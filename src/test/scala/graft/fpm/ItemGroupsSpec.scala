package graft.fpm

import org.scalatest.funsuite.AnyFunSuite

class ItemGroupsSpec extends AnyFunSuite {

  test("hashed covers all groups and is total") {
    val g = ItemGroups.hashed(4, 100)
    assert(g.length == 100)
    assert(g.toSet == Set(0, 1, 2, 3))
    assert(g.forall(x => x >= 0 && x < 4))
  }

  test("balanced is total, deterministic, and within LPT bound") {
    for (numGroups <- Seq(1, 2, 4, 8, 16); numItems <- Seq(0, 1, 10, 100, 1000)) {
      val a = ItemGroups.balanced(numGroups, numItems)
      val b = ItemGroups.balanced(numGroups, numItems)
      assert(a.sameElements(b), "deterministic")
      assert(a.length == numItems)
      assert(a.forall(x => x >= 0 && x < numGroups))
      if (numItems >= numGroups * 4) {
        val imbalance = ItemGroups.loadImbalance(a, numGroups)
        assert(imbalance <= 4.0 / 3.0 + 1e-9, s"LPT bound: $imbalance")
        // and strictly better than a hash assignment's imbalance in this regime
        val hashImb = ItemGroups.loadImbalance(ItemGroups.hashed(numGroups, numItems), numGroups)
        assert(imbalance <= hashImb + 1e-9)
      }
    }
  }
}
