package graft.fpm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Closed/maximal itemset flags: hand-computed lattice, brute-force
  * differential on random tables, canonicalization of unsorted input. */
class ClosedItemsetsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("closed-itemsets-spec")
    .getOrCreate()

  private def run(rows: Seq[(Seq[String], Long)]): Map[String, (Long, Boolean, Boolean)] = {
    import spark.implicits._
    ClosedItemsets.flag(rows.toDF("items", "freq"), "items", "freq")
      .as[(String, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("hand-computed lattice: equal-support superset kills closed, any kills maximal") {
    val got = run(Seq(
      (Seq("a"), 5L), (Seq("b"), 4L), (Seq("c"), 3L),
      // unsorted on purpose: the canonical key must sort it
      (Seq("b", "a"), 4L), (Seq("a", "c"), 2L), (Seq("a", "b", "c"), 2L)))
    assert(got == Map(
      "a" -> ((5L, true, false)),      // no equal-freq superset
      "b" -> ((4L, false, false)),     // {a,b} has the SAME freq
      "c" -> ((3L, true, false)),
      "a,b" -> ((4L, true, false)),    // {a,b,c} exists but freq differs
      "a,c" -> ((2L, false, false)),   // {a,b,c} matches its freq
      "a,b,c" -> ((2L, true, true)))) // the frontier
  }

  test("differential: flags == naive pairwise containment on random tables") {
    val rnd = new scala.util.Random(13)
    val alphabet = Vector("a", "b", "c", "d", "e")
    (1 to 5).foreach { _ =>
      val sets = rnd.shuffle(
        (1 to 3).flatMap(k => alphabet.combinations(k).toSeq))
        .take(12).map(s => (s.sorted, (1 + rnd.nextInt(9)).toLong))
      val naive = sets.map { case (items, f) =>
        val sups = sets.filter { case (o, _) =>
          o.size > items.size && items.forall(o.contains)
        }
        (items.mkString(","),
          (f, !sups.exists(_._2 == f), sups.isEmpty))
      }.toMap
      assert(run(sets.map { case (i, f) => (i: Seq[String], f) }) == naive)
    }
  }

  test("singletons only: everything is closed and maximal") {
    val got = run(Seq((Seq("x"), 3L), (Seq("y"), 1L)))
    assert(got == Map("x" -> ((3L, true, true)), "y" -> ((1L, true, true))))
  }

  test("arity above the hard cap raises instead of overflowing the mask") {
    val wide = (0 until ClosedItemsets.MaxArity + 1).map(i => f"i$i%02d")
    val e = intercept[Exception] { run(Seq((wide, 2L), (Seq("a"), 5L))) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exceeds the hard cap")))
    // at the cap itself the guard stays silent
    val ok = run(Seq(((0 until ClosedItemsets.MaxArity).map(i => f"i$i%02d"), 2L)))
    assert(ok.values.toSeq == Seq((2L, true, true)))
  }
}
