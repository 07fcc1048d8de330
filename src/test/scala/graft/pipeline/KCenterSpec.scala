package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Greedy k-center selection: driver-side reference differential,
  * farthest-first invariants, short-corpus degeneration. */
class KCenterSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("kcenter-spec")
    .getOrCreate()

  private def vecs(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextFloat()))
  }

  private def select(
      rows: Seq[(Long, Seq[Float])], k: Int, dim: Int) = {
    import spark.implicits._
    Similarity.kCenterSelect(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k, dim)
      .as[(Int, Long, Option[Double])].collect().toSeq.sortBy(_._1)
  }

  /** Driver-side farthest-first with the same fold order. */
  private def reference(
      rows: Seq[(Long, Seq[Float])], k: Int): Seq[(Int, Long, Option[Double])] = {
    val e = rows.map { case (id, v) => id -> v.map(_.toDouble) }
    def sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    var selected = List(e.minBy(_._1))
    val out = scala.collection.mutable.ListBuffer(
      (1, selected.head._1, Option.empty[Double]))
    for (r <- 2 to math.min(k, e.size)) {
      val rest = e.filterNot(p => selected.exists(_._1 == p._1))
      val scored = rest.map { case (id, v) =>
        (id, v, selected.map(s => sq(v, s._2)).min)
      }
      val best = scored.minBy { case (id, _, d) => (-d, id) }
      selected = (best._1, best._2) :: selected
      out += ((r, best._1, Some(best._3)))
    }
    out.toSeq
  }

  test("matches the driver-side reference, distances included") {
    val rows = vecs(120, 8, 3)
    assert(select(rows, 6, 8) == reference(rows, 6))
  }

  test("farthest-first invariants: seed is lowest id, distances shrink") {
    val rows = vecs(200, 4, 7)
    val got = select(rows, 5, 4)
    assert(got.head == ((1, 1L, None)), "seed must be the lowest id")
    val ds = got.tail.map(_._3.get)
    assert(ds == ds.sorted.reverse,
      "selection distances must be non-increasing (farthest-first)")
    assert(got.map(_._2).distinct.size == got.size, "picks are distinct")
  }

  test("k beyond the corpus stops at the corpus") {
    val rows = vecs(3, 4, 9)
    val got = select(rows, 10, 4)
    assert(got.size == 3)
  }

  test("wrong-dimension and null vectors are excluded") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some(Seq(0.0f, 0.0f))), (2L, Some(Seq(1.0f, 1.0f))),
      (3L, Some(Seq(9.0f))), (4L, None))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(rows, "vec_id", "embedding", 5, 2)
      .as[(Int, Long, Option[Double])].collect()
    assert(got.map(_._2).toSet == Set(1L, 2L))
  }
}
