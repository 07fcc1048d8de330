package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interval join: inclusive-bound semantics, bucket edges, differential. */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("interval-join-spec")
    .getOrCreate()

  test("bounds are inclusive; keys isolate; empty intervals drop") {
    import spark.implicits._
    val points = Seq((1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 21L, "p21"),
      (2L, 15L, "other-key")).toDF("k", "t", "pid")
    val intervals = Seq(
      (1L, 10L, 20L, "a"),  // catches 10 and 20 (inclusive), not 21
      (1L, 21L, 21L, "b"),  // single-point interval
      (1L, 30L, 25L, "c"),  // end < start: empty, must NOT explode
      (2L, 0L, 99L, "d")).toDF("k", "s", "e", "iid")
    val got = IntervalJoin.intervalJoin(points, intervals, Seq("k"),
        col("t"), col("s"), col("e"), bucketWidth = 7L)
      .select(col("iid"), col("pid")).as[(String, String)].collect().toSet
    assert(got == Set(("a", "p10"), ("a", "p20"), ("b", "p21"),
      ("d", "other-key")))
  }

  test("differential vs naive range join on random data (incl. negatives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = Seq.tabulate(300)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong - 100L, i.toLong))
      .toDF("k", "t", "pid")
    val intervals = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(200).toLong - 100L
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(30).toLong, i.toLong)
    }.toDF("k", "s", "e", "iid")
    for (bucket <- Seq(1L, 7L, 64L, 1000L)) {
      val got = IntervalJoin.intervalJoin(points, intervals, Seq("k"),
          col("t"), col("s"), col("e"), bucket)
        .select(col("iid"), col("pid")).as[(Long, Long)].collect().sorted.toSeq
      val want = intervals.as("i").join(points.as("p"),
          col("i.k") === col("p.k") && col("t").between(col("s"), col("e")))
        .select(col("iid"), col("pid")).as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"bucketWidth=$bucket diverged")
      assert(got.distinct == got, s"bucketWidth=$bucket produced duplicates")
    }
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    import spark.implicits._
    val points = Seq((1L, 10L)).toDF("k", "t")
    val intervals = Seq((1L, 0L, 99L)).toDF("k", "s", "e")
    val plan = IntervalJoin.intervalJoin(points, intervals, Seq("k"),
        col("t"), col("s"), col("e"), 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range-join shape leaked:\n$plan")
  }
}
