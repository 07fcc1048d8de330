package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Key-skew profiler: hand-computed fixture with a genuinely hot key,
  * salt arithmetic, null exclusion, parallelism invariance. */
class KeySkewSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("key-skew-spec")
    .getOrCreate()

  test("hot-key fixture: shares and the salt recommendation, hand-checked") {
    import spark.implicits._
    // 1000 rows of key 1 (hot), 50 keys x 2 rows, 3 nulls excluded:
    // n_rows 1100, n_keys 51, max 1000, top10 = 1000 + 9*2 = 1018
    val rows: Seq[Option[Long]] =
      Seq.fill(1000)(Option(1L)) ++
        (2L to 51L).flatMap(k => Seq(Option(k), Option(k))) ++
        Seq.fill(3)(Option.empty[Long])
    def profile(parts: Int) = RelQueries.keySkewProfile(
        rows.toDF("k").repartition(parts), "k", "fixture", parallelism = 8)
      .as[(String, Long, Long, Long, Long, Double, Double, Long)].collect()
    val Array(r) = profile(4)
    assert((r._2, r._3, r._4, r._5) == ((1100L, 51L, 1000L, 1018L)))
    assert(r._6 == 1000.0 / 1100.0 && r._7 == 1018.0 / 1100.0)
    // salt = ceil(max_cnt / (n_rows / P)) = ceil(1000 * 8 / 1100) = 8:
    // splitting the hot key 8 ways brings its shards to ~avg load
    assert(r._8 == 8L)
    assert(profile(13).toSeq == profile(4).toSeq, "partitioning-invariant")
  }

  test("uniform keys recommend salt 1") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => i % 20)
    val Array(r) = RelQueries.keySkewProfile(
        rows.toDF("k"), "k", "uniform", parallelism = 16)
      .as[(String, Long, Long, Long, Long, Double, Double, Long)].collect()
    assert(r._3 == 20L && r._4 == 20L)
    assert(r._8 == 1L) // 20 * 16 / 400 = 0.8 -> ceil = 1: no salting
  }
}
