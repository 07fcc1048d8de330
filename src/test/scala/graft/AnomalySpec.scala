package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Trailing-window z-score anomaly detection: planted spike, degenerate
  * baselines, per-type isolation. */
class AnomalySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("anomaly-spec")
    .getOrCreate()

  test("planted spike flags, steady traffic and degenerate baselines do not") {
    import spark.implicits._
    // type "a": 25 alternating-volume hours (mean 10, variance 1), then a
    // 100-count spike; type "b": two constant hours (zero variance -> no z)
    val a = (0L until 25L).map(h => ("a", h, if (h % 2 == 0) 9L else 11L)) :+
      (("a", 25L, 100L))
    val b = Seq(("b", 0L, 5L), ("b", 1L, 5L), ("b", 2L, 5L))
    val got = RelQueries.anomalyScores(
        (a ++ b).toDF("event_type", "hour_bucket", "n"))
      .as[(String, Long, Long, Option[Double], Option[Double], Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap

    // hour 0: no baseline at all -> null mean, null z, not anomalous
    assert(got(("a", 0L)) == ((None, None, false)))
    // hour 1: one prior row -> still below the n_prior >= 2 floor
    assert(got(("a", 1L)) == ((None, None, false)))
    // the spike: baseline is 24 alternating hours (12x9 + 12x11:
    // mean 10, variance 1) -> z = 90, flagged
    val (spikeMean, spikeZ, spikeFlag) = got(("a", 25L))
    assert(spikeMean.contains(10.0) && spikeZ.contains(90.0) && spikeFlag)
    // a steady alternating hour is within |z| < 3
    val (_, steadyZ, steadyFlag) = got(("a", 24L))
    assert(steadyZ.exists(z => math.abs(z) < 3) && !steadyFlag)
    // zero-variance baseline -> null z, never flagged (no div-by-zero)
    assert(got(("b", 2L)) == ((Some(5.0), None, false)))
    // types are isolated: b's hour 1 sees only ONE prior row (its own
    // type's hour 0), staying under the n_prior >= 2 floor even though
    // type a has plenty of earlier hours
    assert(got(("b", 1L)) == ((None, None, false)))
  }

  test("robust anomalies: planted spike flags, constant series never does") {
    import spark.implicits._
    val H = 3600000000000L // one hour in ts nanos
    // type "a": nine calm hours of 10-12 events (the wiggle keeps the
    // MAD nonzero) + one 100-event spike hour; type "b": constant 5
    // events across 10 hours — MAD 0, the degenerate guard path
    val rows =
      (for { h <- 0L to 8L; i <- 1L to (10L + h % 3) } yield ("a", h * H, i)) ++
        (for { i <- 1L to 100L } yield ("a", 9L * H, i)) ++
        (for { h <- 0L to 9L; i <- 1L to 5L } yield ("b", h * H, i))
    val got = RelQueries.robustAnomaliesFromEvents(
        rows.toDF("event_type", "ts", "i"), flagAt = 5.0)
      .as[(String, Long, Long, Long, Long, Option[Double], Boolean)]
      .collect()
    val a = got.filter(_._1 == "a")
    assert(a.count(_._7) == 1, "exactly one hour of type a flags")
    assert(a.filter(_._7).head._2 == 9L, "and it is the spike hour")
    val b = got.filter(_._1 == "b")
    assert(b.forall(r => r._5 == 0L && r._6.isEmpty && !r._7),
      "a constant series has MAD 0, null ratio, and never flags")
  }
}
