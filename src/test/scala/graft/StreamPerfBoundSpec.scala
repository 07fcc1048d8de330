package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming-family PERF BOUND — the self-adjudicating guard round 11
 * proved necessary: with zero code change, the round's bench moved +21%
 * (q92 2.09→3.63 s, q95 4.46→6.38 s) purely from host state, and
 * nothing in the harness could distinguish that draw from a real
 * regression. This spec makes the distinction mechanical:
 *
 *  - a fixed CALIBRATION workload (hash + shuffle + sum over 4M rows —
 *    deterministic work, the machinery every query exercises) runs
 *    immediately before each query; its time measures the HOST, not
 *    the code;
 *  - each streaming query's elapsed time must stay under
 *    `floor + baseline * Slack * hostFactor`, where `hostFactor =
 *    max(1, calib_now / CalibBaseline)` rescales the bound by however
 *    much slower the host is RIGHT NOW than when the baseline was
 *    recorded.
 *
 * A contended host inflates calibration and query alike — the bound
 * scales and the run passes. A real regression (a new shuffle, an
 * accidental O(n²), a lost broadcast) inflates ONLY the query — the
 * bound holds still and the run fails. Slack 4× + a fixed floor absorb
 * micro-batch scheduling jitter (streaming rows carry ~1 s of fixed
 * RocksDB/checkpoint machinery that does not scale with host speed);
 * under absurd contention (host > 8× baseline) the tests cancel rather
 * than adjudicate noise.
 *
 * Baselines: measured at sf0.01 on an otherwise-idle host under the
 * shared sbt-test SparkContext (local[4], shuffle.partitions = 4),
 * warm JVM — re-record (values printed on every run) whenever a query's
 * declared shape changes intentionally.
 */
class StreamPerfBoundSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("stream-perf-bound")
    .getOrCreate()

  private val SfDir = "/root/testdata/sf0.01"

  /** Calibration seconds on the reference (idle) host — steady-state
    * (warm) measurement; the first calibration of a JVM runs hotter and
    * is burned untimed. */
  private val CalibBaseline = 0.2

  /** Idle-host per-query seconds at sf0.01, measured 2026-08-14 (warm
    * shared context, calib 0.12-0.23 s in the same runs); rows from
    * q151 down measured 2026-08-15 when the r15 extension closed the
    * unbounded slow bracket (every BENCH_r14 row >= 2 s now carries a
    * bound). Artifact-stream rows include their declared per-row
    * builds; the sequence rows' shared probe mine lands on whichever
    * row the suite runs first (the r15 keyed memo), so each baseline
    * is the COLD value — warm runs sit far inside the bound. */
  private val Baselines: Map[String, Double] = Map(
    "q84_asof_stream" -> 2.0,
    "q91_sessions_stream" -> 2.2,
    "q92_hourly_stream" -> 2.3,
    "q94_hopping_stream" -> 2.2,
    "q95_followups_stream" -> 4.0,
    "q96_dedup_stream" -> 1.5,
    "q97_contam_gate_stream" -> 2.5,
    "q98_neardup_gate_stream" -> 4.0,
    "q113_media_gate_stream" -> 5.0,
    "q131_funnel_stream" -> 3.0,
    "q135_hll_stream" -> 4.5,
    "q151_sample_stream" -> 1.6,
    "q154_qsketch_stream" -> 1.7,
    "q159_windowed_qsketch_stream" -> 2.1,
    "q169_boilerplate_gate_stream" -> 1.2,
    "q176_lm_gate_stream" -> 2.4,
    "q177_kmv_stream" -> 2.3,
    "q180_priority_sample_stream" -> 1.3,
    "q188_itemset_stream" -> 2.2,
    "q190_seqpattern_stream" -> 2.3,
    "q194_itemset_cdc_stream" -> 2.4,
    "q196_seqpattern_touch_stream" -> 2.7,
    "q197_seqpattern_erase_stream" -> 2.4,
    "q200_seqpattern_auto_resnapshot" -> 6.0,
    // r16 extension (see BatchPerfBoundSpec): the two stream rows that
    // crossed 2 s in the drifted round-15 driver recording unbounded,
    // plus q203 bounded from birth (its cold value pays the probe
    // mine, four touched-key folds, the mid-stream re-mine AND the
    // corpus promotion — the declared lifecycle)
    "q126_scd2_stream" -> 3.2,
    "q160_session_window_stream" -> 2.3,
    "q203_seqpattern_touch_auto_resnapshot" -> 9.5)

  private val Slack = 4.0
  private val FloorSeconds = 4.0

  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    spark.range(4000000L)
      .selectExpr("xxhash64(cast(id as string)) % 1048576 AS h", "id % 64 AS k")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("h"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def timeQuery(name: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, SfDir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  // one untimed warm-up so JIT/codegen/session init lands on no query
  private lazy val warm: Unit = { calibrate(); () }

  Baselines.toSeq.sortBy(_._1).foreach { case (name, baseline) =>
    test(s"$name stays within its host-normalized bound") {
      warm
      val calib = calibrate()
      val hostFactor = math.max(1.0, calib / CalibBaseline)
      assume(hostFactor < 8.0,
        s"host $hostFactor x slower than baseline — too contended to adjudicate")
      val elapsed = timeQuery(name)
      val bound = FloorSeconds + baseline * Slack * hostFactor
      info(f"$name%-24s $elapsed%6.2f s (baseline $baseline%4.1f, " +
        f"calib $calib%5.2f, host x$hostFactor%4.2f, bound $bound%6.2f)")
      assert(elapsed <= bound,
        f"$name took $elapsed%.2f s > bound $bound%.2f s " +
          f"(baseline $baseline%.2f x slack $Slack%.1f x host $hostFactor%.2f " +
          f"+ floor $FloorSeconds%.1f): calibration says the host is fine, " +
          "so this is a code regression, not a host draw")
    }
  }
}
