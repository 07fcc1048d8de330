package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * BATCH-suite host-normalized perf bound — the round-13 extension of
 * [[StreamPerfBoundSpec]]'s calibration pattern to the batch rows whose
 * bench recordings have needed hand adjudication three rounds running
 * (q05b drew 21.4 s in round 12 despite a dedicated warm-up vs 1.97 s
 * idle; q150 13.7 s vs 3.3 s; the deltas were host draws, not
 * regressions, but nothing machine-checked that claim).
 *
 * Mechanism, identical to the streaming spec: a fixed deterministic
 * calibration workload runs before each query and measures the HOST;
 * the query must finish under `floor + baseline * Slack * hostFactor`.
 * Contention inflates calibration and query together — the bound
 * scales, the run passes. A code regression inflates only the query —
 * the bound holds still, the run fails.
 *
 * Scope: the adjudication-prone rows the round-12 verdict names —
 * q05b (broadcast rule probe, the suite's worst variance source), q36
 * (exact-vs-sketch reference row), q108 (kNN vote from the IVF
 * artifact), q118 (two-stage retrieval with embedded exact recall
 * denominator), q150 (incremental dup clusters incl. artifact build),
 * q152 (staleness-triggered ANN auto-rebuild). q98 is already bounded
 * by StreamPerfBoundSpec. The driver's bench TOTAL self-adjudicates
 * via the calibration fields Bench.scala now embeds in bench.json
 * (`calib_sec` / `host_factor`) — a spec cannot time the driver's run,
 * only annotate it.
 *
 * Baselines: idle-host per-query seconds at sf0.01 under the shared
 * spec SparkContext (local[4], shuffle.partitions = 4), warm JVM,
 * measured 2026-08-14. Artifact rows (q150/q152) include their
 * artifact builds — that is the declared row. Re-record (values are
 * printed on every run) whenever a query's declared shape changes
 * intentionally.
 */
class BatchPerfBoundSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("batch-perf-bound")
    .getOrCreate()

  private val SfDir = "/root/testdata/sf0.01"

  /** Calibration seconds on the reference (idle) host — steady-state
    * (warm) measurement; the first calibration of a JVM runs hotter and
    * is burned untimed. Same workload and constant as
    * [[StreamPerfBoundSpec]]. */
  private val CalibBaseline = 0.2

  /** Rows from q40b down measured 2026-08-15 when the r15 extension
    * closed the unbounded slow bracket (every BENCH_r14 row >= 2 s now
    * carries a bound). Lifecycle rows include their declared per-row
    * artifact builds; the sequence rows' shared probe mine lands on
    * whichever row runs first (the r15 keyed memo), so each baseline
    * is the COLD value. */
  private val Baselines: Map[String, Double] = Map(
    "q05b_predict_relational" -> 3.6,
    "q36_sketches" -> 2.6,
    "q108_knn_label_vote" -> 5.2,
    "q118_projected_ann" -> 4.1,
    "q150_dup_clusters_refresh" -> 9.0,
    "q152_ann_auto_rebuild" -> 7.1,
    "q40b_dup_clusters_logn" -> 2.1,
    "q90_ann_ivfpq_indexed" -> 2.0,
    "q104_ann_drift" -> 4.4,
    "q121_sequential_patterns" -> 1.5,
    "q127_co_engagement" -> 1.1,
    "q153_bucketed_join" -> 1.5,
    "q170_itemset_refresh" -> 1.4,
    "q189_seqpattern_refresh" -> 1.8,
    "q191_seqrules_from_artifact" -> 1.2,
    "q192_seqpattern_touch_refresh" -> 2.2,
    "q193_itemset_cdc_refresh" -> 1.3,
    "q195_seqpattern_erase" -> 1.4,
    "q198_predict_from_artifact" -> 1.5,
    "q199_itemset_auto_resnapshot" -> 5.0,
    "q201_next_event_predict" -> 3.5,
    "q202_seq_predict_from_artifact" -> 5.0,
    // r16 extension: every row >= ~1.5 s in the round-15 driver
    // recording (which ran a 1.29x drifted host) now carries a bound,
    // so a host draw can never move a row out of the bounded set
    // again — the round-15 verdict's frontier argument. Measured
    // 2026-08-15, warm JVM, cold per-query caches.
    "q33b_neardup_grid" -> 0.8,
    "q63_apriori_itemsets" -> 2.0,
    "q86_ann_pq" -> 2.1,
    "q87_ann_ivfpq" -> 2.5,
    "q93_ann_ivf_indexed" -> 2.0,
    "q99_span_dedup" -> 2.0,
    "q103_unigram_encode" -> 1.3,
    "q114_tokenizer_report" -> 0.9,
    "q120_hll_cardinality" -> 0.6,
    "q156_price_quantile_sketch" -> 1.1,
    "q158_bucketed_rollup" -> 0.8,
    "q163_boilerplate_refresh" -> 1.0,
    "q174_kmv_refresh" -> 1.5,
    // r16 completion: the last three rows >= 1.1 s in ANY recording —
    // with these, every row that could cross 2 s under a < ~1.8x host
    // draw is bounded. q187/q106 baselines are COLD (the probe mine /
    // wordpiece table land on the first family row in a shared run).
    "q33_embedding_neardup" -> 1.2,
    "q106_wordpiece_encode" -> 3.2,
    "q187_rules_from_artifact" -> 5.6)

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

  // one untimed warm-up so JIT/codegen/session init lands on no query;
  // the model fit + basket cache land on the first q05b-family touch,
  // exactly like the bench's own warm-up discipline
  private lazy val warm: Unit = {
    calibrate()
    try FpmQueries.predictRelational(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    ()
  }

  Baselines.toSeq.sortBy(_._1).foreach { case (name, baseline) =>
    test(s"$name stays within its host-normalized bound") {
      warm
      val calib = calibrate()
      val hostFactor = math.max(1.0, calib / CalibBaseline)
      assume(hostFactor < 8.0,
        s"host $hostFactor x slower than baseline — too contended to adjudicate")
      val elapsed = timeQuery(name)
      val bound = FloorSeconds + baseline * Slack * hostFactor
      info(f"$name%-26s $elapsed%6.2f s (baseline $baseline%5.2f, " +
        f"calib $calib%5.2f, host x$hostFactor%4.2f, bound $bound%6.2f)")
      assert(elapsed <= bound,
        f"$name took $elapsed%.2f s > bound $bound%.2f s " +
          f"(baseline $baseline%.2f x slack $Slack%.1f x host $hostFactor%.2f " +
          f"+ floor $FloorSeconds%.1f): calibration says the host is fine, " +
          "so this is a code regression, not a host draw")
    }
  }
}
