package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan regression guards: the scale properties SCALE.md claims
 * (pushdown, pruning, broadcast, partial agg, top-k) must stay visible in
 * the plans, not just hold by accident.
 */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("plan-spec")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode)

  test("pricing summary pushes the shipdate filter and prunes columns") {
    val p = plan("q06_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    assert(p.contains("partial_sum"), p)
    // pruned: 5 of 11 lineitem columns read
    assert(!p.contains("l_tax"), p)
  }

  test("nation revenue broadcasts both dimension tables") {
    val p = plan("q07_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q08_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("basket build broadcasts the part dimension") {
    val p = plan("q01_baskets")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti") {
    val p = plan("q32_order_presence")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("oov rate: the vocab dictionary broadcasts, the token scan never shuffles by term") {
    val p = plan("q47_oov_rate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // top-V cut, no global sort
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("contamination: eval gram set broadcasts against the shared index") {
    val p = plan("q48_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("InMemoryTableScan"), p) // reuses the cached shingle index
  }

  test("temperature sample: stratum counts broadcast, partial-aggregated") {
    val p = plan("q50_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("repetition aggregates partially on both groupBys, no join wider than per-doc") {
    val p = plan("q46_repetition")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  private def shuffleCount(p: String): Int =
    "- Exchange \\(".r.findAllIn(p).size // BroadcastExchange prints separately

  test("per-nation top-k: rank limit pushed below the window exchange, dims broadcast") {
    val p = plan("q51_top_per_nation")
    // WindowGroupLimit caps each map partition at k rows BEFORE the
    // window's shuffle — the property that makes window top-k viable at scale
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("grouped quantiles: histogram + window + pivot in exactly two shuffles") {
    val p = plan("q52_lang_percentiles")
    assert(shuffleCount(p) == 2, p)
    assert(p.contains("partial_count"), p)
    // final per-group aggregate reuses the window's partitioning by g
    assert("Window".r.findAllIn(p).size >= 2, p)
  }

  test("bigram model: ONE corpus scan (marginal is a window, not a rejoin)") {
    // the BUILD plan (what actually runs when the keyed cache first
    // materializes the LM): one scan, one generate, two exchanges
    import graft.pipeline.Signals
    val docs = Tables.load(spark, dir, "documents")
    val p = Signals.buildBigramModel(docs, "text", 5L)
      .queryExecution.explainString(FormattedMode)
    // tree lines only — each node also reprints as a "(N) ..." detail header
    assert("- Scan parquet".r.findAllIn(p).size == 1, p)
    assert("- Generate".r.findAllIn(p).size == 1, p)
    assert(shuffleCount(p) == 2, p)
    // the DECLARED q53 reads the keyed cache — the corpus scan runs once
    // per session across the LM table and every scoring consumer (q66)
    val pd = plan("q53_bigram_model")
    assert(pd.contains("InMemoryTableScan"), pd)
  }

  test("LM doc score: large-LM regime joins shuffled, never broadcast") {
    import graft.pipeline.Signals
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // kill Spark's own stats-driven broadcast so the plan shows what
      // the gate decided, not what AQE would rescue at this tiny SF
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = Signals.lmScore(docs, "doc_id", "text", minCount = 5L,
          broadcastMaxRows = 0L) // force the above-threshold regime
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("BroadcastHashJoin"), p)
      // keys of the shuffled probe: the (w1, w2) pair
      assert(p.contains("w1"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("repeated spans: shared shingle cache, window on span, no self-join") {
    val p = plan("q54_repeated_spans")
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert(shuffleCount(p) == 2, p)
  }

  test("bloom contamination: cached index feeds both sides, verify join broadcasts") {
    val p = plan("q48b_contamination_bloom")
    assert(p.contains("InMemoryTableScan"), p)
    // the gram-level verify join must broadcast; the final per-doc outer
    // join may plan SMJ statically (the persisted eval set hides its
    // size until materialization — AQE re-plans it broadcast at runtime)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("retention cohorts: one event scan (cohort min is a window, not a rejoin)") {
    val p = plan("q58_retention_cohorts")
    assert("- Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("relational predict: one basket pass, codegen inner broadcast probe, zero added shuffles") {
    val p = plan("q05b_predict_relational")
    // the bitmask probe theta-join broadcasts the (small, lift-filtered)
    // rule table; the basket side — the 100 TB side — is scanned in place.
    // Inner (sentinel-completed), NOT outer: outer BNLJ falls out of
    // whole-stage codegen and pays ~6x on the pair predicate
    assert(p.contains("BroadcastNestedLoopJoin Inner BuildRight"), p)
    assert(!p.contains("CartesianProduct"), p)
    // ONE pass over the cached basket table (tree nodes only — the detail
    // section reprints each operator as "(N) InMemoryTableScan")
    assert("- InMemoryTableScan".r.findAllIn(p).size == 1, p)
    // the query adds ZERO shuffles of its own: the broadcast probe
    // preserves the basket cache's hash(l_orderkey) partitioning, so the
    // partial and final aggregates chain with no Exchange between them
    // (the plan's only Exchange nodes sit inside the reprinted cached
    // basket-build subplan)
    assert("""ObjectHashAggregate \(\d+\)\n\s*\+- ObjectHashAggregate"""
      .r.findFirstIn(p).nonEmpty, p)
    // prediction assembly is the BOUNDED-buffer aggregate (best lift per
    // consequent-vocab slot, allocation-free update, partials that
    // actually combine) — NOT collect_list-of-struct, whose partials
    // concatenate and shuffle one struct per fired (row, rule) pair
    // (~10M+ allocations per run, the suite's dominant GC draw source —
    // BENCH_NOTES round 10; q05b 1.45 s -> 0.69 s isolated)
    assert(p.contains("best_rules_prediction"), p)
    assert(!p.contains("collect_list") && !p.contains("sort_array"), p)
  }

  test("suite-wide sweep: no cartesian product; BNL only where declared") {
    // the only declared nested-loop shapes: the broadcast rule-probe
    // (q05/q05b — bounded rule table broadcast, big side streamed),
    // q33's intentionally-exact all-pairs (scale twin q33b is the
    // declared path), q22's exact brute-force baseline (bounded query
    // set broadcast, corpus streamed), and q23 whose recall-contract row
    // embeds q22's exact reference. Everything else must plan without
    // either.
    val bnlAllowed = Set("q05_predict", "q05b_predict_relational",
      "q33_embedding_neardup", "q22_cosine_topk", "q23_ann_lsh",
      // q86: ADC scoring is corpus-scan x broadcast bounded-query LUTs —
      // the q22 shape with per-pair work collapsed to m lookups
      "q86_ann_pq",
      // q87: the approximate IVFADC path is pure equi-joins (PqSpec pins
      // it) — the BNL is the exact brute-force side of the recall
      // contract, q22's embedded reference
      "q87_ann_ivfpq",
      // q90: q87's search served from the persisted inverted file — same
      // recall contract, same embedded exact reference, same reason
      "q90_ann_ivfpq_indexed",
      // q104: the drift probe MEASURES the stale index against exact
      // brute force — the BNL is that embedded exact reference (q22's
      // shape), the measurement's denominator by definition
      "q104_ann_drift",
      // q109: hard-negative mining is q22's exact broadcast shape with a
      // label anti-filter — bounded query batch broadcast, corpus
      // streamed, the same adjudication
      "q109_hard_negatives",
      // q118: BOTH sides of the recall contract are the q22 shape — the
      // stage-1 shortlist scan (bounded projected-query batch broadcast,
      // compressed corpus streamed) and the embedded exact brute-force
      // reference the recall is measured against
      "q118_projected_ann",
      // q165: the ADC rank audit scores the FULL candidate set per
      // bounded query so every rank is exactly checkable — q22's
      // broadcast evaluation shape, a measurement workload by
      // definition (serving paths are the indexed ANN rows)
      "q165_adc_rank_eval")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val p = fn(spark, dir).queryExecution.executedPlan.toString
          val cart = p.contains("CartesianProduct")
          val bnl = p.contains("BroadcastNestedLoopJoin") && !bnlAllowed(name)
          if (cart || bnl) Some(s"$name: cartesian=$cart unexpected-bnl=$bnl")
          else None
        } catch {
          case e: Throwable => Some(s"$name: plan construction failed: ${e.getMessage}")
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("bucketed join: co-located scans, zero exchanges below the SMJ") {
    val p = plan("q153_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // the layout pre-paid the join shuffle: the only exchange in the
    // whole plan is the final groupBy on o_orderstatus
    assert(shuffleCount(p) == 1, p)
    assert(p.contains("Bucketed: true"), p)
  }

  test("bucketed rollup: bucket-local aggregate, zero exchanges anywhere") {
    val p = plan("q158_bucketed_rollup")
    assert(shuffleCount(p) == 0, p)
    assert(p.contains("Bucketed: true"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("quantile sketch: bounded sketch agg, exact side broadcast-joined") {
    val p = plan("q147_quantile_sketch")
    // sketch side: partial-aggregated groupBy (shuffle carries at most
    // groups x ~1.9k bucket cells); exact side joins in via broadcast
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // only (source, text) read from the documents scan
    assert(!p.contains("doc_id"), p)
  }

  test("derived sessions: gaps, numbering, and aggs share one user exchange") {
    val p = plan("q146_derived_sessions")
    // the user-keyed exchange feeds both window passes and the groupBys;
    // the timeout is driver metadata, never a joined constant-key frame
    assert(shuffleCount(p) <= 2, p)
    assert(!p.contains("Join"), p)
  }

  test("centroid classifier: scoring is pure projection, zero shuffles") {
    // training (the label x dim fixed-point aggregation) runs eagerly at
    // construction and collects bounded centroids; the DECLARED plan is
    // the scoring pass only — centroid literals + codegen'd dots + in-row
    // argmax, nothing exchanged, no join of any kind
    val p = plan("q107_centroid_classifier")
    assert(shuffleCount(p) == 0, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("arraydot") || p.contains("array_dot"), p)
  }

  test("winnow fingerprints: zero shuffles, winnow inside whole-stage codegen") {
    val p = plan("q73_winnow_fingerprints")
    assert(shuffleCount(p) == 0, p)
    assert(p.contains("Generate"), p)
    // the expression itself is codegen'd (static-call body, not
    // CodegenFallback): the project feeding the generate keeps its span
    assert(p.contains("codegen id"), p)
    assert(p.contains("winnow"), p)
  }

  test("doc chunking: pure scan + generate, zero shuffles") {
    val p = plan("q71_doc_chunks")
    assert(shuffleCount(p) == 0, p)
    assert(p.contains("Generate"), p)
  }

  test("semantic dedup: one fixed-width-key shuffle, md5 computed below it") {
    val p = plan("q72_semantic_dedup")
    assert(shuffleCount(p) == 1, p)
    // the embedding is collapsed to qhash BEFORE the exchange: the window
    // reads only (vec_id, qhash), never the float vector
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("token-id vocab: top-V cut is TakeOrderedAndProject, encode has no global window") {
    import graft.pipeline.TextStats
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    // the vocab-build subquery: bounded per-partition heaps, never a
    // global sort or an unpartitioned row_number over ALL distinct terms
    val vp = TextStats.topTerms(docs, "text", 40)
      .queryExecution.explainString(FormattedMode)
    assert(vp.contains("TakeOrderedAndProject"), vp)
    assert(!vp.contains("Window"), vp)
    // the declared q55 plan: broadcast vocab probe, zero Window operators
    val p = plan("q55_token_ids")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("sketches: exact side is histogram + distinct, never a raw-value buffer") {
    val p = plan("q36_sketches")
    // the exact quantile bounds come from the histogram window path
    // (grouped cells), NOT Spark's `percentile`, which buffers every raw
    // value per group in executor memory — a 100 TB OOM in a contract row
    assert(!p.contains("percentile(") && !p.contains("Percentile("), p)
    assert(p.contains("percentile_approx"), p) // the estimate under test
    assert(p.contains("Window"), p)            // histogram cumulative pass
    assert(p.contains("BroadcastHashJoin"), p) // group-sized bounds join
  }

  test("LM doc score: vocabulary-sized LM broadcasts, partial-aggregated scoring") {
    val p = plan("q66_lm_doc_score")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("BPE encode: one scan, map-side partial aggregate, single exchange, no join") {
    val p = plan("q80_bpe_encode")
    assert("- Scan parquet".r.findAllIn(p).size == 1, p)
    assert(shuffleCount(p) == 1, p)
    // collect_list partials combine map-side (ObjectHashAggregate pair)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
  }

  test("native expressions stay inside whole-stage codegen") {
    import graft.functions.VectorExprs
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, dir, "embeddings")
      .select(VectorExprs.array_dot(col("embedding"), col("embedding")).as("d"))
    val p = df.queryExecution.explainString(FormattedMode)
    // formatted mode marks codegen'd operators with "[codegen id : N]"
    assert(p.contains("codegen id"), p)
    assert(p.contains("array_dot"), p)
  }
}
