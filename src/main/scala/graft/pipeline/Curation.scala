package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Corpus-curation operators a large-scale training-data pipeline runs after
 * dedup/scoring: duplicate-cluster resolution, exact quantile-band
 * filtering, deterministic stratified sampling, and sequence packing.
 * Everything is DataFrame algebra with exact-integer semantics (each has a
 * DuckDB oracle in [[graft.PipelineQueries]]).
 */
object Curation {

  /**
   * Materialize one iteration round and CUT ITS LINEAGE — both the
   * logical plan and the RDD dependency chain. The loop body references
   * the previous round's frame more than once (update join +
   * neighbor-min), so without truncation the logical plan DOUBLES per
   * round (plan stringification OOMs long-chain graphs around round ~20),
   * and even with a constant plan the RDD dependency graph deepens per
   * round until task deserialization StackOverflows (~round 100). Eager
   * `localCheckpoint` is the standard iterative-algorithm fix: it
   * materializes the round and replaces the dependency chain with the
   * stored blocks. [[release]] frees a finished round — checkpoint blocks
   * are invisible to the cache manager, so `unpersist()` alone leaks one
   * cached RDD per round.
   */
  // Every checkpoint this object creates is registered here; intra-loop
  // rounds deregister as [[release]] frees them, so what remains is
  // exactly the storage behind RETURNED frames — [[clearCheckpoints]] is
  // the sweep contract a long-lived session calls between corpora.
  // WEAK references: a frame the caller has already dropped stays
  // reclaimable by Spark's GC-based ContextCleaner (whose own weak map
  // this registry must not defeat); the sweep covers what is still
  // strongly held.
  private val liveCheckpoints: java.util.Set[org.apache.spark.rdd.RDD[_]] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[org.apache.spark.rdd.RDD[_], java.lang.Boolean]()))

  private def track(df: DataFrame): DataFrame = {
    org.apache.spark.sql.GraftShims.checkpointRDDs(df).foreach(liveCheckpoints.add)
    df
  }

  // private[pipeline]: GraphRank's iteration rounds share this registry,
  // so one clearCheckpoints sweep covers every iterative operator.
  private[pipeline] def materializeRound(df: DataFrame): DataFrame =
    track(df.localCheckpoint(eager = true))

  // Releases the frame's OWN storage only: its cache entry plus the
  // checkpoint RDD at the frame's ROOT (what materializeRound produced).
  // Never the deep LogicalRDD leaves — a round built OVER a caller's
  // checkpoint-backed input (mergeComponents contracts delta pairs
  // through the stored dupClusters artifact) carries the INPUT's
  // LogicalRDD in its lineage, and sweeping leaves would yank the
  // caller's blocks out from under every later consumer
  // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND at the next action).
  private[pipeline] def release(df: DataFrame): Unit = {
    df.unpersist()
    val rdds = org.apache.spark.sql.GraftShims.ownCheckpointRDD(df)
    rdds.foreach(_.unpersist(blocking = false))
    rdds.foreach(liveCheckpoints.remove)
  }

  /**
   * Release the checkpoint blocks still held by frames RETURNED from this
   * object's iterative operators (intra-loop rounds free themselves).
   * Spec-enforced: repeated cluster runs followed by a sweep leave zero
   * net storage growth.
   *
   * Call it AFTER the returned frames are consumed: `localCheckpoint`
   * truncates lineage, so a swept frame cannot be recomputed — reading it
   * again throws rather than re-running the pipeline. Don't sweep
   * concurrently with an in-flight clustering run either (its current
   * round is registered here and would be yanked mid-job).
   */
  def clearCheckpoints(): Unit = {
    liveCheckpoints.synchronized {
      liveCheckpoints.forEach(r => r.unpersist(blocking = false))
      liveCheckpoints.clear()
    }
    // cached CC frames read the checkpoint blocks released above —
    // lineage is truncated, so a swept frame cannot re-materialize and
    // must leave the cache with its storage
    ccCache.clear()
  }

  // One resolved component-label table per (session, edge plan, cols):
  // cluster resolution (q40) and the leakage-safe split (q89) share the
  // same near-dup edges, and recomputing the components per caller
  // doubles the dominant cost — the q53/q66 LM-sharing discipline. The
  // cached value's storage IS its checkpoint (registered in
  // liveCheckpoints), so [[clearCheckpoints]] sweeps both together.
  private val ccCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def cachedComponents(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // applicationId + startTime: stable, never GC-recycled (see Tables)
    val key = s"${sc.applicationId}@${sc.startTime}|" +
      s"${edges.queryExecution.analyzed.semanticHash()}|$srcCol|$dstCol"
    val cached = ccCache.get(key)
    if (cached != null) return cached
    val built = connectedComponents(edges, srcCol, dstCol)
    val prev = ccCache.putIfAbsent(key, built)
    if (prev != null) prev else built
  }

  /**
   * Connected components by iterative min-label propagation: every node
   * starts labeled with its own id; each round takes the min of its own and
   * its neighbors' labels; fixpoint = each node labeled with its
   * component's minimum id.
   *
   * Scale shape: one shuffle join + partial-aggregated groupBy per round,
   * and the number of rounds is the graph DIAMETER — for dedup graphs
   * (near-clique clusters of copies) that is 2-3, so the 100 TB cost is a
   * handful of joins over an edge list that is itself tiny relative to the
   * corpus. For adversarially long path graphs the alternating
   * large-star/small-star variant (Kiveris et al., "Connected Components in
   * MapReduce and Beyond") drops rounds to O(log n); the propagation loop
   * below is the right trade for dup-resolution workloads. Convergence is
   * detected (not assumed): the loop stops when a round changes no label,
   * and `maxIter` bounds pathological inputs.
   *
   * Returns (node, cluster_id) for every node that appears in `edges`.
   */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var persisted = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("old"), col("node").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = persisted.select(col("node"), col("label"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym.join(labels, col("b") === col("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      // Carry the previous label through the update join so convergence is
      // a scan of the cached frame, not a second join per round.
      // Eager checkpoint = materialize FULLY before the previous labels
      // are dropped (a partially-stored `next` would otherwise recompute
      // missing partitions through released state) AND cut both lineages
      // (see materializeRound).
      val next = materializeRound(
        labels.join(nbrMin, col("node") === col("a"), "left")
          .select(col("node"), col("label").as("old"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label")))
      val changed = next.where(col("label") =!= col("old")).count()
      release(persisted)
      persisted = next
      labels = next.select(col("node"), col("label"))
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    // The returned frame reads the final (small: one row per edge-connected
    // node) stored label table; a long-lived session sweeping many corpora
    // releases it with [[clearCheckpoints]] once consumed (spec-enforced
    // zero-net-growth contract).
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  /**
   * Connected components by alternating large-star / small-star rounds
   * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
   * converges in O(log n) rounds with high probability on ANY graph —
   * the scale path for adversarially long chains, where min-label
   * propagation ([[connectedComponents]]) needs diameter rounds.
   *
   *  - large-star(u): link every strictly-larger neighbor of u to
   *    m = min(N(u) ∪ u)
   *  - small-star(u): over edges directed larger→smaller, link every
   *    smaller neighbor of u (and u itself) to the minimum
   *
   * Both steps are one partial-aggregated groupBy (the per-node min) and
   * one self-join per round — no neighborhood is ever collected into a
   * single row, so hub nodes cost shuffle fan-out, not memory. Fixpoint
   * is the star graph rooted at each component's minimum; detected by a
   * (count, hash-sum) signature match between consecutive rounds,
   * computed inside the single action that materializes each round.
   *
   * Returns (node, cluster_id) for every node appearing in `edges` —
   * output-identical to [[connectedComponents]] (spec-enforced).
   */
  def connectedComponentsAlternating(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("x").as("u"), col("y").as("v"))
        .union(e.select(col("y").as("u"), col("x").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      // no distinct here: duplicates don't affect smallStar's min and its
      // final distinct dedupes — saves one shuffle per round
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("x"), col("m").as("y"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // edges already flow larger -> smaller (x > y invariant below)
      val mins = e.groupBy(col("x")).agg(min(col("y")).as("m"))
      e.join(mins, "x").where(col("y") =!= col("m"))
        .select(col("y").as("x"), col("m").as("y"))
        .union(mins.select(col("x"), col("m").as("y")))
        .distinct()
    }
    // Distinct-set equality probe in ONE action: (count, XOR of pair
    // hashes). XOR, not sum: ANSI mode (Spark 4 default) throws
    // ARITHMETIC_OVERFLOW the moment a running sum of uniform 64-bit
    // hashes leaves the Long range — i.e. on any non-toy edge set — while
    // XOR is closed over 64 bits and equally order-insensitive. The sets
    // are distinct() so XOR's duplicate-cancellation cannot fire. Equal
    // signatures on distinct sets differ only on a 64-bit collision
    // (~2^-64 per round): a spurious EXTRA round is harmless, and a false
    // convergence is negligible against hardware error rates. This
    // replaces a per-round anti-join + count pair.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        bit_xor(xxhash64(col("x"), col("y")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val init = edges
      .select(greatest(col(srcCol), col(dstCol)).as("x"),
        least(col(srcCol), col(dstCol)).as("y"))
      .where(col("x") =!= col("y"))
      .distinct()
    var cur = init.persist(StorageLevel.MEMORY_AND_DISK)
    var curSig = signature(cur) // also materializes cur
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // LAZY checkpoint + signature: the signature's full scan is the job
      // that writes every checkpoint block, so one action per round both
      // materializes `next` (fully, before cur is released) and probes
      // convergence. Lineage truncation per materializeRound's contract.
      val next = track(smallStar(largeStar(cur)).localCheckpoint(eager = false))
      val nextSig = signature(next)
      release(cur)
      converged = nextSig == curSig
      cur = next
      curSig = nextSig
      i += 1
    }
    // Fixpoint edges form a star per component: every non-root node has
    // exactly the edge (node, root) and each root (of a size>=2
    // component) appears on the y side, so cur's two sides together cover
    // every node that ever appeared in an edge. Deriving nodes from the
    // CHECKPOINTED cur — not from init — matters: init's persisted blocks
    // were released in round 1, so reading init here would recompute the
    // entire upstream edge-generation pipeline (for dup-clusters, the
    // full shingle-index self-join) twice more, after the algorithm
    // already finished.
    val nodes = cur.select(col("x").as("node"))
      .union(cur.select(col("y").as("node"))).distinct()
    nodes
      .join(cur.select(col("x").as("node"), col("y").as("root")), Seq("node"), "left")
      .select(col("node"), coalesce(col("root"), col("node")).as("cluster_id"))
  }

  /**
   * Duplicate-cluster resolution over near-dup pair edges: every doc mapped
   * to its cluster's canonical (minimum) id; docs in no pair cluster to
   * themselves. Downstream, `keep = (id == cluster_id)` dedupes
   * transitively (a~b, b~c drops both b AND c even when a~c was never
   * emitted as a pair — groupwise `keep` flags on raw pairs cannot do that).
   */
  def dupClusters(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      d1: String = "d1", d2: String = "d2"): DataFrame = {
    val cc = cachedComponents(pairs, d1, d2)
    docs.select(col(idCol))
      .join(cc, col(idCol) === col("node"), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
  }

  /**
   * INCREMENTAL component refresh — fold a DELTA batch of near-dup
   * pairs into a persisted `(node, cluster_id)` artifact ([[dupClusters]]
   * output, saved as parquet) without recomputing components over the
   * full history: the union-find merge, O(delta) amortized.
   *
   * The algebra that makes it exact: connected components are
   * insensitive to how the edge set is partitioned, so folding
   * `deltaPairs` into the stored labels equals full recompute over
   * (old pairs ∪ delta pairs) PROVIDED every old edge's information
   * survives — and it does, contracted into the stored labels. Steps:
   *
   *  1. CONTRACT each delta endpoint through the stored labels (an
   *     already-clustered node is represented by its cluster id; an
   *     unseen node stands for itself) — one join per side against the
   *     artifact, delta-sized output;
   *  2. run components over the CONTRACTED graph only — delta-sized
   *     work regardless of history size;
   *  3. COMPOSE: stored labels re-map through the (delta-bounded,
   *     broadcast) relabel table; delta-only nodes take their
   *     contracted label directly.
   *
   * Labels stay canonical min-ids: the contracted CC minimizes over
   * old cluster minima and new node ids, and min-of-mins is the global
   * min — so the refreshed table is BIT-EQUAL to [[dupClusters]] over
   * the union pair set (spec-pinned, and q150's oracle recomputes the
   * union directly). Insert-only like every artifact here: REMOVING an
   * edge can split a cluster, which needs a rebuild of that cluster's
   * component, not a merge.
   */
  def mergeComponents(
      stored: DataFrame, deltaPairs: DataFrame,
      d1: String = "d1", d2: String = "d2"): DataFrame = {
    val contracted = deltaPairs
      .join(stored.select(col("node").as("__n1"), col("cluster_id").as("__c1")),
        col(d1) === col("__n1"), "left")
      .join(stored.select(col("node").as("__n2"), col("cluster_id").as("__c2")),
        col(d2) === col("__n2"), "left")
      .select(coalesce(col("__c1"), col(d1)).as("m1"),
        coalesce(col("__c2"), col(d2)).as("m2"))
    val remap = connectedComponents(contracted, "m1", "m2")
      .select(col("node").as("__rep"), col("cluster_id").as("__new"))
    val storedNew = stored
      .join(broadcast(remap), col("cluster_id") === col("__rep"), "left")
      .select(col("node"), coalesce(col("__new"), col("cluster_id")).as("cluster_id"))
    val freshNodes = deltaPairs.select(col(d1).as("node"))
      .union(deltaPairs.select(col(d2).as("node"))).distinct()
      .join(stored.select(col("node")), Seq("node"), "left_anti")
    val freshLabeled = freshNodes
      .join(broadcast(remap), col("node") === col("__rep"))
      .select(col("node"), col("__new").as("cluster_id"))
    storedNew.unionByName(freshLabeled)
  }

  /**
   * Exact quantile-band filter: keep rows whose integer measure lies in
   * [p_lo, p_hi], thresholds defined as the smallest value whose cumulative
   * count reaches ceil(p * n) — exact order statistics, no approximate
   * sketch in the cut.
   *
   * Scale shape: the full scan aggregates to a VALUE HISTOGRAM first; only
   * that histogram (bounded by the measure's distinct-value count — for
   * doc-length-like measures, thousands) is collected to compute the two
   * thresholds, then the filter pushes back down as two literal
   * comparisons. This is the same bounded-metadata-collect contract as the
   * L1 frequent-items dictionary; no data-sized driver materialization.
   */
  def quantileBand(
      df: DataFrame, idCol: String, measure: Column,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    // null measures excluded, mirroring groupedQuantiles: Spark sorts
    // them first, DuckDB last, and a null histogram row would NPE the
    // driver threshold walk below
    val scored = df.select(col(idCol), measure.cast("long").as("m"))
      .where(col("m").isNotNull)
    val hist = scored.groupBy(col("m")).agg(count(lit(1)).as("c"))
      .orderBy(col("m")).collect()
    val n = hist.iterator.map(_.getLong(1)).sum
    // exact decimal ceil — double `lo * n` drifts above the true rational
    // for many (p, n) pairs (e.g. 100 * 0.07 -> 7.000000000000001), and
    // DuckDB's `0.05` oracle literal is DECIMAL, already exact
    def ceilK(p: Double): Long =
      (BigDecimal(p.toString) * n).setScale(0, BigDecimal.RoundingMode.CEILING).toLong
    val loK = ceilK(lo)
    val hiK = ceilK(hi)
    var cum = 0L
    var loV = Long.MaxValue
    var hiV = Long.MaxValue
    hist.foreach { r =>
      cum += r.getLong(1)
      if (cum >= loK && loV == Long.MaxValue) loV = r.getLong(0)
      if (cum >= hiK && hiV == Long.MaxValue) hiV = r.getLong(0)
    }
    scored.where(col("m").between(loV, hiV))
  }

  /**
   * Exact per-group order-statistic quantiles, fully distributed (no
   * driver histogram, unlike [[quantileBand]]'s global form): for each
   * group, each requested `p` maps to the smallest value whose cumulative
   * count reaches `ceil(p * n)` — the same exact definition as
   * [[quantileBand]], per group.
   *
   * Scale shape: the raw rows reduce to a value HISTOGRAM per group in
   * one partial-aggregated shuffle (histogram size = distinct measure
   * values, independent of row count), then one window pass over the
   * histogram computes cumulative and total counts, and a final pivoting
   * aggregate emits one row per group. No per-group sort of raw rows, no
   * approximate percentile: a 100 TB corpus with bounded-cardinality
   * measures (lengths, token counts) shuffles only its histogram.
   *
   * Returns one row per group: (groupCol, <one long column per quantile>).
   */
  def groupedQuantiles(
      df: DataFrame, groupCol: String, measure: Column,
      quantiles: Seq[(String, Double)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    // Null measures are excluded outright: Spark windows sort NULLS FIRST
    // and DuckDB NULLS LAST, so letting them into the histogram silently
    // shifts every cumulative count on one engine but not the other (and
    // "the p50 of the null documents" is not a meaningful statistic).
    val h = df.select(col(groupCol).as("g"), measure.cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val wOrd = Window.partitionBy(col("g")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("g"))
    // one exchange on g serves both window frames and the final groupBy
    val cum = h.select(col("g"), col("v"),
      sum(col("cnt")).over(wOrd).as("cc"),
      sum(col("cnt")).over(wAll).as("n"))
    val aggs = quantiles.map { case (name, p) =>
      // EXACT decimal threshold, not ceil(n * p) in doubles: 100 * 0.07
      // is 7.000000000000001 in IEEE, whose ceil is the WRONG order
      // statistic (8th instead of 7th). A decimal literal multiplies
      // exactly — which is also what DuckDB does natively, since its
      // `0.07` literal parses as DECIMAL, not DOUBLE.
      val pDec = lit(new java.math.BigDecimal(p.toString))
      min(when(col("cc") >= ceil(col("n") * pDec).cast("long"), col("v"))).as(name)
    }
    cum.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("g", groupCol)
  }

  /**
   * The audited cross-engine md5 gate shared by every deterministic
   * sampler/splitter: first 8 md5 hex chars of the (stringified, salted)
   * id as an integer, mod `mod`. Must stay byte-for-byte equivalent to
   * the DuckDB idiom `('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT %
   * mod` — one definition so a tweak cannot desynchronize one oracle.
   */
  private def md5Bucket(idCol: String, mod: Long, salt: String = ""): Column = {
    val key = if (salt.isEmpty) col(idCol).cast("string")
      else concat(col(idCol).cast("string"), lit(salt))
    conv(substring(md5(key), 1, 8), 16, 10).cast("long") % mod
  }

  /**
   * Deterministic stratified sampling: a row is kept iff its md5-derived
   * bucket (first 8 hex chars as an int, mod 100) falls under its stratum's
   * per-cent rate. Hash-gated sampling is reproducible across runs/engines
   * (no RNG state), stable under repartitioning, and exactly replayable —
   * the properties corpus rebalancing needs (e.g. downsample the dominant
   * language). Pure codegen'd scan, no shuffle.
   */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      ratesPct: Map[String, Int], defaultPct: Int): DataFrame = {
    val bucket = md5Bucket(idCol, 100L)
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.select(col(idCol), col(stratumCol), bucket.as("bucket"))
      .where(col("bucket") < rate)
  }

  /**
   * Deterministic train/validation/test assignment: every row gets
   * exactly one split label from its md5 bucket — the partition every
   * training pipeline needs, with the properties random splits lack at
   * scale: reproducible across runs/engines/partitionings (no RNG
   * state), stable under corpus growth (a document's split never changes
   * when others are added), disjoint and complete by construction. A
   * keyed salt isolates independent experiments (different salt ->
   * statistically independent assignment). Pure codegen'd scan.
   *
   * `valPct` and `testPct` are integer percents; the remainder is train.
   */
  def datasetSplit(
      df: DataFrame, idCol: String,
      valPct: Int = 1, testPct: Int = 1, salt: String = ""): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"invalid split percents ($valPct, $testPct)")
    val bucket = md5Bucket(idCol, 100L, salt)
    df.select(col(idCol), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < valPct, lit("val"))
          .when(col("bucket") < valPct + testPct, lit("test"))
          .otherwise(lit("train")))
  }

  /**
   * Deterministic EXACT-k per-stratum sample: every stratum contributes
   * exactly `min(k, |stratum|)` rows, ranked by a salted md5 of the row
   * id — the fixed-quota complement of the RATE-based gates
   * ([[temperatureSample]], [[mixtureSample]], whose per-row keep
   * decisions are independent and only hit quotas in expectation). The
   * quota guarantee is what evaluation-set construction and per-domain
   * audits need ("exactly 10 docs from every source, reproducibly").
   *
   * Scale shape: one shuffle on the stratum key; the `row_number <= k`
   * filter plans as WindowGroupLimit (the q51 rank-limit shape), so
   * each map task pre-prunes to its local top-k before the exchange —
   * the shuffle carries O(k x partitions) rows per stratum, not the
   * corpus. Replayable: same salt, same sample, regardless of
   * partitioning or corpus growth ORDER (growth can displace ranks, as
   * with any fixed-quota scheme; the salt isolates experiments).
   */
  def exactKSample(
      df: DataFrame, strataCol: String, idCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val key = md5(concat_ws(":", lit(s"strat$salt"), col(idCol)))
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
    df.select(col(strataCol), col(idCol), key.as("sample_key"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col(strataCol), col(idCol), col("sample_key"),
        col("__rn").cast("long").as("rk"))
  }

  /**
   * Deterministic PRIORITY SAMPLING (Duffield, Lund, Thorup, JACM 2007)
   * — the WEIGHTED member of the sampling family: where
   * [[exactKSample]] ranks rows uniformly, here a row with weight `w`
   * gets priority `q = w / u` for a hash-derived uniform `u` in (0, 1],
   * and the sample is the global top-k by priority. Long/high-weight
   * rows are proportionally more likely to be kept — the
   * weighted-quota shape training-mix construction needs ("sample 200
   * docs, length-proportional, reproducibly").
   *
   * The estimator that makes the sample USABLE as a surrogate corpus:
   * with `tau` = the (k+1)-th priority, each sampled row represents
   * `w_est = max(w, tau)` of total weight; `sum(w_est)` over the
   * sample is an unbiased estimator of `sum(w)` over the corpus
   * (Duffield et al. Thm 1), and when the corpus has at most k rows
   * the sample is the corpus and `tau = 0` makes it exact.
   *
   * Determinism/replayability: `u = (m + 1) / 2^52` from the first 13
   * md5 hex chars of the salted id (the [[md5Bucket]] idiom widened to
   * 52 bits — exactly representable in a double, so both engines
   * convert identically); priority is two pinned IEEE divisions. No
   * RNG state: same salt, same sample, any partitioning.
   *
   * Scale shape: the scan is codegen'd (md5 + arithmetic in-scan);
   * `orderBy(...).limit(k+1)` plans as TakeOrderedAndProject —
   * per-partition top-(k+1) heaps merged on the driver, never a global
   * sort — and the tau/rank window runs over the k+1 survivors only.
   * Rows with non-positive weight are excluded (zero weight = zero
   * priority = never sampled; the filter states it).
   */
  def prioritySample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val topk1 = scorePriorities(df, idCol, weightCol, salt)
      .orderBy(col("priority").desc, col(idCol)).limit(k + 1)
    finishPrioritySample(topk1, idCol, weightCol, k)
  }

  /** The per-row scoring half of [[prioritySample]] — a pure codegen'd
    * projection (priority depends only on the row), shared with the
    * streaming maintenance path. */
  private def scorePriorities(
      df: DataFrame, idCol: String, weightCol: String,
      salt: String): DataFrame = {
    val m = conv(substring(md5(concat_ws(":",
      lit(s"prio$salt"), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val u = (m + lit(1L)).cast("double") / lit(4.503599627370496e15)
    df.where(col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        (col(weightCol).cast("double") / u).as("priority"))
  }

  /** The rank/tau/estimator finish over the k+1 survivors — bounded
    * single partition (the TakeOrdered output or the maintained
    * artifact, never the corpus); shared by the batch row and the
    * artifact-serving step. */
  private[graft] def finishPrioritySample(
      topk1: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val wRank = Window.orderBy(col("priority").desc, col(idCol))
    val wAll = Window.partitionBy()
    topk1.withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("tau",
        coalesce(max(when(col("rk") === k + 1, col("priority"))).over(wAll),
          lit(0.0)))
      .where(col("rk") <= k)
      .withColumn("w_est", greatest(col(weightCol).cast("double"), col("tau")))
      .select(col(idCol), col(weightCol), col("priority"), col("rk"),
        col("tau"), col("w_est"))
  }

  /**
   * STREAMING maintenance of the [[prioritySample]] artifact — the
   * [[exactKSampleMaintain]] discipline for the WEIGHTED sample: per
   * micro-batch, the stored top-(k+1) rows (tiny) union with the
   * batch's scored rows, the global top-(k+1) by `(priority desc, id)`
   * re-selects, and the artifact swaps via write-sibling -> rename.
   * Top-m under a total order is associative —
   * `topm(A ∪ B) == topm(topm(A) ∪ B)` — and the priority is a pure
   * per-row hash function, so any batching converges to the one-pass
   * sample bit for bit, INCLUDING tau (the k+1-th priority is kept in
   * the artifact precisely so the threshold survives maintenance).
   * Serve with [[finishPrioritySample]] over the loaded artifact.
   *
   * ARTIFACT-DIR CONTRACT: `batchId`s are scoped to ONE streaming
   * query — commit goes through [[graft.Fs.appliedMarkerSwap]], whose
   * replay guard skips any id at or below the artifact's max
   * `_applied_` marker. A NEW query (fresh checkpoint, ids restarting
   * at 0) pointed at a dir that outlived its old stream would have its
   * early batches silently skipped as "replays". Stage a fresh
   * `artifactDir` per query (what every caller here does), or sweep
   * the stale `_applied_` markers when bootstrapping a new stream over
   * an inherited dir. Same contract on [[exactKSampleMaintain]].
   */
  def prioritySampleMaintain(
      spark: org.apache.spark.sql.SparkSession,
      artifactDir: java.nio.file.Path, batch: DataFrame,
      idCol: String, weightCol: String, k: Int,
      batchId: Long, salt: String = ""): Unit = {
    val cand = scorePriorities(batch, idCol, weightCol, salt)
    val merged =
      if (java.nio.file.Files.exists(artifactDir))
        spark.read.parquet(artifactDir.toString).unionByName(cand)
      else cand
    val kept = merged.orderBy(col("priority").desc, col(idCol)).limit(k + 1)
    // Commit through the shared swap scaffold: top-m merge is replay-
    // idempotent by algebra, so the per-batch-id marker skip is merely
    // a saved re-merge — what the scaffold buys here is the complete-
    // before-destroy ordering (retire -> publish -> roll-forward); the
    // old delete-then-move left a crash window where ALL previously
    // folded batches' state was gone and only the last batch would be
    // redelivered.
    graft.Fs.appliedMarkerSwap(artifactDir.getParent, artifactDir, batchId) {
      sibling =>
        kept.coalesce(1).write.mode("overwrite").parquet(sibling.toString)
    }
    ()
  }

  /**
   * STREAMING maintenance of the [[exactKSample]] artifact — q124's
   * streaming twin, the q135 foreachBatch pattern: per micro-batch,
   * the stored sample (≤ strata × k rows — tiny) unions with the
   * batch's rows, [[exactKSample]] re-selects the k best per stratum,
   * and the artifact swaps via write-sibling → rename.
   *
   * Batch-boundary AND arrival-order independence are exact, not
   * approximate: the sample key is a deterministic salted md5 of the
   * id (no RNG state — the reason hash-gated sampling was chosen over
   * reservoir sampling, whose eviction coin depends on arrival order),
   * and top-k under a TOTAL order (key, id) is associative —
   * `topk(A ∪ B) == topk(topk(A) ∪ B)` — so any batching of the
   * corpus converges to the one-pass batch sample bit for bit (the
   * q151 oracle runs q124's SQL over the whole corpus and says
   * exactly that). A newly-arrived id with a smaller key EVICTS the
   * stratum's rank-k row; ranks are recomputed at each merge so `rk`
   * stays contiguous. Insert-only, like every artifact here: deleting
   * a sampled doc needs a rebuild from the surviving corpus.
   *
   * ARTIFACT-DIR CONTRACT: one `artifactDir` per streaming query —
   * see [[prioritySampleMaintain]]; a dir inherited from a dead
   * stream carries `_applied_` markers that would skip a new query's
   * restarted batch ids.
   */
  def exactKSampleMaintain(
      spark: org.apache.spark.sql.SparkSession,
      artifactDir: java.nio.file.Path, batch: DataFrame,
      strataCol: String, idCol: String, k: Int,
      batchId: Long, salt: String = ""): Unit = {
    val cand = batch.select(col(strataCol), col(idCol))
    val merged =
      if (java.nio.file.Files.exists(artifactDir))
        spark.read.parquet(artifactDir.toString)
          .select(col(strataCol), col(idCol)).unionByName(cand)
      else cand
    val kept = exactKSample(merged, strataCol, idCol, k, salt)
    // Shared swap scaffold for the same reason as
    // [[prioritySampleMaintain]]: the merge is replay-idempotent, the
    // scaffold's value is the never-deleted-only commit ordering.
    graft.Fs.appliedMarkerSwap(artifactDir.getParent, artifactDir, batchId) {
      sibling =>
        kept.coalesce(1).write.mode("overwrite").parquet(sibling.toString)
    }
    ()
  }

  /**
   * RENDEZVOUS (highest-random-weight) shard routing — consistent
   * assignment of keys to shards: each key goes to the shard whose
   * salted hash of (shard, key) is highest. Unlike `hash(key) mod n`
   * (which moves (n-1)/n of all keys when n changes), growing the
   * shard set relocates ONLY the keys the new shard now wins —
   * 1/(n+1) in expectation — because every surviving shard's weight
   * for a key is unchanged. The routing table for index shards,
   * stateful-stream partition maps, and cache rings.
   *
   * Determinism AND independence: weights are md5 hex strings compared
   * lexicographically (fixed width — string order IS numeric order),
   * so per-shard weights are genuinely independent. A rolling-hash
   * weight would NOT be: Karp-Rabin is linear, so per-shard salted
   * hashes are affine shifts of one another and the winner
   * distribution skews (measured 18% moved where HRW predicts 11% —
   * the q128 lesson in routing form). Argmax ties break to the first
   * shard via `array_position`. Pure projection — one codegen'd md5
   * per (key, shard) over a shard-count-bounded literal set, no
   * shuffle, no state.
   */
  def rendezvousShard(
      df: DataFrame, keyCol: String, numShards: Int,
      salt: String = "", shardCol: String = "shard"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    val weights = (0 until numShards).map { s =>
      md5(concat_ws(":", lit(s"hrw$salt"), lit(s),
        col(keyCol).cast("string")))
    }
    val arr = array(weights: _*)
    // A null key yields a NULL shard — never a silent default route:
    // concat_ws SKIPS null args (every shard would hash the same
    // key-less string) while SQL `||` NULL-propagates, so any concrete
    // shard picked here would diverge between engines. Routing a null
    // key is a caller decision, and null makes the unrouted rows
    // filterable instead of silently co-locating them on one shard.
    df.withColumn(shardCol,
      when(col(keyCol).isNull, lit(null).cast("int")).otherwise(
        (array_position(arr, array_max(arr)) - 1L).cast("int")))
  }

  /**
   * Leakage-safe train/val/test split: the [[datasetSplit]] md5 gate
   * keyed by the NEAR-DUP CLUSTER id instead of the document id, so
   * every member of a duplicate cluster lands in the same split — the
   * guarantee a doc-keyed split cannot give (a k-member near-dup
   * cluster crosses splits with probability ≈ 1-(p_tr^k + p_v^k +
   * p_te^k), i.e. almost always for k ≥ 2, silently contaminating
   * eval). Cluster ids come from [[dupClusters]] (transitive closure
   * over the near-dup pair edges); docs in no pair cluster to
   * themselves, so with no edges this is exactly [[datasetSplit]].
   *
   * Scale shape: the bounded CC label join is the only addition over
   * [[datasetSplit]] — the gate stays a pure codegen'd projection of
   * md5(cluster_id, salt), with all of datasetSplit's properties
   * (replayable, growth-stable, salt-isolated) inherited per CLUSTER.
   */
  def leakageSafeSplit(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      valPct: Int = 1, testPct: Int = 1, salt: String = "",
      d1: String = "d1", d2: String = "d2"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"invalid split percents ($valPct, $testPct)")
    val clustered = dupClusters(docs, idCol, pairs, d1, d2)
    val bucket = md5Bucket("cluster_id", 100L, salt)
    clustered.select(col(idCol), col("cluster_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < valPct, lit("val"))
          .when(col("bucket") < valPct + testPct, lit("test"))
          .otherwise(lit("train")))
  }

  /**
   * Corpus SNAPSHOT DIFF — the incremental-crawl primitive: given two
   * versions of a corpus, classify every id as `added` (new only),
   * `removed` (old only), `changed` (both, content fingerprint differs
   * under [[Dedup.fingerprint]]'s normalize+md5), or `unchanged`. A
   * recurring 100 TB pipeline reprocesses ONLY `added`+`changed` docs
   * (and retracts `removed` ones downstream) instead of re-running
   * every stage over the full snapshot; this row is the manifest that
   * decision reads.
   *
   * Scale shape: each side reduces in-scan to `(id, 32-hex-char
   * fingerprint)` — text never crosses the wire — then ONE full-outer
   * shuffle join on id; the status column is a codegen'd projection of
   * the two null/equality tests. No window, no collect, no skew beyond
   * the id distribution itself.
   */
  def snapshotDiff(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // Presence flags (not fingerprint nullness) decide added/removed, and
    // the content compare is null-safe — a doc whose text is null on both
    // sides is unchanged, not spuriously "changed".
    val o = oldDocs.select(col(idCol).as("__sd_id"),
      Dedup.fingerprint(col(textCol)).as("__sd_ofp"), lit(true).as("__sd_o"))
    val n = newDocs.select(col(idCol).as("__sd_id"),
      Dedup.fingerprint(col(textCol)).as("__sd_nfp"), lit(true).as("__sd_n"))
    o.join(n, Seq("__sd_id"), "full_outer")
      .select(col("__sd_id").as(idCol),
        when(col("__sd_o").isNull, lit("added"))
          .when(col("__sd_n").isNull, lit("removed"))
          .when(col("__sd_ofp") <=> col("__sd_nfp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /**
   * Distribution DRIFT report between two corpus snapshots — the
   * monitoring row a recurring ingest runs next to [[snapshotDiff]]'s
   * id-level manifest: bucket a numeric measure on both sides (fixed
   * integer-division buckets, the last one open-ended), compare the
   * bucket SHARES, and flag buckets whose share moved more than
   * `threshold`. Catches the shifts an id-diff can't see (a new crawler
   * truncating documents changes every length share while the id sets
   * barely move).
   *
   * Determinism: counts are exact integers from one partial-aggregated
   * groupBy per side (histogram-sized frames after the scan); each
   * share/delta is a pinned sequence of IEEE double ops per OUTPUT ROW
   * — there is deliberately NO order-sensitive float reduction (no
   * summed PSI/KL: those need libm logs and an unordered float sum; the
   * per-bucket table carries strictly more information anyway).
   */
  def histogramDrift(
      oldSide: DataFrame, newSide: DataFrame, valueCol: String,
      bucketWidth: Long, numBuckets: Int,
      threshold: Double): DataFrame = {
    require(bucketWidth > 0 && numBuckets > 1,
      s"need positive width and > 1 buckets: $bucketWidth/$numBuckets")
    def hist(df: DataFrame, cName: String) =
      df.where(col(valueCol).isNotNull)
        .select(least(expr(s"$valueCol div $bucketWidth"),
          lit(numBuckets - 1L)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(cName))
    val all = Window.partitionBy()
    hist(oldSide, "c_old")
      .join(hist(newSide, "c_new"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      // side totals re-derived over the joined histogram (sum of the
      // coalesced counts == the side's total; histogram-sized window)
      .withColumn("n_old", sum(col("c_old")).over(all))
      .withColumn("n_new", sum(col("c_new")).over(all))
      // An EMPTY side has zero share everywhere (not 0/0 = NaN, which
      // Spark orders above every threshold and would flag every bucket
      // drifted): against an empty snapshot each bucket's delta is the
      // other side's share — full drift, reported deterministically.
      .withColumn("share_old",
        when(col("n_old") === 0L, lit(0.0)).otherwise(
          col("c_old").cast("double") / col("n_old").cast("double")))
      .withColumn("share_new",
        when(col("n_new") === 0L, lit(0.0)).otherwise(
          col("c_new").cast("double") / col("n_new").cast("double")))
      .withColumn("share_delta_abs",
        abs(col("share_old") - col("share_new")))
      .withColumn("drifted", col("share_delta_abs") > threshold)
  }

  /**
   * INCREMENTAL AGGREGATE MAINTENANCE from a snapshot diff — the payoff
   * of [[snapshotDiff]]: refresh a per-word count rollup by touching
   * ONLY the changed documents. The new aggregate is
   * `base - contributions(removed + changed-old) + contributions(added
   * + changed-new)` merged in one grouped sum; words whose count nets
   * to zero drop (a direct recompute has no row for them), and the
   * result is row-for-row EQUAL to recomputing the aggregate over the
   * new snapshot — which is exactly what the declared row's oracle
   * checks.
   *
   * The `base` word count is recomputed here from `oldDocs` for a
   * self-contained operator; a production refresh reads it from the
   * stored rollup, so the data-sized work is bounded by the CHANGED
   * document set (two id-keyed semi-join-shaped scans) plus a merge
   * keyed by word — delta cost, not snapshot cost.
   */
  def incrementalWordCount(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def wc(docs: DataFrame) = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("cnt"))
    val diff = snapshotDiff(oldDocs, newDocs, idCol, textCol)
    val retractIds = diff
      .where(col("status").isin("removed", "changed")).select(col(idCol))
    val addIds = diff
      .where(col("status").isin("added", "changed")).select(col(idCol))
    val retract = wc(oldDocs.join(retractIds, idCol))
      .select(col("word"), (-col("cnt")).as("cnt"))
    val add = wc(newDocs.join(addIds, idCol))
    wc(oldDocs).unionAll(retract).unionAll(add)
      .groupBy(col("word")).agg(sum(col("cnt")).cast("long").as("cnt"))
      .where(col("cnt") > 0L)
  }

  /**
   * Square-root temperature resampling: keep each row with probability
   * `min(1, c / sqrt(|stratum|))` — the standard language-rebalancing
   * law (kept mass per stratum grows as sqrt of its size, so dominant
   * strata are damped and small strata survive whole). Deterministic via
   * the same md5 gate as [[stratifiedSample]], in parts-per-million.
   *
   * Cross-engine exactness: the rate is `floor(c*1e6 / sqrt(n))` — sqrt
   * and double division are correctly-rounded IEEE ops on any engine, and
   * no cross-stratum normalization (which would sum doubles in an
   * engine-defined order) enters the cut.
   *
   * Scale shape: one tiny stratum-count aggregate broadcast back over the
   * scan — no driver collect, no second pass.
   */
  def temperatureSample(
      df: DataFrame, idCol: String, stratumCol: String, c: Double): DataFrame = {
    val cnts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("stratum_n"))
    val ppm = md5Bucket(idCol, 1000000L)
    val rate = least(lit(1000000L),
      floor(lit(c * 1e6) / sqrt(col("stratum_n"))).cast("long"))
    df.select(col(idCol), col(stratumCol))
      .join(broadcast(cnts), Seq(stratumCol))
      .select(col(idCol), col(stratumCol), col("stratum_n"),
        ppm.as("ppm"), rate.as("rate_ppm"))
      .where(col("ppm") < col("rate_ppm"))
  }

  /**
   * Token-budget MIXTURE sampling — domain reweighting to a target
   * recipe: given per-stratum target weights (parts-per-million of the
   * training token budget, the published mixture-table form) and a
   * total token budget, each row of stratum `s` is kept with rate
   * `min(1, budget * w_ppm(s) / 1e6 / tokens_s)`, so the EXPECTED kept
   * token mass per stratum is `budget * w_ppm(s) / 1e6` — the stratum's
   * share of the recipe — until the stratum runs out (rate clamps at 1:
   * an under-represented domain contributes everything it has, the
   * standard "epochs > 1 needed" signal a mixture report surfaces).
   * Strata absent from `weightsPpm` get weight 0 and drop entirely.
   *
   * Deterministic via the shared [[md5Bucket]] ppm gate (reproducible
   * across runs/engines/partitionings). Cross-engine exactness: the
   * rate is computed in pure LONG arithmetic with integral division
   * (`div` here == DuckDB `//` for non-negative operands) — no double
   * or decimal quotient whose rounding could cross an integer boundary
   * differently per engine. Caller contract: `budgetTokens * max(w_ppm)`
   * must stay below 2^63 (budget < ~9.2e12 at a full 1e6 weight).
   * A LISTED zero-token stratum keeps all its rows (its recipe share
   * cannot be expressed in tokens; dropping silently would hide data);
   * weight 0 always drops, tokens or not — the weight test precedes
   * the zero-token test.
   *
   * Scale shape: one tiny per-stratum token aggregate broadcast back
   * over the scan — no driver collect, no second pass, the
   * [[temperatureSample]] contract.
   */
  def mixtureSample(
      df: DataFrame, idCol: String, stratumCol: String, tokensCol: String,
      weightsPpm: Map[String, Long], budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(weightsPpm.values.forall(_ >= 0), "weights must be >= 0 ppm")
    val w = weightsPpm.foldLeft(lit(0L)) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    val cnts = df.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol)).cast("long").as("stratum_tokens"))
    val ppm = md5Bucket(idCol, 1000000L)
    df.select(col(idCol), col(stratumCol), col(tokensCol))
      .join(broadcast(cnts), Seq(stratumCol))
      .withColumn("w_ppm", w)
      .withColumn("rate_ppm",
        when(col("w_ppm") === 0L, lit(0L))
          .when(col("stratum_tokens") === 0L, lit(1000000L))
          .otherwise(least(lit(1000000L),
            expr(s"(${budgetTokens}L * w_ppm) div stratum_tokens"))))
      .withColumn("ppm", ppm)
      .where(col("ppm") < col("rate_ppm"))
  }

  /**
   * Sequence packing: concatenate documents into fixed-token-budget
   * training chunks. Docs are ordered deterministically (by id) WITHIN a
   * shard, each doc's start offset is the running token count before it,
   * and its chunk is `start_offset div budget` — offset packing, where a
   * doc belongs to the chunk its first token lands in.
   *
   * Scale shape: the window partitions by the shard column, so each shard
   * packs independently in parallel — the standard way packing runs over a
   * 100 TB corpus (shard = language, source, or a hash bucket sized to an
   * executor). No global ordering is ever materialized.
   */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String, shardCol: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(shardCol),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"start_offset div ${budget}L"))
  }

  /**
   * Sliding-window chunking: split each document into overlapping token
   * windows of `window` tokens advancing by `stride` (stride < window
   * preserves `window - stride` tokens of cross-boundary context) — the
   * other half of sequence prep next to [[packSequences]]: packing
   * concatenates short docs up to a budget, chunking splits long docs
   * down to one. Windows start at token 1, 1+stride, 1+2*stride, ... up
   * to the document length; the final window is short if the tail has
   * fewer than `window` tokens. Empty documents produce no chunks.
   *
   * Scale shape: a pure per-row generate (explode of the start
   * positions) — no shuffle, no state, scan-bound at any corpus size;
   * output volume is ~ total tokens x (window / stride).
   */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"invalid chunking ($window, $stride)")
    // Filter BEFORE building the start sequence: sequence(1, 0) throws,
    // and Generate never reorders above the Filter.
    docs
      .select(col(idCol), Dedup.tokens(col(textCol)).as("ws"))
      .where(size(col("ws")) > 0)
      .select(col(idCol), col("ws"),
        posexplode(sequence(lit(1), size(col("ws")), lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("ws"), col("start"), lit(window))).cast("long")
          .as("n_tokens"),
        array_join(slice(col("ws"), col("start"), lit(window)), " ")
          .as("chunk_text"))
  }

  /**
   * Corpus-frequent chunk removal — the C4 cleaning step "drop any line
   * that occurs in three or more documents", word-chunk-ified because
   * this corpus has no newlines: each document is cut into TUMBLING
   * `chunk`-token windows ([[chunkDocuments]] with stride == window), a
   * chunk is boilerplate when its exact text occurs in at least
   * `minDocs` DISTINCT documents, and each document is reassembled from
   * its surviving chunks in original order. Output: one row per
   * non-empty document with total/dropped chunk counts and the cleaned
   * text — an empty string when every chunk dropped, so "the document
   * died in cleaning" stays a visible, auditable row rather than a
   * silent disappearance.
   *
   * Scale shape: one scan-bound chunk generate, one count-distinct
   * aggregate keyed by chunk text (partial aggregation collapses each
   * task's repeats before the exchange), one shuffle join of chunks to
   * their corpus counts on the chunk text, one per-document reassembly
   * aggregate — every stage keyed and shuffle-shaped, no driver state,
   * no corpus-sized broadcast. At 100 TB the join key would be a
   * 64/128-bit chunk hash instead of the raw text (a far smaller
   * exchange with the same behavior at any realistic cardinality); the
   * declared row keeps the text key so the DuckDB oracle replays it
   * verbatim.
   */
  def stripFrequentChunks(
      docs: DataFrame, idCol: String, textCol: String,
      chunk: Int, minDocs: Long): DataFrame =
    stripWithChunkCounts(docs, chunkCounts(docs, idCol, textCol, chunk),
      idCol, textCol, chunk, minDocs)

  /** The tumbling-chunk generate shared by [[chunkCounts]] and
    * [[stripWithChunkCounts]]: `(id, chunk_idx, chunk_text)`, one row
    * per `chunk`-token window, token-empty docs excluded. */
  private def tumblingChunks(
      docs: DataFrame, idCol: String, textCol: String,
      chunk: Int): DataFrame = {
    require(chunk > 0, s"chunk size must be positive, got $chunk")
    docs
      .select(col(idCol), Dedup.tokens(col(textCol)).as("ws"))
      .where(size(col("ws")) > 0)
      .select(col(idCol), col("ws"),
        posexplode(sequence(lit(1), size(col("ws")), lit(chunk)))
          .as(Seq("chunk_idx", "start")))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("ws"), col("start"), lit(chunk)), " ")
          .as("chunk_text"))
  }

  /**
   * Per-chunk corpus document frequency `(chunk_text, n_docs)` — the
   * maintainable state behind [[stripFrequentChunks]]. Over DISJOINT
   * document batches the counts are ADDITIVE (each doc contributes at
   * most 1 per chunk text, so distinct-doc counts sum exactly across a
   * partition of the corpus) — the same contract as the count-min
   * counter artifact: persist a batch's table, fold each new disjoint
   * batch in with [[mergeChunkCounts]], and the merged table equals the
   * full-corpus recompute row for row. Re-ingesting an already-counted
   * document double-counts; deletions need a rebuild (insert-only, like
   * any additive sketch).
   */
  def chunkCounts(
      docs: DataFrame, idCol: String, textCol: String,
      chunk: Int): DataFrame =
    tumblingChunks(docs, idCol, textCol, chunk)
      .groupBy(col("chunk_text"))
      .agg(countDistinct(col(idCol)).as("n_docs"))

  /** Cell-wise additive fold of two [[chunkCounts]] tables (batches must
    * cover disjoint document sets). Associative and commutative, so
    * batching and arrival order are irrelevant. */
  def mergeChunkCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy(col("chunk_text"))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"))

  /** Persist / reload a [[chunkCounts]] table. Deliberately NOT
    * coalesced: the table is corpus-vocabulary-sized, so it stays a
    * distributed parquet dataset (contrast the register-sized sketch
    * artifacts, which collapse to one file). */
  def saveChunkCounts(counts: DataFrame, path: String): Unit =
    counts.write.mode("overwrite").parquet(path)

  def loadChunkCounts(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** [[stripFrequentChunks]] served against an EXTERNAL count table
    * (persisted artifact, possibly incrementally folded): a chunk absent
    * from the table counts 0 (kept) — a stale artifact under-strips,
    * never invents a hot chunk. */
  def stripWithChunkCounts(
      docs: DataFrame, counts: DataFrame, idCol: String, textCol: String,
      chunk: Int, minDocs: Long): DataFrame = {
    require(minDocs > 0, s"minDocs must be positive, got $minDocs")
    tumblingChunks(docs, idCol, textCol, chunk)
      .join(counts.select(col("chunk_text"), col("n_docs")),
        Seq("chunk_text"), "left_outer")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") >= minDocs, 1L).otherwise(0L))
          .as("n_dropped"),
        // when() without otherwise() is null for boilerplate chunks and
        // collect_list drops nulls, so only survivors are reassembled.
        array_join(
          transform(
            sort_array(collect_list(when(col("n_docs") < minDocs,
              struct(col("chunk_idx"), col("chunk_text"))))),
            s => s.getField("chunk_text")),
          " ").as("clean_text"))
  }

  /**
   * Deterministic per-EPOCH shuffle order — the training data-loader's
   * order generator: for every epoch, each row is routed to a shard and
   * given a contiguous position inside it, with the permutation keyed by
   * `md5(id "#" epoch)` so (a) every epoch is a DIFFERENT pseudo-random
   * order, (b) every epoch is exactly reproducible from the ids alone —
   * resuming a crashed run or re-materializing epoch 7 needs no stored
   * state, and (c) no global sort ever exists: ordering happens inside
   * each (epoch, shard) window, the unit a data-loader worker actually
   * consumes.
   *
   * Scale shape: the epoch explode is scan-bound; ONE exchange keyed
   * (epoch, shard) feeds the per-shard windows, whose partition count is
   * `epochs * numShards` — size `numShards` so a shard's rows fit an
   * executor (at 100 TB that is tens of thousands of shards, exactly how
   * the order files are laid out for the loader fleet). The 32-bit hash
   * collides at corpus scale, so the (hash, id) tie-break keeps the
   * order total and deterministic regardless.
   */
  def epochShuffleOrder(
      df: DataFrame, idCol: String, epochs: Int,
      numShards: Int): DataFrame = {
    require(epochs > 0 && numShards > 0,
      s"need positive epochs/shards, got ($epochs, $numShards)")
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit("#"),
      col("epoch").cast("string"))), 1, 8), 16, 10).cast("long")
    df.select(col(idCol),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("epoch", col("epoch").cast("long"))
      .withColumn("__hv", h)
      .withColumn("shard", col("__hv") % numShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("__hv"), col(idCol))).cast("long"))
      .drop("__hv")
  }

  /**
   * WATER-FILLING token-budget allocation: given per-group supplies
   * and a global budget `B = total * budgetNum div budgetDen` (an
   * exact integer fraction of total supply), find the integer
   * WATERLINE `W*` — the
   * largest cap with `sum_g min(supply_g, W*) <= B` — and allocate
   * `min(supply_g, W*)` to each group. The standard fair-capping step
   * of mixture construction: small sources keep everything, dominant
   * sources are cut to the common line, and the budget binds globally.
   *
   * Closed form, all-integer: with supplies sorted ascending
   * (`s_1 <= ... <= s_n`, prefix sums `P`), for each split k the
   * candidate line is `floor((B - P_k) / (n - k))` — the cap if
   * exactly the k smallest sources are below the line — and
   * `W* = max{ cand_k : s_k <= cand_k }` (infeasible splits, where the
   * supposedly-capped source would sit under its own line, drop out).
   * No floats anywhere; the spec differentially checks the defining
   * inequality pair `A(W*) <= B < A(W* + 1)` against brute force.
   *
   * Scale shape: supplies come from ONE partial-aggregated shuffle;
   * the waterline windows run over the GROUP-DOMAIN-sized supply table
   * (bounded — the F-list class, stated per the q181 convention), and
   * the waterline is ONE long of driver metadata attached as a
   * literal (the q146 1-row-collect convention). The windowed plan is
   * materialized ONCE (eager localCheckpoint, this file's round
   * helper): the waterline collect and the returned frame read the
   * same stored blocks, so a nondeterministic or changing `supplies`
   * source cannot yield allocations inconsistent with the emitted
   * waterline, and the global-sort window never runs twice. EAGER at
   * call time (q146 builder convention); the checkpoint is released by
   * [[clearCheckpoints]] like every round artifact.
   *
   * Emits `(group, supply, allocation, waterline, budget)`.
   */
  def waterFillBudget(
      supplies: DataFrame, groupCol: String, supplyCol: String,
      budgetNum: Int, budgetDen: Int): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0,
      s"budget fraction must be >= 0 with positive denominator," +
        s" got $budgetNum/$budgetDen")
    val ord = Window.orderBy(col("__s"), col(groupCol))
    val all = Window.partitionBy()
    val base = materializeRound(supplies.select(col(groupCol),
        col(supplyCol).cast("long").as("__s"))
      .withColumn("__b",
        expr(s"(sum(__s) OVER () * $budgetNum) div $budgetDen").cast("long"))
      .withColumn("__k", row_number().over(ord).cast("long"))
      .withColumn("__pk", (sum(col("__s")).over(ord) - col("__s")))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__lag", coalesce(lag(col("__s"), 1).over(ord), lit(0L)))
      .withColumn("__cand",
        expr("(__b - __pk) div (__n - __k + 1)").cast("long")))
    // one long of bounded metadata: the waterline over the
    // group-domain-sized supply table (the q146 1-row-collect
    // convention — a literal-key join constant-folds into a BNL,
    // which the plan sweep rightly rejects)
    val wlOpt: Option[Long] = base
      .where(col("__lag") <= col("__cand"))
      .agg(max(col("__cand")).as("waterline"))
      .collect().headOption.flatMap(r => Option(r.get(0)))
      .map(_.asInstanceOf[Long])
    val wl = wlOpt.map(lit).getOrElse(lit(null).cast("long"))
    base
      .select(col(groupCol), col("__s").as("supply"),
        least(col("__s"), wl).as("allocation"),
        wl.as("waterline"), col("__b").as("budget"))
  }

  /**
   * RECIPROCAL-RANK FUSION (Cormack et al., SIGIR 2009) of per-group
   * signal rankings: each named signal ranks descending within the
   * group (ties by id), the fused score is `sum_i 1/(rrfK + rank_i)`,
   * and the top `topK` per group survive. RRF consumes only RANKS —
   * no signal calibration — which is why retrieval and curation stacks
   * reach for it when signals live on incomparable scales.
   *
   * Emits `(group, id, r_<name>..., rrf, fused_rank)`. Every window is
   * keyed by the group column (one exchange, reused across the N+1
   * windows) — never a global sort; the additions are a pinned
   * left-to-right IEEE chain, cross-engine exact.
   */
  def rrfFuse(
      df: DataFrame, groupCol: String, idCol: String,
      signals: Seq[(String, Column)], topK: Int, rrfK: Int = 60): DataFrame = {
    require(signals.nonEmpty && topK >= 1,
      s"need signals and positive topK, got (${signals.size}, $topK)")
    def rankBy(c: Column) = row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(c.desc, col(idCol)))
      .cast("long")
    val ranked = signals.foldLeft(df) { case (acc, (name, c)) =>
      acc.withColumn(s"r_$name", rankBy(c))
    }
    val rrf = signals.map { case (name, _) =>
      lit(1.0) / (lit(rrfK.toDouble) + col(s"r_$name").cast("double"))
    }.reduce(_ + _)
    ranked.withColumn("rrf", rrf)
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("rrf").desc, col(idCol))).cast("long"))
      .where(col("fused_rank") <= topK)
      .select(Seq(col(groupCol), col(idCol)) ++
        signals.map { case (name, _) => col(s"r_$name") } ++
        Seq(col("rrf"), col("fused_rank")): _*)
  }

  /**
   * Deterministic MIXTURE INTERLEAVE — stride scheduling (Waldspurger &
   * Weihl, OSDI '95) applied to training-data ordering: every source
   * gets an integer weight and its i-th document is scheduled at
   * integer VIRTUAL TIME `v = i * (lcm / w)`; reading each shard in
   * `(v, source, i)` order yields a sequence whose every prefix holds
   * the sources near their weight proportions — the data-mixture
   * schedule a curriculum wants, instead of concatenated sources or an
   * unweighted shuffle. Weights must divide `lcm` (raise_error
   * otherwise — a non-divisor would make `v` inexact and the order
   * engine-dependent).
   *
   * Deterministic end to end: within-source order is the salted-md5
   * shuffle (the q164 idiom), virtual times are exact integers, and
   * ties break on `(source, i)`. Sharding is BY DESIGN (the q164
   * shape): each trainer worker reads its own shard's interleave, so
   * no global total order — and therefore no single-partition sort —
   * ever materializes; the exchanges are keyed `(shard, source)` then
   * `shard`.
   */
  def mixtureInterleave(
      df: DataFrame, idCol: String, sourceCol: String, weight: Column,
      lcm: Int, numShards: Int, salt: String = ""): DataFrame = {
    require(lcm > 0 && numShards > 0,
      s"need positive lcm/shards, got ($lcm, $numShards)")
    val w = when(weight <= 0 || pmod(lit(lcm), weight) =!= 0,
        raise_error(concat(lit(s"mixtureInterleave: weight "),
          weight.cast("string"), lit(s" must be a positive divisor of $lcm"))))
      .otherwise(weight.cast("long"))
    val hv = conv(substring(md5(concat_ws(":",
      lit(s"mix$salt"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val base = df.select(col(idCol), col(sourceCol).as("source"),
      w.as("w"), hv.as("__hv"))
      .withColumn("shard", col("__hv") % numShards)
    val wi = Window.partitionBy(col("shard"), col("source"))
      .orderBy(col("__hv"), col(idCol))
    val ranked = base
      .withColumn("i", row_number().over(wi).cast("long"))
      .withColumn("v", col("i") * expr(s"cast($lcm as bigint) div w"))
    ranked
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("v"), col("source"), col("i"))).cast("long"))
      .select(col(idCol), col("source"), col("w"), col("shard"),
        col("i"), col("v"), col("pos"))
  }

  /**
   * Length-bucketed dynamic batching with padding accounting — the
   * batching strategy both training and batch inference use to stop
   * paying for pad tokens: rows are bucketed by length range
   * (`len div bucketWidth`), ordered longest-first inside each bucket
   * (deterministic (len desc, id) order), cut into `batchSize`-row
   * batches, and each batch reports its padding waste
   * `n * max_len - sum_len` — the tokens a rectangular batch tensor
   * allocates beyond the real content. The per-batch rows are the
   * audit: tuning bucketWidth against the padding column is exactly the
   * knob a serving/training stack exposes.
   *
   * Scale shape: one scan computes lengths; ONE exchange keyed by
   * bucket feeds the per-bucket windows (buckets are independent and
   * bounded in count by maxLen / bucketWidth); the batch rollup reuses
   * the same partitioning. A pathologically hot bucket shards further
   * by a hash suffix in practice (the q164 note); the declared row
   * keeps pure bucket keys so the oracle replays ranks verbatim.
   */
  def lengthBucketedBatches(
      docs: DataFrame, idCol: String, textCol: String,
      bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      s"need positive bucketWidth/batchSize, got ($bucketWidth, $batchSize)")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("len").desc, col(idCol))
    docs
      .select(col(idCol),
        size(Dedup.tokens(col(textCol))).cast("long").as("len"))
      .where(col("len") > 0L)
      .withColumn("bucket", expr(s"len div ${bucketWidth}L"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("batch_idx", expr(s"(rk - 1L) div ${batchSize}L"))
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("len")).as("max_len"),
        sum(col("len")).cast("long").as("sum_len"))
      .withColumn("padding",
        col("n_docs") * col("max_len") - col("sum_len"))
  }

  /**
   * Cumulative ppm thresholds of Poisson(1) — `P(X <= k) * 1e6` for
   * k = 0..9, the 1-ppm rounding remainder folded into k = 0 so the
   * masses sum to exactly 1e6. Frozen integer constants (replayed
   * verbatim by the oracle): cross-engine exactness never depends on
   * either engine evaluating `exp(-1)`.
   */
  private[pipeline] val PoissonCumPpm: Seq[Long] = Seq(
    367880L, 735759L, 919699L, 981012L, 996340L,
    999406L, 999917L, 999990L, 999999L, 1000000L)

  /**
   * Poisson bootstrap confidence interval for a per-stratum mean — the
   * bootstrap that actually runs at corpus scale: classical resampling
   * needs `n` i.i.d. draws WITH replacement per replica (a global
   * shuffle per replica), while the Poisson approximation gives each row
   * an independent Poisson(1) multiplicity per replica, turning all
   * `replicas` resamples into ONE scan + ONE aggregate with no global
   * count anywhere. Each row's multiplicity is drawn deterministically:
   * md5(id ":" replica) -> ppm in [0, 1e6) -> inverse-CDF lookup against
   * [[PoissonCumPpm]] (hash-gated like [[stratifiedSample]] —
   * reproducible across runs, engines, and partitionings). Per
   * (stratum, replica) the weighted mean is a single IEEE division of
   * two exact longs; the interval is the order-statistic band
   * [2nd smallest, 2nd largest] of the replica means (~93.75% coverage
   * at 32 replicas), reported next to the full-sample point estimate.
   * A replica whose weights all drew 0 is dropped (visible via
   * `n_replicas`), and `boot_lo`/`boot_hi` are null when fewer than 3
   * replica means survive — never silently wrong.
   *
   * Scale shape: the replica explode multiplies the SCAN, not the
   * exchange — partial aggregation collapses each task's rows to
   * (stratum, replica) pairs before the shuffle, so the exchange
   * carries `|strata| * replicas` rows regardless of corpus size; the
   * final per-stratum fold sorts a bounded `replicas`-length array.
   */
  def poissonBootstrapCI(
      df: DataFrame, idCol: String, stratumCol: String, valueCol: String,
      replicas: Int): DataFrame = {
    require(replicas >= 4, s"need >= 4 replicas for the CI, got $replicas")
    val ppm = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":"), col("replica").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000L
    val w = PoissonCumPpm.init.zipWithIndex.foldRight(
      lit(PoissonCumPpm.size - 1): Column) { case ((thr, k), acc) =>
      when(col("ppm") < thr, lit(k)).otherwise(acc)
    }.cast("long")
    val reps = df
      .select(col(stratumCol), col(idCol),
        col(valueCol).cast("long").as("v"),
        explode(sequence(lit(0), lit(replicas - 1))).as("replica"))
      .withColumn("ppm", ppm)
      .withColumn("w", w)
      .groupBy(col(stratumCol), col("replica"))
      .agg(sum(col("w") * col("v")).as("wsum"), sum(col("w")).as("wn"))
      .where(col("wn") > 0L)
      .withColumn("rep_mean",
        col("wsum").cast("double") / col("wn").cast("double"))
    val point = df.groupBy(col(stratumCol))
      .agg((sum(col(valueCol)).cast("double") /
        count(lit(1)).cast("double")).as("mean_value"))
    reps
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_replicas"),
        sort_array(collect_list(col("rep_mean"))).as("__ms"))
      .select(col(stratumCol), col("n_replicas"),
        when(col("n_replicas") >= 3, element_at(col("__ms"), 2))
          .as("boot_lo"),
        when(col("n_replicas") >= 3, element_at(col("__ms"), -2))
          .as("boot_hi"))
      .join(point, Seq(stratumCol))
  }
}
