package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Graph centrality over corpus-derived graphs — the TextRank keyword
 * scorer (Mihalcea & Tarau, EMNLP 2004): PageRank over the undirected
 * word co-occurrence graph, the standard unsupervised
 * keyword/keyphrase-extraction primitive a training-data pipeline uses
 * to summarize and tag documents at corpus scale.
 *
 * The reference engine has no graph operator family at all (its surface
 * is frequent-itemset mining, `/root/reference/src/main/java/fdu/cst/
 * bigdata/pfp/FPGrowthCore.scala`); this extends the engine's graph
 * support beyond connected components ([[Curation.connectedComponents]])
 * to iterative score propagation — the other half of what production
 * graph workloads (PageRank crawl prioritization, TextRank keywords,
 * label propagation) need.
 *
 * == Determinism contract ==
 *
 * Classic PageRank sums floating-point contributions, whose value
 * depends on partitioning/merge order. Every quantity here is instead
 * an exact 64-bit integer in 1e-6 fixed point (the q66/q102 discipline):
 *
 *  - scores start at `1000000` (1.0);
 *  - the contribution of node j to neighbor i is
 *    `(score_j * w_ji) div wdeg_j` — integral division, exact;
 *  - the damped update is `150000 + (85 * sum(contribs)) div 100`
 *    (d = 0.85), again integral.
 *
 * Integer sums are associative and commutative, so the result is
 * bit-identical at any parallelism and replayable in ANSI SQL with
 * floor division — the declared row's DuckDB oracle unrolls the same
 * rounds as chained CTEs.
 *
 * == Scale shape ==
 *
 * Edge extraction is one corpus scan (pairs generated in-scan by
 * slice+zip, no self-join) feeding one partial-aggregated shuffle down
 * to the vocabulary-sized edge table; weighted degree attaches via one
 * window exchange over that already-reduced table (the q53 marginal
 * lesson — never re-scan the corpus for a marginal). Each iteration is
 * then one shuffle join + one partial-aggregated groupBy over
 * vocabulary-sized frames — corpus size never re-enters the loop. The
 * adjacency persists across rounds; per-round results localCheckpoint
 * eagerly (lineage truncation, the [[Curation.connectedComponents]]
 * discipline) and register in the shared sweep registry, so
 * [[Curation.clearCheckpoints]] / `Caches.clearAll` releases them.
 */
object GraphRank {

  /** Damping in percent and the complementary teleport mass in 1e-6
    * fixed point: d = 0.85, (1 - d) = 0.15 = 150000 micro. */
  private val DampNum = 85L
  private val DampDen = 100L
  private val TeleportMicro = 150000L
  private val OneMicro = 1000000L

  private def tokens(textCol: String): Column =
    filter(split(lower(col(textCol)), " "), w => w =!= "")

  /**
   * Undirected weighted co-occurrence edges between ADJACENT lowercase
   * words: `(word_a < word_b, weight = pair count)`, self-pairs dropped,
   * edges seen fewer than `minEdgeCount` times pruned (hapax
   * co-occurrences are noise for ranking and would otherwise let the
   * graph grow with the corpus's long tail instead of its vocabulary).
   */
  def cooccurrenceEdges(
      docs: DataFrame, textCol: String, minEdgeCount: Long = 2L): DataFrame = {
    val pairs = docs.select(tokens(textCol).as("ws"))
      .select(explode(Signals.sliceNgrams(col("ws"), 2)).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2"))
      .where(col("w1") =!= col("w2"))
    pairs
      .select(least(col("w1"), col("w2")).as("word_a"),
        greatest(col("w1"), col("w2")).as("word_b"))
      .groupBy(col("word_a"), col("word_b"))
      .agg(count(lit(1)).as("weight"))
      .where(col("weight") >= minEdgeCount)
  }

  /**
   * TextRank scores over [[cooccurrenceEdges]]: `iterations` rounds of
   * exact fixed-point PageRank on the symmetric adjacency. Returns one
   * row per graph node: `(word, rank_micro)` — the score in 1e-6 units
   * (words that never co-occur above the edge floor have no edges and
   * are deliberately absent: they'd all carry the teleport constant).
   *
   * The iteration count is a FIXED parameter, not a convergence test:
   * the declared row pins the score table bit-for-bit, and a
   * data-dependent stopping rule would make the oracle's unrolled
   * rounds unstatable. Ten damped rounds is past the point where
   * keyword ORDER stabilizes on co-occurrence graphs.
   *
   * == Size-gated routing (the BPE trainer discipline) ==
   *
   * Edge extraction is always the distributed scan+aggregate; the
   * ITERATION then routes on the aggregated edge count. At or below
   * `distributedThreshold` edges (vocabulary-sized graphs — the common
   * TextRank case) the rounds run driver-side over the collected edge
   * list: same integer arithmetic to the bit (spec-enforced against the
   * distributed path), no per-round job/shuffle/checkpoint overhead.
   * Above the gate — web-scale link graphs — each round is one shuffle
   * join + one partial-aggregated groupBy over vocabulary-sized frames
   * with eager localCheckpoint truncation (the CC round discipline);
   * corpus size never re-enters the loop either way.
   */
  def textRank(
      docs: DataFrame, textCol: String,
      minEdgeCount: Long = 2L, iterations: Int = 10,
      distributedThreshold: Long = 100000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val edges = cooccurrenceEdges(docs, textCol, minEdgeCount)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // One long of metadata: the aggregated edge count that routes the
      // iteration regime.
      if (edges.count() <= distributedThreshold) textRankLocal(edges, iterations)
      else textRankDistributed(edges, iterations)
    } finally edges.unpersist()
  }

  /** Driver-side rounds over a bounded collected edge list — identical
    * arithmetic to [[textRankDistributed]] (spec-enforced). The
    * `score * weight` product is carried as BigInt (the distributed twin
    * uses decimal(38,0)): on a skewed hub graph a concentrated score
    * (~total mass, up to ~1e14 micro at web vocabulary) times a hub edge
    * weight (~1e10) exceeds Long and would wrap silently — while DuckDB
    * errors — breaking the cross-engine contract exactly at scale. The
    * per-node RESULT (≤ teleport + 0.85 × total mass) stays well inside
    * Long; only the intermediates widen. */
  private[graft] def textRankLocal(edges: DataFrame, iterations: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("word_a"), col("word_b"), col("weight"))
      .as[(String, String, Long)].collect()
    val adj = es.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val wdeg = scala.collection.mutable.HashMap.empty[String, Long]
    adj.foreach { case (s, _, w) =>
      wdeg.update(s, wdeg.getOrElse(s, 0L) + w)
    }
    var score: scala.collection.Map[String, Long] =
      wdeg.map { case (k, _) => k -> OneMicro }
    for (_ <- 1 to iterations) {
      val mass = scala.collection.mutable.HashMap.empty[String, BigInt]
      adj.foreach { case (s, d, w) =>
        mass.update(d,
          mass.getOrElse(d, BigInt(0)) + BigInt(score(s)) * w / wdeg(s))
      }
      score = mass.map { case (k, m) =>
        k -> (TeleportMicro + (DampNum * m / DampDen).toLong)
      }
    }
    score.toSeq.toDF("word", "rank_micro")
  }

  /** Distributed rounds: one join + one partial-aggregated groupBy per
    * round over vocabulary-sized frames, localCheckpoint-truncated.
    * Intermediates (`score * weight` product, per-node mass sum, damped
    * numerator) are decimal(38,0) — see [[textRankLocal]]'s overflow
    * note; `div` (IntegralDivide) returns the Long the next round
    * consumes, so the node-table schema is unchanged. */
  private[graft] def textRankDistributed(
      edges: DataFrame, iterations: Int): DataFrame = {
    val sym = edges.select(col("word_a").as("src"), col("word_b").as("dst"),
        col("weight"))
      .union(edges.select(col("word_b").as("src"), col("word_a").as("dst"),
        col("weight")))
    // Weighted degree via a window over the vocabulary-sized adjacency —
    // one exchange on src, no second corpus pass, no join against a
    // second copy of the aggregate subtree.
    val wdeg = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val adj = sym.withColumn("wdeg", sum(col("weight")).over(wdeg))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var persisted = Curation.materializeRound(
      adj.select(col("src").as("word")).distinct()
        .select(col("word"), lit(OneMicro).as("score")))
    var scores = persisted
    for (_ <- 1 to iterations) {
      val contribs = adj.join(scores, adj("src") === scores("word"))
        .select(col("dst"),
          expr(s"(cast(score as decimal(38,0)) * weight) div wdeg")
            .as("contrib"))
      val next = Curation.materializeRound(
        contribs.groupBy(col("dst"))
          .agg(sum(col("contrib").cast("decimal(38,0)")).as("mass"))
          .select(col("dst").as("word"),
            (lit(TeleportMicro) +
              expr(s"($DampNum * mass) div $DampDen")).as("score")))
      Curation.release(persisted)
      persisted = next
      scores = next
    }
    adj.unpersist()
    scores.select(col("word"), col("score").as("rank_micro"))
  }

  /**
   * Triangle census — the graph-shape datasheet: node/edge counts,
   * wedges (open two-paths, `sum(d*(d-1)/2)`), triangle count, and the
   * global clustering coefficient `3*triangles / wedges`. Triangles use
   * the node-ORDERED edge list (`word_a < word_b` from
   * [[cooccurrenceEdges]]), so every triangle a<b<c is found exactly
   * once as edges (a,b)+(b,c) closed by (a,c) — two equi-joins over the
   * vocabulary-sized edge table, never a per-node neighborhood
   * materialization (hub nodes cost join fan-out, not memory). All
   * counts are exact integers; the coefficient is one IEEE division.
   *
   * Emits ONE row `(nodes, edges, wedges, triangles, clustering)`;
   * zero rows on an empty graph (the corpus-card convention). The
   * one-row aggregates combine by union + max, not a cross join — no
   * cartesian shape anywhere in the plan.
   */
  def triangleCensus(edges: DataFrame): DataFrame = {
    val e = edges.select(col("word_a"), col("word_b"))
    val deg = e.select(col("word_a").as("node"))
      .union(e.select(col("word_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val nw = deg.agg(count(lit(1)).as("nodes"),
      coalesce(sum(expr("(d * (d - 1)) div 2")), lit(0L)).as("wedges"))
    val em = e.agg(count(lit(1)).as("edges"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.word_b") === col("e2.word_a"))
      .join(e.as("e3"), col("e3.word_a") === col("e1.word_a") &&
        col("e3.word_b") === col("e2.word_b"))
      .agg(count(lit(1)).as("triangles"))
    val nullL = lit(null).cast("long")
    nw.select(col("nodes"), nullL.as("edges"), col("wedges"),
        nullL.as("triangles"))
      .unionAll(em.select(nullL.as("nodes"), col("edges"),
        nullL.as("wedges"), nullL.as("triangles")))
      .unionAll(tri.select(nullL.as("nodes"), nullL.as("edges"),
        nullL.as("wedges"), col("triangles")))
      .agg(max(col("nodes")).as("nodes"), max(col("edges")).as("edges"),
        max(col("wedges")).as("wedges"),
        max(col("triangles")).as("triangles"))
      .withColumn("clustering",
        when(col("wedges") > 0L,
          (lit(3) * col("triangles")).cast("double") /
            col("wedges").cast("double")))
      .where(col("nodes") > 0L)
  }
}
