package graft.fpm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Sequential pattern mining — the event-log sibling of the reference's
 * frequent-ITEMSET mining (`/root/reference/src/main/java/fdu/cst/
 * bigdata/pfp/FPGrowthCore.scala` mines unordered transactions; this
 * mines ORDERED per-key event sequences, the GSP/PrefixSpan problem
 * family of Srikant & Agrawal 1996 / Pei et al. 2001). A pattern
 * `a -> b -> c` is frequent when at least `minSupport` of the keys'
 * event sequences contain it as a (not necessarily contiguous)
 * subsequence.
 *
 * == Algorithm (Apriori-style candidate growth, GSP) ==
 *
 * Level k candidates come from level k-1: `p :+ c` is a candidate iff
 * `p` is frequent and its suffix extension `p.tail :+ c` is frequent —
 * the lossless anti-monotone prune (support(p :+ c) <= support of every
 * subsequence). Candidate sets are bounded by the EVENT-TYPE ALPHABET
 * (V^k for alphabet V), not by the data, so candidate generation is
 * driver-side over an alphabet-sized collect — the same bounded-metadata
 * discipline as [[Apriori]]'s broadcast candidates.
 *
 * == Scale shape ==
 *
 * One shuffle builds the per-key ordered sequences (bounded per-key
 * collect — the projected-database assumption every PrefixSpan-family
 * miner makes: one key's history fits in memory). Each counting pass is
 * then a pure PROJECTION over the cached sequences — the alphabet-sized
 * candidate list ships as a plan literal, and containment is one greedy
 * left-to-right fold per (sequence, candidate) via nested higher-order
 * functions (no UDF, no join, no BNL) — followed by one
 * partial-aggregated vocabulary-sized groupBy. Corpus size never enters
 * a join; per-key work is |seq| x |candidates|, both bounded.
 *
 * Determinism: sequences order by the strictly-unique (time, eventId)
 * pair, so subsequence positions biject onto strict lexicographic
 * comparisons — the declared row's oracle states containment as
 * EXISTS-ordered-positions joins and counts match exactly.
 */
object SequentialPatterns {

  /** Greedy subsequence test: fold the sequence left to right, advancing
    * a match cursor on each hit; contained iff the cursor reaches the
    * pattern length (greedy matching is complete for subsequence
    * existence). */
  private def containedIn(seq: Column, pat: Column): Column =
    aggregate(seq, lit(0), (m, x) =>
      when(m < size(pat) && x === element_at(pat, m + 1), m + 1)
        .otherwise(m)) === size(pat)

  /**
   * Frequent sequential patterns of length 1..`maxLen` over per-key
   * ordered event sequences. `minSupportNum / minSupportDen` is the
   * support fraction (kept rational so the threshold
   * `ceil(frac * keys)` is exact integer arithmetic cross-engine).
   *
   * Returns `(pattern, plen, support)` — the pattern as
   * `"a->b->c"`, its length, and the number of keys containing it.
   */
  def frequentSequences(
      events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, minSupportNum: Long = 4L, minSupportDen: Long = 5L,
      maxLen: Int = 3): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1: $maxLen")
    require(minSupportNum >= 0 && minSupportDen > 0,
      s"support fraction must be a nonnegative rational: " +
        s"$minSupportNum/$minSupportDen")
    val spark = events.sparkSession
    val seqs = events.where(col(typeCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"),
        col(idCol).as("i"), col(typeCol).as("y")))).as("s"))
      .select(expr("transform(s, x -> x.y)").as("seq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // One long of metadata: the key count that anchors the threshold.
      val numKeys = seqs.count()
      val minCount = (numKeys * minSupportNum + minSupportDen - 1) /
        minSupportDen

      // Each counting pass is distributed; its RESULT is alphabet-bounded
      // (<= V^k rows), so layers collect as metadata (the histogram /
      // codebook discipline) and the output assembles driver-side.
      def countPatterns(cands: Seq[Seq[String]]): Seq[(List[String], Long)] =
        if (cands.isEmpty) Nil
        else {
          // Alphabet-bounded candidate list as a plan literal: each row
          // filters it by the greedy fold — a projection, not a join.
          val candLit = array(cands.map(p => array(p.map(lit): _*)): _*)
          seqs.select(explode(filter(candLit,
              p => containedIn(col("seq"), p))).as("pat"))
            .groupBy(col("pat")).agg(count(lit(1)).as("support"))
            .where(col("support") >= minCount)
            .collect()
            .map(r => (r.getSeq[String](0).toList, r.getLong(1))).toSeq
        }

      // Alphabet-sized collect (bounded by the event-type vocabulary).
      val l1: Seq[(List[String], Long)] = seqs
        .select(explode(array_distinct(col("seq"))).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("support"))
        .where(col("support") >= minCount)
        .collect().map(r => (List(r.getString(0)), r.getLong(1))).toSeq
      val f1: Seq[String] = l1.map(_._1.head).sorted
      var layers = List(l1)
      var freqK: Seq[List[String]] = l1.map(_._1)
      var k = 2
      while (k <= maxLen && freqK.nonEmpty) {
        val fkSet = freqK.toSet
        val cands: Seq[Seq[String]] = for {
          p <- freqK; c <- f1 if fkSet.contains(p.tail :+ c)
        } yield p :+ c
        val lk = countPatterns(cands)
        layers = lk :: layers
        freqK = lk.map(_._1)
        k += 1
      }
      import spark.implicits._
      layers.reverse.flatten
        .map { case (p, s) => (p.mkString("->"), p.length, s) }
        .toDF("pattern", "plen", "support")
    } finally seqs.unpersist()
  }
}
