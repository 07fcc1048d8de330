package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Byte-pair-encoding tokenizer TRAINING (Sennrich et al., "Neural Machine
 * Translation of Rare Words with Subword Units", ACL 2016): iteratively
 * merge the most frequent adjacent symbol pair across the corpus, starting
 * from characters, for a fixed number of rounds. The output is the merge
 * table — (step, lhs, rhs, pair_cnt) — which IS the trained tokenizer
 * artifact a pipeline ships to its encode jobs.
 *
 * Scale shape — bounded rounds, broadcast merge table, in-scan
 * re-tokenize:
 *  - ONE corpus-wide scan reduces the corpus to the word-frequency
 *    dictionary (vocabulary-sized — the classic BPE trainer input),
 *    persisted once; every merge round iterates over THAT, never the
 *    corpus.
 *  - Each round broadcasts the merge list trained so far and
 *    re-symbolizes every word IN-SCAN (apply all merges in order to the
 *    character split), then runs one partial-aggregated pair count plus
 *    a `TakeOrderedAndProject`-shaped top-1 (count desc, then
 *    lexicographic (lhs, rhs) — a TOTAL order, so the argmax is
 *    deterministic on any engine). Re-deriving from the ONE cached
 *    dictionary keeps every round's plan flat — no chained per-round
 *    caches whose nested lineage (and nested AQE plans) grow with the
 *    round count — at the cost of re-applying ≤`numMerges` merges per
 *    word per round, trivial against the aggregation itself.
 *  - Only the merge table — `numMerges` rows — ever reaches the driver,
 *    and the broadcast payload is bounded by the same table.
 *
 * The merge application is the standard greedy left-to-right scan: each
 * (lhs, rhs) adjacency becomes one merged symbol, consumed pairs don't
 * overlap, and a merged symbol never re-merges within the same pass
 * (lhs+rhs is strictly longer than lhs, so it can't equal that pass's
 * lhs). Symbols are plain strings, so the trainer is cross-engine
 * reproducible — the DuckDB oracle unrolls the same rounds in list
 * algebra and must pick identical merges.
 */
object Bpe {

  private[pipeline] def mergePair(
      syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.toSeq
  }

  /** A word re-symbolized under an ordered merge list (chars first, then
    * each merge applied greedily in training order — the same procedure
    * a BPE ENCODER applies at inference time). */
  private[pipeline] def applyMerges(
      word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = mergePair(syms, a, b)
    }
    syms
  }

  /**
   * Train `numMerges` BPE merges over the whitespace-tokenized, lowercased
   * corpus; pairs below `minPairCount` total occurrences are never merged
   * (training stops early once no pair qualifies). Returns the merge
   * table: `(step, lhs, rhs, pair_cnt)`, step 1-based in merge order.
   */
  def trainMerges(
      docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(
        filter(split(lower(col(textCol)), " "), w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges =
        scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var step = 1
      var done = false
      while (step <= numMerges && !done) {
        val bc = spark.sparkContext.broadcast(
          merges.map(m => (m._2, m._3)).toSeq)
        val resym = udf((w: String) => applyMerges(w, bc.value))
        val top = words
          .select(explode(
            Signals.sliceNgrams(resym(col("word")), 2)).as("p"), col("cnt"))
          .groupBy(col("p.0").as("lhs"), col("p.1").as("rhs"))
          .agg(sum(col("cnt")).as("c"))
          .where(col("c") >= minPairCount)
          .orderBy(col("c").desc, col("lhs").asc, col("rhs").asc)
          .limit(1)
          .collect()
        if (top.isEmpty) done = true
        else {
          merges += ((step.toLong,
            top(0).getString(0), top(0).getString(1), top(0).getLong(2)))
          step += 1
        }
      }
      merges.toSeq.toDF("step", "lhs", "rhs", "pair_cnt")
    } finally words.unpersist()
  }
}
