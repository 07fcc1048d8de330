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

  /** Initial symbolization: one symbol per Unicode CODE POINT, not per
    * UTF-16 code unit — a `word.map(_.toString)` split would cut astral
    * characters into lone surrogate halves, which diverges from the
    * oracle's codepoint split (DuckDB `string_split(w, '')`) and mangles
    * to '?' on the executor's UTF-8 boundary. */
  private[pipeline] def charSymbols(word: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toSeq
  }

  /** A word re-symbolized under an ordered merge list (code points
    * first, then each merge applied greedily in training order — the
    * same procedure a BPE ENCODER applies at inference time). */
  private[pipeline] def applyMerges(
      word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = charSymbols(word)
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = mergePair(syms, a, b)
    }
    syms
  }

  // One trained merge table per (session, corpus plan, params) — the
  // keyed-cache discipline (Dedup.indexCache), but the cached value is
  // the DRIVER-SIDE merge list itself (numMerges rows — bounded
  // metadata): the trainer (q79) and the encoder (q80) share one
  // training run, the train-once/encode-many lifecycle a tokenizer
  // deployment has.
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Long, String, String, Long)]]()

  /** Drop every cached merge table (driver-side rows only — no storage). */
  def clearCaches(): Unit = mergeCache.clear()

  private[pipeline] def trainedMerges(
      docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long): Seq[(Long, String, String, Long)] = {
    val sc = docs.sparkSession.sparkContext
    val key = s"${sc.applicationId}@${sc.startTime}|" +
      s"${docs.queryExecution.analyzed.semanticHash()}|$textCol|$numMerges|$minPairCount"
    val cached = mergeCache.get(key)
    if (cached != null) return cached
    val built = runTraining(docs, textCol, numMerges, minPairCount)
    val prev = mergeCache.putIfAbsent(key, built)
    if (prev != null) prev else built
  }

  private def runTraining(
      docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long): Seq[(Long, String, String, Long)] = {
    val spark = docs.sparkSession
    val persisted = docs
      .select(explode(
        filter(split(lower(col(textCol)), " "), w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Size-gate the dictionary's partition count (the LM-gate
    // discipline): every merge round schedules a stage over this table,
    // so a benchmark-scale dictionary spread over the session's full
    // shuffle parallelism pays ~numMerges x partitions of empty-task
    // scheduler latency for no work. A measured-small dictionary reads
    // its cached blocks through 4 tasks (narrow coalesce — no shuffle,
    // re-planned per round); a corpus-scale one keeps full parallelism.
    // The count doubles as the materialization action.
    val words =
      if (persisted.count() < 100000L) persisted.coalesce(4) else persisted
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
      merges.toSeq
    } finally persisted.unpersist()
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
    trainedMerges(docs, textCol, numMerges, minPairCount)
      .toDF("step", "lhs", "rhs", "pair_cnt")
  }

  /**
   * Encode every document under the trained merge table — the inference
   * half of the tokenizer: each word re-symbolized by applying the
   * merges in training order (chars first, then each greedy pass), per
   * word joined with `|`, per document joined with spaces in word
   * order. Returns `(idCol, n_words, n_tokens, encoded)`; `n_tokens`
   * counts emitted symbols. Documents with zero words produce no row
   * (nothing to encode).
   *
   * Scale shape: the merge table (numMerges pairs — bounded) broadcasts
   * and every word encodes IN-SCAN; one aggregation by doc id
   * reassembles word order (collect + sort of that doc's own tokens —
   * the q55 token-id shape). Training cost is shared with the trainer
   * through the keyed merge cache: train once, encode any number of
   * corpora/batches.
   */
  def encode(
      docs: DataFrame, idCol: String, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    val merges = trainedMerges(docs, textCol, numMerges, minPairCount)
      .map(m => (m._2, m._3))
    val bc = spark.sparkContext.broadcast(merges)
    val tokUdf = udf((w: String) => applyMerges(w, bc.value).mkString("|"))
    val words = filter(split(lower(col(textCol)), " "), w => w =!= "")
    docs
      .select(col(idCol), posexplode(words).as(Seq("pos", "word")))
      .select(col(idCol), col("pos"), tokUdf(col("word")).as("tok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(split(col("tok"), "\\|"))).cast("long").as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("encoded"))
  }
}
