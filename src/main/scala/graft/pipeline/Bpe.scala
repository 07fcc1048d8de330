package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Byte-pair-encoding tokenizer TRAINING (Sennrich et al., "Neural Machine
 * Translation of Rare Words with Subword Units", ACL 2016): iteratively
 * merge the most frequent adjacent symbol pair across the corpus, starting
 * from characters, for a fixed number of rounds. The output is the merge
 * table — (step, lhs, rhs, pair_cnt) — which IS the trained tokenizer
 * artifact a pipeline ships to its encode jobs
 * ([[saveMerges]]/[[loadMerges]], the IVF-index lifecycle of
 * [[Similarity.saveIvfIndex]]).
 *
 * Scale shape — ONE corpus scan, then vocabulary-sized state:
 *  - ONE corpus-wide scan reduces the corpus to the word-frequency
 *    dictionary (vocabulary-sized — the classic BPE trainer input),
 *    persisted once; every merge round iterates over THAT, never the
 *    corpus. Corpus scale-up changes the scan, not the rounds.
 *  - A measured-small dictionary (the overwhelmingly common case — the
 *    gate matches the LM/partition gates at 100k words) collects to the
 *    driver and trains IN MEMORY with delta-maintained pair counts: each
 *    round re-symbolizes ONLY the words containing the merged pair (the
 *    classic trainer), so per-round cost is flat in the round index and
 *    a 32k–100k-merge tokenizer is minutes, not days. Only the
 *    dictionary — bounded metadata, the same class as the q55 vocab
 *    collect — ever reaches the driver.
 *  - A corpus-scale dictionary (≥100k distinct words) stays distributed
 *    AND delta-maintained, like the in-memory path: the state is the
 *    current symbolization `(cnt, syms)`, each round applies only that
 *    round's one merge to it (identity on untouched words) and runs one
 *    partial-aggregated pair count plus a `TakeOrderedAndProject`-shaped
 *    top-1 — flat per-merge cost in the round index (BpeProbe-measured),
 *    so a 32k–100k-merge tokenizer over a web-scale dictionary costs
 *    M dictionary scans, not O(M²) symbol work. Round lineage is cut by
 *    lazy per-round localCheckpoints that the pair-count action itself
 *    materializes (one action per round, no plan growth).
 *  - Only the per-round top-1 pair and the merge table — `numMerges`
 *    rows — ever reach the driver from the distributed path.
 *
 * Both paths take the same total-ordered argmax each round (count desc,
 * then lexicographic (lhs, rhs)) and are differential-tested equal
 * (BpeSpec); the in-memory path is the same sequential procedure with
 * the per-round recount replaced by exact delta maintenance.
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

  /** Dictionaries below this many distinct words train in memory with
    * delta-maintained pair counts; at or above it the distributed
    * re-derive-all path runs (same gate constant as the partition and
    * LM size gates). */
  private[pipeline] val InMemoryDictGate = 100000L

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

  // Encode-side broadcasts stay referenced by the (lazy) result
  // DataFrame until it executes, so they cannot be destroyed eagerly;
  // they are tracked here and swept by [[clearCaches]] — unpersist (not
  // destroy) releases the executor copies while keeping the driver-side
  // value usable, preserving the Caches contract that a sweep is always
  // safe for in-flight plans (tasks re-fetch from the driver on next
  // use). Training-round broadcasts don't need tracking: their value is
  // fully consumed by the round's collect and destroyed in-round.
  private val liveBroadcasts = new java.util.concurrent.ConcurrentLinkedQueue[
    org.apache.spark.broadcast.Broadcast[_]]()

  private def trackedBroadcast[T: scala.reflect.ClassTag](
      spark: SparkSession, value: T): org.apache.spark.broadcast.Broadcast[T] = {
    val bc = spark.sparkContext.broadcast(value)
    liveBroadcasts.add(bc)
    bc
  }

  // Distributed-trainer round checkpoints: intra-loop rounds release
  // themselves (releaseCheckpoint), so this WEAK registry only backstops
  // a run that died mid-loop — swept by [[clearCaches]], the Curation
  // liveCheckpoints discipline.
  private val liveCheckpoints: java.util.Set[org.apache.spark.rdd.RDD[_]] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[org.apache.spark.rdd.RDD[_], java.lang.Boolean]()))

  private def trackCheckpoint(df: DataFrame): DataFrame = {
    org.apache.spark.sql.GraftShims.checkpointRDDs(df).foreach(liveCheckpoints.add)
    df
  }

  private def releaseCheckpoint(df: DataFrame): Unit = {
    df.unpersist()
    val rdds = org.apache.spark.sql.GraftShims.checkpointRDDs(df)
    rdds.foreach(_.unpersist(blocking = false))
    rdds.foreach(liveCheckpoints.remove)
  }

  /** Drop every cached merge table (driver-side rows only — no storage)
    * and release executor blocks of encode-side merge broadcasts plus
    * any round checkpoints a died-mid-loop distributed run left. */
  def clearCaches(): Unit = {
    mergeCache.clear()
    var bc = liveBroadcasts.poll()
    while (bc != null) {
      try bc.unpersist() catch { case _: Throwable => }
      bc = liveBroadcasts.poll()
    }
    liveCheckpoints.synchronized {
      liveCheckpoints.forEach(r => r.unpersist(blocking = false))
      liveCheckpoints.clear()
    }
  }

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
    val persisted = docs
      .select(explode(
        filter(split(lower(col(textCol)), " "), w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The count doubles as the materialization action and drives the
    // dictionary size gate.
    val n = persisted.count()
    try {
      if (n < InMemoryDictGate) {
        // Vocabulary-sized dictionary: the classic in-memory trainer.
        // The collect is bounded by the gate (≤100k (word, cnt) rows —
        // a few MB); per-round cost is proportional to the words
        // CONTAINING the merged pair, not the dictionary, so merge
        // count scales linearly (measured flat per round — SCALE.md).
        val dict = persisted.collect().map(r => (r.getString(0), r.getLong(1)))
        trainInMemory(dict, numMerges, minPairCount)
      } else {
        // Corpus-scale dictionary: distributed re-derive-all rounds
        // (flat lineage — a per-round persist chain OOMs the driver).
        trainDistributed(persisted, numMerges, minPairCount)
      }
    } finally persisted.unpersist()
  }

  /** The classic incremental BPE trainer: symbolizations and pair counts
    * held in memory, each merge updating ONLY the words that contain the
    * merged pair (tracked by an inverted pair→words index), with exact
    * delta maintenance of the pair counts. Produces the identical merge
    * sequence to [[trainDistributed]] — same argmax total order (count
    * desc, then lexicographic pair), same greedy merge procedure —
    * differential-tested in BpeSpec. */
  private[pipeline] def trainInMemory(
      dict: Array[(String, Long)], numMerges: Int,
      minPairCount: Long): Seq[(Long, String, String, Long)] = {
    import scala.collection.mutable
    val syms = dict.map { case (w, _) => charSymbols(w).toArray }
    val cnts = dict.map(_._2)
    // pair -> total adjacent-occurrence count (each adjacency counts,
    // so "aaa" contributes 2x its word count to (a,a) — the same
    // semantics as the distributed sliceNgrams sum).
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    // pair -> indices of words with at least one adjacency of that pair
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = syms(wi); val c = cnts(wi) * sign
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        val nc = pairCounts.getOrElse(p, 0L) + c
        if (nc == 0L) pairCounts.remove(p) else pairCounts.update(p, nc)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
      if (sign < 0) {
        // drop stale inverted-index entries for pairs no longer present
        i = 0
        val present = mutable.Set.empty[(String, String)]
        while (i + 1 < s.length) { present += ((s(i), s(i + 1))); i += 1 }
        present.foreach { p =>
          // re-added below if the new symbolization still contains p
          pairWords.get(p).foreach { set => set -= wi; if (set.isEmpty) pairWords.remove(p) }
        }
      }
    }
    var wi = 0
    while (wi < syms.length) { addWord(wi, 1L); wi += 1 }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      // deterministic argmax over the live pair counts: count desc,
      // then lexicographic (lhs, rhs) — the same TOTAL order as the
      // distributed orderBy, independent of hash-map iteration order
      var best: ((String, String), Long) = null
      pairCounts.foreach { case e @ (p, c) =>
        if (c >= minPairCount &&
            (best == null || c > best._2 ||
             (c == best._2 && (p._1 < best._1._1 ||
               (p._1 == best._1._1 && p._2 < best._1._2))))) best = e
      }
      if (best == null) done = true
      else {
        val ((a, b), c) = best
        merges += ((step.toLong, a, b, c))
        // re-symbolize ONLY the words containing (a, b) — the delta
        val touched = pairWords.getOrElse((a, b), mutable.Set.empty).toArray
        java.util.Arrays.sort(touched)
        touched.foreach { w =>
          addWord(w, -1L)
          syms(w) = mergePair(syms(w).toSeq, a, b).toArray
          addWord(w, 1L)
        }
        step += 1
      }
    }
    merges.toSeq
  }

  /** Distributed training rounds over a (word, cnt) dictionary DataFrame
    * — the large-dictionary path, DELTA-MAINTAINED like the in-memory
    * trainer: the state is the CURRENT symbolization `(cnt, syms)`, and
    * each round applies only that round's ONE merge to it (`mergePair`
    * is the identity on words without the pair), so per-merge symbol
    * work is flat in the round index — the re-derive-all formulation
    * (re-applying all M prior merges per word per round, O(M²) total)
    * is gone. Round lineage is truncated by a LAZY localCheckpoint
    * whose blocks the next round's pair-count aggregation materializes
    * — ONE action per round, no chained plan growth (the
    * connectedComponentsAlternating discipline); the previous round's
    * blocks release only after its successor is fully stored. Only the
    * per-round top-1 pair ever reaches the driver. */
  private[graft] def trainDistributed(
      words: DataFrame, numMerges: Int,
      minPairCount: Long): Seq[(Long, String, String, Long)] = {
    val charUdf = udf((w: String) => charSymbols(w))
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var state = trackCheckpoint(
      words.select(col("cnt"), charUdf(col("word")).as("syms"))
        .localCheckpoint(eager = false))
    var prev: DataFrame = null
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      // the round's ONE action: counts pairs AND writes state's (lazy)
      // checkpoint blocks — after it, the previous round is droppable
      val top = state
        .select(explode(Signals.sliceNgrams(col("syms"), 2)).as("p"), col("cnt"))
        .groupBy(col("p.0").as("lhs"), col("p.1").as("rhs"))
        .agg(sum(col("cnt")).as("c"))
        .where(col("c") >= minPairCount)
        .orderBy(col("c").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (prev != null) { releaseCheckpoint(prev); prev = null }
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((step.toLong, a, b, top(0).getLong(2)))
        val mergeUdf = udf((syms: Seq[String]) =>
          if (syms.length > 1) mergePair(syms, a, b) else syms)
        val next = trackCheckpoint(
          state.select(col("cnt"), mergeUdf(col("syms")).as("syms"))
            .localCheckpoint(eager = false))
        prev = state
        state = next
        step += 1
      }
    }
    if (prev != null) releaseCheckpoint(prev)
    releaseCheckpoint(state)
    merges.toSeq
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

  /** Persist a trained merge table as parquet — the tokenizer artifact a
    * production deployment trains once and ships to every encode job
    * (the [[Similarity.saveIvfIndex]] lifecycle). One file: the table is
    * `numMerges` rows of bounded strings. */
  def saveMerges(mergeTable: DataFrame, path: String): Unit =
    mergeTable
      .select(col("step").cast("long").as("step"), col("lhs"), col("rhs"),
        col("pair_cnt").cast("long").as("pair_cnt"))
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Load a [[saveMerges]] artifact back into encode-ready form. EAGER —
    * the rows (bounded: the merge count) are collected immediately, so
    * the artifact directory may be deleted once this returns (the
    * [[Similarity.loadIvfIndex]] contract). */
  def loadMerges(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("step").cast("long"), col("lhs"), col("rhs"),
        col("pair_cnt").cast("long"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
      .toDF("step", "lhs", "rhs", "pair_cnt")
  }

  /**
   * Encode every document under an EXTERNAL trained merge table — the
   * shipped-artifact path: train on corpus A ([[trainMerges]]),
   * [[saveMerges]]/[[loadMerges]] through storage, encode corpus B. The
   * merge table (step, lhs, rhs[, ...]) is collected up front (bounded:
   * the merge count) and applied in step order.
   *
   * Each word is re-symbolized by applying the merges in training order
   * (chars first, then each greedy pass), per word joined with `|`, per
   * document joined with spaces in word order. Returns
   * `(idCol, n_words, n_tokens, encoded)`; `n_tokens` counts emitted
   * symbols. Documents with zero words produce no row (nothing to
   * encode).
   *
   * CONTRACT: `|` is the intra-word symbol separator and must not occur
   * in corpus words — a word containing a literal `|` would inflate
   * `n_tokens` (counted by splitting the joined string) and make
   * `encoded` ambiguous. This mirrors the oracle's `;` assumption; feed
   * pre-tokenized text that excludes both.
   *
   * Scale shape: the merge table broadcasts and every word encodes
   * IN-SCAN; one aggregation by doc id reassembles word order (collect +
   * sort of that doc's own tokens — the q55 token-id shape).
   */
  def encode(
      docs: DataFrame, idCol: String, textCol: String,
      mergeTable: DataFrame): DataFrame = {
    val merges = mergeTable.select(col("step").cast("long"), col("lhs"), col("rhs"))
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
      .toSeq
    encodeWithMerges(docs, idCol, textCol, merges)
  }

  /**
   * Encode every document under a tokenizer trained ON THIS CORPUS with
   * the given parameters — the self-train convenience overload; training
   * cost is shared with [[trainMerges]] through the keyed merge cache
   * (train once, encode any number of batches). See the merge-table
   * overload for the output schema and the `|` separator contract.
   */
  def encode(
      docs: DataFrame, idCol: String, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    val merges = trainedMerges(docs, textCol, numMerges, minPairCount)
      .map(m => (m._2, m._3))
    encodeWithMerges(docs, idCol, textCol, merges)
  }

  private def encodeWithMerges(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    // per-executor word -> encoded memo (measured 2.9 s -> sub-second
    // on the q80 corpus at sf0.1) — see [[EncodeMemo]]
    val bc = trackedBroadcast(spark,
      new EncodeMemo(w => applyMerges(w, merges).mkString("|")))
    val tokUdf = udf((w: String) => bc.value(w))
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
