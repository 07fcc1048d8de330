package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Unigram-language-model tokenizer (Kudo, "Subword Regularization", ACL
 * 2018 — the SentencePiece unigram trainer): seed a piece vocabulary from
 * frequent substrings, fit piece probabilities by EM over all
 * segmentations (forward–backward on the per-word segmentation lattice),
 * prune to the target vocabulary, and encode with the Viterbi best
 * segmentation under the FROZEN shipped model. This is the second
 * production tokenizer family next to [[Bpe]] (merge-based); the artifact
 * lifecycle ([[saveModel]]/[[loadModel]], train once → encode many) is
 * identical to [[Bpe.saveMerges]].
 *
 * Cross-engine exactness — why the trainer is oracle-checkable at all:
 *  - Every probability is produced by IEEE-754 double `+ * /` in a FIXED,
 *    documented evaluation order. Those operations are exactly specified
 *    (correctly rounded), so DuckDB and the JVM produce bit-identical
 *    values; no `log`/`exp` (whose last-ulp behaviour is engine-specific)
 *    appears anywhere.
 *  - The E-step's per-occurrence expected counts are immediately floored
 *    to 1e-12 fixed point (`floor(gamma * 1e12)` as int64 — the q66
 *    `sum_condp_e12` discipline), so the cross-row aggregation is an
 *    INTEGER sum: exact, associative, and independent of partitioning or
 *    row order. Resolution contract: total expected-count mass times 1e12
 *    must fit int64, i.e. ≲9e6 corpus codepoints; larger corpora train on
 *    a bounded deterministic sample, which is standard practice for
 *    production tokenizers (SentencePiece caps trainer input the same
 *    way) — the ENCODE side has no such bound.
 *  - Viterbi ties (exactly equal path probabilities) break to the LONGEST
 *    candidate piece; argmax ranking ties break lexicographically — both
 *    total orders, both mirrored by the oracle's CASE/row_number order.
 *
 * Training schedule (fixed, mirrored CTE-for-CTE by the oracle):
 * seed → EM round 1 → prune to `vocabSize` → EM round 2 → final model.
 * Single-codepoint pieces are ALWAYS kept and their expected count is
 * floored at 1 (the coverage guarantee: every word stays segmentable, so
 * the lattice normalizer is never 0); multi-codepoint pieces whose
 * expected count rounds to 0 drop out — the EM half of Kudo's
 * prune-by-likelihood-loss, at fixed-point resolution.
 *
 * Scale shape — one scan to the dictionary, then vocabulary-sized state:
 *  - ONE corpus scan reduces to the (word, cnt) dictionary (persisted);
 *    every EM pass iterates over THAT.
 *  - The model (≤ seedSize + alphabet pieces) broadcasts; each E-step is
 *    one map-side pass over dictionary partitions emitting (piece,
 *    fixed-point count) plus one partial-aggregated integer sum — flat
 *    per-round cost, one shuffle per round, nothing corpus-sized on the
 *    driver (the collected model is bounded metadata, the q55/Bpe class).
 *  - Encode broadcasts the frozen model and segments in-scan; one
 *    aggregation by doc id reassembles word order (the Bpe.encode shape).
 */
object Unigram {

  /** Maximum piece length in CODEPOINTS — the lattice's branching factor
    * and the oracle's unrolled join width. */
  val MaxPieceLen = 4

  /** Fixed-point resolution of E-step expected counts (the q66 e12
    * discipline): exact integer aggregation at 1e-12 granularity. */
  private val FixedPoint = 1e12

  // ---------------------------------------------------------------- model

  /** Codepoint boundary offsets of `word`: off(i) is the UTF-16 index of
    * codepoint i, off(n) = word.length — the bridge between Java's
    * UTF-16 indexing and the oracle's codepoint-based `substr`. */
  private[pipeline] def cpOffsets(word: String): Array[Int] = {
    val buf = new Array[Int](word.codePointCount(0, word.length) + 1)
    var i = 0; var n = 0
    while (i < word.length) {
      buf(n) = i; n += 1; i += Character.charCount(word.codePointAt(i))
    }
    buf(n) = word.length
    buf
  }

  /** Compact broadcastable model: piece → index into an unboxed prob
    * array (tight-loop lookup discipline — no per-probe boxing). */
  private[pipeline] final class Probs(
      val index: java.util.HashMap[String, Integer], val p: Array[Double])
    extends Serializable {
    def prob(piece: String): Double = {
      val i = index.get(piece)
      if (i == null) -1.0 else p(i.intValue())
    }
  }

  private def toProbs(model: Seq[(String, Long, Double)]): Probs = {
    val idx = new java.util.HashMap[String, Integer](model.size * 2)
    val arr = new Array[Double](model.size)
    var i = 0
    model.foreach { case (piece, _, prob) =>
      idx.put(piece, Integer.valueOf(i)); arr(i) = prob; i += 1
    }
    new Probs(idx, arr)
  }

  // One trained model per (session, corpus plan, params) — the Bpe
  // mergeCache discipline; the cached value is the driver-side model
  // rows (≤ seedSize + alphabet — bounded metadata), shared by the
  // trainer row and every encode batch.
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, Long, Double)]]()

  // Encode-side broadcasts stay referenced by lazy result plans —
  // tracked and swept by [[clearCaches]] (unpersist, not destroy: safe
  // for in-flight plans, the Bpe.liveBroadcasts contract). E-step
  // broadcasts are fully consumed by the round's collect and destroyed
  // in-round.
  private val liveBroadcasts = new java.util.concurrent.ConcurrentLinkedQueue[
    org.apache.spark.broadcast.Broadcast[_]]()

  /** Drop cached models and release executor blocks of encode-side
    * model broadcasts. */
  def clearCaches(): Unit = {
    modelCache.clear()
    var bc = liveBroadcasts.poll()
    while (bc != null) {
      try bc.unpersist() catch { case _: Throwable => }
      bc = liveBroadcasts.poll()
    }
  }

  // ------------------------------------------------------------- training

  /** Forward pass: alpha(i) = Σ_{k=1..4, k≤i} alpha(i-k) · p(piece
    * ending at i), accumulated in ASCENDING k order — the exact float
    * evaluation order the oracle's `(((t1+t2)+t3)+t4)` expression uses. */
  private def forward(word: String, off: Array[Int], m: Probs): Array[Double] = {
    val n = off.length - 1
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var acc = 0.0
      var k = 1
      while (k <= MaxPieceLen && k <= i) {
        val p = m.prob(word.substring(off(i - k), off(i)))
        if (p >= 0.0) acc = acc + alpha(i - k) * p
        k += 1
      }
      alpha(i) = acc
      i += 1
    }
    alpha
  }

  /** Backward pass: beta(i) = Σ_{k} p(piece starting after i) · beta(i+k),
    * ascending k — mirrored float order, see [[forward]]. */
  private def backward(word: String, off: Array[Int], m: Probs): Array[Double] = {
    val n = off.length - 1
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    var i = n - 1
    while (i >= 0) {
      var acc = 0.0
      var k = 1
      while (k <= MaxPieceLen && k <= n - i) {
        val p = m.prob(word.substring(off(i), off(i + k)))
        if (p >= 0.0) acc = acc + p * beta(i + k)
        k += 1
      }
      beta(i) = acc
      i -= 1
    }
    beta
  }

  /** E-step contributions of one dictionary word: for every in-model
    * piece occurrence (start j, length k), the posterior expected count
    * gamma = alpha(j)·p·beta(j+k)/Z floored to fixed point and scaled by
    * the word count — float order ((alpha·p)·beta)/Z·1e12, the oracle's
    * expression verbatim. */
  private[pipeline] def occExpectations(
      word: String, cnt: Long, m: Probs): Iterator[(String, Long)] = {
    val off = cpOffsets(word)
    val n = off.length - 1
    val alpha = forward(word, off, m)
    val beta = backward(word, off, m)
    val z = alpha(n)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var j = 0
    while (j < n) {
      var k = 1
      while (k <= MaxPieceLen && j + k <= n) {
        val piece = word.substring(off(j), off(j + k))
        val p = m.prob(piece)
        if (p >= 0.0) {
          val e = math.floor(alpha(j) * p * beta(j + k) / z * FixedPoint).toLong
          out += ((piece, e * cnt))
        }
        k += 1
      }
      j += 1
    }
    out.iterator
  }

  /** Viterbi best segmentation under the frozen model. Ties in path
    * probability break to the LONGEST candidate piece (descending-k scan
    * with strictly-greater replacement == the oracle's longest-first
    * CASE). A codepoint absent from the model segments as a lone piece
    * with probability 0 (open-vocabulary fallback for encode-time
    * corpora; never exercised by the oracle, whose train and encode
    * corpora coincide). */
  private[pipeline] def viterbiTokens(word: String, m: Probs): Array[String] = {
    val off = cpOffsets(word)
    val n = off.length - 1
    if (n == 0) return Array.empty
    val v = new Array[Double](n + 1)
    val bk = new Array[Int](n + 1)
    v(0) = 1.0
    var i = 1
    while (i <= n) {
      var best = -2.0
      var bestK = 1
      var k = math.min(MaxPieceLen, i)
      while (k >= 1) {
        val piece = word.substring(off(i - k), off(i))
        val p = if (k == 1) math.max(m.prob(piece), 0.0) else m.prob(piece)
        if (p >= 0.0) {
          val q = v(i - k) * p
          if (q > best) { best = q; bestK = k }
        }
        k -= 1
      }
      v(i) = best
      bk(i) = bestK
      i += 1
    }
    var cnt = 0
    i = n
    while (i > 0) { cnt += 1; i -= bk(i) }
    val toks = new Array[String](cnt)
    i = n
    var t = cnt - 1
    while (i > 0) { toks(t) = word.substring(off(i - bk(i)), off(i)); t -= 1; i -= bk(i) }
    toks
  }

  /** Greedy longest-match (maximum munch) segmentation — WordPiece-style
    * INFERENCE under the same frozen piece inventory [[viterbiTokens]]
    * scores probabilistically: at each position take the longest piece
    * (≤ [[MaxPieceLen]] codepoints) present in the model, falling back
    * to the lone codepoint when nothing matches (open-vocabulary
    * passthrough, the Viterbi fallback's twin). No probabilities touched
    * — the mirror oracle is pure string joins. */
  private[pipeline] def greedyTokens(word: String, m: Probs): Array[String] = {
    val off = cpOffsets(word)
    val n = off.length - 1
    if (n == 0) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      var k = math.min(MaxPieceLen, n - i)
      var taken = 1
      var found = false
      while (k >= 2 && !found) {
        if (m.prob(word.substring(off(i), off(i + k))) >= 0.0) {
          taken = k; found = true
        }
        k -= 1
      }
      out += word.substring(off(i), off(i + taken))
      i += taken
    }
    out.toArray
  }

  /** [[encode]]'s greedy twin: Viterbi replaced by [[greedyTokens]],
    * same output shape and separators. */
  def encodeGreedy(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = model.select(col("piece"), col("e").cast("long"),
        col("p").cast("double"))
      .as[(String, Long, Double)].collect().toSeq
    val probs = toProbs(rows)
    // per-executor memo bound to THIS segmenter — see [[EncodeMemo]]
    val bc = spark.sparkContext.broadcast(
      new EncodeMemo(w => greedyTokens(w, probs).mkString("|")))
    liveBroadcasts.add(bc)
    val tokUdf = udf((w: String) => bc.value(w))
    assemble(docs, idCol, textCol, tokUdf)
  }

  /** Codepoint-order string comparison (UTF-8 binary order — the
    * oracle's default collation); differs from String.compareTo only for
    * supplementary-plane codepoints. */
  private[pipeline] def cpLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    a.length < b.length
  }

  /** The shared word dictionary: lowercased whitespace tokens and their
    * corpus counts — the [[Bpe]] trainer's input, re-derived here. */
  private def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(
        filter(split(lower(col(textCol)), " "), w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  private def isSingleCp(s: String): Boolean =
    s.codePointCount(0, s.length) == 1

  /** One distributed E-step + driver M-step: expected fixed-point counts
    * per piece (integer shuffle sum), singles floored at 1 (coverage),
    * zero-count multis dropped, optional prune to the top `keepMultis`
    * multi-codepoint pieces by (count desc, piece asc). Returns
    * (piece, e, p) with p = e/T over the kept total. */
  private def emRound(
      dict: DataFrame, model: Seq[(String, Long, Double)],
      keepMultis: Option[Int]): Seq[(String, Long, Double)] = {
    val spark = dict.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(toProbs(model))
    val eRows =
      try dict.select(col("word"), col("cnt")).as[(String, Long)]
        .flatMap { case (w, c) => occExpectations(w, c, bc.value) }
        .toDF("piece", "occ")
        .groupBy(col("piece")).agg(sum(col("occ")).as("e"))
        .as[(String, Long)].collect()
      finally bc.destroy()
    val singles = eRows.filter(r => isSingleCp(r._1))
      .map { case (piece, e) => (piece, math.max(e, 1L)) }
    val multisAll = eRows.filter(r => !isSingleCp(r._1) && r._2 > 0L)
    val multis = keepMultis match {
      case Some(v) =>
        multisAll.sortWith { (a, b) =>
          a._2 > b._2 || (a._2 == b._2 && cpLess(a._1, b._1))
        }.take(v)
      case None => multisAll
    }
    val kept = (singles ++ multis).toSeq
    val total = kept.map(_._2).sum
    kept.map { case (piece, e) => (piece, e, e.toDouble / total.toDouble) }
  }

  private[pipeline] def trainedModel(
      docs: DataFrame, textCol: String, seedSize: Int, vocabSize: Int,
      minSeedCount: Long): Seq[(String, Long, Double)] = {
    val sc = docs.sparkSession.sparkContext
    val key = s"${sc.applicationId}@${sc.startTime}|" +
      s"${docs.queryExecution.analyzed.semanticHash()}|$textCol|" +
      s"$seedSize|$vocabSize|$minSeedCount"
    val cached = modelCache.get(key)
    if (cached != null) return cached
    val built = runTraining(docs, textCol, seedSize, vocabSize, minSeedCount)
    val prev = modelCache.putIfAbsent(key, built)
    if (prev != null) prev else built
  }

  private def runTraining(
      docs: DataFrame, textCol: String, seedSize: Int, vocabSize: Int,
      minSeedCount: Long): Seq[(String, Long, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = wordDict(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      dict.count() // materialize once; both EM passes and the seed reuse it
      // Seed weights: every (start, len ≤ 4) codepoint substring of every
      // dictionary word, weighted by word count (overlapping occurrences
      // all count — plain substring frequency).
      val subs = dict.as[(String, Long)].flatMap { case (w, c) =>
        val off = cpOffsets(w); val n = off.length - 1
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var j = 0
        while (j < n) {
          var k = 1
          while (k <= MaxPieceLen && j + k <= n) {
            out += ((w.substring(off(j), off(j + k)), c)); k += 1
          }
          j += 1
        }
        out
      }.toDF("piece", "w").groupBy(col("piece")).agg(sum(col("w")).as("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (seed, w0) =
        try {
          // All single codepoints (the alphabet — bounded) are always
          // kept; multi-codepoint seeds take the top `seedSize` by
          // (weight desc, piece asc) via TakeOrderedAndProject — the
          // only rows that ever reach the driver.
          val singleCp = udf((s: String) => isSingleCp(s))
          val singles = subs.where(singleCp(col("piece")))
            .as[(String, Long)].collect()
          val topMultis = subs
            .where(!singleCp(col("piece")) && col("w") >= minSeedCount)
            .orderBy(col("w").desc, col("piece").asc)
            .limit(seedSize)
            .as[(String, Long)].collect()
          (singles ++ topMultis, (singles ++ topMultis).map(_._2).sum)
        } finally subs.unpersist()
      val m0 = seed.toSeq.map { case (piece, w) =>
        (piece, w, w.toDouble / w0.toDouble)
      }
      // seed → EM1 → prune → EM2 (the fixed schedule the oracle unrolls)
      val m1 = emRound(dict, m0, keepMultis = Some(vocabSize))
      emRound(dict, m1, keepMultis = None)
    } finally dict.unpersist()
  }

  /**
   * Train the unigram-LM tokenizer over the whitespace-tokenized,
   * lowercased corpus. Returns the final model `(piece, e, p)`: the
   * fixed-point expected count after the last EM round and the piece
   * probability e/Σe. `vocabSize` bounds the MULTI-codepoint vocabulary
   * at the pruning step; every single codepoint is always retained.
   */
  def trainModel(
      docs: DataFrame, textCol: String, seedSize: Int = 2000,
      vocabSize: Int = 500, minSeedCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainedModel(docs, textCol, seedSize, vocabSize, minSeedCount)
      .toDF("piece", "e", "p")
  }

  /** Persist a trained model as parquet — the shipped tokenizer artifact
    * (train once, encode everywhere; the [[Bpe.saveMerges]] lifecycle).
    * One file: the model is ≤ seedSize + alphabet rows. */
  def saveModel(model: DataFrame, path: String): Unit =
    model
      .select(col("piece"), col("e").cast("long").as("e"),
        col("p").cast("double").as("p"))
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Load a [[saveModel]] artifact back into encode-ready form. EAGER —
    * rows are collected immediately (bounded: the vocab size), so the
    * artifact directory may be deleted once this returns. */
  def loadModel(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("piece"), col("e").cast("long"), col("p").cast("double"))
      .as[(String, Long, Double)].collect().toSeq
      .toDF("piece", "e", "p")
  }

  /**
   * Encode every document by Viterbi segmentation under an EXTERNAL
   * frozen model — the shipped-artifact path. Output matches
   * [[Bpe.encode]]: `(idCol, n_words, n_tokens, encoded)` with `|`
   * joining pieces within a word and spaces between words in document
   * order (the `|`-free-corpus contract of [[Bpe.encode]] applies).
   * Documents with zero words produce no row.
   */
  def encode(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = model.select(col("piece"), col("e").cast("long"),
        col("p").cast("double"))
      .as[(String, Long, Double)].collect().toSeq
    encodeWithModel(docs, idCol, textCol, rows)
  }

  /** Encode under a tokenizer trained ON THIS CORPUS — the self-train
    * convenience overload; training cost is shared with [[trainModel]]
    * through the keyed model cache. */
  def encode(
      docs: DataFrame, idCol: String, textCol: String, seedSize: Int,
      vocabSize: Int, minSeedCount: Long): DataFrame =
    encodeWithModel(docs, idCol, textCol,
      trainedModel(docs, textCol, seedSize, vocabSize, minSeedCount))

  private def encodeWithModel(
      docs: DataFrame, idCol: String, textCol: String,
      model: Seq[(String, Long, Double)]): DataFrame = {
    val spark = docs.sparkSession
    val probs = toProbs(model)
    // per-executor memo bound to THIS segmenter — see [[EncodeMemo]]
    val bc = spark.sparkContext.broadcast(
      new EncodeMemo(w => viterbiTokens(w, probs).mkString("|")))
    liveBroadcasts.add(bc)
    val tokUdf = udf((w: String) => bc.value(w))
    assemble(docs, idCol, textCol, tokUdf)
  }

  /** The shared document-reassembly shape (the [[Bpe.encode]] plan):
    * per-occurrence in-scan word encode, one aggregation by doc id. */
  private def assemble(
      docs: DataFrame, idCol: String, textCol: String,
      tokUdf: org.apache.spark.sql.expressions.UserDefinedFunction): DataFrame = {
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
