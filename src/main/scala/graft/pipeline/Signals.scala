package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-quality signal operators a training-data pipeline runs between
 * dedup and sampling: repetition scoring (the Gopher-style "fraction of
 * n-gram occurrences in repeated n-grams" family), out-of-vocabulary rate
 * against the corpus's own top-V vocabulary (the CCNet-style perplexity
 * proxy without a model), and benchmark-contamination measurement
 * (n-gram overlap between an eval split and every training document).
 *
 * All outputs are exact integer counts plus ratios of those counts, so
 * every operator is DuckDB-oracle-checkable bit-for-bit. Scale shape per
 * operator is documented inline; none is all-pairs, none collects data to
 * the driver.
 */
object Signals {

  /** Non-distinct word n-grams — unlike [[Dedup.shingleSet]] the multiset
    * is kept: repetition metrics are ABOUT the repeats. */
  private[pipeline] def ngramList(text: String, n: Int): Seq[String] = {
    val words =
      if (text == null) Array.empty[String]
      else text.toLowerCase.split(' ').filter(_.nonEmpty)
    if (words.length < n) Seq.empty
    else {
      val out = new Array[String](words.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j)); j += 1
        }
        out(i) = sb.toString; i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  /** One-pass UDF for the same reason as [[Dedup.shingles]]: the
    * equivalent `transform(sequence)` HOF pipeline is interpreted and
    * re-splits the text per gram. */
  def ngrams(text: Column, n: Int): Column = {
    val f = udf((t: String) => ngramList(t, n))
    f(text)
  }

  /**
   * Repetition signals over word n-grams (default bigrams), per document:
   * total n-gram occurrences, the most frequent n-gram's count, the number
   * of occurrences belonging to n-grams seen more than once, and the two
   * ratios (Gopher's "top n-gram fraction" / "duplicate n-gram fraction"
   * quality rules). Documents too short for an n-gram report zero counts
   * and null fractions.
   *
   * Scale shape: explode -> two partial-aggregated groupBys keyed by
   * (doc, gram) then doc — both map-side combinable, one shuffle each,
   * no join wider than the (tiny) per-doc aggregate.
   */
  def repetition(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val grams = docs.select(col(idCol), explode(ngrams(col(textCol), n)).as("gram"))
    val cnts = grams.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
    val agg = cnts.groupBy(col(idCol)).agg(
      sum(col("cnt")).as("n_grams"),
      max(col("cnt")).as("top_cnt"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup_cnt"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"),
        coalesce(col("dup_cnt"), lit(0L)).as("dup_cnt"),
        (col("top_cnt").cast("double") / col("n_grams")).as("top_frac"),
        (col("dup_cnt").cast("double") / col("n_grams")).as("dup_frac"))
  }

  /**
   * Out-of-vocabulary rate: per document, the fraction of token
   * occurrences not in the corpus's top-`vocabSize` vocabulary
   * (frequency desc, term asc tie-break — a total order, so the cut is
   * deterministic on any engine). A model-free fluency proxy: word-salad
   * and boilerplate skew toward rare tails.
   *
   * Scale shape: one token explode feeding (a) a partial-aggregated term
   * count whose top-V survives as a broadcast dictionary — the same
   * bounded-metadata contract as the FP-Growth L1 dictionary — and (b) a
   * broadcast-joined per-doc recount. Documents with zero tokens produce
   * no row (they have no occurrences to rate).
   */
  def oovRate(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 20): DataFrame = {
    val toks = docs.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_frac"))
  }

  /**
   * Benchmark contamination: for every training document (rows where
   * `evalPred(id)` is false), the fraction of its distinct word n-grams
   * that appear anywhere in the eval split (rows where it is true) — the
   * standard n-gram-overlap decontamination check run before training.
   *
   * Scale shape: both sides come out of the ONE cached shingle index
   * (shared with the Jaccard/MinHash dedup queries — the corpus-wide
   * explode runs once per corpus, not once per consumer). The eval gram
   * set is benchmark-sized, so it broadcasts; the training side never
   * shuffles wider than its own per-doc counts. Training docs too short
   * for an n-gram produce no row.
   */
  def contamination(
      docs: DataFrame, idCol: String, textCol: String,
      evalPred: Column => Column, n: Int = 5): DataFrame = {
    val idx = Dedup.shingleIndex(docs, idCol, textCol, n, maxShingleDF = 0L)
    val ev = idx.where(evalPred(col("doc"))).select(col("gram")).distinct()
    val tr = idx.where(!evalPred(col("doc")))
    val tot = tr.groupBy(col("doc")).agg(count(lit(1)).as("n_grams"))
    val hit = tr.join(broadcast(ev), Seq("gram"))
      .groupBy(col("doc")).agg(count(lit(1)).as("n_contam"))
    tot.join(hit, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        col("n_grams"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"),
        (coalesce(col("n_contam"), lit(0L)).cast("double") / col("n_grams"))
          .as("contam_frac"))
  }

  /**
   * Repeated-span analysis (the exact-substring dedup signal of Lee et
   * al., "Deduplicating Training Data Makes Language Models Better",
   * restricted to fixed-width token windows): for every document, how
   * many of its distinct `w`-token spans occur in at least one OTHER
   * document — long verbatim overlaps that near-dup scoring at the
   * whole-document level misses.
   *
   * Scale shape: the span index comes out of the shared shingle cache
   * (one corpus explode for all span/dedup consumers); corpus-wide span
   * frequency is a window count over the span key — ONE shuffle on span,
   * one on doc, never a self-join (the n² pair structure is irrelevant
   * here: only each span's document frequency matters). Docs shorter
   * than `w` tokens produce no row.
   */
  def repeatedSpans(
      docs: DataFrame, idCol: String, textCol: String, w: Int = 8): DataFrame = {
    val idx = Dedup.shingleIndex(docs, idCol, textCol, w, maxShingleDF = 0L)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    idx.withColumn("df", count(lit(1)).over(wg))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_repeated"))
      .select(col("doc").as(idCol), col("n_spans"), col("n_repeated"),
        (col("n_repeated").cast("double") / col("n_spans")).as("repeated_frac"))
  }

  /**
   * Sliding n-grams of an array column, generated shuffle-free inside
   * the scan: n aligned slices zipped positionally. `greatest(..., 0)`
   * guards the slice length — ANSI mode throws on negative lengths for
   * arrays shorter than n (which instead produce zero n-grams). Fields
   * of the zipped struct are positional ("0".."n-1").
   */
  private[graft] def sliceNgrams(arr: Column, n: Int): Column = {
    val len = greatest(size(arr) - (n - 1), lit(0))
    arrays_zip((1 to n).map(k => slice(arr, lit(k), len)): _*)
  }

  /**
   * Bigram language-model table: for every adjacent lowercase word pair
   * across the corpus, its count and the conditional probability
   * `p(w2 | w1) = cnt(w1 w2) / cnt(w1 ·)`, restricted to pairs seen at
   * least `minCount` times — the classic count-based LM used for
   * perplexity-proxy quality scoring and corpus drift checks.
   *
   * Scale shape: pairs are generated shuffle-free inside the scan (slice
   * + zip of the token array, no posexplode self-join), then ONE
   * partial-aggregated shuffle reduces the corpus to the bigram table;
   * the `w1` marginal is re-aggregated from that already-reduced table
   * (vocabulary-sized, not corpus-sized) and joined back broadcast. The
   * probability is a ratio of exact counts, so cross-engine
   * bit-reproducible.
   *
   * The returned frame is materialized once per (session, input plan,
   * params) through the same keyed cache as the shingle index and the
   * winnow sketch: the LM table itself and every consumer that joins
   * against it ([[lmScore]]) share ONE corpus scan + pair aggregation
   * instead of rebuilding the model per query.
   */
  def bigramModel(
      docs: DataFrame, textCol: String, minCount: Long = 5L): DataFrame =
    cachedLm(docs, textCol, minCount).df

  private def cachedLm(
      docs: DataFrame, textCol: String, minCount: Long): CachedLm = {
    val sc = docs.sparkSession.sparkContext
    val key = s"${sc.applicationId}@${sc.startTime}|" +
      s"${docs.queryExecution.analyzed.semanticHash()}|$textCol|$minCount"
    val cached = lmCache.get(key)
    if (cached != null) return cached
    val built = new CachedLm(buildBigramModel(docs, textCol, minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val prev = lmCache.putIfAbsent(key, built)
    if (prev != null) { built.df.unpersist(); prev } else built
  }

  /** The uncached LM build plan (plan-spec'd directly: one scan, one
    * generate, two exchanges). */
  private[graft] def buildBigramModel(
      docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val words = filter(split(lower(col(textCol)), " "), w => w =!= "")
    val pairs = docs.select(words.as("ws"))
      .select(explode(sliceNgrams(col("ws"), 2)).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2"))
    val cnt = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    // w1 marginal as a WINDOW over the aggregated table, not a second
    // groupBy + join: referencing `cnt` twice would re-run the corpus
    // scan + pair generation (the q35 double-aggregate lesson). One
    // aggregate subtree, one vocabulary-sized window exchange on w1.
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    cnt.withColumn("w1_cnt", sum(col("cnt")).over(wTot))
      .where(col("cnt") >= minCount)
      .select(col("w1"), col("w2"), col("cnt"), col("w1_cnt"),
        (col("cnt").cast("double") / col("w1_cnt")).as("cond_p"))
  }

  // One materialized LM per (session, input plan, textCol, minCount) —
  // the shingle-index/winnow-sketch discipline (see Dedup.indexCache):
  // q53 (the declared LM table) and q66 (per-doc scoring) share one
  // corpus scan, and repeated lmScore calls never rebuild the model.
  // The row count memoizes lazily beside the frame: the LM is immutable
  // once cached, so the broadcast size gate pays one cached-scan count
  // on FIRST use and is free on every later scoring call.
  private final class CachedLm(val df: DataFrame) {
    lazy val rows: Long = df.count()
  }
  private val lmCache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedLm]()

  /** Unpersist and drop every cached bigram LM (mirrors Dedup's). */
  def clearCaches(): Unit = {
    lmCache.values.forEach { c =>
      try c.df.unpersist() catch { case _: Throwable => }
    }
    lmCache.clear()
  }

  /**
   * Per-document quality score under the corpus bigram LM
   * ([[bigramModel]]) — the CCNet-style LM-filter signal family: how much
   * of a document the corpus model recognizes, and how probable its
   * transitions are. Deliberately NOT log-perplexity: `log` differs in
   * final ulps across engines/libms, so the score is expressed in
   * cross-engine-EXACT arithmetic instead —
   *
   *  - `n_bigrams` / `n_known`: occurrence counts (known = the LM has the
   *    pair at `minCount` support);
   *  - `known_rate`: their ratio (a direct IEEE division of counts);
   *  - `sum_condp_e12`: sum of the conditional probabilities in 1e-12
   *    fixed point (`floor(p * 1e12)` per occurrence — floor has no
   *    rounding ties — summed as exact BIGINTs, order-independent).
   *
   * Scale shape: the LM comes out of [[bigramModel]]'s keyed cache (one
   * corpus scan + pair aggregation shared with the declared LM-table
   * query), and the probe join is SIZE-GATED, not hint-forced: the
   * materialized LM's measured row count decides between a broadcast
   * probe (at or below `broadcastMaxRows`) and a shuffled sort-merge
   * join on `(w1, w2)` (above it). A web-scale corpus's count>=minCount
   * bigram table runs to billions of rows / tens of GB — unconditionally
   * broadcasting it would OOM the driver and every executor, so the
   * large regime must keep both sides shuffled. Doc bigrams are generated
   * shuffle-free inside the scan (slice + zip, no self-join); ONE
   * aggregation by doc id. Low-scoring docs are what a curation pass
   * drops as gibberish / boilerplate / wrong-language.
   *
   * `broadcastMaxRows` defaults to 1M pairs — ~40 MB of (w1, w2, cond_p)
   * strings+double in a broadcast hash table, the same order as a
   * generously-raised `autoBroadcastJoinThreshold`, far below executor
   * memory. The count that feeds the gate is memoized beside the cached
   * LM: the first scoring call pays one cached-LM scan (doubling as the
   * materialization action), later calls read the remembered count —
   * never a model rebuild, and after the first call not even a scan.
   */
  def lmScore(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, broadcastMaxRows: Long = 1L << 20): DataFrame = {
    val cached = cachedLm(docs, textCol, minCount)
    val model = cached.df.select(col("w1"), col("w2"), col("cond_p"))
    // memoized beside the cache entry: the first scoring call pays one
    // cached-LM scan (doubling as the materialization action), every
    // later call reads the remembered count — the gate itself is free
    val lmRows = cached.rows
    val lm = if (lmRows <= broadcastMaxRows) broadcast(model) else model
    val words = filter(split(lower(col(textCol)), " "), w => w =!= "")
    // explode_outer: a doc with < 2 tokens yields one null-bigram row, so
    // it still scores (0, 0, 0.0, 0) instead of vanishing
    val pairs = docs.select(col(idCol).as("doc_id"),
        explode_outer(sliceNgrams(words, 2)).as("bg"))
      .select(col("doc_id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
    pairs.join(lm, Seq("w1", "w2"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("w1")).as("n_bigrams"),
        count(col("cond_p")).as("n_known"),
        coalesce(sum(floor(col("cond_p") * lit(1e12)).cast("long")), lit(0L))
          .as("sum_condp_e12"))
      .withColumn("known_rate",
        when(col("n_bigrams") > 0,
          col("n_known").cast("double") / col("n_bigrams"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_bigrams"), col("n_known"),
        col("known_rate"), col("sum_condp_e12"))
  }

  /**
   * STUPID-BACKOFF bigram scoring (Brants et al. 2007, "Large Language
   * Models in Machine Translation") — the graded extension of
   * [[lmScore]], whose raw conditional-probability sum gives an
   * unseen-bigram document no signal at all: a bigram the pruned LM
   * does not contain backs off to its unigram relative frequency scaled
   * by the fixed weight alpha = 0.4 (the paper's constant),
   *
   *   S(w2 | w1) = cond_p(w1, w2)            if count(w1,w2) >= minCount
   *              = 0.4 * count(w2) / T       otherwise,
   *
   * where `count(w2)` is the corpus unigram count and `T` the corpus
   * token total — so every document scores on every bigram. Not
   * normalized (stupid backoff deliberately is not a probability
   * distribution — the paper's point is that at corpus scale the
   * unnormalized score ranks as well as Kneser-Ney at a fraction of
   * the cost).
   *
   * Arithmetic discipline (the q66/q162 convention): each term is
   * exact-integer counts finished by a PINNED order of IEEE steps —
   * known: `floor((cnt / w1_cnt) * 1e12)`; backoff:
   * `floor(w2_cnt / T * 4e11)` (0.4 * 1e12 = 4e11, exactly
   * representable) — summed as longs, so a DuckDB oracle replaying the
   * same expressions hash-matches exactly.
   *
   * Scale shape: one corpus scan feeds the (cached) LM and one more
   * the unigram table; scoring is one bigram explode, a left join
   * against the minCount-pruned LM (broadcast when bounded), an
   * equi-join against the vocabulary-sized unigram table, and one
   * partial-aggregated groupBy per doc. `T` is one scalar of driver
   * metadata.
   */
  def lmScoreBackoff(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, broadcastMaxRows: Long = 1L << 20): DataFrame = {
    val cached = cachedLm(docs, textCol, minCount)
    val model = cached.df.select(col("w1"), col("w2"), col("cond_p"))
    val lm = if (cached.rows <= broadcastMaxRows) broadcast(model) else model
    val uni = unigramCounts(docs, textCol)
    val totalTokens = uni.agg(sum(col("w2_cnt")))
      .collect().headOption.flatMap(r => Option(r.get(0)))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    scoreBackoffWithModel(docs, idCol, textCol, lm, uni, totalTokens)
  }

  /** Corpus unigram table `(w2, w2_cnt)` — the backoff distribution's
    * numerator (named `w2` because the backoff weight of a bigram is
    * looked up by its SECOND word). */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame = {
    val words = filter(split(lower(col(textCol)), " "), w => w =!= "")
    docs.select(explode(words).as("w2"))
      .groupBy(col("w2")).agg(count(lit(1)).as("w2_cnt"))
  }

  /** The scoring half of [[lmScoreBackoff]], parameterized by the model
    * frames — the SAME function serves the batch row (cached model) and
    * the streaming gate's per-batch probe (loaded artifact), so
    * stream == batch is equality by construction, not by parallel
    * implementations. */
  private[graft] def scoreBackoffWithModel(
      docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, uni: DataFrame, totalTokens: Long): DataFrame = {
    val words = filter(split(lower(col(textCol)), " "), w => w =!= "")
    val pairs = docs.select(col(idCol).as("doc_id"),
        explode_outer(sliceNgrams(words, 2)).as("bg"))
      .select(col("doc_id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
    val knownTerm = floor(col("cond_p") * lit(1e12)).cast("long")
    val backoffTerm = floor(col("w2_cnt").cast("double") /
      lit(totalTokens.toDouble) * lit(4.0e11)).cast("long")
    pairs
      .join(lm, Seq("w1", "w2"), "left")
      .join(uni, Seq("w2"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("w1")).as("n_bigrams"),
        count(col("cond_p")).as("n_known"),
        (count(col("w1")) - count(col("cond_p"))).as("n_backoff"),
        coalesce(sum(
          when(col("cond_p").isNotNull, knownTerm).otherwise(backoffTerm)),
          lit(0L)).as("score_e12"))
      .select(col("doc_id"), col("n_bigrams"), col("n_known"),
        col("n_backoff"), col("score_e12"))
  }

  /** The persisted LM ARTIFACT: the pruned bigram table, the unigram
    * (backoff) table, and the corpus token total. */
  final case class LmArtifact(
      bigrams: DataFrame, unigrams: DataFrame, totalTokens: Long)

  /**
   * Persist the bigram LM as a SERVABLE artifact (the q83/q163
   * lifecycle for the LM-filter family): `path/bigrams` — the full
   * [[bigramModel]] table, `path/unigrams` — [[unigramCounts]],
   * `path/meta` — one row holding the token total. A scoring service
   * (or the q176 streaming gate) loads this and never re-reads the
   * reference corpus; both model tables are vocabulary-sized, the meta
   * a single row.
   */
  def saveLmArtifact(
      docs: DataFrame, textCol: String, minCount: Long, path: String): Unit = {
    val spark = docs.sparkSession
    cachedLm(docs, textCol, minCount).df
      .write.mode("overwrite").parquet(s"$path/bigrams")
    val uni = unigramCounts(docs, textCol)
    uni.write.mode("overwrite").parquet(s"$path/unigrams")
    val total = spark.read.parquet(s"$path/unigrams")
      .agg(sum(col("w2_cnt")).as("total_tokens"))
    total.coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[saveLmArtifact]] directory. The token total is one row of
    * metadata (bounded driver read). */
  def loadLmArtifact(
      spark: org.apache.spark.sql.SparkSession, path: String): LmArtifact = {
    val total = spark.read.parquet(s"$path/meta")
      .collect().headOption.flatMap(r => Option(r.get(0)))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    LmArtifact(
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/unigrams"), total)
  }

  /**
   * [[contamination]] with a Bloom-filter prefilter on the training side
   * — the shape that survives when the eval gram set is too large to
   * broadcast exactly. The filter is built by a mergeable one-pass
   * aggregate ([[graft.functions.BloomFilterAgg]]: fixed `numBits/8`
   * bytes per partial, OR-merged), so only a fixed-size sketch ever
   * reaches the driver; the training side drops every gram the filter
   * rejects BEFORE the verify join, shipping `true-hits + fp-rate * n`
   * rows instead of all n. Bloom filters have no false negatives and the
   * verify join is exact, so the output is row-identical to
   * [[contamination]] (spec-enforced, same oracle).
   */
  def contaminationBloom(
      docs: DataFrame, idCol: String, textCol: String,
      evalPred: Column => Column, n: Int = 5,
      numBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    import graft.functions.Bloom
    val idx = Dedup.shingleIndex(docs, idCol, textCol, n, maxShingleDF = 0L)
    // Persisted: the distinct eval-gram set feeds BOTH the bloom build
    // (materialized eagerly by the head() action below) and the verify
    // join — without the persist the eval-side distinct shuffle runs
    // twice. Stays cached for the session like the shingle index itself;
    // a sweeping session can unpersist it once consumed.
    val ev = idx.where(evalPred(col("doc"))).select(col("gram")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bytes = ev.agg(Bloom.bloom_agg(col("gram"), numBits, numHashes))
      .head().getAs[Array[Byte]](0)
    val bc = docs.sparkSession.sparkContext.broadcast(Bloom.fromBytes(bytes))
    // UDF, not per-row expression: the probe reads the broadcast word
    // array directly — no per-row filter deserialization.
    val mightContain = udf { g: Long => Bloom.mightContain(bc.value, numHashes, g) }
    val tr = idx.where(!evalPred(col("doc")))
    val tot = tr.groupBy(col("doc")).agg(count(lit(1)).as("n_grams"))
    val hit = tr.where(mightContain(col("gram")))
      .join(ev, Seq("gram")) // exact verify: Bloom false positives die here
      .groupBy(col("doc")).agg(count(lit(1)).as("n_contam"))
    tot.join(hit, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        col("n_grams"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"),
        (coalesce(col("n_contam"), lit(0L)).cast("double") / col("n_grams"))
          .as("contam_frac"))
  }

  /**
   * Incremental (batch-vs-corpus) near-dedup: for each document in the
   * incoming batch (`batchPred(id)` true), count existing-corpus documents
   * within `threshold` n-gram Jaccard and flag `keep` when there are none
   * — the shape dedup takes in a continuously-ingesting pipeline, where
   * re-deduping the full corpus per batch would be quadratic over time.
   *
   * Scale shape: the batch side of the inverted-index join is batch-sized;
   * the corpus side is touched only where grams collide. Candidate
   * generation and intersection counting are one join (as in
   * [[Dedup.ngramJaccardPairs]]); `maxShingleDF` pruning composes if the
   * corpus needs stop-gram bounding. Batch docs with no grams keep
   * trivially (n_dups 0).
   */
  def incrementalDedup(
      docs: DataFrame, idCol: String, textCol: String,
      batchPred: Column => Column, n: Int = 5,
      threshold: Double = 0.5, maxShingleDF: Long = 0L): DataFrame = {
    val idx = Dedup.shingleIndex(docs, idCol, textCol, n, maxShingleDF)
    val b = idx.where(batchPred(col("doc"))).select(col("doc").as("d1"), col("gram"))
    val c = idx.where(!batchPred(col("doc")))
      .select(col("doc").as("d2"), col("gram").as("gram2"))
    val inter = b.join(c, col("gram") === col("gram2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
    val dups = Dedup.jaccardScored(inter, idx, threshold)
      .groupBy(col("d1")).agg(count(lit(1)).as("n_dups"))
    docs.where(batchPred(col(idCol))).select(col(idCol))
      .join(dups, col(idCol) === col("d1"), "left")
      .select(col(idCol),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("n_dups"), lit(0L)) === 0L).as("keep"))
  }
}
