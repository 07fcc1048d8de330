package graft.pipeline

import graft.functions.RollingHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators (language ID, quality scoring, token counting,
 * fingerprinting) as pure Catalyst expressions — every op is codegen'd
 * column algebra, no UDF on the scan path, so a 100 TB pass stays inside
 * whole-stage codegen. All ratios are divisions of exact integer counts
 * (bit-reproducible on any engine).
 */
object TextStats {

  /** Per-language marker lexica for the n-gram/stopword-vote heuristic. */
  val Lexica: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en"))

  private def toks(text: Column): Column = Dedup.tokens(text)

  /** Hits of `words` among the text's tokens (multiset count). */
  def lexiconHits(text: Column, words: Seq[String]): Column =
    size(filter(toks(text), t => t.isInCollection(words)))

  /**
   * Deterministic language ID: the language with the most marker-word
   * hits; ties broken by language code; "und" (undetermined) when no
   * marker hits at all.
   */
  def langId(text: Column): Column = {
    val langsAsc = Lexica.keys.toSeq.sorted
    // struct sort is lexicographic on (hits, pri): descending sort with
    // pri = reversed alphabetical rank breaks hit-ties toward the
    // alphabetically smaller language code.
    val scored = langsAsc.zipWithIndex.map { case (lang, i) =>
      struct(
        lexiconHits(text, Lexica(lang)).as("hits"),
        lit(langsAsc.length - 1 - i).as("pri"),
        lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /**
   * Quality features: char/word counts, mean word length, punctuation and
   * stopword ratios, plus a composite [0,1] score (a ratio of exact
   * integer counts — reproducible).
   */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = size(toks(t))
    val wordChars = aggregate(transform(toks(t), w => length(w)), lit(0), (a, x) => a + x)
    val punct = length(t) - length(regexp_replace(t, "[.,;:!?'\"()-]", ""))
    val stop = lexiconHits(t, Lexica("en"))
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      words.cast("long").as("n_words"),
      (wordChars.cast("double") / words).as("mean_word_len"),
      (punct.cast("double") / length(t)).as("punct_ratio"),
      (stop.cast("double") / words).as("stopword_ratio"))
  }

  /** Whitespace tokens + regex "BPE-ish" subtokens ([a-z]+ | digits | other). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(toks(t)).cast("long").as("ws_tokens"),
      regexp_count(lower(t), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("re_tokens"))
  }

  /**
   * TF-IDF over whitespace tokens, top-k terms per document.
   *
   * IDF is the RATIO form `(N + 1) / (df + 1)` rather than its log: exact
   * integer-derived double division, so scores are bit-reproducible on any
   * engine (log differs in the last ulp between libm implementations —
   * fatal for a hash-compared oracle; monotonicity, and therefore ranking,
   * is identical). Ties break by term asc.
   */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // count() on a parquet source is metadata-only (row-group counts) — not
    // a data scan; the single data pass below is the explode+groupBy.
    val n = docs.count()
    val terms = docs.select(col(idCol), explode(toks(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // df via a window over term instead of a second aggregate + join: the
    // explode+groupBy (the heavy pass over every token) runs ONCE, then one
    // narrow exchange of the (doc, term, tf) rows by term. The old
    // aggregate-then-join shape recomputed the full tf subtree on both join
    // sides — 2x the heaviest scan at 100 TB.
    val wTerm = Window.partitionBy(col("term"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(wTerm))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") * (lit((n + 1).toDouble) / (col("df") + 1)))
          .as("tfidf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /**
   * Top-`vocabSize` terms by (count desc, term asc). Plans as
   * `TakeOrderedAndProject` over the partial-aggregated term counts —
   * bounded per-partition heaps, so the corpus-vocabulary-sized term table
   * is never globally sorted and never flows through an unpartitioned
   * window (the [[graft.pipeline.Signals.oovRate]] shape).
   */
  def topTerms(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame =
    docs.select(explode(toks(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)

  /**
   * Frequency-ranked vocabulary build + token-id encoding — the final
   * tokenize step of a training-data pipeline, with a count-based vocab
   * standing in for a learned BPE merge table: id = dense rank by
   * (count desc, term asc) over the top `vocabSize` terms, OOV encoded
   * as -1, each document emitted as its in-order id array.
   *
   * Scale shape: the corpus reduces to (term, count) in one
   * partial-aggregated shuffle; the top-`vocabSize` cut is a
   * [[topTerms]] `orderBy(...).limit(...)` — `TakeOrderedAndProject`,
   * bounded per-partition heaps, NEVER a global sort or an unpartitioned
   * window over the corpus-vocabulary-sized term table — and ids are
   * assigned on the driver over the ≤`vocabSize` collected rows (the same
   * bounded-metadata boundary as the mining L1 dictionary). The encode
   * side is a broadcast join of the vocab against the positional explode,
   * with per-doc reassembly ordered by position.
   *
   * The corpus IS scanned twice (vocab-build pass + encode pass) — the
   * deliberate side of a trade, same as [[graft.pipeline.Signals.oovRate]]:
   * the alternative (attach counts via a window over term) would shuffle
   * every token row by term, and at 100 TB a second columnar scan is far
   * cheaper than a corpus-wide shuffle. Callers doing both vocab-build
   * and encode repeatedly should persist the tokenized frame.
   */
  def tokenIds(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = docs.select(col(idCol),
      posexplode(toks(col(textCol))).as(Seq("pos", "term")))
    // (cnt desc, term asc) is a total order, so the collected rows arrive
    // fully ranked; the defensive driver re-sort costs O(V log V) on ≤V rows
    // and pins the id assignment to the declared order, not to collect().
    val vocab = topTerms(docs, textCol, vocabSize).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (term, cnt) => (-cnt, term) }
      .iterator.zipWithIndex
      .map { case ((term, _), i) => (term, i.toLong) }
      .toSeq.toDF("term", "tid")
    t.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), coalesce(col("tid"), lit(-1L)).as("tid")))),
        s => s.getField("tid")).as("ids"))
  }

  /**
   * Compression-ratio quality proxy (deflate level 6): low ratio =
   * repetitive/templated text. JVM Deflater output is deterministic for a
   * fixed level but not SQL-expressible — spec-covered, no oracle.
   */
  val compressionRatio: Column => Column = {
    val f = udf { (text: String) =>
      if (text == null || text.isEmpty) 1.0
      else {
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val deflater = new java.util.zip.Deflater(6)
        deflater.setInput(bytes)
        deflater.finish()
        val buf = new Array[Byte](bytes.length + 64)
        var total = 0
        while (!deflater.finished()) total += deflater.deflate(buf)
        deflater.end()
        total.toDouble / bytes.length
      }
    }
    (c: Column) => f(c)
  }

  /**
   * Document fingerprints: normalized-md5 (cross-engine checkable) and the
   * codegen'd Karp-Rabin [[RollingHash]] (the fast native path).
   */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      Dedup.fingerprint(col(textCol)).as("fingerprint_md5"),
      RollingHash.rolling_hash(
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ")).as("fingerprint_rk"))

  /** Email pattern shared by the Spark query and the DuckDB oracle — only
    * constructs whose semantics are identical between Java regex and RE2
    * (char classes, bounded/unbounded repeats; no backrefs, no lookaround). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NNN-NNN-NNNN phone shape (same cross-engine-safe construct set). */
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /**
   * PII detection + redaction — the pre-training curation step that must
   * run over EVERY byte of a corpus, so it has to stay a pure
   * codegen'd projection: per-doc match counts and the text with emails
   * then phone numbers replaced by placeholder tags. No shuffle, no UDF;
   * at 100 TB this is scan-bound, exactly as it should be. Replacement
   * order (emails first) is fixed so both engines produce identical text
   * when patterns could overlap.
   *
   * Counts are RAW-TEXT detections, not tag tallies: a phone-shaped run
   * swallowed by an email match (e.g. `555-123-4567@x.io`) counts in
   * `n_phones` but redacts as part of the `<EMAIL>` tag — the counts
   * answer "how much PII did the scanner see", not "how many tags were
   * emitted".
   */
  def piiRedact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
        .as("redacted"))
  }
}
