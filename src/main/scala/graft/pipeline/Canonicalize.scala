package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text CANONICALIZATION — the documented FIRST stage ahead of every
 * dedup pass. [[Dedup.fingerprint]] folds case and whitespace only; a
 * multilingual crawl defeats that immediately: the same sentence
 * arrives NFC-composed from one source and NFD-decomposed from another
 * (é as U+00E9 vs e+U+0301), full-width from CJK pages (ＡＢＣ vs ABC),
 * with typographic quotes/dashes from CMS rewriters (’ vs ', — vs -).
 * All of those hash to different fingerprints, so exact dedup silently
 * misses the bulk of cross-source duplicates — the q12 family's recall
 * depends on canonicalizing FIRST.
 *
 * Two strengths, both deterministic:
 *
 *  - [[canonical]] — Unicode NFC (canonical composition: é is é however
 *    it arrived) + typographic punctuation folding + case fold +
 *    whitespace collapse. NFC is what DuckDB's `nfc_normalize`
 *    computes, so this strength is fully ORACLE-CHECKABLE and is what
 *    the declared row (q149) runs.
 *  - [[canonicalNfkc]] — NFKC instead of NFC: the COMPATIBILITY
 *    decomposition additionally folds width variants (ＡＢＣ→ABC),
 *    ligatures (ﬁ→fi), superscripts and the like — the right strength
 *    for dedup recall on CJK/mixed corpora. DuckDB has no NFKC, so
 *    this strength is spec-pinned (planted mixed-width fixtures)
 *    rather than oracle-declared.
 *
 * Normalization runs through `java.text.Normalizer` (the JDK's
 * implementation of UAX #15 — the standardized algorithm both engines'
 * libraries implement, so NFC here == utf8proc NFC in DuckDB for any
 * assigned codepoint). A Scala UDF rather than a Catalyst expression:
 * normalization is an intrinsically library-backed per-string
 * transform (no arithmetic to codegen), it sits in an in-scan
 * projection with no shuffle on either side, and the downstream md5 /
 * shingle machinery stays codegen'd.
 *
 * Fold order is pinned (normalize → punct → case → whitespace) and must
 * stay byte-identical to the q149 oracle SQL — a reorder silently
 * changes fingerprints on non-ASCII corpora.
 */
object Canonicalize {

  /** Typographic punctuation folded 1:1 to ASCII (codepoint-wise
    * `translate`, identical in DuckDB): quotes U+2018-201B -> ',
    * double quotes U+201C-201F -> ", dashes U+2012-2015 -> -,
    * NBSP -> space (NFC does not fold it; NFKC does, kept here so BOTH
    * strengths agree on it). */
  private val PunctFrom =
    "\u2018\u2019\u201A\u201B" + "\u201C\u201D\u201E\u201F" +
      "\u2012\u2013\u2014\u2015" + "\u00A0"
  private val PunctTo = "''''" + "\"\"\"\"" + "----" + " "

  private val nfcUdf = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  private val nfkcUdf = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
  }

  /** Unicode NFC composition (null-safe). */
  def nfc(text: Column): Column = nfcUdf(text)

  /** Unicode NFKC compatibility composition (null-safe). */
  def nfkc(text: Column): Column = nfkcUdf(text)

  private def folds(normalized: Column): Column =
    trim(regexp_replace(lower(translate(normalized, PunctFrom, PunctTo)),
      "\\s+", " "))

  /** NFC + punct fold + case fold + whitespace collapse — the
    * oracle-checkable canonical form (DuckDB: `nfc_normalize` +
    * `translate` + `lower` + `regexp_replace`). */
  def canonical(text: Column): Column = folds(nfcUdf(text))

  /** NFKC + the same folds — adds width/ligature/superscript folding;
    * the dedup-recall strength for mixed-script corpora. */
  def canonicalNfkc(text: Column): Column = folds(nfkcUdf(text))

  /** md5 of [[canonical]] — drop-in for [[Dedup.fingerprint]] as the
    * exact-dedup key. */
  def canonicalFingerprint(text: Column): Column = md5(canonical(text))

  /** md5 of [[canonicalNfkc]]. */
  def canonicalNfkcFingerprint(text: Column): Column = md5(canonicalNfkc(text))
}
