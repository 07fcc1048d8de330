package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Canonicalization: NFC/NFKC folds, punct/width/diacritic fixtures,
  * and the dedup-pair DELTA the folds exist for. */
class CanonicalizeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("canonicalize-spec")
    .getOrCreate()

  private def canon(s: Seq[String]) = {
    import spark.implicits._
    s.toDF("t").select(Canonicalize.canonical(col("t"))).as[String].collect()
  }

  private def canonK(s: Seq[String]) = {
    import spark.implicits._
    s.toDF("t").select(Canonicalize.canonicalNfkc(col("t"))).as[String].collect()
  }

  test("NFC: composed and decomposed spellings canonicalize identically") {
    // "café" with precomposed U+00E9 vs decomposed e + U+0301
    val composed = "caf\u00e9 bar"
    val decomposed = "cafe\u0301 bar"
    assert(composed != decomposed, "fixtures differ before folding")
    val Seq(a, b) = canon(Seq(composed, decomposed)).toSeq
    assert(a == b, "NFC must compose the combining acute")
  }

  test("typographic punctuation and NBSP fold to ASCII") {
    val typo = "it’s “fine” — really so"
    val ascii = "it's \"fine\" - really so"
    val Seq(a, b) = canon(Seq(typo, ascii)).toSeq
    assert(a == b, s"punct fold: '$a' vs '$b'")
  }

  test("NFKC additionally folds width and ligatures; NFC does not") {
    val fullWidth = "\uFF21\uFF22\uFF23 x" // full-width ABC
    val ascii = "ABC x"
    val Seq(n1, n2) = canon(Seq(fullWidth, ascii)).toSeq
    assert(n1 != n2, "NFC leaves width variants distinct")
    val Seq(k1, k2) = canonK(Seq(fullWidth, ascii)).toSeq
    assert(k1 == k2, "NFKC folds full-width to ASCII")
    val Seq(l1, l2) = canonK(Seq("\uFB01ne", "fine")).toSeq // fi-ligature
    assert(l1 == l2, "NFKC folds the fi ligature")
  }

  test("canonicalization CHANGES the dedup pairs on a planted fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "caf\u00e9 \u2014 the \u201Cbest\u201D"),
      (2L, "cafe\u0301 - the \"best\""), // same text, NFD + ASCII punct
      (3L, "\uFF21\uFF22\uFF23 menu"),   // full-width ABC
      (4L, "ABC menu"),                  // ASCII twin — NFKC-only pair
      (5L, "unrelated text")).toDF("doc_id", "text")
    def keepers(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Dedup.exact(docs, "doc_id", "text", key)
        .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val plain = keepers(Dedup.fingerprint)
    assert(plain.values.forall(identity),
      "plain fingerprints see five distinct docs — every row keeps")
    val nfc = keepers(Canonicalize.canonicalFingerprint)
    assert(!nfc(2L) && nfc(1L), "NFC+punct folds doc 2 into doc 1's group")
    assert(nfc(3L) && nfc(4L), "width variants stay distinct under NFC")
    val nfkc = keepers(Canonicalize.canonicalNfkcFingerprint)
    assert(!nfkc(2L) && !nfkc(4L) && nfkc(3L),
      "NFKC folds the width pair too (keeper = min id = 3)")
    assert(nfkc(5L), "unrelated doc unaffected")
  }

  test("null text stays null through every strength") {
    import spark.implicits._
    val df = Seq((1L, null: String)).toDF("id", "t")
    val r = df.select(Canonicalize.canonical(col("t")),
        Canonicalize.canonicalNfkc(col("t")),
        Canonicalize.canonicalFingerprint(col("t"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("canonicalization is idempotent on generated mixed-unicode text") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // pieces that exercise every fold: composed/decomposed accents,
    // full-width, ligature, typographic punct, NBSP, case, whitespace
    val pieces = Vector("caf\u00e9", "cafe\u0301", "\uFF21\uFF22",
      "\uFB01ne", "\u2018x\u2019", "\u201Cy\u201D", "a\u2014b", "A\u00A0B",
      "MiXeD", "  spaced  ", "plain", "ß", "Straße", "")
    val texts = (0 until 200).map { _ =>
      Seq.fill(1 + rnd.nextInt(6))(pieces(rnd.nextInt(pieces.length)))
        .mkString(" ")
    }
    val once = canon(texts)
    val twice = texts.toDF("t")
      .select(Canonicalize.canonical(Canonicalize.canonical(col("t"))))
      .as[String].collect()
    assert(once.toSeq == twice.toSeq,
      "canonical(canonical(x)) must equal canonical(x) — a non-idempotent " +
        "fold would re-dedup differently on already-canonical corpora")
    val onceK = canonK(texts)
    val twiceK = texts.toDF("t")
      .select(Canonicalize.canonicalNfkc(Canonicalize.canonicalNfkc(col("t"))))
      .as[String].collect()
    assert(onceK.toSeq == twiceK.toSeq, "NFKC strength must be idempotent too")
    // canonical never yields null on non-null input; no leading/trailing
    // space; no double spaces; no typographic punct survivors
    for (c <- once) {
      assert(c != null && c == c.trim && !c.contains("  "))
      assert(!c.exists(ch => "\u2018\u2019\u201C\u201D\u2014\u00A0".contains(ch)))
    }
  }

  test("fold chain matches the q149 oracle order on ASCII (identity)") {
    // On pure ASCII the canonical form equals the plain normalized form,
    // so the canonical fingerprint degrades gracefully to q12's
    val s = Seq("  The   quick BROWN fox ", "plain ascii")
    import spark.implicits._
    val both = s.toDF("t").select(
        Canonicalize.canonicalFingerprint(col("t")).as("c"),
        Dedup.fingerprint(col("t")).as("p"))
      .as[(String, String)].collect()
    assert(both.forall { case (c, p) => c == p })
  }
}
