package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Signal operators: repetition, OOV rate, contamination, incremental
  * dedup, temperature sampling. */
class SignalsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("signals-spec")
    .getOrCreate()

  test("repetition: hand-computed bigram counts, short docs zero out") {
    import spark.implicits._
    // "a a a b": bigrams (a a), (a a), (a b) -> n=3, top=2, dup=2
    // "x y": one bigram -> n=1, top=1, dup=0
    // "solo": too short -> 0s, null fractions
    val df = Seq((1L, "a a a b"), (2L, "x y"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = Signals.repetition(df, "doc_id", "text", n = 2)
      .select(col("doc_id"), col("n_grams"), col("top_cnt"), col("dup_cnt"),
        col("top_frac"), col("dup_frac"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, 2L, Some(2.0 / 3), Some(2.0 / 3)),
      (2L, 1L, 1L, 0L, Some(1.0), Some(0.0)),
      (3L, 0L, 0L, 0L, None, None)))
  }

  test("oov rate: top-V cut by (freq desc, term asc), occurrences counted") {
    import spark.implicits._
    // freq: a=4, b=3, c=2, d=2, e=1. V=3 -> vocab {a, b, c}: the c/d tie
    // at cnt=2 breaks toward 'c' (term asc).
    val df = Seq(
      (1L, "a a b c d"), (2L, "a a b b c d e")).toDF("doc_id", "text")
    val got = Signals.oovRate(df, "doc_id", "text", vocabSize = 3)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("oov_frac"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 5L, 1L, 0.2),          // d OOV
      (2L, 7L, 2L, 2.0 / 7)))     // d, e OOV
  }

  test("contamination: planted eval overlap measured exactly") {
    import spark.implicits._
    // eval = ids % 10 == 0. Doc 11 shares its entire text with eval doc 10;
    // doc 12 shares nothing. n=2 grams for a compact fixture.
    val df = Seq(
      (10L, "one two three four"),
      (11L, "one two three five"),
      (12L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Signals.contamination(df, "doc_id", "text", _ % 10 === 0, n = 2)
      .select(col("doc_id"), col("n_grams"), col("n_contam"), col("contam_frac"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // doc 11 grams: (one two)(two three)(three five): first two contaminated
    assert(got.toSeq == Seq(
      (11L, 3L, 2L, 2.0 / 3),
      (12L, 3L, 0L, 0.0)))
  }

  test("repeated spans: cross-doc windows flagged, within-doc repeats are not") {
    import spark.implicits._
    // docs 1/2 share the span "a b c"; doc 3 repeats its own span twice
    // (distinct-per-doc -> df stays 1 -> NOT flagged); doc 4 is too short.
    val df = Seq(
      (1L, "a b c x"), // spans: (a b c)(b c x) -> 1 of 2 repeated
      (2L, "a b c y"),
      (3L, "p q r p q r p q"), // spans incl (p q r)... all unique to doc 3
      (4L, "z z")).toDF("doc_id", "text")
    val got = Signals.repeatedSpans(df, "doc_id", "text", w = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, 1L)) && got(2L) == ((2L, 1L)))
    assert(got(3L)._2 == 0L, "within-doc repetition must not count")
    assert(!got.contains(4L), "docs shorter than w produce no row")
  }

  test("bigram model: hand-computed pair counts and conditional probabilities") {
    import spark.implicits._
    // corpus: "a b a b c" + "a b" -> pairs: (a b)x3? no: doc1 pairs
    // (a b)(b a)(a b)(b c), doc2 (a b) => (a b):3, (b a):1, (b c):1
    val df = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val got = Signals.bigramModel(df, "text", minCount = 1L)
      .as[(String, String, Long, Long, Double)].collect()
      .map { case (w1, w2, c, t, p) => ((w1, w2), (c, t, p)) }.toMap
    assert(got == Map(
      ("a", "b") -> (3L, 3L, 1.0),
      ("b", "a") -> (1L, 2L, 0.5),
      ("b", "c") -> (1L, 2L, 0.5)))
    // minCount filters pairs but NOT the marginal they divide by
    val filtered = Signals.bigramModel(df, "text", minCount = 2L)
      .as[(String, String, Long, Long, Double)].collect()
    assert(filtered.toSeq == Seq(("a", "b", 3L, 3L, 1.0)))
  }

  test("bloom-prefiltered contamination == exact contamination on sf0.001") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Signals.contamination(docs, "doc_id", "text", _ % 10 === 0)
      .as[(Long, Long, Long, Double)].collect().toSet
    val bloom = Signals.contaminationBloom(docs, "doc_id", "text", _ % 10 === 0)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(bloom == exact)
    assert(exact.exists(_._3 > 0L), "fixture should contain planted overlap")
  }

  test("incremental dedup: batch flagged against corpus only, not itself") {
    import spark.implicits._
    // batch = ids % 5 == 4. Doc 4 duplicates corpus doc 1; doc 9 duplicates
    // batch doc 14 ONLY (batch-internal dup -> both keep; incremental dedup
    // compares against the standing corpus, not within the batch).
    val df = Seq(
      (1L, "p q r s t u v w"),
      (2L, "k l m n o p q r"),
      (4L, "p q r s t u v w"),
      (9L, "z y x w v u t s"),
      (14L, "z y x w v u t s")).toDF("doc_id", "text")
    val got = Signals.incrementalDedup(df, "doc_id", "text", _ % 5 === 4,
        n = 5, threshold = 0.5)
      .select(col("doc_id"), col("n_dups"), col("keep"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (4L, 1L, false), (9L, 0L, true), (14L, 0L, true)))
  }

  test("temperature sample: small strata survive whole, large are damped") {
    import spark.implicits._
    val df = ((0 until 1600).map(i => (i.toLong, "en")) ++
      (1600 until 1610).map(i => (i.toLong, "rare"))).toDF("doc_id", "lang")
    val got = Curation.temperatureSample(df, "doc_id", "lang", c = 8.0)
      .select(col("doc_id"), col("lang"), col("rate_ppm"))
      .as[(Long, String, Long)].collect()
    val byLang = got.groupBy(_._2).view.mapValues(_.size).toMap
    // rare: 8/sqrt(10) > 1 -> capped at 1e6 ppm, all 10 kept
    assert(byLang("rare") == 10)
    assert(got.filter(_._2 == "rare").forall(_._3 == 1000000L))
    // en: 8/sqrt(1600) = 0.2 -> 200000 ppm, ~320 of 1600 expected
    assert(got.filter(_._2 == "en").forall(_._3 == 200000L))
    assert(byLang("en") > 230 && byLang("en") < 410, s"en=${byLang("en")}")
    // deterministic replay
    val again = Curation.temperatureSample(df, "doc_id", "lang", c = 8.0)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == got.map(_._1).toSet)
  }

  test("PII redaction: planted emails/phones counted and replaced, clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to alice.smith+x@corp-mail.co.uk or call 555-123-4567 now"),
      (2L, "two mails a@b.io c@d.org and numbers 111-222-3333 444-555-6666"),
      (3L, "no pii here, just text with @ and 12-34 fragments"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = TextStats.piiRedact(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, 1L, "write to <EMAIL> or call <PHONE> now")))
    assert(got(2L) == ((2L, 2L, "two mails <EMAIL> <EMAIL> and numbers <PHONE> <PHONE>")))
    assert(got(3L) == ((0L, 0L, "no pii here, just text with @ and 12-34 fragments")))
    assert(got(4L) == ((0L, 0L, "")))
  }

  test("LM doc score: hand-computed coverage and fixed-point probability sums") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"), // bigrams (a,b) (b,a) (a,b) (b,c)
      (2L, "a b x"),     // (a,b) (b,x)
      (3L, "z"),         // no bigrams
      (4L, "")           // no tokens
    ).toDF("doc_id", "text")
    // corpus counts: (a,b)=3, (b,a)=1, (b,c)=1, (b,x)=1; w1 marginals
    // a=3, b=3; minCount=2 keeps only (a,b) with cond_p = 3/3 = 1.0
    val got = Signals.lmScore(docs, "doc_id", "text", minCount = 2L)
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((4L, 2L, 0.5, 2000000000000L)),
      2L -> ((2L, 1L, 0.5, 1000000000000L)),
      3L -> ((0L, 0L, 0.0, 0L)),
      4L -> ((0L, 0L, 0.0, 0L))))
  }

  test("stupid-backoff LM score: unseen bigrams fall back to 0.4 * unigram/T") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"), // bigrams (a,b) (b,a) (a,b) (b,c)
      (2L, "a b x"),     // (a,b) (b,x)
      (3L, "z"),         // no bigrams
      (4L, "")           // no tokens
    ).toDF("doc_id", "text")
    // unigrams: a=3 b=3 c=1 x=1 z=1, T=9; LM at minCount=2 keeps only
    // (a,b) with cond_p=1.0. Backoff term = floor(w2_cnt/9 * 4e11):
    // w2=a -> floor(3.0/9.0*4e11) = 133333333333
    // w2=c, w2=x -> floor(1.0/9.0*4e11) = 44444444444
    val got = Signals.lmScoreBackoff(docs, "doc_id", "text", minCount = 2L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((4L, 2L, 2L, 2000000000000L + 133333333333L + 44444444444L)),
      2L -> ((2L, 1L, 1L, 1000000000000L + 44444444444L)),
      3L -> ((0L, 0L, 0L, 0L)),
      4L -> ((0L, 0L, 0L, 0L))))
    // every bigram now contributes: known docs rank above all-novel docs,
    // but an all-novel doc of frequent words still scores above one of
    // rare words (the graded signal q66's raw sum lacks)
    val novel = Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "c a"), (4L, "x z"))
      .toDF("doc_id", "text")
    val scores = Signals.lmScoreBackoff(novel, "doc_id", "text", minCount = 2L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(scores(3L) > scores(4L)) // (c,a): a freq 4 beats (x,z): z freq 1
    assert(scores(3L) > 0L && scores(4L) > 0L)
  }
}
