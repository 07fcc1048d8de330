package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Doc(doc_id: Long, arrival: java.sql.Timestamp, text: String)

/** Streaming dedup must reproduce the batch keep-set on a replayed source. */
class DocStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("doc-streams-spec")
    .getOrCreate()

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("streaming dedup == batch distinct fingerprints within the horizon") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // Whitespace/case variants fingerprint identically; batch 2 replays
    // dup content within the horizon plus one fresh doc.
    val batch1 = Seq(
      Doc(1L, ts(10), "the quick brown fox"),
      Doc(2L, ts(11), "The  quick  brown fox"), // dup of 1 (normalized)
      Doc(3L, ts(12), "something else"))
    val batch2 = Seq(
      Doc(4L, ts(13), "THE QUICK BROWN FOX"), // dup of 1, within horizon
      Doc(5L, ts(14), "genuinely new text"))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = DocStreams.dedupStream(
        source.toDS().toDF(), "text", "arrival", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      source.addData(batch1)
      q.processAllAvailable()
      source.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("dedup_stream")
      .select($"doc_id", $"fingerprint").as[(Long, String)].collect()
    // One survivor per distinct fingerprint, matching the batch fingerprint
    // set over all arrivals.
    val batchFps = graft.pipeline.Dedup.exact(
        (batch1 ++ batch2).toDF(), "doc_id", "text")
      .select($"fingerprint").as[String].collect().toSet
    assert(kept.map(_._2).toSet == batchFps)
    assert(kept.map(_._2).distinct.length == kept.length, "emitted a dup")
    // The quick-brown-fox group kept exactly one of ids {1, 2, 4}.
    assert(kept.length == 3)
    assert(Set(1L, 2L, 4L).intersect(kept.map(_._1).toSet).size == 1)
  }

  test("canonical-key streaming dedup collapses Unicode spelling variants") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // NFC vs NFD, typographic vs ASCII punct: same text, four spellings
    val docs = Seq(
      Doc(1L, ts(10), "caf\u00e9 \u2014 the \u201Cbest\u201D"),
      Doc(2L, ts(11), "cafe\u0301 - the \"best\""),
      Doc(3L, ts(12), "caf\u00e9 - the\u00A0\"best\""),
      Doc(4L, ts(13), "genuinely different"))
    def run(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        name: String): Set[Long] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[Doc]
      val q = DocStreams.dedupStream(
          source.toDS().toDF(), "text", "arrival", "1 hour", key)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        source.addData(docs)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).select($"doc_id").as[Long].collect().toSet
    }
    val plain = run(graft.pipeline.Dedup.fingerprint, "cdedup_plain")
    assert(plain == Set(1L, 2L, 3L, 4L),
      "plain fingerprints see four distinct spellings")
    val canon = run(graft.pipeline.Canonicalize.canonicalFingerprint,
      "cdedup_canon")
    assert(canon == Set(1L, 4L),
      "the canonical key folds NFD and typographic punct into doc 1")
  }

  test("streaming near-dup gate: flags == batch MinHash candidates on planted fixtures") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // Planted fixture: reference corpus docs, arriving docs that are
    // near-copies (small edits — high jaccard), plus unrelated docs.
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "one two three four five six seven eight nine ten eleven"),
      (102L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // copy of 100
      (2L, "one two three four five six seven eight nine ten twelve"),  // near-copy of 101
      (3L, "completely unrelated text about mountains and rivers flowing"),
      (4L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"), // copy of 102
      (5L, "short"), // zero 5-gram shingles: must never flag
      (6L, "different words entirely with no overlap whatsoever present here"))

    val (n, bands, rows) = (5, 8, 4)
    val corpusBuckets = graft.pipeline.Dedup
      .minHashBuckets(corpus, "doc_id", "text", n, bands, rows)
      .select($"band", $"bucket").as[(Int, Int)].collect().toSet

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = DocStreams.nearDupGateStream(
        source.toDS().toDF("doc_id", "text"), "text", corpusBuckets,
        n, bands, rows)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_gate").start()
    try {
      source.addData(arrivals)
      q.processAllAvailable()
    } finally q.stop()

    val flagged = spark.table("neardup_gate")
      .where($"maybe_near_dup").select($"doc_id").as[Long].collect().toSet
    // ground truth = the BATCH candidate predicate: arriving docs whose
    // per-row band buckets (computed by the batch grouped path) collide
    // with a corpus bucket — the per-row streaming signature must be
    // bit-identical to the grouped batch one
    val truth = graft.pipeline.Dedup
      .minHashBuckets(arrivals.toDF("doc_id", "text"), "doc_id", "text",
        n, bands, rows)
      .as[(Long, Int, Int)].collect()
      .filter { case (_, band, bucket) => corpusBuckets.contains((band, bucket)) }
      .map(_._1).toSet
    assert(truth.contains(1L) && truth.contains(4L),
      "planted exact copies must be batch candidates")
    assert(!truth.contains(5L), "a shingle-less doc cannot be a candidate")
    assert(flagged == truth,
      s"stream flags must equal batch candidates: got $flagged vs $truth")
    // the near-copy with one word changed shares most shingles: at
    // j ~ 0.8, miss probability (1-j^4)^8 ~ 0.004 — planted to collide
    assert(flagged.contains(2L), "near-copy should collide in some band")
  }

  test("indexed near-dup gate == frozen broadcast gate, no driver collect") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "one two three four five six seven eight nine ten eleven"),
      (102L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten twelve"),
      (3L, "completely unrelated text about mountains and rivers flowing"),
      (4L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
      (5L, "short"),
      (6L, "different words entirely with no overlap whatsoever present here"))
    val (n, bands, rows) = (5, 8, 4)
    val bucketIndex = graft.pipeline.Dedup
      .minHashBuckets(corpus, "doc_id", "text", n, bands, rows)
      .select($"band", $"bucket").distinct()

    // 1) the per-batch equi-join probe must equal the broadcast-set
    // probe row for row on identical input
    val batchDF = arrivals.toDF("doc_id", "text")
    val viaJoin = DocStreams.nearDupGateIndexProbe(
        batchDF, "text", "doc_id", bucketIndex, n, bands, rows)
      .select($"doc_id", $"n_shingles", $"maybe_near_dup")
      .as[(Long, Long, Boolean)].collect().toSet
    val corpusSet = bucketIndex.as[(Int, Int)].collect().toSet
    val viaSet = DocStreams.nearDupGateStream(batchDF, "text", corpusSet,
        n, bands, rows)
      .select($"doc_id", $"n_shingles", $"maybe_near_dup")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(viaJoin == viaSet,
      "equi-join probe must reproduce the broadcast-set gate exactly")

    // 2) streamed end to end through foreachBatch
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]
    val q = DocStreams.nearDupGateStreamIndexed(
        source.toDS().toDF("doc_id", "text"), "text", "doc_id",
        bucketIndex, n, bands, rows) { (probed, _) =>
        val batch = probed.select(col("doc_id"), col("n_shingles"),
            col("maybe_near_dup"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        got.synchronized { got ++= batch }
      }
      .start()
    try {
      source.addData(arrivals)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == viaSet,
      "streamed indexed gate must equal the batch probe")
  }

  test("boilerplate gate: streamed two-batch flags == the batch strip's flags") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // corpus where "a b c" is hot (4 distinct docs at minDocs = 3)
    val corpus = Seq(
      (100L, "a b c x y z"), (101L, "a b c p q r"), (102L, "u v w a b c"),
      (103L, "m n o")).toDF("doc_id", "text")
    val counts = graft.pipeline.Curation
      .chunkCounts(corpus, "doc_id", "text", chunk = 3)
    // expected flags from the batch strip over the arrivals
    val arrivals = Seq(
      (1L, "a b c fresh words here"),  // contains the hot chunk -> gated
      (2L, "fresh words here only"),   // nothing hot
      (3L, "m n o"),                   // seen once in corpus -> not hot
      (4L, ""))                        // token-empty: no row at all
    val expect = DocStreams.boilerplateGateProbe(
        arrivals.toDF("doc_id", "text"), "text", "doc_id", counts,
        chunk = 3, minDocs = 3L)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(expect.exists(r => r._1 == 1L && r._4) &&
      expect.exists(r => r._1 == 2L && !r._4) &&
      expect.exists(r => r._1 == 3L && !r._4) &&
      !expect.exists(_._1 == 4L))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Boolean)]
    val q = DocStreams.boilerplateGateStream(
        source.toDS().toDF("doc_id", "text"), "text", "doc_id", counts,
        chunk = 3, minDocs = 3L) { (probed, _) =>
        val batch = probed.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        got.synchronized { got ++= batch }
      }
      .start()
    try {
      source.addData(arrivals.take(2))
      q.processAllAvailable()
      source.addData(arrivals.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == expect,
      "the frozen-artifact gate is stateless per batch, so batching must not matter")
  }

  test("LM gate: streamed two-batch scores == the batch backoff scorer") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (100L, "a b a b a b c"), (101L, "a b a b x"), (102L, "a b d"),
      (103L, "q r s")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm-gate-spec").toString
    graft.pipeline.Signals.saveLmArtifact(corpus, "text", minCount = 3L, dir)
    val art = graft.pipeline.Signals.loadLmArtifact(spark, dir)
    // (a,b)=6 and (b,a)=3 survive minCount 3; 18 corpus tokens
    assert(art.bigrams.count() == 2L && art.totalTokens == 18L)
    val arrivals = Seq(
      (1L, "a b a b"),     // all-known transitions -> high mean score
      (2L, "q z q z"),     // all-backoff, rare words -> gated
      (3L, "solo"),        // no bigrams -> never gated
      (4L, "a b q z"))     // mixed
    // threshold between the all-known and all-backoff means
    val thr = 500000000000L / 2
    val expect = DocStreams.lmGateProbe(
        arrivals.toDF("doc_id", "text"), "text", "doc_id", art, thr)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(expect.exists(r => r._1 == 1L && !r._6) &&
      expect.exists(r => r._1 == 2L && r._6) &&
      expect.exists(r => r._1 == 3L && !r._6))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long, Boolean)]
    val q = DocStreams.lmGateStream(
        source.toDS().toDF("doc_id", "text"), "text", "doc_id", art, thr) {
        (probed, _) =>
        val batch = probed.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getBoolean(5)))
        got.synchronized { got ++= batch }
      }
      .start()
    try {
      source.addData(arrivals.take(2))
      q.processAllAvailable()
      source.addData(arrivals.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == expect,
      "frozen-artifact scoring is stateless per batch; batching must not matter")
  }

  test("refreshing near-dup gate tracks a growing reference corpus") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val (n, bands, rows) = (5, 8, 4)
    val docA = (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val docB = (101L, "one two three four five six seven eight nine ten eleven")
    // reference corpus grows between micro-batches
    var corpus = Seq(docA)
    def bucketsNow(): Set[(Int, Int)] = graft.pipeline.Dedup
      .minHashBuckets(corpus.toDF("doc_id", "text"), "doc_id", "text",
        n, bands, rows)
      .select($"band", $"bucket").as[(Int, Int)].collect().toSet

    val batch1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // copy of A
      (2L, "one two three four five six seven eight nine ten eleven"))  // copy of B — NOT yet referenced
    val batch2 = Seq(
      (3L, "one two three four five six seven eight nine ten eleven"),  // copy of B — now referenced
      (4L, "utterly unrelated content about rivers and mountains here"))

    val results =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = DocStreams.nearDupGateStreamRefreshing(
        source.toDS().toDF("doc_id", "text"), "text", () => bucketsNow(),
        n, bands, rows) { (gated, batchId) =>
      results ++= gated.select($"doc_id", $"maybe_near_dup")
        .collect().map(r => (batchId, r.getLong(0), r.getBoolean(1)))
    }.start()
    try {
      source.addData(batch1)
      q.processAllAvailable()
      corpus = corpus :+ docB // corpus append BETWEEN batches
      source.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val flags = results.map { case (_, id, f) => id -> f }.toMap
    // the refresh contract: a copy of docB arriving BEFORE docB lands in
    // the reference passes the gate; the same content arriving AFTER the
    // append is flagged — a frozen gate would miss it forever
    assert(flags(1L), "copy of referenced docA must flag in batch 1")
    assert(!flags(2L), "docB not yet referenced: must pass in batch 1")
    assert(flags(3L), "docB referenced after refresh: must flag in batch 2")
    assert(!flags(4L), "unrelated doc must pass")
    // per-batch equality vs the batch candidate predicate against the
    // exact snapshot that batch saw
    val snap1 = graft.pipeline.Dedup
      .minHashBuckets(Seq(docA).toDF("doc_id", "text"), "doc_id", "text",
        n, bands, rows)
      .select($"band", $"bucket").as[(Int, Int)].collect().toSet
    val truth1 = graft.pipeline.Dedup
      .minHashBuckets(batch1.toDF("doc_id", "text"), "doc_id", "text",
        n, bands, rows)
      .as[(Long, Int, Int)].collect()
      .filter { case (_, b, h) => snap1.contains((b, h)) }.map(_._1).toSet
    assert(results.filter(_._1 == 0L).filter(_._3).map(_._2).toSet == truth1)
  }

  test("streaming contamination gate: zero false negatives vs the batch check") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.Bloom

    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // batch-built filter over the eval split's grams (the q48 predicate)
    val evGrams = docs.where($"doc_id" % 10 === 0)
      .select(explode(graft.pipeline.Dedup.shingles($"text", 5)).as("g"))
      .select(xxhash64($"g").as("gram")).distinct()
    val words = Bloom.fromBytes(
      evGrams.agg(Bloom.bloom_agg($"gram", 1 << 20, 5)).head().getAs[Array[Byte]](0))

    // stream the training split through the gate
    val train = docs.where($"doc_id" % 10 =!= 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = DocStreams.contaminationGateStream(
        source.toDS().toDF("doc_id", "text"), "text", words, 5, 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("contam_gate").start()
    try {
      source.addData(train.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val flagged = spark.table("contam_gate")
      .where($"maybe_contaminated").select($"doc_id").as[Long].collect().toSet
    // ground truth from the exact batch operator
    val truth = graft.pipeline.Signals.contamination(docs, "doc_id", "text", _ % 10 === 0)
      .where($"n_contam" > 0).select($"doc_id").as[Long].collect().toSet
    assert(truth.nonEmpty, "fixture should contain planted overlap")
    // one-sided error: every truly contaminated doc MUST be flagged...
    assert(truth.subsetOf(flagged), s"missed: ${truth.diff(flagged).take(5)}")
    // ...and the fp overshoot stays sketch-small (documented trade)
    assert(flagged.size <= truth.size + 25, s"${flagged.size} vs ${truth.size}")
  }
}
