package graft.streaming

import graft.pipeline.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming media gate: the per-row probe must equal the exact batch
  * predicate (exists a reference fingerprint within the hamming bound). */
class MediaStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("media-streams-spec")
    .getOrCreate()

  test("phash gate stream == exact batch exists-within-hamming predicate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val rnd = new scala.util.Random(23)
    def doc(words: Int) = Seq.fill(words)("m" + rnd.nextInt(3000)).mkString(" ")
    val refs = (0 until 10).map(i => (100L + i, doc(100)))
    // arrivals: edits of refs (must flag), unrelated (must not), a
    // too-short payload (honest all-zero fingerprint, gates normally),
    // and a null payload (null flag)
    val edits = (0 until 3).map { i =>
      val w = refs(i)._2.split(' '); w(50) = "EDIT" + i
      (i.toLong, w.mkString(" "))
    }
    val arrivals: Seq[(Long, String)] =
      edits ++ Seq((7L, doc(100)), (8L, doc(100)), (9L, "tiny"))

    val refPhashes = refs
      .map { case (_, t) => Multimodal.perceptualHash64(t.getBytes("UTF-8")) }
      .toArray

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = MediaStreams.phashGateStream(
        source.toDS().toDF("media_id", "text")
          .select($"media_id", $"text".cast("binary").as("blob")),
        "blob", refPhashes, maxHamming = 6)
      .select($"media_id", $"maybe_near_dup")
      .writeStream.outputMode("append").format("memory")
      .queryName("media_gate").start()
    try {
      source.addData(arrivals)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("media_gate")
      .as[(Long, Boolean)].collect().toMap
    val truth = arrivals.map { case (id, t) =>
      val p = Multimodal.perceptualHash64(t.getBytes("UTF-8"))
      id -> refPhashes.exists(r => java.lang.Long.bitCount(r ^ p) <= 6)
    }.toMap
    assert(got == truth, s"stream flags must equal the exact batch predicate")
    assert((0 until 3).forall(i => truth(i.toLong)), "planted edits must flag")
    assert(!truth(7L) && !truth(8L), "unrelated payloads must not flag")
  }

  test("indexed phash gate == CSR broadcast gate, incl. null payloads") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(29)
    def doc(words: Int) = Seq.fill(words)("m" + rnd.nextInt(3000)).mkString(" ")
    val refs = (0 until 10).map(i => (100L + i, doc(100)))
    val edits = (0 until 3).map { i =>
      val w = refs(i)._2.split(' '); w(50) = "EDIT" + i
      (i.toLong, w.mkString(" "))
    }
    val arrivals: Seq[(Long, String)] =
      edits ++ Seq((7L, doc(100)), (8L, "tiny"), (9L, null))
    val batch = arrivals.toDF("media_id", "text")
      .select($"media_id", $"text".cast("binary").as("blob"))
    val bandIndex = MediaStreams.phashBandIndex(
      Multimodal.perceptualHashes(
        refs.toDF("media_id", "text")
          .select($"media_id", $"text".cast("binary").as("blob")),
        "media_id", "blob"),
      "phash")

    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select($"media_id", $"maybe_near_dup").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    // 1) the equi-join probe equals the CSR broadcast gate on one batch
    val viaJoin = asMap(MediaStreams.phashGateIndexProbe(
      batch, "blob", "media_id", bandIndex, maxHamming = 6))
    val refPhashes = refs.map { case (_, t) =>
      Multimodal.perceptualHash64(t.getBytes("UTF-8")) }.toArray
    val viaCsr = asMap(MediaStreams.phashGateStream(
      batch, "blob", refPhashes, maxHamming = 6))
    assert(viaJoin == viaCsr,
      "equi-join probe must reproduce the CSR gate exactly (null incl.)")
    assert(viaJoin(9L).isEmpty, "null payload keeps the null flag")

    // 2) streamed end to end through foreachBatch
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Option[Boolean])]
    val q = MediaStreams.phashGateStreamIndexed(
        source.toDS().toDF("media_id", "text")
          .select($"media_id", $"text".cast("binary").as("blob")),
        "blob", "media_id", bandIndex, maxHamming = 6) { (probed, _) =>
        val rows = probed.select(col("media_id"), col("maybe_near_dup"))
          .collect().map(r => (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
        got.synchronized { got ++= rows }
      }
      .start()
    try {
      source.addData(arrivals)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == viaCsr, "streamed indexed gate must equal the probe")
  }

  test("null payload yields a null flag; empty reference set never flags") {
    import spark.implicits._
    val media = Seq((1L, "some payload bytes here"), (2L, null))
      .toDF("media_id", "text")
      .select($"media_id", $"text".cast("binary").as("blob"))
    val empty = MediaStreams
      .phashGateStream(media, "blob", Array.emptyLongArray, maxHamming = 6)
      .select($"media_id", $"maybe_near_dup")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap
    assert(empty == Map(1L -> Some(false), 2L -> None))
  }
}
