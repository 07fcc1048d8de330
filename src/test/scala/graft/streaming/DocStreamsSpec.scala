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
}
