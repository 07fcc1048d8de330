package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming paths must reproduce their oracle-checked batch twins. */
class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("streams-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("windowed streaming aggregation == batch hourly aggregate") {
    import spark.implicits._
    // complete mode: in append, windows not yet past the watermark (the
    // stream's final hours) would still be buffered in state at EOF.
    runToMemory(EventStreams.hourlyStream(spark, sf), "hourly", "complete")
    val streamed = spark.table("hourly")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = EventStreams.hourlyBatch(spark, sf)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization == batch window sessionization") {
    import spark.implicits._
    runToMemory(EventStreams.sessionsStream(spark, sf), "sessions")
    val streamed = spark.table("sessions")
      .select("user_id", "session_no", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = EventStreams.sessionsBatch(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
