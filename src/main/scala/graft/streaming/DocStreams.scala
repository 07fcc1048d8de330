package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming ingest paths for the document pipeline. Batch twins live in
 * [[graft.pipeline.Dedup]] and are oracle-checked (q12); the streaming
 * variants must reproduce them on replayed bounded sources
 * (DocStreamsSpec).
 */
object DocStreams {

  /**
   * Streaming exact dedup: each arriving document is fingerprinted
   * (normalize + md5, identical to the batch path) and deduped with
   * `dropDuplicatesWithinWatermark` — the first arrival of a fingerprint
   * within the watermark horizon wins, and STATE IS BOUNDED BY THE HORIZON,
   * not the stream's lifetime. That is the deliberate streaming-ingest
   * trade: a duplicate arriving later than `delay` after its original's
   * horizon re-enters (a plain `dropDuplicates` would catch it but holds
   * every fingerprint forever — unbounded state on an unbounded corpus);
   * dedup beyond the horizon belongs to the periodic batch sweep (q12)
   * over the landed corpus.
   *
   * Output keeps the input columns plus the `fingerprint` used as the key.
   */
  def dedupStream(
      docs: DataFrame, textCol: String, eventTimeCol: String,
      delay: String): DataFrame =
    docs
      .withColumn("fingerprint", Dedup.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
