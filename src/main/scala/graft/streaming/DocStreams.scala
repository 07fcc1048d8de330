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

  /**
   * Streaming contamination gate: flag each arriving document whose text
   * shares any word n-gram with a STATIC eval set, probing a pre-built
   * Bloom filter ([[graft.functions.BloomFilterAgg]]) broadcast once at
   * stream start. Stateless per micro-batch — no join against the eval
   * table per batch, no streaming state at all; the filter's one-sided
   * error means a flagged doc MAY be clean (fp rate) but an unflagged
   * doc is GUARANTEED clean — the safe direction for a quarantine gate
   * (false quarantines get re-checked exactly by the batch q48 path;
   * missed contamination never happens).
   *
   * Output: input columns + `n_grams` + `maybe_contaminated`.
   */
  def contaminationGateStream(
      docs: DataFrame, textCol: String,
      bloomWords: Array[Long], numHashes: Int, n: Int): DataFrame = {
    import graft.functions.Bloom
    val bc = docs.sparkSession.sparkContext.broadcast(bloomWords)
    val anyHit = udf { grams: Seq[String] =>
      grams.exists(g =>
        Bloom.mightContain(bc.value, numHashes,
          // xxhash64 of the gram string, matching the batch index's key
          org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(g),
            org.apache.spark.sql.types.StringType, 42L)))
    }
    docs
      .withColumn("__grams", Dedup.shingles(col(textCol), n))
      .withColumn("n_grams", size(col("__grams")).cast("long"))
      .withColumn("maybe_contaminated", anyHit(col("__grams")))
      .drop("__grams")
  }
}
