package graft.streaming

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/**
 * Shared scaffold for the marker-guarded artifact streams (q154 /
 * q188 / q190 / q194 / q196 / q197): a file-source AvailableNow
 * stream over `in`, one file per micro-batch, every batch committed
 * through [[graft.Fs.appliedMarkerSwap]] so a fold whose merge is not
 * replay-idempotent (additive, signed, or subtractive) applies
 * exactly once per batch id. The per-family fold writes the complete
 * replacement artifact into the sibling dir it is handed; the swap
 * publishes fold + markers in one atomic rename.
 *
 * Extracted after the sixth hand-copied variant of this scaffold:
 * the guards live in ONE place now, so a fix to the commit protocol
 * reaches every stream (the cumulative-guard durability fix that
 * motivated the extraction had to touch four call sites).
 *
 * Cumulative FUP guards: persist the count with
 * [[graft.Fs.writeCounter]] inside the sibling and re-read it with
 * [[graft.Fs.readCounter]] from the artifact — never a driver-side
 * variable, which resets on restart and misses replay-skipped
 * batches.
 *
 * PRECONDITION: `in` must already exist and hold at least one parquet
 * file when this is called — the schema is probed eagerly (a file
 * stream needs a declared schema before the first trigger), so a
 * not-yet-populated input dir is a caller bug, surfaced here as a
 * clear require instead of a bare AnalysisException from inside the
 * schema probe. Callers that stage their own input (every declared
 * row) write the files first; a production caller pointing at a live
 * landing dir must create it (with a seed file or an explicit schema
 * handshake) before wiring the stream.
 */
object ArtifactStream {

  def foldAvailableNow(
      spark: SparkSession, base: Path, artDir: Path, in: String)(
      fold: (DataFrame, Path) => Unit): Unit =
    foldAvailableNowWithId(spark, base, artDir, in) {
      (batch, _, sibling) => fold(batch, sibling)
    }

  /** [[foldAvailableNow]] with the micro-batch id exposed to the fold —
    * for folds that keep per-batch durable side state keyed by id (the
    * q199 ingest record: an id-keyed write is idempotent under
    * redelivery-after-crash, where the same id re-runs the closure). */
  def foldAvailableNowWithId(
      spark: SparkSession, base: Path, artDir: Path, in: String)(
      fold: (DataFrame, Long, Path) => Unit): Unit = {
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(in)),
      s"ArtifactStream input dir must pre-exist with at least one " +
        s"parquet file (the schema is probed eagerly): $in")
    val schema = spark.read.parquet(in).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.Fs.appliedMarkerSwap(base, artDir, id) { sibling =>
          fold(batch, id, sibling)
        }
        ()
      }
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
