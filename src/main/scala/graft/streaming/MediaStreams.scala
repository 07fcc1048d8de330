package graft.streaming

import graft.pipeline.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming ingest paths for MEDIA payloads — the image side of
 * [[DocStreams]]. Batch twins live in [[graft.pipeline.Multimodal]]
 * (q100/q101 oracle-checked); the streaming gate must reproduce the
 * batch predicate exactly on replayed bounded sources (MediaStreamsSpec).
 */
object MediaStreams {

  /**
   * Streaming perceptual near-dup gate — and unlike the text gate
   * ([[DocStreams.nearDupGateStream]], a candidate predicate with an
   * S-curve recall), this one is EXACT: flag each arriving media payload
   * iff some reference payload sits within `maxHamming` (<= 7) of its
   * 64-bit perceptual fingerprint. Exactness is q101's pigeonhole: a
   * pair within hamming 7 of 64 bits differs in at most 7 of the 8
   * 8-bit bands, so at least one band matches EXACTLY — probing the 8
   * band buckets of a reference index finds every qualifying partner,
   * and the exact `bitCount(xor)` check inside the probe removes every
   * false candidate. The flag is therefore a deterministic function of
   * (payload, reference set): fully oracle-expressible, no contract
   * hedge needed.
   *
   * The reference index is built driver-side from the reference
   * fingerprints (bounded — the gate-corpus broadcast every gate
   * implies): a flat CSR layout of 8 x 256 band buckets over one
   * candidate array, so the per-row probe is integer indexing + a
   * bounded scan with zero allocation (the [[DocStreams]] packed-array
   * discipline). Stateless per micro-batch, no streaming state at all.
   *
   * Output: input columns + `maybe_near_dup` (null payload -> null flag,
   * the q100 null-fingerprint convention; a too-short payload hashes to
   * the honest all-zero fingerprint and gates normally).
   */
  def phashGateStream(
      media: DataFrame, blobCol: String,
      refPhashes: Array[Long], maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "8 x 8-bit bands are pigeonhole-complete only to 7")
    // CSR band index: offsets(s)..offsets(s+1) slice candidates for
    // band-bucket s = (band << 8) | byte. Each reference fingerprint
    // appears once per band (8x) — bounded by the reference set.
    val offsets = new Array[Int](8 * 256 + 1)
    refPhashes.foreach { p =>
      var b = 0
      while (b < 8) {
        offsets(((b << 8) | ((p >>> (b * 8)) & 0xffL).toInt) + 1) += 1
        b += 1
      }
    }
    var i = 0
    while (i < 8 * 256) { offsets(i + 1) += offsets(i); i += 1 }
    val cands = new Array[Long](refPhashes.length * 8)
    val fill = offsets.clone()
    refPhashes.foreach { p =>
      var b = 0
      while (b < 8) {
        val s = (b << 8) | ((p >>> (b * 8)) & 0xffL).toInt
        cands(fill(s)) = p
        fill(s) += 1
        b += 1
      }
    }
    val bcOff = media.sparkSession.sparkContext.broadcast(offsets)
    val bcCand = media.sparkSession.sparkContext.broadcast(cands)
    val gate = udf { (blob: Array[Byte]) =>
      if (blob == null) null.asInstanceOf[java.lang.Boolean]
      else {
        val p = Multimodal.perceptualHash64(blob)
        val off = bcOff.value
        val cs = bcCand.value
        var hit = false
        var b = 0
        while (!hit && b < 8) {
          val s = (b << 8) | ((p >>> (b * 8)) & 0xffL).toInt
          var j = off(s)
          val e = off(s + 1)
          while (!hit && j < e) {
            hit = java.lang.Long.bitCount(cs(j) ^ p) <= maxHamming
            j += 1
          }
          b += 1
        }
        java.lang.Boolean.valueOf(hit)
      }
    }
    media.withColumn("maybe_near_dup", gate(col(blobCol)))
  }

  private val phashUdf = udf { (blob: Array[Byte]) =>
    if (blob == null) null
    else java.lang.Long.valueOf(Multimodal.perceptualHash64(blob))
  }

  /**
   * The reference fingerprints exploded into the DISTRIBUTED band-index
   * artifact of [[phashGateStreamIndexed]]: one row per
   * `(band, key, phash)` — each fingerprint appears 8×, once per 8-bit
   * band (the [[Multimodal.perceptualNearDupPairs]] banding). Persist
   * this next to the corpus (ideally partitioned by `band`) and the
   * gate never needs the fingerprints on the driver.
   */
  def phashBandIndex(refs: DataFrame, phashCol: String): DataFrame =
    refs.select(col(phashCol).as("phash"),
        explode(array((0 until 8).map { b =>
          struct(lit(b).as("band"),
            (shiftrightunsigned(col(phashCol), b * 8) bitwiseAND lit(0xffL))
              .as("key"))
        }: _*)).as("bb"))
      .select(col("bb.band"), col("bb.key"), col("phash"))
      .distinct()

  /**
   * [[phashGateStream]] with the reference index as a PERSISTED,
   * DISTRIBUTED artifact — the 100 TB shape (the frozen variant
   * collects EVERY reference fingerprint into a driver-side CSR index:
   * 8 B × reference cardinality, a multi-TB collect at web scale).
   * Per micro-batch: each payload's fingerprint explodes to its 8
   * `(band, key)` probes, which BROADCAST into one inner equi-join
   * against the [[phashBandIndex]] artifact; the exact
   * `bit_count(xor) <= maxHamming` verify runs IN the join projection
   * (the gate stays exact — pigeonhole-complete to hamming 7, q101's
   * adjudication), matched ids distinct and broadcast back for the
   * flag. All broadcasts batch-bounded; the artifact only ever streams
   * distributed. Null payload -> null flag, the frozen gate's
   * convention. `foreachBatch` for the same reason as
   * [[DocStreams.nearDupGateStreamIndexed]]: the per-payload "any
   * reference within hamming" flag is a bounded batch aggregation, not
   * watermarked streaming state.
   */
  def phashGateStreamIndexed(
      media: DataFrame, blobCol: String, idCol: String,
      bandIndex: DataFrame, maxHamming: Int = 6)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(maxHamming <= 7, "8 x 8-bit bands are pigeonhole-complete only to 7")
    media.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: java.lang.Long) =>
        sink(phashGateIndexProbe(batch.toDF(), blobCol, idCol, bandIndex,
          maxHamming), batchId.longValue())
    }
  }

  /** The equi-join probe of [[phashGateStreamIndexed]] over one bounded
    * batch — package-visible so the spec can pin it equal to the
    * CSR-broadcast probe on identical input. */
  private[graft] def phashGateIndexProbe(
      batch: DataFrame, blobCol: String, idCol: String,
      bandIndex: DataFrame, maxHamming: Int): DataFrame = {
    val withP = batch.withColumn("__phash", phashUdf(col(blobCol)))
    val probes = withP.where(col("__phash").isNotNull)
      .select(col(idCol), col("__phash"),
        explode(array((0 until 8).map { b =>
          struct(lit(b).as("band"),
            (shiftrightunsigned(col("__phash"), b * 8) bitwiseAND lit(0xffL))
              .as("key"))
        }: _*)).as("bb"))
      .select(col(idCol), col("__phash"), col("bb.band"), col("bb.key"))
    val flagged = bandIndex
      .join(broadcast(probes), Seq("band", "key"))
      .where(bit_count(col("phash") bitwiseXOR col("__phash")) <= maxHamming)
      .select(col(idCol)).distinct()
      .withColumn("__hit", lit(true))
    withP.join(broadcast(flagged), Seq(idCol), "left_outer")
      .withColumn("maybe_near_dup",
        when(col("__phash").isNull, lit(null).cast("boolean"))
          .otherwise(coalesce(col("__hit"), lit(false))))
      .drop("__phash", "__hit")
  }
}
