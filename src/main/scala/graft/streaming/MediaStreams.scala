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
}
