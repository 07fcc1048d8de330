package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads as opaque `binary` columns
 * with typed metadata, plus batched feature extraction.
 *
 * The image/audio decode libraries are NOT present in this environment, so
 * the decoder body is a clearly-marked deterministic STUB (a byte
 * histogram standing in for "decode then embed"); everything around it —
 * schema, null-safety, per-partition batching via `mapPartitions` on a
 * typed Dataset, the frame-sampling slice algebra — is the real Spark
 * plumbing a production decode would use unchanged. At scale the decode
 * is embarrassingly parallel: no shuffle, one pass, codegen'd slicing.
 */
object Multimodal {

  case class MediaRow(media_id: Long, mime: String, nbytes: Long, blob: Array[Byte])
  case class MediaFeature(media_id: Long, dim: Int, feature: Array[Float])

  /**
   * Testdata has no binary payloads; manufacture blobs from document text
   * (UTF-8 bytes) with media metadata — the plumbing under test is the
   * binary-column handling, not the payload's origin.
   */
  def documentBlobs(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("mime"),
        col("text").cast("binary").as("blob"))
      .withColumn("nbytes", octet_length(col("blob")).cast("long"))

  /**
   * STUB DECODER: a real pipeline would decode the image/audio here
   * (libs unavailable in this container). The deterministic stand-in is a
   * normalized 16-bucket byte histogram — shaped exactly like an embedding
   * head (fixed dim, Array[Float], null-safe), so swapping in a real
   * decoder changes only this function's body.
   */
  def stubDecodeFeature(blob: Array[Byte], dim: Int = 16): Array[Float] = {
    val counts = new Array[Float](dim)
    if (blob == null || blob.isEmpty) return counts
    var i = 0
    while (i < blob.length) {
      counts((blob(i) & 0xff) % dim) += 1f
      i += 1
    }
    val n = blob.length.toFloat
    var j = 0
    while (j < dim) { counts(j) /= n; j += 1 }
    counts
  }

  /** Batched per-partition feature extraction (typed, no shuffle). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("mime"), col("nbytes"), col("blob"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // One batch per partition: a real decoder would init its native
        // context here once, then stream rows through it.
        rows.map(r => MediaFeature(r.media_id, dim, stubDecodeFeature(r.blob, dim)))
      }
  }

  // ------------------------------------------------- perceptual near-dup

  /**
   * 64-bit perceptual fingerprint of a media payload — the image/frame
   * near-dup primitive the text side gets from MinHash. The algorithm
   * is b-bit minwise hashing (Li & Koenig, WWW 2010) with
   * one-permutation bucketing (Li, Owen & Zhang, NIPS 2012), applied
   * to byte-shingle "local texture" features the way an image pipeline
   * applies dHash to a downsampled pixel grid:
   *
   *  - every length-`n` byte window of the payload is a local feature,
   *    Karp-Rabin hashed ([[graft.functions.RollingHash]]'s polynomial)
   *    and finalized by the same odd-constant multiply as the SimHash
   *    token hash (q15) — 64 well-mixed bits per window;
   *  - the hash space is split into 64 buckets by the top 6 bits (the
   *    "one permutation" partition); each bucket keeps its SIGNED
   *    minimum — a bucket's min is a MinHash, stable under small edits;
   *  - fingerprint bit k is the PARITY of bucket k's min (the b=1
   *    minwise bit), 0 for an empty bucket.
   *
   * A small local edit touches ~`n` windows and flips a bit only if one
   * of them was (or undercuts) its bucket's min AND the parity changes:
   * measured on the test corpus, planted near-dup payloads land at
   * hamming 0-2 of 64 while unrelated pairs concentrate near 32 (none
   * observed below 13) — the separation a perceptual hash exists for.
   * Pure integer bit algebra end to end, so the fingerprint is
   * DuckDB-replayable and the declared rows (q100/q101) hash-match
   * exactly. The pixel DECODE remains the stub (payload bytes stand in
   * for decoded pixels); a real decoder changes only which bytes feed
   * the windows, not one line of this algebra.
   */
  def perceptualHash64(blob: Array[Byte], n: Int = 8): Long = {
    val mins = new Array[Long](64)
    val seen = new Array[Boolean](64)
    var i = 0
    val last = blob.length - n
    while (i <= last) {
      var r = 0L
      var j = 0
      while (j < n) { r = r * 1000000007L + (blob(i + j) & 0xffL); j += 1 }
      val h = r * -7046029254386353131L
      val b = (h >>> 58).toInt
      if (!seen(b) || h < mins(b)) { mins(b) = h; seen(b) = true }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (seen(k) && (mins(k) & 1L) == 1L) out |= (1L << k)
      k += 1
    }
    out
  }

  private val phashUdf = udf { (blob: Array[Byte]) =>
    // Null payload -> null fingerprint (NOT 0L, which is the honest
    // fingerprint of a too-short payload) — the simHashUdf convention.
    if (blob == null) null else java.lang.Long.valueOf(perceptualHash64(blob))
  }

  /** media id + 64-bit perceptual fingerprint (null payloads excluded). */
  def perceptualHashes(media: DataFrame, idCol: String, blobCol: String): DataFrame =
    media.select(col(idCol).as("media"), phashUdf(col(blobCol)).as("phash"))
      .where(col("phash").isNotNull)

  /**
   * Perceptual near-dup pairs with hamming(phash) <= `maxHamming`
   * (<= 7 supported): 8-bit band-equality candidates — a pair within
   * hamming 7 differs in at most 7 of the 8 bands, so at least one
   * band matches EXACTLY (pigeonhole-complete, the q15 adjudication) —
   * then the exact `bit_count(xor)` filter. The join ships (band, key)
   * ints, never payloads; candidate fan-out is bounded by bucket
   * occupancy exactly as in [[Dedup.simHashPairs]].
   */
  def perceptualNearDupPairs(
      media: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "8 x 8-bit bands are pigeonhole-complete only to 7")
    val hashes = perceptualHashes(media, idCol, blobCol)
    val banded = hashes.select(col("media"), col("phash"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          (shiftrightunsigned(col("phash"), b * 8) bitwiseAND lit(0xffL)).as("key"))
      }: _*)).as("bb"))
      .select(col("media"), col("phash"), col("bb.band"), col("bb.key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media") < col("b.media"))
      .select(col("a.media").as("m1"), col("b.media").as("m2"),
        bit_count(col("a.phash") bitwiseXOR col("b.phash")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /**
   * CROSS-MODAL dedup join — the caption↔media contract: perceptual
   * near-dup MEDIA pairs ([[perceptualNearDupPairs]]) annotated with
   * whether their CAPTIONS are exact text dups ([[Dedup.fingerprint]]'s
   * normalize+md5). Rows with `same_caption = false` are the dups ONLY
   * the image side can see — same (near-identical) media re-captioned —
   * which is exactly the pair class a text-only dedup pass ships twice
   * into training; a LAION-style multimodal pipeline dedupes on the
   * media fingerprint and keeps one caption per media cluster.
   *
   * Scale shape: the pair set is the bounded output of the banded
   * media near-dup join; attaching captions is two equi-joins keyed by
   * media id that ship `(id, 32-byte fingerprint)` — never text, never
   * payloads (AQE broadcasts the pair side once its post-join size is
   * known).
   */
  def crossModalDupPairs(
      media: DataFrame, mediaIdCol: String, blobCol: String,
      captions: DataFrame, capIdCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val pairs = perceptualNearDupPairs(media, mediaIdCol, blobCol, maxHamming)
    val fps = captions.select(
      col(capIdCol).as("cap_id"), Dedup.fingerprint(col(textCol)).as("cap_fp"))
    pairs
      .join(fps.select(col("cap_id").as("m1"), col("cap_fp").as("fp1")), Seq("m1"))
      .join(fps.select(col("cap_id").as("m2"), col("cap_fp").as("fp2")), Seq("m2"))
      .select(col("m1"), col("m2"), col("hamming"),
        (col("fp1") === col("fp2")).as("same_caption"))
  }

  /**
   * Media duplicate-CLUSTER resolution + canonical-copy selection — the
   * image side of q40/q110: perceptual near-dup pairs
   * ([[perceptualNearDupPairs]]) resolved transitively into clusters
   * (a~b, b~c dedupes b AND c even when a~c never surfaced as a pair),
   * then per cluster the LARGEST payload wins (`nbytes` desc, id asc) —
   * the "keep the highest-resolution copy" policy an image pipeline
   * applies where the text side keeps the longest article. Media with
   * no near-dup partner cluster to themselves and are their own
   * representative.
   *
   * Output per media row: `(media_id, cluster_id, rep_id, keep)`.
   *
   * Scale shape: cluster resolution rides [[Curation.dupClusters]]'s
   * shared CC cache (bounded to the PAIRED ids — dup volume, not corpus
   * volume); the representative argmax is one partial-combined
   * `max(struct(nbytes, -id))` per cluster, no window over the corpus;
   * nothing after the banded pair join ever ships a payload.
   */
  def mediaDupClusters(
      media: DataFrame, idCol: String, blobCol: String, sizeCol: String,
      maxHamming: Int = 6): DataFrame = {
    val pairs = perceptualNearDupPairs(media, idCol, blobCol, maxHamming)
      .select(col("m1"), col("m2"))
    val present = media.where(col(blobCol).isNotNull)
      .select(col(idCol).as("media_id"), col(sizeCol).as("nbytes"))
    val clusters = Curation.dupClusters(
      present.select(col("media_id")), "media_id", pairs, "m1", "m2")
    val sized = clusters.join(present, "media_id")
    val reps = sized.groupBy(col("cluster_id"))
      .agg(max(struct(col("nbytes"), (-col("media_id")).as("negid"))).as("m"))
      .select(col("cluster_id"), (-col("m.negid")).as("rep_id"))
    sized.join(reps, "cluster_id")
      .select(col("media_id"), col("cluster_id"), col("rep_id"),
        (col("media_id") === col("rep_id")).as("keep"))
  }

  /**
   * Frame sampling: fixed-width byte windows every `stride` bytes
   * (the video-frame access pattern), pure slice algebra on the binary
   * column — one row per (media, frame).
   */
  def sampleFrames(media: DataFrame, width: Int, stride: Int): DataFrame = {
    val nFrames = greatest(
      lit(0),
      ((col("nbytes") - width) / stride).cast("long") + 1)
    media
      .where(col("nbytes") >= width) // before explode: keeps sequence() ascending
      .select(col("media_id"), col("nbytes"), col("blob"),
        explode(sequence(lit(0L), nFrames - 1)).as("frame_no"))
      .select(
        col("media_id"), col("frame_no"),
        substring(col("blob"), (col("frame_no") * stride + 1).cast("int"), lit(width))
          .as("frame"))
  }
}
