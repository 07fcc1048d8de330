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
   *
   * `key` defaults to the case/whitespace [[Dedup.fingerprint]]; pass
   * [[graft.pipeline.Canonicalize.canonicalFingerprint]] (or the NFKC
   * strength) to make the STREAM dedupe across Unicode spellings — the
   * q149 canonicalization applied at ingest time, where cross-source
   * duplicate spellings actually arrive.
   */
  def dedupStream(
      docs: DataFrame, textCol: String, eventTimeCol: String,
      delay: String,
      key: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        Dedup.fingerprint): DataFrame =
    docs
      .withColumn("fingerprint", key(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /**
   * Streaming NEAR-dup gate: flag each arriving document whose MinHash
   * band signature collides with a STATIC reference corpus's — the
   * banded-LSH analogue of [[contaminationGateStream]]'s exact-gram
   * bloom gate, for suppression of near-COPIES (whitespace edits, small
   * rewrites) that exact fingerprints miss. The reference corpus's
   * `(band, bucket)` keys come from the batch index
   * ([[graft.pipeline.Dedup.minHashBuckets]], collected once — docs x
   * bands rows of two ints, the bounded broadcast a gate corpus implies)
   * and broadcast at stream start; each arriving doc computes its own
   * band buckets PER ROW (min-over-array reformulation of the batch
   * grouped min — bit-identical signatures, spec-enforced) and probes
   * the set. Stateless per micro-batch, no streaming state at all.
   *
   * The flag means "shares >= 1 LSH band with some reference doc" —
   * exactly the batch candidate-generation predicate, so flagged docs
   * are [[graft.pipeline.Dedup.minHashPairs]]' CANDIDATES (recall
   * `1-(1-t^r)^b` per true near-dup, ~1 in the tight-dup regime banding
   * serves); the exact-Jaccard verify belongs to the batch sweep over
   * quarantined docs, mirroring the bloom gate's re-check contract.
   *
   * Output: input columns + `n_shingles` + `maybe_near_dup` (a doc with
   * zero shingles never flags — it has no signature to collide).
   */
  def nearDupGateStream(
      docs: DataFrame, textCol: String,
      corpusBuckets: Set[(Int, Int)],
      n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val bc = packedBroadcast(docs.sparkSession, corpusBuckets)
    nearDupGateProbe(docs, textCol, bc, n, bands, rowsPerBand)
  }

  /** (band, bucket) packed into one long each, sorted for binary search:
    * the probe runs per ARRIVING ROW, so it must not allocate (a
    * Set[(Int, Int)] lookup boxes a tuple per band per row — the
    * cellsUdf defect class); the packed array is also the smaller
    * broadcast. */
  private def packedBroadcast(
      spark: org.apache.spark.sql.SparkSession,
      corpusBuckets: Set[(Int, Int)]): org.apache.spark.broadcast.Broadcast[Array[Long]] = {
    val packed = corpusBuckets.toArray
      .map { case (b, h) => (b.toLong << 32) | (h.toLong & 0xffffffffL) }
    java.util.Arrays.sort(packed)
    spark.sparkContext.broadcast(packed)
  }

  /** The gate's probe columns over a batch OR streaming frame — shared
    * by the frozen-reference stream and the per-batch refreshing
    * variant. */
  private def nearDupGateProbe(
      docs: DataFrame, textCol: String,
      bc: org.apache.spark.broadcast.Broadcast[Array[Long]],
      n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Per-row signature: h_i = min over shingles of xxhash64(i, gram),
    // gram = xxhash64(shingle) — the same expression tree as the batch
    // index path (xxhash64 of the string, then seeded-by-position
    // xxhash64 over the long), with the grouped min replaced by
    // array_min over the row's own shingles.
    val grams = transform(Dedup.shingles(col(textCol), n), g => xxhash64(g))
    val sig = array((0 until numHashes).map(i =>
      array_min(transform(col("__grams"), x => xxhash64(lit(i), x)))): _*)
    val buckets = array((0 until bands).map { b =>
      hash((0 until rowsPerBand)
        .map(r => col("__sig").getItem(b * rowsPerBand + r)): _*)
    }: _*)
    val anyHit = udf { (bks: Seq[Int]) =>
      bks != null && {
        val keys = bc.value
        var band = 0
        var hit = false
        val it = bks.iterator
        while (!hit && it.hasNext) {
          val key = (band.toLong << 32) | (it.next().toLong & 0xffffffffL)
          hit = java.util.Arrays.binarySearch(keys, key) >= 0
          band += 1
        }
        hit
      }
    }
    docs
      .withColumn("__grams", grams)
      .withColumn("__sig", sig)
      .withColumn("n_shingles", size(col("__grams")).cast("long"))
      .withColumn("maybe_near_dup",
        col("n_shingles") > 0 && anyHit(buckets))
      .drop("__grams", "__sig")
  }

  /**
   * [[nearDupGateStream]] with the reference index as a PERSISTED,
   * DISTRIBUTED artifact instead of a driver-collected broadcast set —
   * the 100 TB shape. The frozen variant materializes the corpus's
   * `(band, bucket)` set on the driver (reference-corpus-cardinality ×
   * 8 B: a multi-TB collect at web scale); this one takes the DISTINCT
   * bucket artifact as a DataFrame (typically `spark.read.parquet` over
   * the index [[graft.pipeline.Dedup.minHashBuckets]] persisted) and
   * probes it per micro-batch with an EQUI-JOIN — the driver never
   * holds a row of it.
   *
   * Join shape per batch (all batch-bounded broadcasts; the artifact
   * only ever streams distributed): the batch's per-row band buckets
   * explode to `(id, band, bucket)` keys — batch × bands rows — which
   * BROADCAST into one inner equi-join against the artifact; matched
   * ids distinct (≤ batch-sized), broadcast back onto the batch for the
   * flag column. Same predicate as the frozen gate (same signature
   * expressions, same "shares ≥ 1 band" semantics — spec-pinned equal),
   * stateless per batch, no streaming state.
   *
   * `foreachBatch` rather than an unbatched stream-static join because
   * the per-DOC flag needs "any band matched" — an aggregation that
   * would demand watermarked streaming state, while inside the batch
   * callback it is a plain bounded groupBy (the q135 artifact-
   * maintenance pattern). Callers own trigger/checkpoint/start.
   */
  /**
   * Streaming BOILERPLATE gate: flag each arriving document that
   * contains any corpus-hot chunk, served from the PERSISTED chunk-count
   * artifact (the q163 lifecycle) via a per-batch equi-join — the q98
   * indexed-gate shape, never a driver-collected hot set (the count
   * table is corpus-vocabulary-sized). The probe IS the batch strip's
   * counting half ([[graft.pipeline.Curation.stripWithChunkCounts]]), so
   * `gated` means exactly "the batch cleaning pass (q161) would drop at
   * least one chunk of this document" — same thresholds, same chunking,
   * same absent-chunk-counts-0 staleness semantics. Callers own
   * trigger/checkpoint/start.
   */
  def boilerplateGateStream(
      docs: DataFrame, textCol: String, idCol: String,
      chunkCounts: DataFrame, chunk: Int, minDocs: Long)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: java.lang.Long) =>
        sink(boilerplateGateProbe(batch.toDF(), textCol, idCol, chunkCounts,
          chunk, minDocs), batchId.longValue())
    }

  /** The per-batch probe of [[boilerplateGateStream]] — package-visible
    * so the spec can pin it equal to the batch strip's flags. */
  private[graft] def boilerplateGateProbe(
      batch: DataFrame, textCol: String, idCol: String,
      chunkCounts: DataFrame, chunk: Int, minDocs: Long): DataFrame =
    graft.pipeline.Curation
      .stripWithChunkCounts(batch, chunkCounts, idCol, textCol, chunk, minDocs)
      .select(col(idCol), col("n_chunks"), col("n_dropped"),
        (col("n_dropped") > 0L).as("gated"))

  /**
   * Streaming LM-QUALITY gate served from the persisted LM artifact
   * ([[graft.pipeline.Signals.saveLmArtifact]] — pruned bigram table,
   * unigram backoff table, token total): each arriving document is
   * stupid-backoff-scored per micro-batch by the SAME
   * `scoreBackoffWithModel` the batch row (q172) runs — the probe is
   * the batch scorer applied to the batch's rows against the frozen
   * artifact, so stream == batch is equality by construction — and
   * gated when its mean per-bigram score falls below `thrE12` (exact
   * integer compare: `score_e12 < thrE12 * n_bigrams`), the CCNet-style
   * "model finds this document improbable" filter applied at ingest.
   *
   * Both model tables are vocabulary-sized DataFrames (broadcast by the
   * planner when small, shuffled equi-joins above that) — the driver
   * never holds a model row; zero-bigram docs are NOT gated (no
   * evidence). Stateless per batch. Callers own
   * trigger/checkpoint/start.
   */
  def lmGateStream(
      docs: DataFrame, textCol: String, idCol: String,
      artifact: graft.pipeline.Signals.LmArtifact, thrE12: Long)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: java.lang.Long) =>
        sink(lmGateProbe(batch.toDF(), textCol, idCol, artifact, thrE12),
          batchId.longValue())
    }

  /** The per-batch probe of [[lmGateStream]] — package-visible so the
    * spec can pin it equal to the batch scorer's output. */
  private[graft] def lmGateProbe(
      batch: DataFrame, textCol: String, idCol: String,
      artifact: graft.pipeline.Signals.LmArtifact, thrE12: Long): DataFrame =
    graft.pipeline.Signals.scoreBackoffWithModel(
        batch, idCol, textCol,
        artifact.bigrams.select(col("w1"), col("w2"), col("cond_p")),
        artifact.unigrams, artifact.totalTokens)
      .withColumn("gated",
        col("n_bigrams") > 0L && col("score_e12") < lit(thrE12) * col("n_bigrams"))

  def nearDupGateStreamIndexed(
      docs: DataFrame, textCol: String, idCol: String,
      bucketIndex: DataFrame,
      n: Int, bands: Int, rowsPerBand: Int)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: java.lang.Long) =>
        sink(nearDupGateIndexProbe(batch.toDF(), textCol, idCol, bucketIndex,
          n, bands, rowsPerBand), batchId.longValue())
    }

  /** The equi-join probe of [[nearDupGateStreamIndexed]] over one
    * bounded batch — package-visible so the spec can pin it equal to
    * the broadcast-set probe on identical input. */
  private[graft] def nearDupGateIndexProbe(
      batch: DataFrame, textCol: String, idCol: String,
      bucketIndex: DataFrame,
      n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val numHashes = bands * rowsPerBand
    // identical signature expressions to the frozen gate's probe
    val grams = transform(Dedup.shingles(col(textCol), n), g => xxhash64(g))
    val sig = array((0 until numHashes).map(i =>
      array_min(transform(col("__grams"), x => xxhash64(lit(i), x)))): _*)
    val buckets = array((0 until bands).map { b =>
      hash((0 until rowsPerBand)
        .map(r => col("__sig").getItem(b * rowsPerBand + r)): _*)
    }: _*)
    val withSig = batch
      .withColumn("__grams", grams)
      .withColumn("__sig", sig)
      .withColumn("n_shingles", size(col("__grams")).cast("long"))
      .withColumn("__buckets", buckets)
      .drop("__grams", "__sig")
    val exploded = withSig.where(col("n_shingles") > 0)
      .select(col(idCol), posexplode(col("__buckets")).as(Seq("band", "bucket")))
    val flagged = bucketIndex
      .join(broadcast(exploded), Seq("band", "bucket"))
      .select(col(idCol)).distinct()
      .withColumn("__hit", lit(true))
    withSig.drop("__buckets")
      .join(broadcast(flagged), Seq(idCol), "left_outer")
      .withColumn("maybe_near_dup",
        col("n_shingles") > 0 && coalesce(col("__hit"), lit(false)))
      .drop("__hit")
  }

  /**
   * [[nearDupGateStream]] with a reference corpus that GROWS while the
   * gate runs: the frozen variant broadcasts its `(band, bucket)` set
   * once at stream start, so a long-lived gate slowly goes stale as the
   * landed corpus accretes behind it. This variant re-reads the current
   * set AT EACH MICRO-BATCH BOUNDARY (`foreachBatch` — the standard
   * mechanism for per-batch side input refresh): `currentBuckets` is
   * called once per batch on the driver, its result packed/broadcast,
   * the batch probed exactly like the frozen gate (same columns, same
   * allocation-free binary-search probe — spec-pinned equal per batch),
   * and the batch broadcast released as soon as the sink call returns —
   * the gate holds ONE reference snapshot at a time, never a history.
   *
   * `currentBuckets` typically closes over a batch-side index query
   * ([[graft.pipeline.Dedup.minHashBuckets]] over the reference table,
   * collected — the same bounded metadata the frozen gate ships once);
   * its cost is per BATCH, not per row, and a deployment that wants
   * cheaper refresh swaps in an incremental collector without touching
   * the gate. Returns the started query's writer so callers own
   * trigger/checkpoint/start, mirroring the composable frozen variant.
   */
  def nearDupGateStreamRefreshing(
      docs: DataFrame, textCol: String,
      currentBuckets: () => Set[(Int, Int)],
      n: Int, bands: Int, rowsPerBand: Int)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: java.lang.Long) =>
        val bc = packedBroadcast(batch.sparkSession, currentBuckets())
        try sink(
          nearDupGateProbe(batch, textCol, bc, n, bands, rowsPerBand),
          batchId.longValue())
        finally bc.unpersist()
    }

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
