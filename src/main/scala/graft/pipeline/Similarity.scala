package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding
 * column.
 *
 *  - [[cosine]]: pure Catalyst (`zip_with` + `aggregate`), all math in
 *    double, left-to-right accumulation — deterministic bit-for-bit.
 *  - [[bruteForceTopK]]: exact baseline. The query side is broadcast (the
 *    usual shape: few queries vs a huge corpus), cosine is codegen'd
 *    column algebra, top-k via window `row_number` partitioned by query.
 *    A 100x corpus scales linearly with no shuffle of the corpus — the
 *    only shuffle is the final per-query top-k (tiny).
 *  - [[lshTopK]]: the scale path. Random-hyperplane LSH (seeded,
 *    deterministic planes broadcast as literals), multi-table to recover
 *    recall, bucket-equality candidate join, exact cosine re-rank. Probes
 *    `n_tables * bucket` instead of the full corpus.
 */
object Similarity {

  // ANN query paths broadcast bounded per-invocation payloads (centroids,
  // codebooks, query LUTs, probe maps) that stay referenced by the LAZY
  // result DataFrames, so they cannot be destroyed eagerly at function
  // return — the Bpe.liveBroadcasts discipline applies: track every one
  // here and sweep via [[clearCaches]] with unpersist (not destroy),
  // which releases the executor copies while keeping the driver-side
  // value usable — a sweep stays safe for in-flight plans (tasks
  // re-fetch from the driver on next use), preserving the Caches
  // contract. Without the sweep a long-lived session issuing many query
  // batches accumulates executor storage one broadcast per batch.
  private val liveBroadcasts = new java.util.concurrent.ConcurrentLinkedQueue[
    org.apache.spark.broadcast.Broadcast[_]]()

  private def trackedBroadcast[T: scala.reflect.ClassTag](
      spark: SparkSession, value: T): org.apache.spark.broadcast.Broadcast[T] = {
    val bc = spark.sparkContext.broadcast(value)
    liveBroadcasts.add(bc)
    bc
  }

  /** Number of ANN broadcasts currently tracked (spec hook). */
  private[graft] def liveBroadcastCount: Int = liveBroadcasts.size()

  /** Release executor blocks of every ANN broadcast issued by past query
    * batches (each q34/q86/q87-style invocation creates a few). Swept by
    * [[graft.Caches.clearAll]]. */
  def clearCaches(): Unit = {
    var bc = liveBroadcasts.poll()
    while (bc != null) {
      try bc.unpersist() catch { case _: Throwable => }
      bc = liveBroadcasts.poll()
    }
  }

  /**
   * Cosine similarity of two float-array columns, computed in double via
   * the codegen'd [[graft.functions.ArrayDot]] (bit-identical to the
   * `aggregate`/`zip_with` formulation, ~10x faster: no interpreted
   * lambdas or intermediate arrays on the pair loop).
   */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.array_cosine(a, b)

  /**
   * Exact top-k neighbors for each query vector (self-matches excluded).
   * Deterministic ordering: (cosine desc, neighbor id asc).
   */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("query_vec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /**
   * HARD-NEGATIVE mining for contrastive training data: per query, the
   * `k` most similar corpus vectors with a DIFFERENT label — the
   * near-miss negatives a retrieval/embedding trainer pairs with each
   * anchor. [[bruteForceTopK]]'s exact shape (bounded query batch
   * broadcast, corpus streamed, codegen'd cosine, per-query window
   * top-k) with the label anti-filter applied BEFORE ranking, so the
   * top-k is over the negative candidate set itself, not a post-filter
   * of the overall neighborhood (which could yield fewer than k — or
   * zero — negatives for anchors inside same-label clusters).
   */
  def hardNegativesTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      col(labelCol).as("query_label")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
      col(labelCol).as("neighbor_label"))
    val scored = c.join(q,
        col("neighbor_id") =!= col("query_id") &&
          col("neighbor_label") =!= col("query_label"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("query_vec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic unit hyperplanes: dims x planes, seeded. */
  private[pipeline] def hyperplanes(
      numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /**
   * All per-table sign-pattern buckets of a vector in one pass. A single
   * UDF over the broadcast plane matrix beats encoding the planes as
   * column literals: tables x planes x dim literal nodes explode the
   * expression tree past what codegen can inline.
   */
  private def bucketsUdf(planes: Array[Array[Array[Double]]]) =
    udf { v: Seq[Float] =>
      val vec = v.toArray
      planes.map { tablePlanes =>
        var bucket = 0L
        var i = 0
        while (i < tablePlanes.length) {
          val p = tablePlanes(i)
          var proj = 0.0
          var j = 0
          val n = math.min(p.length, vec.length)
          while (j < n) { proj += vec(j) * p(j); j += 1 }
          if (proj >= 0) bucket |= (1L << i)
          i += 1
        }
        bucket
      }.toSeq
    }

  /**
   * LSH-bucketed approximate top-k: candidates = pairs sharing a bucket in
   * any table, re-ranked by exact cosine. Recall rises with numTables;
   * candidate cost falls with numPlanes.
   */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 6, numTables: Int = 16, seed: Long = 42L): DataFrame = {
    // dim 1 fallback keeps an EMPTY corpus planning through (every frame
    // downstream is empty with the right schema) instead of throwing on
    // head-of-nothing — the dry-shard case a pipeline must survive
    val dim = corpus.select(size(col(vecCol))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(1)
    val planes = Array.tabulate(numTables)(t => hyperplanes(numPlanes, dim, seed + t))
    val buckets = bucketsUdf(planes)
    def withBuckets(df: DataFrame, side: String): DataFrame = df
      .select(col(idCol).as(s"${side}_id"),
        posexplode(buckets(col(vecCol))).as(Seq("table", "bucket")))

    // Candidate pairs carry ids only — the bucket join and the distinct
    // never shuffle vector payloads; vectors re-attach afterwards (query
    // side broadcast, corpus side one narrow shuffle of candidate ids).
    val qb = broadcast(withBuckets(queries, "query"))
    val cb = withBuckets(corpus, "neighbor")
    val cand = cb.join(qb, Seq("table", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")), "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  private def unitVec(v: Array[Double]): Array[Double] = {
    var n = 0.0
    v.foreach(x => n += x * x)
    val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
    v.map(_ * inv)
  }

  /**
   * Train the IVF coarse quantizer: driver k-means (cosine metric, unit
   * centroids) over a deterministic bounded sample — the trainable half
   * of [[ivfTopK]], exposed so an index can be built ONCE and reused
   * across query batches (see [[saveIvfIndex]]/[[loadIvfIndex]]).
   * Returns an empty array on an empty corpus.
   */
  def trainIvfCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int = 16, iterations: Int = 5,
      sampleSize: Int = 2048, seed: Long = 42L): Array[Array[Double]] = {
    import corpus.sparkSession.implicits._
    // Deterministic training sample: first `sampleSize` rows by id (any
    // orderable id type — only the vectors are collected).
    val sample = corpus
      .select(col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(sampleSize)
      .as[Seq[Double]].collect().map(v => unitVec(v.toArray))
    if (sample.isEmpty) return Array.empty
    // Never more centroids than sample vectors (tiny corpora degrade to
    // fewer cells, worst case 1 = brute force within the single list).
    val k2 = math.min(numCentroids, sample.length)
    val rng = new scala.util.Random(seed)
    var centroids = rng.shuffle(sample.indices.toList).take(k2)
      .map(sample(_)).toArray
    val numCells = centroids.length
    for (_ <- 0 until iterations) {
      val sums = Array.fill(numCells)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](numCells)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < numCells) {
          var d = 0.0; var i = 0
          while (i < v.length) { d += v(i) * centroids(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(numCells)(c =>
        if (counts(c) == 0) centroids(c) else unitVec(sums(c)))
    }
    centroids
  }

  /** Persist a trained IVF quantizer as (cell, centroid) parquet — the
    * index artifact a production deployment trains once and ships to
    * every query job (doubles round-trip bit-exactly through parquet,
    * so loaded assignments are IDENTICAL — spec-pinned). */
  def saveIvfIndex(
      spark: SparkSession, centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toSeq) }
      .toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveIvfIndex]] artifact back into probe-ready form. */
  def loadIvfIndex(spark: SparkSession, path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(path)
      .orderBy(col("cell"))
      .select(col("centroid"))
      .as[Seq[Double]].collect().map(_.toArray)
  }

  /**
   * IVF (inverted-file) ANN: a coarse k-means quantizer trained
   * driver-side on a bounded sample (seeded Lloyd iterations over
   * unit-normalized vectors), corpus rows assigned to their nearest
   * centroid's inverted list, queries probing the `nProbe` nearest lists,
   * exact cosine re-rank inside the probed lists. With
   * `nProbe == numCentroids` this degenerates to exact brute force
   * (spec-enforced); smaller probes trade recall for touching only
   * `nProbe/numCentroids` of the corpus — the IVF scale contract.
   */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numCentroids: Int = 16, nProbe: Int = 4,
      iterations: Int = 5, sampleSize: Int = 2048, seed: Long = 42L): DataFrame = {
    val centroids = trainIvfCentroids(
      corpus, idCol, vecCol, numCentroids, iterations, sampleSize, seed)
    // An empty corpus has nothing to train centroids on; brute force over
    // the same empty corpus yields the identical (empty) result schema
    // instead of throwing — pipelines must survive a dry shard.
    if (centroids.isEmpty) return bruteForceTopK(corpus, queries, idCol, vecCol, k)
    ivfTopKWithCentroids(corpus, queries, idCol, vecCol, k, centroids, nProbe)
  }

  /** The probe half of [[ivfTopK]]: assign + search with a given (trained
    * or loaded) quantizer. */
  def ivfTopKWithCentroids(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    require(centroids.nonEmpty, "ivfTopKWithCentroids needs a trained index")
    val bcCentroids = trackedBroadcast(corpus.sparkSession, centroids)

    // Corpus-side assignment IS the scan at 100x: one tight-loop argmax
    // per row ([[nearestCosine]]), no per-cell tuple/boxing allocation.
    val cellUdf = udf { (v: Seq[Float]) =>
      nearestCosine(bcCentroids.value, unitVec(v.map(_.toDouble).toArray))
    }
    // Query side is bounded; the bounded partial select ([[topCells]]) is
    // bit-identical to a full sort by (-dot, cell) + take (spec-pinned).
    val probeUdf = udf { (v: Seq[Float]) =>
      topCells(bcCentroids.value, unitVec(v.map(_.toDouble).toArray), nProbe).toSeq
    }

    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      cellUdf(col(vecCol)).as("cell"))
    val qb = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probeUdf(col(vecCol))).as("cell")))
    // No dedup needed: each corpus row lives in exactly one cell and a
    // query's probed cells are distinct, so pairs are unique by construction.
    val scored = cb.join(qb, "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF-assign every corpus row: `(idCol, cell, vec)` — the IVF-FLAT
    * inverted list (raw vectors grouped by their coarse cell; contrast
    * [[ivfPqEncode]], which stores compressed codes). Persisted via
    * [[saveEncodedCorpus]] — whose default lays it out
    * directory-per-cell — a query batch READS only its probed cells'
    * vectors ([[ivfTopKFromAssigned]]'s partition-pruned scan), where
    * the inline [[ivfTopKWithCentroids]] scans the full corpus and
    * prunes compute only. One tight-loop argmax per row. */
  def ivfAssign(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "ivfAssign needs a trained index")
    val bc = trackedBroadcast(corpus.sparkSession, centroids)
    val cellUdf = udf { (v: Seq[Float]) =>
      nearestCosine(bc.value, unitVec(v.map(_.toDouble).toArray))
    }
    corpus.select(col(idCol), cellUdf(col(vecCol)).as("cell"),
      col(vecCol).as("vec"))
  }

  /**
   * [[ivfTopKWithCentroids]] served from a PRE-ASSIGNED inverted list
   * (an [[ivfAssign]] frame, typically loaded from its
   * [[saveEncodedCorpus]] artifact): the scan is filtered to the union
   * of the query batch's probed cells — a bounded literal IN-list that
   * becomes PARTITION PRUNING on the cell-partitioned artifact, so only
   * ~nProbe/numCells of the corpus vectors are READ, not merely skipped
   * after scoring. Identical results to the inline path (spec-pinned):
   * a row outside every probed cell can never join a probe.
   */
  def ivfTopKFromAssigned(
      assigned: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    require(centroids.nonEmpty, "ivfTopKFromAssigned needs a trained index")
    val spark = assigned.sparkSession
    val bcCentroids = trackedBroadcast(spark, centroids)
    val probeUdf = udf { (v: Seq[Float]) =>
      topCells(bcCentroids.value, unitVec(v.map(_.toDouble).toArray), nProbe).toSeq
    }
    // The probed cell set derives driver-side from the bounded query rows
    // (the same rows the probe join broadcasts) — queries x nProbe ids.
    val (_, units) = collectQueries(spark, queries, idCol, vecCol)
    val probedCells = units.flatMap(u => topCells(centroids, u, nProbe))
      .distinct.sorted.toSeq
    val cb = assigned
      .where(col("cell").isin(probedCells: _*))
      .select(col(idCol).as("neighbor_id"), col("vec").as("nv"), col("cell"))
    val qb = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probeUdf(col(vecCol))).as("cell")))
    val scored = cb.join(qb, "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /**
   * Exact embedding-cosine near-dup pairs (cosine >= threshold, id1 < id2).
   * Brute-force all-pairs with the broadcast-nested-loop join + codegen'd
   * cosine — exact and oracle-checkable. At corpus sizes where n^2 stops
   * being affordable, [[lshTopK]]'s bucket candidates + this threshold
   * filter is the scale path (same verify step, approximate recall).
   */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorExprs.array_dot
    // Normalize each side ONCE (per-row cast + norm), so the n^2 pair loop
    // is a single codegen'd dot over array<double> — no per-pair casts or
    // norm recomputation (those made this 8x slower).
    def unit(side: DataFrame, idAs: String, vecAs: String): DataFrame = side
      .select(col(idCol).as(idAs), col(vecCol).cast("array<double>").as("v"),
        sqrt(array_dot(col(vecCol), col(vecCol))).as("n"))
      .select(col(idAs), transform(col("v"), x => x / col("n")).as(vecAs))
    val a = unit(df, "v1", "va")
    val b = unit(df, "v2", "vb")
    a.join(b, col("v1") < col("v2"))
      .where(array_dot(col("va"), col("vb")) >= threshold)
      .select(col("v1"), col("v2"))
  }

  /** The grid-sizing rule: `max(8, ceil(n / 10k))` blocks, so a cell's
    * two sides stay ~10k rows whatever the corpus size (the scaladoc's
    * n/10k rule, applied — not a constant that 100x growth outruns). */
  private[pipeline] def autoGridBlocks(n: Long): Int =
    math.max(8L, (n + 9999L) / 10000L).toInt

  /** Unit-normalize a vector column once per row (shared by the pair ops):
    * id as `idAs`, normalized `array<double>` as `vecAs`. */
  private def unitRows(
      df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame = {
    import graft.functions.VectorExprs.array_dot
    df.select(col(idCol).as(idAs), col(vecCol).cast("array<double>").as("v"),
        sqrt(array_dot(col(vecCol), col(vecCol))).as("n"))
      .select(col(idAs), transform(col("v"), x => x / col("n")).as(vecAs))
  }

  /**
   * Exact embedding-cosine near-dup pairs via a GRID-PARTITIONED block
   * join — the same pair set as [[cosineNearDupPairs]] but with a plan a
   * 1000-executor cluster can run: no BroadcastNestedLoopJoin (no
   * driver-side broadcast of the whole corpus), the inherent n^2 pair work
   * spread over `blocks*(blocks+1)/2` independent tasks of bounded size
   * `(n/blocks)^2`, each fed by a plain shuffle equi-join on block id.
   *
   * Why exact and not LSH here: with this corpus's threshold (0.42) the
   * hyperplane collision probability of a qualifying pair
   * (1 - acos(0.423)/pi = 0.639/plane) is statistically indistinguishable
   * from the background just under the threshold (1 - acos(0.418)/pi =
   * 0.638/plane), so banded candidates are either ~all pairs or miss true
   * pairs — measured on this data, not assumed. LSH banding pays off only
   * when the threshold leaves a real probability gap (cf. MinHash q14:
   * jaccard 0.99 vs threshold 0.7); [[lshNearDupPairs]] covers that regime
   * and its spec proves set-equality there. For loose cosine thresholds the
   * honest scale path is distributing the exact quadratic work evenly —
   * which this operator does.
   *
   * `blocks` sizes the grid: cells hold ~(n/blocks)^2 dot products; the
   * default (0 = auto) derives it from the corpus row count as
   * `max(8, ceil(n / 10k))` — cells stay ~10k-a-side however large the
   * corpus grows (a fixed constant would leave cells of (n/const)^2 work,
   * 10,000x per cell at 100x rows), while the floor of 8 keeps 36 cells
   * of parallelism on small corpora. The sizing count is one
   * column-pruned pass (parquet answers it from footer metadata); pass an
   * explicit block count to skip it when n is already known. The pair set
   * is block-count-invariant (spec-pinned), so auto-sizing can never
   * change results, only task granularity.
   */
  def gridNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      blocks: Int = 0): DataFrame = {
    import graft.functions.VectorExprs.array_dot
    require(blocks >= 0, s"blocks must be >= 0 (0 = auto), got $blocks")
    val nBlocks =
      if (blocks > 0) blocks
      else autoGridBlocks(df.select(col(idCol)).count())
    // Deterministic block id from a hash of the row id; grid cell (i, j)
    // with i <= j owns the pairs between blocks i and j. Each a-row in
    // block i replicates to cells (i, i..blocks-1); each b-row in block j
    // to cells (0..j, j) — every unordered cross-block pair meets in
    // exactly one cell and same-block pairs are ordered by id, so no
    // dedup pass is needed. The equi-join key is the FULL cell (ci, cj):
    // blocks*(blocks+1)/2 distinct keys spread the quadratic work evenly
    // (a block-id-only key would collapse onto `blocks` reducers).
    val a = unitRows(df, idCol, vecCol, "v1", "va")
      .withColumn("ba", pmod(xxhash64(col("v1")), lit(nBlocks)).cast("int"))
      .withColumn("cj", explode(sequence(col("ba"), lit(nBlocks - 1))))
    val b = unitRows(df, idCol, vecCol, "v2", "vb")
      .withColumn("bb", pmod(xxhash64(col("v2")), lit(nBlocks)).cast("int"))
      .withColumn("ci", explode(sequence(lit(0), col("bb"))))
    a.join(b,
        col("ba") === col("ci") && col("cj") === col("bb") &&
          (col("ba") =!= col("bb") || col("v1") < col("v2")))
      .where(array_dot(col("va"), col("vb")) >= threshold)
      .select(
        least(col("v1"), col("v2")).as("v1"),
        greatest(col("v1"), col("v2")).as("v2"))
  }

  /**
   * Approximate near-dup pairs via random-hyperplane LSH banding + exact
   * cosine verify. Candidates = pairs sharing any table's full sign
   * pattern; per-pair recall for cosine c is
   * `1 - (1 - (1 - acos(c)/pi)^numPlanes)^numTables` — near 1 only when c
   * is well above the background (tight-dup regimes, c >= ~0.9). Precision
   * is exact (every candidate is verified). For loose thresholds use
   * [[gridNearDupPairs]] — see its scaladoc for the measured collision-gap
   * argument.
   */
  def lshNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      numPlanes: Int = 8, numTables: Int = 12, seed: Long = 42L): DataFrame = {
    import graft.functions.VectorExprs.array_dot
    // dim 1 fallback: empty input plans through to an empty result (see lshTopK)
    val dim = df.select(size(col(vecCol))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(1)
    val planes = Array.tabulate(numTables)(t => hyperplanes(numPlanes, dim, seed + t))
    val buckets = bucketsUdf(planes)
    // ids-only candidate join (vectors re-attach after the distinct).
    val banded = df
      .select(col(idCol).as("id"), posexplode(buckets(col(vecCol))).as(Seq("table", "bucket")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("v1"), col("b.id").as("v2"))
      .distinct()
    val ua = unitRows(df, idCol, vecCol, "v1", "va")
    val ub = unitRows(df, idCol, vecCol, "v2", "vb")
    cand.join(ua, "v1").join(ub, "v2")
      .where(array_dot(col("va"), col("vb")) >= threshold)
      .select(col("v1"), col("v2"))
  }

  /**
   * Train a PRODUCT-QUANTIZATION codebook (Jegou, Douze, Schmid,
   * "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
   * vectors are unit-normalized, split into `m` contiguous subspaces of
   * `dim/m` dims, and each subspace gets its own `k`-centroid driver
   * k-means (seeded Lloyd over the same deterministic bounded sample as
   * [[trainIvfCentroids]] — first `sampleSize` rows by id). The codebook
   * compresses a vector to `m` small codes (m bytes at k <= 256): the
   * billion-scale memory story — a 64-dim float vector (256 B) becomes
   * 8 codes, and the ADC scorer ([[pqTopK]]) never touches raw corpus
   * vectors again.
   *
   * Returns `codebook(s)(c)` = centroid `c` of subspace `s` (empty on an
   * empty corpus). `dim` must divide evenly by `m` (subspaces must agree
   * in width for the code arithmetic to be positional). The defaults are
   * the canonical PQ "8x8" (m=8 subspaces, k=256 = one BYTE per code):
   * measured on the synthetic corpus, k=16 halves recall vs k=256 at
   * 10x corpus growth (0.47 vs 0.89 at the same shortlist) — the coarse
   * codebook, not the shortlist, is the first knob that matters.
   */
  def trainPqCodebook(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 256, iterations: Int = 5,
      sampleSize: Int = 8192, seed: Long = 42L): Array[Array[Array[Double]]] = {
    import corpus.sparkSession.implicits._
    require(m > 0 && k > 0, s"need positive m/k, got m=$m k=$k")
    val sample = corpus
      .select(col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(sampleSize)
      .as[Seq[Double]].collect().map(v => unitVec(v.toArray))
    if (sample.isEmpty) return Array.empty
    val dim = sample(0).length
    require(dim % m == 0, s"embedding dim $dim must divide by m=$m subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val vectors = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      // per-subspace seed: subspaces must not share an init permutation,
      // or identical subspace distributions would train rank-correlated
      // codebooks (seed + s mirrors the LSH per-table seeding)
      kMeansL2(vectors, math.min(k, vectors.length), iterations, seed + s)
    }
  }

  /** Seeded Lloyd k-means under plain L2 (the PQ metric: subvectors are
    * slices of a unit vector, not unit themselves — cosine would distort
    * the subspace geometry). Empty clusters keep their previous centroid,
    * matching [[trainIvfCentroids]]'s convention. */
  private def kMeansL2(
      vectors: Array[Array[Double]], k: Int, iterations: Int,
      seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    var centroids = rng.shuffle(vectors.indices.toList).take(k)
      .map(v => vectors(v).clone()).toArray
    for (_ <- 0 until iterations) {
      val sums = Array.fill(centroids.length)(new Array[Double](vectors(0).length))
      val counts = new Array[Int](centroids.length)
      vectors.foreach { v =>
        val best = nearestL2(centroids, v)
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(centroids.length) { c =>
        if (counts(c) == 0) centroids(c)
        else { val n = counts(c); sums(c).map(_ / n) }
      }
    }
    centroids
  }

  /** Deterministic argmin-L2 cell: ties break toward the LOWEST cell id,
    * so encode results are reproducible across engines and runs. */
  private def nearestL2(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Persist a trained PQ codebook as (sub, cell, centroid) parquet — the
    * same ship-once artifact contract as [[saveIvfIndex]] (doubles
    * round-trip bit-exactly, spec-pinned). */
  def savePqCodebook(
      spark: SparkSession, codebook: Array[Array[Array[Double]]],
      path: String): Unit = {
    import spark.implicits._
    codebook.zipWithIndex.flatMap { case (cells, s) =>
      cells.zipWithIndex.map { case (v, c) => (s, c, v.toSeq) }
    }.toSeq.toDF("sub", "cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[savePqCodebook]] artifact back into encode-ready form.
    * EAGER (the rows are m*k bounded metadata) — the artifact directory
    * may be deleted once this returns. */
  def loadPqCodebook(
      spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("sub"), col("cell"), col("centroid"))
      .as[(Int, Int, Seq[Double])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cells) =>
        cells.sortBy(_._2).map(_._3.toArray).toArray
      }.toArray
  }

  /** PQ-encode every row: `(idCol, code)` with `code(s)` = the nearest
    * (L2, lowest-cell ties) centroid of subspace `s` for the row's
    * unit-normalized vector. Pure per-row projection over the broadcast
    * codebook — scan-bound at any corpus size; the 4x-to-32x compressed
    * code column is what a 100 TB deployment materializes next to (or
    * instead of) the raw vectors. */
  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Array[Double]]]): DataFrame = {
    require(codebook.nonEmpty, "pqEncode needs a trained codebook")
    val bc = trackedBroadcast(corpus.sparkSession, codebook)
    val enc = udf { (v: Seq[Float]) =>
      val cb = bc.value
      val u = unitVec(v.map(_.toDouble).toArray)
      val sub = u.length / cb.length
      Array.tabulate(cb.length) { s =>
        nearestL2(cb(s), java.util.Arrays.copyOfRange(u, s * sub, (s + 1) * sub))
      }.toSeq
    }
    corpus.select(col(idCol), enc(col(vecCol)).as("code"))
  }

  /**
   * PQ top-k by ASYMMETRIC DISTANCE COMPUTATION: each query precomputes
   * ONE m*k lookup table of subspace dot products against the codebook
   * (the query side stays exact — "asymmetric"), and scoring a corpus
   * row is then `m` table lookups over its code instead of a `dim`-wide
   * dot product: `dot(q, x_hat) = sum_s LUT(s, code(s))`. With m=8 over
   * dim=64 that is 8 adds vs 64 multiply-adds against a corpus that
   * stores 8 codes per vector instead of 64 floats — the PQ scale
   * contract (compressed corpus scan, bounded queries broadcast, the
   * q22 shape with the per-pair work collapsed).
   *
   * Approximate by construction (corpus vectors quantize to cell
   * centroids): rank quality is a recall contract ([[pqTopK]] reaches 1.0
   * exactly when quantization is lossless — spec-pinned), production use
   * re-ranks a PQ shortlist with exact scores ([[bruteForceTopK]] over
   * the survivors). Deterministic ordering: (score desc, neighbor asc).
   */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      codebook: Array[Array[Array[Double]]]): DataFrame =
    pqTopKFromCodes(
      pqEncode(corpus, idCol, vecCol, codebook), queries, idCol, vecCol, k,
      codebook)

  /**
   * [[pqTopK]] served from a PRE-ENCODED corpus — the production path:
   * the `(id, code)` frame is [[pqEncode]]'s output materialized ONCE
   * ([[saveEncodedCorpus]]/[[loadEncodedCorpus]]) and every query batch
   * scans the codes (m bytes a row), never the raw vectors. Re-encoding
   * per batch ([[pqTopK]]'s convenience shape) turns the index scan back
   * into a full raw-vector scan — exactly the cost PQ exists to remove
   * at 100 TB. Rank-for-rank identical to the inline-encode path
   * (spec-pinned): int codes round-trip parquet exactly.
   */
  def pqTopKFromCodes(
      encoded: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      codebook: Array[Array[Array[Double]]]): DataFrame = {
    require(codebook.nonEmpty, "pqTopKFromCodes needs a trained codebook")
    val spark = encoded.sparkSession
    // Query LUTs build driver-side from the BOUNDED query side (the same
    // rows a broadcast join would ship) and travel as ONE broadcast: at
    // k=256 a LUT is 16 KiB, and carrying it as a join column would
    // re-materialize it into every (corpus x query) output row —
    // measured 10x+ on the declared q86 shape. The scan instead emits
    // skinny (neighbor, query_idx, score) rows.
    val (qIdxDf, units) = collectQueries(spark, queries, idCol, vecCol)
    val luts = units.map(u => lutOf(u, codebook))
    val bcLuts = trackedBroadcast(spark, luts)
    val kk = codebook(0).length
    val adcAll = udf { (code: Seq[Int]) =>
      val ls = bcLuts.value
      val out = new Array[(Int, Double)](ls.length)
      var qi = 0
      while (qi < ls.length) {
        val lut = ls(qi)
        var s = 0; var acc = 0.0
        while (s < code.length) { acc += lut(s * kk + code(s)); s += 1 }
        out(qi) = (qi, acc)
        qi += 1
      }
      out.toSeq
    }
    val c = encoded.select(col(idCol).as("neighbor_id"), col("code"))
    val scored = c
      .select(col("neighbor_id"), explode(adcAll(col("code"))).as("s"))
      .select(col("neighbor_id"), col("s._1").as("qidx"), col("s._2").as("score"))
      .join(broadcast(qIdxDf), "qidx")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Flat m*k LUT of per-subspace centroid dots for one unit vector —
    * `ADC(lut, code) = sum_s lut(s*k + code_s)`. */
  private def lutOf(
      u: Array[Double], cb: Array[Array[Array[Double]]]): Array[Double] = {
    val sub = u.length / cb.length
    val kk = cb(0).length
    val flat = new Array[Double](cb.length * kk)
    var s = 0
    while (s < cb.length) {
      var c = 0
      while (c < cb(s).length) {
        var d = 0.0; var i = 0
        val cent = cb(s)(c)
        while (i < cent.length) { d += u(s * sub + i) * cent(i); i += 1 }
        flat(s * kk + c) = d
        c += 1
      }
      s += 1
    }
    flat
  }

  /** Collect the bounded query side once: returns a one-partition
    * (qidx, query_id) frame (query_id keeps the source id type) plus the
    * unit vectors in qidx order — the driver-side twin of the broadcast
    * a join plan would ship, feeding the single-broadcast LUT path. */
  private def collectQueries(
      spark: SparkSession, queries: DataFrame, idCol: String, vecCol: String)
      : (DataFrame, Array[Array[Double]]) = {
    val idField = queries.select(col(idCol)).schema.head
    val rows = queries
      .select(col(idCol), col(vecCol).cast("array<double>")).collect()
    val units = rows.map(r => unitVec(r.getSeq[Double](1).toArray))
    val qIdxDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.toIndexedSeq.zipWithIndex.map { case (r, i) => Row(i, r.get(0)) }, 1),
      StructType(Seq(
        StructField("qidx", IntegerType, nullable = false),
        idField.copy(name = "query_id"))))
    (qIdxDf, units)
  }

  /**
   * The production PQ search shape: ADC over the compressed codes
   * produces a `shortlist`-sized candidate set per query ([[pqTopK]] —
   * the only stage that scans the corpus, touching m-byte codes, not
   * vectors), then ONLY the shortlisted rows re-attach their raw vectors
   * (narrow shuffle of candidate ids — the [[lshTopK]] re-rank pattern)
   * for an exact cosine top-k. Recall is governed by the shortlist
   * factor; precision of the returned ranking is exact. Deterministic
   * ordering: (cosine desc, neighbor asc).
   */
  def pqTopKReranked(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      codebook: Array[Array[Array[Double]]]): DataFrame =
    pqTopKRerankedFromCodes(
      pqEncode(corpus, idCol, vecCol, codebook), corpus, queries, idCol,
      vecCol, k, shortlist, codebook)

  /** [[pqTopKReranked]] served from a pre-encoded `(id, code)` corpus
    * ([[pqTopKFromCodes]]'s contract): the ADC shortlist scans only the
    * codes; `corpus` supplies raw vectors solely for the exact re-rank
    * of the shortlisted candidates. */
  def pqTopKRerankedFromCodes(
      encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      codebook: Array[Array[Array[Double]]]): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = pqTopKFromCodes(encoded, queries, idCol, vecCol, shortlist, codebook)
      .select(col("query_id"), col("neighbor_id"))
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** The `n` nearest cells by cosine, ties toward the LOWER cell id —
    * a bounded partial select (insertion into an n-slot list), exactly
    * the `sortBy((-dot, cell)).take(n)` order without materializing or
    * sorting all cells (spec-pinned equal to the sort formulation).
    * Degenerates to [[nearestCosine]]'s argmax at n = 1. */
  private[pipeline] def topCells(
      centroids: Array[Array[Double]], u: Array[Double], n: Int): Array[Int] = {
    val m = math.min(n, centroids.length)
    if (m <= 0) return Array.empty
    val ds = new Array[Double](m)
    val cs = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0; var i = 0
      while (i < u.length) { d += u(i) * cent(i); i += 1 }
      // c ascends, so on a dot tie the incumbent (lower id) wins: the
      // strict > here and in the shift below IS the (-dot, cell) order
      if (filled < m || d > ds(filled - 1)) {
        var pos = if (filled < m) filled else m - 1
        while (pos > 0 && d > ds(pos - 1)) {
          ds(pos) = ds(pos - 1); cs(pos) = cs(pos - 1); pos -= 1
        }
        ds(pos) = d; cs(pos) = c
        if (filled < m) filled += 1
      }
      c += 1
    }
    cs
  }

  /** Deterministic argmax-cosine cell over unit vectors: ties break
    * toward the LOWEST cell id (the [[nearestL2]] convention), so IVF
    * assignments are reproducible across engines and runs. */
  private[pipeline] def nearestCosine(centroids: Array[Array[Double]], u: Array[Double]): Int = {
    var best = 0; var bestDot = Double.MinValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0; var i = 0
      while (i < u.length) { d += u(i) * cent(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /**
   * Train a RESIDUAL product-quantization codebook — the PQ half of
   * IVFADC (Jegou et al., TPAMI 2011, §IV: "IVFADC" = inverted file +
   * asymmetric distance over RESIDUALS): each sampled vector is
   * unit-normalized, assigned to its nearest (cosine) IVF centroid, and
   * the codebook is trained per-subspace on `r = u - c_cell` instead of
   * on `u`. Residuals concentrate around 0 far more tightly than raw
   * vectors spread over the sphere, so the same k centroids per subspace
   * quantize with much lower error — the reason production IVF-PQ
   * encodes residuals, not vectors.
   *
   * Same bounded deterministic sample, seeding, and artifact shape as
   * [[trainPqCodebook]] ([[savePqCodebook]]/[[loadPqCodebook]] apply
   * unchanged). Returns empty on an empty corpus.
   */
  def trainPqCodebookResidual(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]],
      m: Int = 8, k: Int = 256, iterations: Int = 5,
      sampleSize: Int = 8192, seed: Long = 42L): Array[Array[Array[Double]]] = {
    import corpus.sparkSession.implicits._
    require(m > 0 && k > 0, s"need positive m/k, got m=$m k=$k")
    require(centroids.nonEmpty, "trainPqCodebookResidual needs IVF centroids")
    val sample = corpus
      .select(col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(sampleSize)
      .as[Seq[Double]].collect().map(v => unitVec(v.toArray))
    if (sample.isEmpty) return Array.empty
    val dim = sample(0).length
    require(dim % m == 0, s"embedding dim $dim must divide by m=$m subspaces")
    val sub = dim / m
    val residuals = sample.map { u =>
      val cent = centroids(nearestCosine(centroids, u))
      val r = new Array[Double](dim)
      var i = 0
      while (i < dim) { r(i) = u(i) - cent(i); i += 1 }
      r
    }
    Array.tabulate(m) { s =>
      val vectors = residuals.map(r => java.util.Arrays.copyOfRange(r, s * sub, (s + 1) * sub))
      kMeansL2(vectors, math.min(k, vectors.length), iterations, seed + s)
    }
  }

  /**
   * IVF-PQ (IVFADC) top-k — the two billion-scale halves composed: IVF
   * prunes WHICH corpus rows a query scores (only rows in its `nProbe`
   * nearest cells — the compute half), PQ compresses WHAT the scan reads
   * per row (`m` codes of the cell residual, not `dim` floats — the
   * memory/bandwidth half). The inner-product decomposition keeps the
   * query-side LUT cell-independent:
   *
   *   dot(u_q, x_hat) = dot(u_q, c_cell) + dot(u_q, r_hat)
   *                   = qdotc(cell)      + sum_s LUT_q(s, code_s)
   *
   * — `dot(u_q, c_cell)` is exact per (query, probed cell) and
   * `dot(u_q, r_hat)` is the standard ADC sum over the residual codes,
   * with ONE m*k LUT per query reused across all its probed cells (the
   * residual r_hat lives in the same space as u_q, so the LUT is built
   * from u_q alone). The query side (LUTs + a cell -> (query, qdotc)
   * probe map) is prepared driver-side from the bounded query rows and
   * ships as ONE broadcast — a corpus row scores only the queries
   * probing ITS cell, emitting skinny (neighbor, query, score) rows, so
   * unlike [[pqTopK]]'s full-corpus ADC every non-probed (row, query)
   * pair costs nothing and no LUT ever rides an output row. No
   * nested-loop shape anywhere. The ADC shortlist then re-attaches raw
   * vectors for an exact cosine re-rank ([[pqTopKReranked]]'s production
   * pattern). Deterministic ordering: (cosine desc, neighbor asc).
   */
  def ivfPqTopKReranked(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      centroids: Array[Array[Double]],
      codebook: Array[Array[Array[Double]]],
      nProbe: Int): DataFrame =
    ivfPqTopKRerankedFromCodes(
      ivfPqEncode(corpus, idCol, vecCol, centroids, codebook),
      corpus, queries, idCol, vecCol, k, shortlist, centroids, codebook,
      nProbe)

  /**
   * IVFADC-encode every corpus row: `(idCol, cell, code)` with `cell` =
   * the row's nearest (cosine) IVF centroid and `code` = the residual
   * `u - c_cell` product-quantized under `codebook`. This frame IS the
   * INVERTED FILE — ~32x smaller than the raw vectors (one int cell +
   * m byte-range codes vs dim floats) — and is what a production
   * deployment materializes ONCE next to the centroid/codebook artifacts
   * ([[saveEncodedCorpus]]) and serves every query batch from
   * ([[ivfPqTopKRerankedFromCodes]]). One tight-loop projection per row;
   * scan-bound at any corpus size.
   */
  def ivfPqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]],
      codebook: Array[Array[Array[Double]]]): DataFrame = {
    require(centroids.nonEmpty, "ivfPqEncode needs IVF centroids")
    require(codebook.nonEmpty, "ivfPqEncode needs a residual codebook")
    val bcC = trackedBroadcast(corpus.sparkSession, centroids)
    val bcCb = trackedBroadcast(corpus.sparkSession, codebook)
    val encUdf = udf { (v: Seq[Float]) =>
      val cents = bcC.value; val cb = bcCb.value
      val u = unitVec(v.map(_.toDouble).toArray)
      val cell = nearestCosine(cents, u)
      val cent = cents(cell)
      val r = new Array[Double](u.length)
      var i = 0
      while (i < u.length) { r(i) = u(i) - cent(i); i += 1 }
      val sub = u.length / cb.length
      val code = Array.tabulate(cb.length)(s =>
        nearestL2(cb(s), java.util.Arrays.copyOfRange(r, s * sub, (s + 1) * sub)))
      (cell, code.toSeq)
    }
    corpus.select(col(idCol), encUdf(col(vecCol)).as("e"))
      .select(col(idCol), col("e._1").as("cell"), col("e._2").as("code"))
  }

  /** Persist an encoded corpus ([[ivfPqEncode]] / [[pqEncode]] output)
    * next to its centroid/codebook artifacts — the index half a
    * deployment must NOT recompute per query batch. Unlike those
    * bounded-metadata artifacts this one is corpus-sized (that's the
    * point: codes, 32x smaller than vectors, are what query batches
    * scan), so it keeps its natural partitioning — no repartition(1).
    *
    * `partitionByCell = true` (the default when the frame HAS a cell
    * column — i.e. an IVFADC inverted file) lays the codes out
    * directory-per-cell, which IS the on-disk inverted-list structure:
    * the search path filters its scan to the probed cell set, so a
    * partitioned artifact READS only ~nProbe/numCells of the codes
    * (partition pruning — `PartitionFilters` in the scan, spec-pinned)
    * instead of scanning all codes and discarding non-probed rows.
    * Cell counts are bounded (the coarse quantizer's k), so the
    * directory fan-out is too. */
  def saveEncodedCorpus(encoded: DataFrame, path: String): Unit =
    saveEncodedCorpus(encoded, path,
      partitionByCell = encoded.columns.contains("cell"))

  /** [[saveEncodedCorpus]] with the cell layout explicit. */
  def saveEncodedCorpus(
      encoded: DataFrame, path: String, partitionByCell: Boolean): Unit = {
    val w = encoded.write.mode("overwrite")
    (if (partitionByCell) w.partitionBy("cell") else w).parquet(path)
  }

  /** Append a NEW batch's rows to an existing encoded-corpus artifact —
    * INCREMENTAL index maintenance: the quantizer/codebook stay FROZEN
    * (retraining would silently invalidate every already-persisted
    * code), so ingesting new corpus rows costs one encode of the delta
    * ([[ivfPqEncode]]/[[pqEncode]]/[[ivfAssign]] over the new rows
    * only) plus an append write into the same cell directories — the
    * existing corpus is never re-encoded or rewritten. Search from the
    * appended artifact == search over the union corpus encoded in one
    * pass (spec-pinned; encoding is per-row, so batch boundaries cannot
    * change codes). The rest of the maintenance lifecycle: deletes are
    * tombstones ([[deleteFromEncodedCorpus]]), accumulated delta files
    * and tombstones fold away at [[compactEncodedCorpus]], and quantizer
    * DRIFT on a shifted corpus — which this path by design never
    * re-examines — is detected by the [[recallProbe]] measurement (the
    * declared q104 row), the standard rebuild trigger. */
  def appendEncodedCorpus(encoded: DataFrame, path: String): Unit = {
    val w = encoded.write.mode("append")
    (if (encoded.columns.contains("cell")) w.partitionBy("cell") else w)
      .parquet(path)
  }

  /** Load a [[saveEncodedCorpus]] artifact. LAZY, unlike the
    * bounded-metadata loads ([[loadIvfIndex]]/[[loadPqCodebook]]): the
    * codes are corpus-sized and must stream through the scan, never the
    * driver — so the artifact directory must outlive every query batch
    * served from it (int cells/codes round-trip parquet exactly;
    * spec-pinned rank-for-rank equal to inline encoding). Rows deleted
    * via [[deleteFromEncodedCorpus]] are filtered out here (broadcast
    * anti-join against the tombstone set — the underscore-prefixed
    * tombstone dir is invisible to the code scan itself), so every
    * search path honors deletes with no code change; the filter
    * disappears entirely once [[compactEncodedCorpus]] folds the
    * tombstones in. */
  def loadEncodedCorpus(spark: SparkSession, path: String): DataFrame = {
    val codes = spark.read.parquet(path)
    val tPath = tombstoneDir(path)
    val fs = hadoopFs(spark, path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(tPath))) codes
    else {
      // the id column is whatever the encode step carried through — the
      // first column that is none of the artifact's payload columns
      // (`cell`/`code` for IVFADC/PQ codes, `vec` for IVF-FLAT lists);
      // every encode shape puts the id first. The tombstone column name
      // is reserved (`__graft_tombstone_id`), so the join can never be
      // ambiguous whatever the caller named the id.
      val idCol = codes.columns.filterNot(Set("cell", "code", "vec")).head
      codes.join(
        broadcast(spark.read.parquet(tPath)
          .select(col(TombstoneIdCol)).distinct()),
        codes(idCol) === col(TombstoneIdCol), "left_anti")
    }
  }

  private def tombstoneDir(path: String): String =
    path.stripSuffix("/") + "/_tombstones"

  /** Reserved tombstone column name — never collides with a caller's
    * id column, so the anti-join is unambiguous by construction. */
  private val TombstoneIdCol = "__graft_tombstone_id"

  private def hadoopFs(
      spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /**
   * Delete corpus rows from an encoded artifact by id — TOMBSTONES, not
   * rewrite: the ids append to a hidden `_tombstones` dataset inside the
   * artifact dir (underscore prefix = invisible to the parquet scan),
   * and [[loadEncodedCorpus]] anti-joins them out. Deleting is therefore
   * O(delta) like [[appendEncodedCorpus]] — no touch of the cell
   * directories — and the tombstone set stays a bounded broadcast until
   * [[compactEncodedCorpus]] folds it in (the LSM delete discipline:
   * logical delete now, physical reclaim at compaction).
   */
  def deleteFromEncodedCorpus(
      spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"tombstone ids must be a single column, got ${ids.columns.mkString(",")}")
    ids.toDF(TombstoneIdCol).repartition(1).write.mode("append")
      .parquet(tombstoneDir(path))
  }

  /**
   * Rewrite an encoded-corpus artifact without its tombstoned rows and
   * with per-cell files consolidated — the maintenance pass that bounds
   * what [[appendEncodedCorpus]] (one file batch per delta) and
   * [[deleteFromEncodedCorpus]] (one anti-join probe per tombstone
   * batch) accumulate. The surviving rows are hash-repartitioned by cell
   * before the partitioned write, so each cell directory collapses to
   * one file (flat artifacts rewrite at the session's shuffle
   * parallelism); the tombstone set is consumed by the rewrite and
   * gone afterwards. Search from the compacted artifact equals search
   * over the survivor corpus encoded fresh, rank-for-rank (spec-pinned).
   *
   * The swap is write-to-sibling, delete, rename — safe against its own
   * failure modes on a local/posix-rename store (the artifact is intact
   * until the delete; a crash between delete and rename leaves the
   * complete `.compacting` sibling to recover from). An object-store
   * deployment does the same swap behind a manifest commit (the
   * [[graft.sources]] DSv2 connector's O(1)-visibility pattern) instead
   * of a directory rename.
   */
  def compactEncodedCorpus(spark: SparkSession, path: String): Unit = {
    val live = loadEncodedCorpus(spark, path) // tombstones applied
    val tmp = path.stripSuffix("/") + ".compacting"
    val hasCell = live.columns.contains("cell")
    val w =
      if (hasCell) live.repartition(col("cell")).write.partitionBy("cell")
      else live.repartition(
        spark.sessionState.conf.numShufflePartitions).write
    w.mode("overwrite").parquet(tmp)
    val fs = hadoopFs(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path))
  }

  /**
   * Index-health measurement: recall of an approximate result set
   * against the exact truth — `(n_queries, n_pairs, n_hits, recall)` in
   * one integer-counting aggregation over the two bounded result sets.
   * This is the REBUILD TRIGGER the frozen-quantizer maintenance path
   * ([[appendEncodedCorpus]]) relies on: a deployment periodically runs
   * a query sample through the stale index AND [[bruteForceTopK]] and
   * re-trains when this measurement crosses its floor — drift shows up
   * HERE, not in the append path (which by design never re-examines the
   * quantizer). Both inputs carry `(query_id, neighbor_id)`; recall =
   * |approx ∩ exact| / |exact| over those pairs.
   */
  def recallProbe(approx: DataFrame, exact: DataFrame): DataFrame =
    // both sides deduplicated: a candidate list that repeats a pair
    // (e.g. unioned across probed cells) must not multiply exact rows
    // or double-count hits — the measurement is over pair SETS
    exact.select(col("query_id"), col("neighbor_id")).distinct()
      .join(
        approx.select(col("query_id"), col("neighbor_id")).distinct()
          .withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(lit(1).as("one"))
      .agg(
        count_distinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_pairs"),
        coalesce(sum(col("hit")), lit(0)).cast("long").as("n_hits"))
      .drop("one")
      .withColumn("recall",
        col("n_hits").cast("double") / col("n_pairs").cast("double"))

  /**
   * [[ivfPqTopKReranked]] served from a PRE-ENCODED inverted file — the
   * production path: `encoded` is [[ivfPqEncode]]'s `(id, cell, code)`
   * output materialized once, and the ADC scan reads ONLY it (cell-pruned
   * codes — never the raw vectors). `corpus` supplies raw vectors solely
   * for the exact re-rank of the shortlist (narrow shuffle of ~shortlist
   * x queries candidate ids — the [[lshTopK]] re-attach pattern). The
   * inline-encode convenience shape ([[ivfPqTopKReranked]]) re-derives
   * the codes per batch — a full raw-vector scan per invocation, the
   * exact cost the inverted file exists to avoid at 100 TB.
   */
  def ivfPqTopKRerankedFromCodes(
      encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      centroids: Array[Array[Double]],
      codebook: Array[Array[Array[Double]]],
      nProbe: Int): DataFrame = {
    require(centroids.nonEmpty, "ivfPqTopKRerankedFromCodes needs IVF centroids")
    require(codebook.nonEmpty, "ivfPqTopKRerankedFromCodes needs a residual codebook")
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    val spark = encoded.sparkSession
    // Query side prepared DRIVER-side from the bounded query rows (the
    // same rows a broadcast join would ship): ONE m*k LUT per query plus
    // a cell -> (query_idx, qdotc) probe map, shipped as broadcasts so
    // no LUT ever rides a scored output row (see pqTopK).
    val (qIdxDf, units) = collectQueries(spark, queries, idCol, vecCol)
    val luts = units.map(u => lutOf(u, codebook))
    val probesByCell: Map[Int, Array[(Int, Double)]] = units.zipWithIndex
      .flatMap { case (u, qi) =>
        centroids.indices.map { c =>
          var d = 0.0; var i = 0
          val cent = centroids(c)
          while (i < u.length) { d += u(i) * cent(i); i += 1 }
          (d, c)
        }.sortBy { case (d, c) => (-d, c) }.take(nProbe)
          .map { case (d, c) => (c, (qi, d)) }
      }.groupBy(_._1).map { case (cell, xs) => (cell, xs.map(_._2)) }
    val bcLuts = trackedBroadcast(spark, luts)
    val bcProbes = trackedBroadcast(spark, probesByCell)
    val kk = codebook(0).length
    val scoreUdf = udf { (cell: Int, code: Seq[Int]) =>
      bcProbes.value.get(cell) match {
        case None => Seq.empty[(Int, Double)]
        case Some(qs) =>
          val ls = bcLuts.value
          qs.map { case (qi, qdotc) =>
            val lut = ls(qi)
            var s = 0; var acc = 0.0
            while (s < code.length) { acc += lut(s * kk + code(s)); s += 1 }
            (qi, qdotc + acc)
          }.toSeq
      }
    }
    // Cell-pruned scan: a corpus row in a non-probed cell scores nothing
    // (the probe map returns empty), so cut those rows BEFORE the scan —
    // on a cell-partitioned artifact (saveEncodedCorpus's default cell
    // layout) this literal IN-list is PARTITION PRUNING: only the probed
    // cells' directories are read at all, ~nProbe/numCells of the codes.
    // The probed set is bounded (queries x nProbe cell ids).
    val probedCells = probesByCell.keys.toSeq.sorted
    val c = encoded
      .where(col("cell").isin(probedCells: _*))
      .select(col(idCol).as("neighbor_id"), col("cell"), col("code"))
    val scored = c
      .select(col("neighbor_id"),
        explode(scoreUdf(col("cell"), col("code"))).as("s"))
      .select(col("neighbor_id"), col("s._1").as("qidx"), col("s._2").as("score"))
      .join(broadcast(qIdxDf), "qidx")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val cand = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val reranked = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cos"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    reranked.withColumn("rank", row_number().over(w2)).where(col("rank") <= k)
  }

  /**
   * ADC rank evaluation — the retrieval-quality audit run after
   * quantizing an embedding corpus: for each query, where does the TRUE
   * nearest neighbor (exact double dot product) land when candidates
   * are ranked by the asymmetric-distance score actually served from
   * int8 codes (`scale_q * scale_c * <q8, c8>` — integer code dot
   * scaled back, [[quantizeEmbeddings]]'s exact quantizer)? Output per
   * query: the true NN, its rank under ADC ordering (1 = quantization
   * lost nothing for this query), and the reciprocal rank — the
   * mean of that last column IS MRR, but the per-query rows are kept
   * because the distribution's tail (rank 50 queries) is the actionable
   * signal, not the average.
   *
   * Determinism: both scores are pinned-order arithmetic — the exact
   * dot and the code dot run through the left-to-right codegen'd
   * [[graft.functions.ArrayDot]] (code products and their sums are
   * integers below 2^53, so the double path is EXACT for them), the ADC
   * rescale is the explicit product `(scale_q * scale_c) * dot`, and
   * both rankings tie-break on neighbor id. The oracle replays every
   * step with `list_reduce` folds in the same order.
   *
   * Scale shape: a bounded query batch broadcast against the streamed
   * corpus ([[bruteForceTopK]]'s exact-evaluation shape — the quadratic
   * side is the declared evaluation workload, not a serving path), two
   * per-query windows over the scored candidates. Evaluating against a
   * 100 TB corpus samples candidates per query; the declared row keeps
   * the full candidate set so every rank is exactly checkable.
   */
  def adcRankEval(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    import graft.functions.VectorExprs.array_dot
    def coded(df: DataFrame) = {
      val v = col(vecCol).cast("array<double>")
      df.select(col(idCol), v.as("v"),
          (aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0)
            .as("scale"))
        .select(col(idCol), col("v"), col("scale"),
          transform(col("v"), x =>
            when(col("scale") > 0,
              least(greatest(floor(x / col("scale") + 0.5), lit(-127L)),
                lit(127L)))
              .otherwise(lit(0L)).cast("double")).as("q"))
    }
    val q = broadcast(coded(queries).select(col(idCol).as("query_id"),
      col("v").as("qv"), col("scale").as("qscale"), col("q").as("qq")))
    val c = coded(corpus).select(col(idCol).as("neighbor_id"),
      col("v").as("cv"), col("scale").as("cscale"), col("q").as("cq"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        array_dot(col("qv"), col("cv")).as("dot"),
        ((col("qscale") * col("cscale")) * array_dot(col("qq"), col("cq")))
          .as("adc"))
    val wTrue = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    val wQuant = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    scored
      .withColumn("true_rank", row_number().over(wTrue))
      .withColumn("quant_rank", row_number().over(wQuant).cast("long"))
      .where(col("true_rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("true_nn"),
        col("quant_rank"),
        (lit(1.0) / col("quant_rank")).as("reciprocal_rank"))
  }

  /**
   * Scalar int8 quantization with a per-vector scale — the standard
   * storage/transport compression for embedding corpora (4x smaller than
   * float32 before an ANN index even starts): `scale = max|x| / 127`,
   * `q_i = clamp(floor(x_i / scale + 0.5), -127, 127)` (floor(x + 0.5)
   * = half-up rounding with NO tie ambiguity across engines, unlike
   * round()). All-zero vectors quantize to zeros with scale 0. Pure
   * per-row projection — scan-bound at any corpus size. The quantized
   * vector is emitted comma-joined so the driver hash-checks every
   * element.
   */
  def quantizeEmbeddings(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val scale = (aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0).as("scale")
    df.select(col(idCol), scale, v.as("v"))
      .select(col(idCol), col("scale"),
        array_join(
          transform(col("v"), x =>
            when(col("scale") > 0,
              least(greatest(floor(x / col("scale") + 0.5), lit(-127L)), lit(127L)))
              .otherwise(lit(0L))),
          ",").as("qvec"))
  }

  /**
   * Seeded Rademacher RANDOM PROJECTION (Achlioptas 2003 / the
   * Johnson-Lindenstrauss family): project each embedding to `outDim`
   * dimensions through a dense ±1 sign matrix derived DETERMINISTICALLY
   * from `md5(seed:k:i)` — no RNG state, so the matrix (and therefore
   * every projected value) is reproducible across runs, partitionings,
   * and ENGINES (DuckDB derives the identical matrix from the identical
   * md5 strings, which is what lets the declared row hash-match doubles
   * exactly). The standard embedding-compression step before a coarse
   * ANN stage: inner products are preserved in expectation with
   * variance O(1/outDim), and 4x fewer dims is 4x less ANN scan I/O.
   *
   * Each output component is one [[graft.functions.VectorExprs.array_dot]]
   * against a LITERAL sign row — codegen'd left-to-right accumulation,
   * mirrored by the oracle's `list_reduce` replay. Pure projection: no
   * shuffle, no UDF, the matrix is `outDim x inDim` literals baked into
   * the plan (bounded — projection targets are small by definition).
   */
  def randomProject(
      df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int, seed: String): DataFrame = {
    require(inDim > 0 && outDim > 0, s"bad dims ($inDim, $outDim)")
    val signs: Array[Array[Double]] = Array.tabulate(outDim, inDim) {
      (k, i) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$seed:$k:$i".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        (java.lang.Long.parseLong(hex, 16) % 2L) * 2.0 - 1.0
    }
    val v = col(vecCol).cast("array<double>")
    val proj = array(signs.map { row =>
      graft.functions.VectorExprs.array_dot(col("__v"),
        org.apache.spark.sql.functions.typedlit(row.toSeq))
    }: _*)
    df.where(col(vecCol).isNotNull && size(col(vecCol)) === inDim)
      .select(col(idCol), v.as("__v"))
      .select(col(idCol), proj.as("proj"))
  }

  /**
   * TWO-STAGE retrieval under the JL projection — the pipeline
   * [[randomProject]] exists to serve: stage 1 shortlists by projected
   * DOT over the COMPRESSED vectors (Rademacher signs preserve inner
   * products in expectation), so the only corpus-wide scan reads
   * `projDim/inDim` of the vector bytes; stage 2 re-ranks the shortlist
   * by exact cosine over raw vectors via the [[lshTopK]] re-attach
   * pattern (ids-only candidate frame, query side broadcast, corpus
   * side one narrow shuffle of shortlist ids). Same output shape as
   * [[bruteForceTopK]]; recall is a measured contract (the q23
   * adjudication), margin set by `shortlist/k`.
   */
  def projectedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      inDim: Int, projDim: Int, seed: String): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val pc = randomProject(corpus, idCol, vecCol, inDim, projDim, seed)
      .select(col(idCol).as("neighbor_id"), col("proj").as("nproj"))
    val pq = broadcast(
      randomProject(queries, idCol, vecCol, inDim, projDim, seed)
        .select(col(idCol).as("query_id"), col("proj").as("qproj")))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("pdot").desc, col("neighbor_id").asc)
    val cand = pc.join(pq, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorExprs.array_dot(col("qproj"), col("nproj"))
          .as("pdot"))
      .withColumn("prank", row_number().over(w1))
      .where(col("prank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cos"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w2)).where(col("rank") <= k)
  }

  /** Embedding summary stats (norm etc.), all-double sequential math. */
  def embeddingStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val sumSq = aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val s = aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double"))
    df.select(
      col(idCol),
      size(v).cast("long").as("dim"),
      sqrt(sumSq).as("l2_norm"),
      (s / size(v)).as("mean_val"))
  }

  /**
   * Greedy k-CENTER coreset selection (Gonzalez 1985 farthest-first
   * traversal) — the diverse-subset curation primitive: pick k points
   * such that every corpus point is close to some pick (2-approximation
   * of the optimal k-center cover). Training-data pipelines use it to
   * choose representative/diverse examples where random sampling
   * oversamples dense clusters.
   *
   * Seed = the lowest id; each round adds the point FARTHEST (squared
   * L2) from the current picks, ties to the lowest id. Returns
   * `(rank, vec_id, min_dist)` — the distance at selection (null for
   * the seed). Every arithmetic step is IEEE double in a pinned
   * left-to-right fold, and `least` chains carry no rounding, so the
   * declared row replays bit-for-bit against k unrolled oracle rounds.
   *
   * Scale shape: k rounds, each ONE partial-combined top-1 aggregation
   * (`TakeOrderedAndProject`) over the cached corpus with the picked
   * vectors as bounded plan literals — no shuffle of the corpus, no
   * pairwise materialization; cost is k scans, the standard
   * farthest-first trade (k is small by definition of a coreset seed).
   */
  def kCenterSelect(
      embs: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = embs.sparkSession
    import spark.implicits._
    val e = embs
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("vec_id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = scala.collection.mutable.ListBuffer
        .empty[(Int, Long, Option[Double])]
      val seed = e.orderBy(col("vec_id")).limit(1)
        .as[(Long, Seq[Double])].collect()
      if (seed.nonEmpty) {
        var selected = List(seed(0))
        out += ((1, seed(0)._1, None))
        for (r <- 2 to k) {
          val dists = selected.map { case (_, sv) =>
            val litV = array(sv.map(lit): _*)
            aggregate(zip_with(col("v"), litV, (a, b) => (a - b) * (a - b)),
              lit(0.0), (acc, x) => acc + x)
          }
          val minD = if (dists.lengthCompare(1) == 0) dists.head
            else least(dists: _*)
          val best = e.where(!col("vec_id").isin(selected.map(_._1): _*))
            .select(col("vec_id"), col("v"), minD.as("md"))
            .orderBy(col("md").desc, col("vec_id").asc).limit(1)
            .as[(Long, Seq[Double], Double)].collect()
          if (best.nonEmpty) {
            selected = (best(0)._1, best(0)._2) :: selected
            out += ((r, best(0)._1, Some(best(0)._3)))
          }
        }
      }
      out.toSeq.toDF("rank", "vec_id", "min_dist")
    } finally e.unpersist()
  }
}
