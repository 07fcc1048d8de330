package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * ANN index maintenance: tombstone deletes, compaction, and the
 * quantizer-drift recall probe (the rebuild trigger for the frozen
 * quantizer the append path keeps).
 */
class IndexMaintenanceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("index-maintenance-spec")
    .getOrCreate()

  private def randomCorpus(n: Int, dim: Int, seed: Long, idOffset: Long = 0L) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      (idOffset + i, Seq.fill(dim)(rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  /** Vectors clustered tightly around the given unit-ish centers. */
  private def clusteredCorpus(
      n: Int, centers: Seq[Array[Double]], noise: Double, seed: Long) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val c = centers(i % centers.length)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * noise).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def searchSet(
      codes: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]]): Set[(Long, Int, Long)] = {
    import spark.implicits._
    Similarity.ivfPqTopKRerankedFromCodes(
        codes, corpus, queries, "vec_id", "embedding", k = 5, shortlist = 20,
        cents, cb, nProbe = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet
  }

  private def parquetFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    java.nio.file.Files.walkFileTree(dir, new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
      override def visitFile(f: java.nio.file.Path,
          a: java.nio.file.attribute.BasicFileAttributes): java.nio.file.FileVisitResult = {
        if (f.getFileName.toString.endsWith(".parquet")) out += f
        java.nio.file.FileVisitResult.CONTINUE
      }
    })
    out.toSeq
  }

  test("delete-by-id tombstones, then compaction == fresh survivor encode") {
    import spark.implicits._
    val base = randomCorpus(200, dim = 16, seed = 3L)
    val delta = randomCorpus(40, dim = 16, seed = 4L, idOffset = 200L)
    val all = base.union(delta).cache()
    val cents = Similarity.trainIvfCentroids(base, "vec_id", "embedding",
      numCentroids = 8)
    val cb = Similarity.trainPqCodebookResidual(base, "vec_id", "embedding",
      cents, m = 4, k = 16, iterations = 3, sampleSize = 256)
    val dir = java.nio.file.Files.createTempDirectory("graft-maint-spec")
    try {
      val path = dir.resolve("codes").toString
      // base save + frozen-quantizer delta append (q90's lifecycle)
      Similarity.saveEncodedCorpus(
        Similarity.ivfPqEncode(base, "vec_id", "embedding", cents, cb), path)
      Similarity.appendEncodedCorpus(
        Similarity.ivfPqEncode(delta, "vec_id", "embedding", cents, cb), path)
      // tombstone every 7th id across BOTH batches, in two delete calls
      // (tombstone batches accumulate like delta appends)
      val dead = all.where(col("vec_id") % 7 === 0).select(col("vec_id"))
      Similarity.deleteFromEncodedCorpus(spark, path,
        dead.where(col("vec_id") < 100))
      Similarity.deleteFromEncodedCorpus(spark, path,
        dead.where(col("vec_id") >= 100))
      val survivors = all.where(col("vec_id") % 7 =!= 0).cache()
      val queries = survivors.where(col("vec_id") < 30)

      // 1) load honors tombstones before any compaction
      val loadedIds = Similarity.loadEncodedCorpus(spark, path)
        .select(col("vec_id")).as[Long].collect().toSet
      val survivorIds = survivors.select(col("vec_id")).as[Long].collect().toSet
      assert(loadedIds == survivorIds)

      // 2) search from the tombstoned artifact == search over the
      //    survivor corpus encoded fresh under the same frozen quantizer
      val fresh = Similarity.ivfPqEncode(survivors, "vec_id", "embedding", cents, cb)
      val wantSearch = searchSet(fresh, survivors, queries, cents, cb)
      assert(searchSet(Similarity.loadEncodedCorpus(spark, path),
        survivors, queries, cents, cb) == wantSearch)

      // 3) compaction: tombstones folded in, per-cell files consolidated,
      //    search unchanged
      val filesBefore = parquetFiles(dir.resolve("codes")).size
      Similarity.compactEncodedCorpus(spark, path)
      assert(!java.nio.file.Files.exists(dir.resolve("codes").resolve("_tombstones")))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path.stripSuffix("/") + ".compacting")))
      val cellDirs = java.nio.file.Files.list(dir.resolve("codes")).iterator()
      val it = scala.jdk.CollectionConverters.IteratorHasAsScala(cellDirs).asScala
      it.filter(p => p.getFileName.toString.startsWith("cell=")).foreach { cd =>
        assert(parquetFiles(cd).size == 1,
          s"cell dir $cd not consolidated to one file")
      }
      val filesAfter = parquetFiles(dir.resolve("codes")).size
      assert(filesAfter < filesBefore,
        s"compaction did not reduce file count ($filesBefore -> $filesAfter)")
      val compacted = Similarity.loadEncodedCorpus(spark, path)
      assert(compacted.select(col("vec_id")).as[Long].collect().toSet == survivorIds)
      assert(searchSet(compacted, survivors, queries, cents, cb) == wantSearch)
    } finally {
      graft.Fs.deleteRecursively(dir)
      all.unpersist()
    }
  }

  test("flat (cell-less) artifacts honor tombstones and compact too") {
    import spark.implicits._
    val corpus = randomCorpus(100, dim = 8, seed = 9L)
    val cb = Similarity.trainPqCodebook(corpus, "vec_id", "embedding",
      m = 2, k = 16, iterations = 3, sampleSize = 128)
    val dir = java.nio.file.Files.createTempDirectory("graft-maint-flat")
    try {
      val path = dir.resolve("codes").toString
      Similarity.saveEncodedCorpus(
        Similarity.pqEncode(corpus, "vec_id", "embedding", cb), path)
      Similarity.deleteFromEncodedCorpus(spark, path,
        corpus.where(col("vec_id") < 10).select(col("vec_id")))
      val want = (10L until 100L).toSet
      assert(Similarity.loadEncodedCorpus(spark, path)
        .select(col("vec_id")).as[Long].collect().toSet == want)
      Similarity.compactEncodedCorpus(spark, path)
      assert(!java.nio.file.Files.exists(dir.resolve("codes").resolve("_tombstones")))
      assert(Similarity.loadEncodedCorpus(spark, path)
        .select(col("vec_id")).as[Long].collect().toSet == want)
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("IVF-FLAT (vector-list) artifacts honor tombstones and compact") {
    import spark.implicits._
    val corpus = randomCorpus(80, dim = 8, seed = 17L)
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      numCentroids = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-maint-flat-ivf")
    try {
      val path = dir.resolve("list").toString
      Similarity.saveEncodedCorpus(
        Similarity.ivfAssign(corpus, "vec_id", "embedding", cents), path)
      Similarity.deleteFromEncodedCorpus(spark, path,
        corpus.where(col("vec_id") < 10).select(col("vec_id")))
      val loaded = Similarity.loadEncodedCorpus(spark, path)
      // id detection must pick vec_id, not the vec payload column
      assert(loaded.select(col("vec_id")).as[Long].collect().toSet
        == (10L until 80L).toSet)
      assert(loaded.columns.toSet == Set("vec_id", "vec", "cell"))
      Similarity.compactEncodedCorpus(spark, path)
      assert(Similarity.loadEncodedCorpus(spark, path)
        .select(col("vec_id")).as[Long].collect().toSet
        == (10L until 80L).toSet)
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("recallProbe arithmetic") {
    import spark.implicits._
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("query_id", "neighbor_id")
    val exact = Seq((1L, 10L), (1L, 12L), (2L, 10L), (2L, 11L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallProbe(approx, exact)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((2L, 4L, 2L, 0.5)))
    // empty truth -> zero rows (the declared row's HAVING convention)
    assert(Similarity.recallProbe(approx, exact.limit(0)).collect().isEmpty)
  }

  test("recallProbe detects a drifted quantizer") {
    // served corpus: 8 tight, well-separated clusters; the FRESH
    // quantizer trains on it, the DRIFTED one on clusters placed on
    // different axes entirely (yesterday's distribution).
    val dim = 16
    def axisCenters(offset: Int): Seq[Array[Double]] =
      (0 until 8).map { c =>
        val v = new Array[Double](dim)
        v((c + offset) % dim) = 1.0
        v
      }
    // noise wide enough that PQ residuals are resolvable (ultra-tight
    // clusters make every member's ADC score identical and the shortlist
    // arbitrary), narrow enough that clusters stay separated
    val served = clusteredCorpus(240, axisCenters(0), noise = 0.25, seed = 21L)
      .cache()
    val drifted = clusteredCorpus(240, axisCenters(8), noise = 0.25, seed = 22L)
    val queries = served.where(col("vec_id") < 24)
    val exact = Similarity.bruteForceTopK(served, queries, "vec_id", "embedding", 5)
    def recallUnder(trainOn: org.apache.spark.sql.DataFrame): Double = {
      val cents = Similarity.trainIvfCentroids(trainOn, "vec_id", "embedding",
        numCentroids = 8)
      val cb = Similarity.trainPqCodebookResidual(trainOn, "vec_id", "embedding",
        cents, m = 4, k = 16, iterations = 3, sampleSize = 256)
      val codes = Similarity.ivfPqEncode(served, "vec_id", "embedding", cents, cb)
      val approx = Similarity.ivfPqTopKRerankedFromCodes(
        codes, served, queries, "vec_id", "embedding", k = 5, shortlist = 30,
        cents, cb, nProbe = 2)
      Similarity.recallProbe(approx, exact).select(col("recall"))
        .head().getDouble(0)
    }
    val freshRecall = recallUnder(served)
    val staleRecall = recallUnder(drifted)
    // the monitoring story: the SAME measurement, run against the stale
    // index, visibly degrades — that is the rebuild trigger
    assert(freshRecall > staleRecall + 0.1,
      s"drift not detected: fresh $freshRecall vs stale $staleRecall")
    assert(freshRecall >= 0.8, s"fresh index unexpectedly weak: $freshRecall")
    served.unpersist()
  }

  test("auto-rebuild row: stale half-corpus index triggers, rebuilt passes") {
    // q152 end to end at sf0.001: the stale index cannot reach the
    // unindexed odd half, so the trigger must fire and the rebuilt
    // index must clear the floor — the exact booleans the oracle pins.
    val row = graft.PipelineQueries
      .annAutoRebuild(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_queries") > 0L)
    assert(row.getAs[Boolean]("rebuild_triggered"),
      "an index missing half the corpus must trip the 0.7 recall floor")
    assert(row.getAs[Boolean]("fresh_recall_ok"),
      "the rebuilt full-corpus index must clear the floor")
  }
}
