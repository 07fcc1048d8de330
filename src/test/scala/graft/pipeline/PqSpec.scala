package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Product quantization (train / artifact / encode / ADC search):
 * lossless-regime exactness, artifact round trip, determinism, and the
 * recall contract the declared q86 pins.
 */
class PqSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("pq-spec")
    .getOrCreate()

  private def sf = "/root/testdata/sf0.001"

  /** Deterministic random float vectors: all subvectors distinct with
    * probability 1, cosine ties astronomically unlikely. */
  private def randomCorpus(n: Int, dim: Int, seed: Long) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Seq.fill(dim)(rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("lossless regime: k = corpus size makes PQ == exact brute force") {
    import spark.implicits._
    // Every subvector distinct and k = n: Lloyd init takes ALL subvectors
    // as centroids, each cluster holds exactly its own subvector, and the
    // update is a fixed point — quantization error is zero, so the ADC
    // score IS the exact cosine and the ranking must match brute force.
    val n = 24
    val corpus = randomCorpus(n, dim = 8, seed = 7L).cache()
    val queries = corpus.where(col("vec_id") < 6)
    val cb = Similarity.trainPqCodebook(
      corpus, "vec_id", "embedding", m = 2, k = n, iterations = 3,
      sampleSize = n)
    assert(cb.length == 2 && cb.forall(_.length == n))
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", 5, cb)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(pq == exact)
    // the re-ranked production shape degenerates to the same answer
    val rr = Similarity.pqTopKReranked(
        corpus, queries, "vec_id", "embedding", 5, shortlist = 10, cb)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(rr == exact)
    corpus.unpersist()
  }

  test("codebook artifact round-trips bit-exactly and loaded == trained") {
    val corpus = randomCorpus(64, dim = 12, seed = 11L)
    val cb = Similarity.trainPqCodebook(
      corpus, "vec_id", "embedding", m = 3, k = 4, iterations = 4,
      sampleSize = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-spec").toString
    val loaded =
      try {
        Similarity.savePqCodebook(spark, cb, dir)
        Similarity.loadPqCodebook(spark, dir)
      } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    assert(loaded.length == cb.length)
    cb.zip(loaded).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("encode: codes in range, deterministic, compression shape") {
    import spark.implicits._
    val corpus = randomCorpus(100, dim = 16, seed = 13L)
    val cb = Similarity.trainPqCodebook(
      corpus, "vec_id", "embedding", m = 4, k = 8, iterations = 3,
      sampleSize = 100)
    val enc = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(enc.length == 100)
    // every row compresses to exactly m codes, each a valid cell id
    assert(enc.forall { case (_, code) =>
      code.length == 4 && code.forall(c => c >= 0 && c < 8)
    })
    val enc2 = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(enc.toSeq == enc2.toSeq)
  }

  test("recall contract on the sf0.001 embeddings (the q86 floor)") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 100)
    val cb = Similarity.trainPqCodebook(e, "vec_id", "embedding")
    val pq = Similarity.pqTopKReranked(
        e, q, "vec_id", "embedding", k = 5, shortlist = 100, cb)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (pq & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall below the declared q86 floor")
  }

  test("empty corpus: training returns an empty codebook") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.trainPqCodebook(empty, "vec_id", "embedding").isEmpty)
    assert(Similarity.trainPqCodebookResidual(
      empty, "vec_id", "embedding", Array(Array(1.0, 0.0))).isEmpty)
  }

  test("IVFADC lossless + full probe: == exact brute force") {
    import spark.implicits._
    // Residual codebook with k = corpus size quantizes losslessly (every
    // residual subvector is its own centroid), and nProbe = numCells
    // probes every list — so qdotc + ADC == the exact cosine and the
    // composed search must equal brute force rank-for-rank.
    val n = 24
    val corpus = randomCorpus(n, dim = 8, seed = 19L).cache()
    val queries = corpus.where(col("vec_id") < 6)
    val cents = Similarity.trainIvfCentroids(
      corpus, "vec_id", "embedding", numCentroids = 4, sampleSize = n)
    val cb = Similarity.trainPqCodebookResidual(
      corpus, "vec_id", "embedding", cents, m = 2, k = n, iterations = 3,
      sampleSize = n)
    assert(cb.length == 2 && cb.forall(_.length == n))
    val got = Similarity.ivfPqTopKReranked(
        corpus, queries, "vec_id", "embedding", k = 5, shortlist = n,
        cents, cb, nProbe = cents.length)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == exact)
    corpus.unpersist()
  }

  test("IVFADC residual codebook round-trips through the PQ artifact format") {
    val corpus = randomCorpus(64, dim = 12, seed = 23L)
    val cents = Similarity.trainIvfCentroids(
      corpus, "vec_id", "embedding", numCentroids = 4, sampleSize = 64)
    val cb = Similarity.trainPqCodebookResidual(
      corpus, "vec_id", "embedding", cents, m = 3, k = 4, sampleSize = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-spec").toString
    val loaded =
      try {
        Similarity.savePqCodebook(spark, cb, dir)
        Similarity.loadPqCodebook(spark, dir)
      } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    assert(loaded.length == cb.length)
    cb.zip(loaded).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("IVFADC recall contract on the sf0.001 embeddings (the q87 floor)") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 100)
    val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding")
    val cb = Similarity.trainPqCodebookResidual(e, "vec_id", "embedding", cents)
    val got = Similarity.ivfPqTopKReranked(
        e, q, "vec_id", "embedding", k = 5, shortlist = 100, cents, cb,
        nProbe = 12)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall below the declared q87 floor")
  }

  test("IVFADC plans no nested-loop shape in the approximate path") {
    val corpus = randomCorpus(50, dim = 8, seed = 29L)
    val queries = corpus.where(col("vec_id") < 5)
    val cents = Similarity.trainIvfCentroids(
      corpus, "vec_id", "embedding", numCentroids = 4, sampleSize = 50)
    val cb = Similarity.trainPqCodebookResidual(
      corpus, "vec_id", "embedding", cents, m = 2, k = 8, sampleSize = 50)
    val plan = Similarity.ivfPqTopKReranked(
        corpus, queries, "vec_id", "embedding", k = 3, shortlist = 10,
        cents, cb, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"IVFADC must not plan a nested-loop shape:\n$plan")
  }

  test("inverted-file artifact: search from persisted codes == inline encode, rank-for-rank") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 50)
    val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding")
    val cb = Similarity.trainPqCodebookResidual(e, "vec_id", "embedding", cents)
    val dir = java.nio.file.Files.createTempDirectory("graft-invfile-spec")
    try {
      // encode ONCE, persist the (id, cell, code) inverted file, serve
      // the search from the loaded artifact — must equal the inline
      // re-encode path rank-for-rank (int codes round-trip parquet
      // exactly, and the search math is identical)
      Similarity.saveEncodedCorpus(
        Similarity.ivfPqEncode(e, "vec_id", "embedding", cents, cb),
        dir.toString)
      val fromCodes = Similarity.ivfPqTopKRerankedFromCodes(
          Similarity.loadEncodedCorpus(spark, dir.toString),
          e, q, "vec_id", "embedding", k = 5, shortlist = 60, cents, cb,
          nProbe = 12)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      val inline = Similarity.ivfPqTopKReranked(
          e, q, "vec_id", "embedding", k = 5, shortlist = 60, cents, cb,
          nProbe = 12)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(fromCodes.nonEmpty && fromCodes == inline)
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("PQ codes artifact: pqTopKFromCodes(loaded) == pqTopK inline, rank-for-rank") {
    import spark.implicits._
    val corpus = randomCorpus(80, dim = 16, seed = 31L).cache()
    val queries = corpus.where(col("vec_id") < 10)
    val cb = Similarity.trainPqCodebook(
      corpus, "vec_id", "embedding", m = 4, k = 16, sampleSize = 80)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqcodes-spec")
    try {
      Similarity.saveEncodedCorpus(
        Similarity.pqEncode(corpus, "vec_id", "embedding", cb), dir.toString)
      val fromCodes = Similarity.pqTopKFromCodes(
          Similarity.loadEncodedCorpus(spark, dir.toString),
          queries, "vec_id", "embedding", 5, cb)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      val inline = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", 5, cb)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(fromCodes.nonEmpty && fromCodes == inline)
    } finally {
      graft.Fs.deleteRecursively(dir)
      corpus.unpersist()
    }
  }

  test("cell-partitioned inverted file: probed-cell scan is partition-pruned, results unchanged") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 5)
    val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding")
    val cb = Similarity.trainPqCodebookResidual(e, "vec_id", "embedding", cents)
    val dir = java.nio.file.Files.createTempDirectory("graft-cellpart-spec")
    try {
      // default save lays the codes out directory-per-cell (the on-disk
      // inverted-list structure)
      Similarity.saveEncodedCorpus(
        Similarity.ivfPqEncode(e, "vec_id", "embedding", cents, cb),
        dir.toString)
      val cellDirs = dir.toFile.listFiles().count(_.getName.startsWith("cell="))
      assert(cellDirs == cents.length,
        s"expected one directory per cell, got $cellDirs")
      val search = Similarity.ivfPqTopKRerankedFromCodes(
        Similarity.loadEncodedCorpus(spark, dir.toString),
        e, q, "vec_id", "embedding", k = 3, shortlist = 20, cents, cb,
        nProbe = 2)
      // the probed-cell IN-list must reach the artifact scan as a
      // partition filter — only probed directories are read
      val plan = search.queryExecution.executedPlan.toString
      assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).nonEmpty,
        s"probed-cell filter must prune partitions:\n$plan")
      val fromArtifact = search
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      val inline = Similarity.ivfPqTopKReranked(
          e, q, "vec_id", "embedding", k = 3, shortlist = 20, cents, cb,
          nProbe = 2)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(fromArtifact.nonEmpty && fromArtifact == inline)
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("incremental append: delta-encoded batch + append == one-pass encode of the union") {
    import spark.implicits._
    val all = randomCorpus(90, dim = 16, seed = 41L).cache()
    val base = all.where(col("vec_id") < 60)
    val delta = all.where(col("vec_id") >= 60)
    val queries = all.where(col("vec_id") < 8)
    // quantizer/codebook trained on the BASE corpus and then FROZEN —
    // the append contract (retraining would invalidate existing codes)
    val cents = Similarity.trainIvfCentroids(
      base, "vec_id", "embedding", numCentroids = 4, sampleSize = 60)
    val cb = Similarity.trainPqCodebookResidual(
      base, "vec_id", "embedding", cents, m = 4, k = 8, sampleSize = 60)
    val dir = java.nio.file.Files.createTempDirectory("graft-append-spec")
    try {
      Similarity.saveEncodedCorpus(
        Similarity.ivfPqEncode(base, "vec_id", "embedding", cents, cb),
        dir.toString)
      Similarity.appendEncodedCorpus(
        Similarity.ivfPqEncode(delta, "vec_id", "embedding", cents, cb),
        dir.toString)
      val appended = Similarity.ivfPqTopKRerankedFromCodes(
          Similarity.loadEncodedCorpus(spark, dir.toString),
          all, queries, "vec_id", "embedding", k = 5, shortlist = 30,
          cents, cb, nProbe = 2)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      val onePass = Similarity.ivfPqTopKReranked(
          all, queries, "vec_id", "embedding", k = 5, shortlist = 30,
          cents, cb, nProbe = 2)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(appended.nonEmpty && appended == onePass)
    } finally {
      graft.Fs.deleteRecursively(dir)
      all.unpersist()
    }
  }

  test("topCells partial select == full sort by (-dot, cell) + take") {
    // the tight-loop probe selection must be bit-identical to the sort
    // formulation it replaced, ties toward the lower cell id included
    val rng = new scala.util.Random(37L)
    val dim = 6
    val cents = Array.fill(11)(Array.fill(dim)(rng.nextGaussian()))
    // planted exact ties: two centroid pairs share identical vectors
    cents(4) = cents(1).clone()
    cents(9) = cents(6).clone()
    for (_ <- 0 until 200) {
      val u = Array.fill(dim)(rng.nextGaussian())
      val reference = cents.indices
        .map(c => (cents(c).zip(u).map { case (a, b) => a * b }.sum, c))
        .sortBy { case (d, c) => (-d, c) }
      for (n <- Seq(1, 3, 11, 15)) {
        val got = Similarity.topCells(cents, u, n)
        assert(got.toSeq == reference.take(math.min(n, cents.length)).map(_._2),
          s"n=$n mismatch")
      }
    }
  }

  test("dim not divisible by m is rejected with a clear message") {
    val corpus = randomCorpus(10, dim = 10, seed = 17L)
    val e = intercept[IllegalArgumentException] {
      Similarity.trainPqCodebook(corpus, "vec_id", "embedding", m = 4)
    }
    assert(e.getMessage.contains("divide"))
  }

  test("adcRankEval: lossless-regime vectors rank their true NN first") {
    import spark.implicits._
    // every component is k/127 for integer k, so int8 quantization is
    // EXACT (scale = max|x|/127 reproduces each entry) and the ADC
    // ordering must equal the exact-dot ordering: rank 1 everywhere
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 40L).map { i =>
      (i, Array.fill(8)((rnd.nextInt(255) - 127).toFloat / 127f))
    }.toDF("vec_id", "embedding")
    val got = Similarity
      .adcRankEval(vecs, vecs.where($"vec_id" < 10), "vec_id", "embedding")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 10)
    assert(got.map(_._1).toSet == (0L until 10L).toSet,
      "exactly one row per query")
    assert(got.forall(r => r._3 == 1L && r._4 == 1.0),
      s"lossless quantization must not move the true NN: ${got.toSeq}")
  }

  test("adcRankEval: a planted coarse corpus degrades rank, never drops a query") {
    import spark.implicits._
    // tiny magnitudes relative to one huge outlier component force the
    // quantizer to crush most coordinates to 0 -> ADC reorders
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 60L).map { i =>
      val base = Array.fill(8)(rnd.nextFloat() * 0.004f - 0.002f)
      base(0) = if (i % 2 == 0) 1.0f else -1.0f
      (i, base)
    }.toDF("vec_id", "embedding")
    val got = Similarity
      .adcRankEval(vecs, vecs.where($"vec_id" < 20), "vec_id", "embedding")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 20)
    assert(got.forall(r => r._3 >= 1L && r._3 <= 59L))
    assert(got.forall(r => r._4 == 1.0 / r._3))
    assert(got.exists(_._3 > 1L),
      "crushed coordinates must demote at least one true NN")
  }
}
