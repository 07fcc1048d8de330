package graft.pipeline

import graft.functions.RollingHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup / similarity / text / multimodal operators: unit + differential. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("pipeline-spec")
    .getOrCreate()

  private def sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------ rolling hash

  test("RollingHash expression == reference impl, codegen and interpreted") {
    import spark.implicits._
    val strs = Seq("", "a", "hello world", "ünïcödé ≠ ascii", "x" * 1000)
    val df = strs.toDF("s")
    val got = df.select(RollingHash.rolling_hash(col("s"))).as[Long].collect()
    assert(got.toSeq == strs.map(RollingHash.hashString))
    // null propagates
    val nulls = Seq[Option[String]](Some("a"), None).toDF("s")
    val g2 = nulls.select(RollingHash.rolling_hash(col("s"))).collect()
    assert(!g2(0).isNullAt(0) && g2(1).isNullAt(0))
    // survives a codegen-disabled (interpreted) run too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val g3 = df.select(RollingHash.rolling_hash(col("s"))).as[Long].collect()
      assert(g3.toSeq == strs.map(RollingHash.hashString))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  // ------------------------------------------------------------------- dedup

  test("exact dedup groups identical-after-normalization docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "different text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .select("doc_id", "group_size", "keeper", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2L, 1L, true)))
    assert(out(1) == ((2L, 2L, 1L, false)))
    assert(out(2) == ((3L, 1L, 3L, true)))
  }

  test("ngram jaccard and minhash agree on planted near-dups (sf0.001 docs)") {
    val docs = graft.Tables.load(spark, sf, "documents")
    import spark.implicits._
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.7)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val mh = Dedup.minHashPairs(docs, "doc_id", "text", 5, 8, 4, 0.7)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "sf0.001 should contain planted near-dup pairs")
    assert(mh == exact, "LSH+verify must equal the exact pair set here")
  }

  test("containment catches a quoted doc that jaccard structurally misses") {
    import spark.implicits._
    // doc 2 is doc 1's opening passage verbatim: every 5-gram of 2 is
    // in 1, so cont_21 = 1.0, but jaccard = |2|/|1| is small
    val host = ((1 to 40).map(i => s"tok$i") ++ (1 to 40).map(i => s"pad$i"))
      .mkString(" ")
    val quote = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, host), (2L, quote), (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", n = 5,
        threshold = 0.8)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (d1, d2, inter, sz1, sz2, c12, c21, jac) =
      (got(0)._1, got(0)._2, got(0)._3, got(0)._4, got(0)._5,
        got(0)._6, got(0)._7, got(0)._8)
    assert((d1, d2) == ((1L, 2L)))
    assert(sz2 == 6L && inter == 6L && c21 == 1.0) // all 6 5-grams of the quote
    assert(c12 == inter.toDouble / sz1)
    assert(jac < 0.7, "q13's symmetric threshold would never fire here")
    // the symmetric jaccard operator indeed misses the pair
    val jacPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.7)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    assert(!jacPairs.contains((1L, 2L)))
  }

  test("delta-probe pairs == full-corpus pairs touching an added doc") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
    val old = docs.where(col("doc_id") % 3 =!= 0)
    val added = docs.where(col("doc_id") % 3 === 0)
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5)
      .select($"d1", $"d2", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val expected = full.filter { case (a, b, _) => a % 3 == 0 || b % 3 == 0 }
    val storedIdx = Dedup.ngramShingleIndex(old, "doc_id", "text", 5)
    val delta = Dedup.ngramJaccardDeltaPairs(storedIdx, added,
        "doc_id", "text", 5, 0.5)
      .select($"d1", $"d2", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "the split should leave cross-side pairs")
    assert(delta == expected,
      "delta probe must produce exactly the full pairs touching an added doc" +
        " (jaccard bit-equal included)")
  }

  test("stop-gram pruning bounds the inverted-index fan-out (adversarial corpus)") {
    import spark.implicits._
    // Every doc shares one ubiquitous 5-gram prefix; tails are unique.
    // Unpruned, that single shingle fans the self-join out to all n(n-1)/2
    // pairs; with maxShingleDF=10 the stop-gram is dropped and NO pair
    // shares a surviving shingle.
    val n = 100
    val docs = (0 until n).map { i =>
      (i.toLong, s"common shared prefix gram words u${i}a u${i}b u${i}c u${i}d u${i}e")
    }.toDF("doc_id", "text")
    try {
      // threshold ~0 => output pairs == candidate pairs (nothing filtered)
      val unpruned = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 5, threshold = 0.001, maxShingleDF = 0L).count()
      val pruned = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 5, threshold = 0.001, maxShingleDF = 10L).count()
      assert(unpruned == n.toLong * (n - 1) / 2,
        s"adversarial corpus must degenerate unpruned: $unpruned")
      assert(pruned == 0L, s"pruning must drop the ubiquitous shingle: $pruned")
    } finally Dedup.clearCaches() // don't leave adversarial indexes cached
  }

  test("simhash: hamming small for near-identical, large for unrelated") {
    val a = "the quick brown fox jumps over the lazy dog again and again".split(" ").toSeq
    val b = a.updated(3, "foxx") // one token changed
    val c = "completely unrelated words zebra quantum plasma xylophone".split(" ").toSeq
    val hAB = java.lang.Long.bitCount(Dedup.simHash(a) ^ Dedup.simHash(b))
    val hAC = java.lang.Long.bitCount(Dedup.simHash(a) ^ Dedup.simHash(c))
    assert(hAB < hAC)
    assert(Dedup.simHash(a) == Dedup.simHash(a)) // deterministic
  }

  // -------------------------------------------------------------- similarity

  test("brute-force top-k matches a driver-side exact computation") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val vecs = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap.view.mapValues(_.map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = vecs.keys.toSeq.sorted.take(20)
    val expected = queries.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1).toList
    }.toMap
    val got = Similarity.bruteForceTopK(
        e, e.where($"vec_id".isin(queries: _*)), "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    assert(got == expected)
  }

  test("cosine near-dup pairs match a driver-side exact computation") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val vecs = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j && cos(vecs(i), vecs(j)) >= 0.42
    } yield (i, j)).toSet
    val got = Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.42)
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("span removal: copied passage vanishes from every copy, unique prose survives") {
    import spark.implicits._
    val boiler = "all rights reserved licensed under the apache license version two"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $boiler epsilon zeta"),
      (2L, s"one two three four five six seven eight $boiler"),
      (3L, "entirely unique document with no duplicated span inside it at all"),
      (4L, boiler),                  // fully covered -> empty cleaned_text
      (5L, "tiny doc"),              // shorter than the span width: untouched
      (6L, "rep rep rep rep rep rep rep rep rep rep")) // same-doc repeat (9-gram window x2 overlapping)
      .toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text", w = 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // the 10-word boilerplate spans appear in docs 1, 2 and 4 -> every
    // word of it is covered in all three; surrounding prose survives
    assert(out(1L)._4 == "alpha beta gamma delta epsilon zeta")
    assert(out(1L)._3 == 10L)
    assert(out(2L)._4 == "one two three four five six seven eight")
    assert(out(4L)._4 == "" && out(4L)._3 == 10L,
      "a fully-covered doc keeps its row with empty text")
    assert(out(3L)._3 == 0L && out(3L)._4.startsWith("entirely unique"))
    assert(out(5L)._3 == 0L && out(5L)._4 == "tiny doc")
    // ten identical words: spans (0..7) and (1..8) and (2..9) are the same
    // 8-gram three times -> duplicated -> all ten positions covered
    assert(out(6L)._4 == "" && out(6L)._3 == 10L)
  }

  test("grid near-dup == brute-force near-dup, plan has no BNL join") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val bnl = Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.42)
      .as[(Long, Long)].collect().toSet
    val grid = Similarity.gridNearDupPairs(e, "vec_id", "embedding", 0.42, blocks = 5)
    val gridPairs = grid.as[(Long, Long)].collect().toSet
    assert(gridPairs == bnl, "grid block join must be exact")
    assert(gridPairs.forall { case (a, b) => a < b }, "pairs must be ordered")
    val physical = grid.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "the grid path must be a shuffle equi-join, not a BNL")
  }

  test("grid near-dup pair set is block-count-invariant; auto-sizing applies the n/10k rule") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val reference = Similarity.gridNearDupPairs(e, "vec_id", "embedding", 0.42, blocks = 5)
      .as[(Long, Long)].collect().toSet
    // the block count spreads the SAME quadratic work differently —
    // the emitted pair set must not depend on it (so the auto-sizer can
    // never change results, only task granularity)
    for (blocks <- Seq(2, 8, 13)) {
      val got = Similarity.gridNearDupPairs(e, "vec_id", "embedding", 0.42, blocks)
        .as[(Long, Long)].collect().toSet
      assert(got == reference, s"pair set changed at blocks=$blocks")
    }
    // auto path (blocks = 0): same pairs, still a shuffle equi-join
    val auto = Similarity.gridNearDupPairs(e, "vec_id", "embedding", 0.42)
    assert(auto.as[(Long, Long)].collect().toSet == reference)
    val physical = auto.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      "the auto-sized grid must stay a shuffle equi-join")
    // the n/10k rule itself: floor of 8 below 80k rows, ceil(n/10k) above
    assert(Similarity.autoGridBlocks(0L) == 8)
    assert(Similarity.autoGridBlocks(79999L) == 8)
    assert(Similarity.autoGridBlocks(80001L) == 9)
    assert(Similarity.autoGridBlocks(1000000L) == 100)
    assert(Similarity.autoGridBlocks(100L * 1000 * 1000 * 1000) == 10000000)
  }

  test("LSH near-dup == exact pair set in the tight-dup regime it is built for") {
    import spark.implicits._
    // Planted high-cosine dups: base vectors plus copies with small noise.
    // At cos >= ~0.99 vs threshold 0.95 the per-pair collision probability
    // per table is (1 - acos(.99)/pi)^8 ~ 0.77, so 12 tables miss with
    // prob ~2e-8 — THIS is the regime where banding beats brute force
    // (contrast: gridNearDupPairs' scaladoc documents why the loose 0.42
    // corpus threshold has no collision gap and needs the exact grid).
    val rng = new scala.util.Random(7)
    val dim = 32
    val base = Array.fill(60)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val dups = (0 until 20).map { i =>
      base(i).map(x => x + (rng.nextGaussian() * 0.02).toFloat)
    }
    val rows = (base ++ dups).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.95)
      .as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(df, "vec_id", "embedding", 0.95,
        numPlanes = 8, numTables = 12, seed = 42L)
      .as[(Long, Long)].collect().toSet
    assert(exact.size == 20, s"expected the 20 planted pairs, got ${exact.size}")
    assert(lsh == exact)
  }

  test("LSH ANN achieves >=50% recall@5 vs brute force on sf0.001") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val q = e.where($"vec_id" < 50)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(e, q, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("IVF index save/load round-trips bit-exactly; loaded == trained results") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val embs = graft.Tables.load(spark, sf, "embeddings")
    val trained = Similarity.trainIvfCentroids(embs, "vec_id", "embedding",
      numCentroids = 8)
    assert(trained.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    try {
      Similarity.saveIvfIndex(spark, trained, dir)
      val loaded = Similarity.loadIvfIndex(spark, dir)
      // doubles survive parquet bit-exactly, cell order preserved
      assert(loaded.length == trained.length)
      assert(loaded.zip(trained).forall { case (a, b) => a.sameElements(b) })
      val qs = embs.orderBy(col("vec_id")).limit(20)
      val a = Similarity.ivfTopKWithCentroids(embs, qs, "vec_id", "embedding",
          k = 5, trained, nProbe = 2)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      val b = Similarity.ivfTopKWithCentroids(embs, qs, "vec_id", "embedding",
          k = 5, loaded, nProbe = 2)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(a == b && a.nonEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("IVF inverted-list artifact: assigned == inline at any probe; scan is partition-pruned") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.load(spark, sf, "embeddings")
    val q = e.where($"vec_id" < 20)
    val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding",
      numCentroids = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivflist-spec")
    try {
      Similarity.saveEncodedCorpus(
        Similarity.ivfAssign(e, "vec_id", "embedding", cents), dir.toString)
      assert(dir.toFile.listFiles().count(_.getName.startsWith("cell=")) == cents.length)
      val list = Similarity.loadEncodedCorpus(spark, dir.toString)
      for (nProbe <- Seq(2, 8)) {
        val served = Similarity.ivfTopKFromAssigned(
          list, q, "vec_id", "embedding", 5, cents, nProbe)
        val inline = Similarity.ivfTopKWithCentroids(
            e, q, "vec_id", "embedding", 5, cents, nProbe)
          .select("query_id", "rank", "neighbor_id")
          .as[(Long, Int, Long)].collect().toSet
        assert(served.select("query_id", "rank", "neighbor_id")
          .as[(Long, Int, Long)].collect().toSet == inline, s"nProbe=$nProbe")
        // the probed-cell IN-list must reach the artifact scan as a
        // partition filter
        val plan = served.queryExecution.executedPlan.toString
        assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).nonEmpty,
          s"nProbe=$nProbe must prune partitions:\n$plan")
      }
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("IVF with full probing == brute force; partial probing keeps recall") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "embeddings")
    val q = e.where($"vec_id" < 30)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val full = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
        numCentroids = 8, nProbe = 8)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(full == exact, "probing every cell must equal brute force")
    val partial = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
        numCentroids = 8, nProbe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map { case (a, _, c) => (a, c) }
    val recall = (exactPairs intersect partial).size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("ArrayDot: ragged arrays yield null, never a truncated partial dot") {
    import graft.functions.VectorExprs.array_dot
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),   // matched -> 11.0
      (Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0)) // ragged -> null
    ).toDF("a", "b")
    val got = df.select(array_dot($"a", $"b")).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0), "length mismatch must be null")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(array_dot($"a", $"b")).collect()
      assert(interp(0).getDouble(0) == 11.0 && interp(1).isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("two-pass heavy hitters == exact groupBy-HAVING on skewed data") {
    import graft.functions.HeavyHitters.heavy_hitters
    import spark.implicits._
    // Zipf-ish skew over 200 distinct items, k far below the domain size so
    // the sketch genuinely evicts; MG guarantees the two-pass output still
    // equals the exact filter.
    val k = 8
    val words = (0 until 20000).map { i =>
      val r = ((i * 2654435761L) >>> 7) % 1000
      if (r < 300) "alpha" else if (r < 520) "beta" else if (r < 680) "gamma"
      else s"tail${r % 200}"
    }
    val toks = words.toDF("term")
    val sketch = toks.agg(heavy_hitters(col("term"), k).as("hh"),
      count(lit(1)).as("n"))
    val cand = sketch.select(explode(col("hh.item")).as("term"), col("n"))
    val got = toks.join(broadcast(cand), "term")
      .groupBy(col("term"), col("n")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1) > col("n"))
      .select($"term", $"cnt").as[(String, Long)].collect().toSet
    val n = words.size.toLong
    val expected = words.groupBy(identity).view
      .mapValues(_.size.toLong).filter { case (_, c) => c * (k + 1) > n }
      .toSet.map { (kv: (String, Long)) => kv }
    assert(got == expected)
    assert(got.nonEmpty, "skewed corpus must produce guaranteed survivors")
  }

  test("fixture corpus is pure ASCII (q24/q20 oracles count chars as bytes)") {
    // The q24 frame oracle slices DuckDB CHARS against Spark BYTES, and the
    // q20 oracle reads ord(code point) as a byte — both exact only while
    // the fixture text is ASCII. Assert it so a fixture change fails loud.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val nonAscii = graft.Tables.load(spark, d, "documents")
        .where(octet_length(col("text")) =!= length(col("text"))).count()
      assert(nonAscii == 0L, s"$d has $nonAscii non-ASCII documents")
    }
  }

  test("embedding quantization: formula-exact, all-zero vectors, clamp bound") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f)), // all-zero -> scale 0, zeros (no div-by-zero)
      (3L, Seq(3.0f))        // single max element -> exactly 127
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeEmbeddings(df, "vec_id", "embedding")
      .as[(Long, Double, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // hand-derived literals, NOT a re-run of the production formula:
    // scale = 1/127; 0.5/scale evaluates to exactly 64.0 after the +0.5
    // (IEEE double, verified), -1.0 -> floor(-126.5) = -127 (half-up,
    // not half-away), 0.25 -> floor(32.25) = 32
    assert(got(1L) == ((1.0 / 127.0, "64,-127,32")))
    assert(got(2L) == ((0.0, "0,0")))
    assert(got(3L) == ((3.0 / 127.0, "127")))
  }

  test("semantic dedup: scale-invariant buckets, zero vectors, min-id keeper") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(1.0f, -2.0f, 0.5f)),   // 2x vector 1 -> identical int8 code
      (3L, Seq(0.5f, 1.0f, 0.25f)),   // different direction -> own bucket
      (4L, Seq(0.0f, 0.0f, 0.0f)),    // zero vectors bucket together
      (5L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(df, "vec_id", "embedding")
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got(1L) == ((2L, 1L, false)) && got(2L) == ((2L, 1L, true)))
    assert(got(3L) == ((1L, 3L, false)))
    assert(got(4L) == ((2L, 4L, false)) && got(5L) == ((2L, 4L, true)))
  }

  test("winnow pairs: planted copied passage found, boilerplate pruned") {
    import spark.implicits._
    val passage = "records show the quarterly totals rose across every region again"
    // 12 tokens: long enough that every filler pair is GUARANTEED >= 2
    // distinct shared selections (interior windows span > w grams)
    val boiler =
      "click here to subscribe to our newsletter for updates delivered every week"
    val docs = Seq(
      (1L, s"intro words before $passage and a different tail here"),
      (2L, s"$passage trailing content that shares nothing else at all"),
      (3L, "completely unrelated text about gardens ponds and stone paths"),
      (4L, s"first filler $boiler"), (5L, s"second filler $boiler"),
      (6L, s"third filler $boiler"), (7L, s"fourth filler $boiler"),
      (8L, s"fifth filler $boiler"), (9L, s"sixth filler $boiler")
    ).toDF("doc_id", "text")
    val got = Dedup.winnowPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 2L, maxDF = 4L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    // the 10-token copied passage (> w+k-1 = 6) must pair 1-2 ...
    assert(got.contains((1L, 2L)), got)
    // ... and 3 pairs with nobody
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), got)
    // boilerplate fingerprints live in 6 docs > maxDF=4: pruned, so the
    // filler docs produce NO pairs despite their shared tail
    assert(!got.exists(p => p._1 >= 4L), got)
    // unpruned control: the same corpus WITH maxDF off does pair them
    val unpruned = Dedup.winnowPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 2L, maxDF = 0L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(unpruned.exists(p => p._1 >= 4L), unpruned)
  }

  test("source leakage: planted cross-source passage rolls up to its pair") {
    import spark.implicits._
    val passage = "records show the quarterly totals rose across every region again"
    val docs = Seq(
      (1L, "a", s"intro words before $passage and a different tail here"),
      (2L, "b", s"$passage trailing content that shares nothing else at all"),
      (3L, "c", "completely unrelated text about gardens ponds and stone paths"))
      .toDF("doc_id", "source", "text")
    val got = graft.PipelineQueries.sourceLeakageOf(docs)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L)))
  }

  test("sketch aggregates land within tolerance of exact values") {
    import spark.implicits._
    val li = graft.Tables.load(spark, sf, "lineitem")
    val rows = graft.PipelineQueries.sketches(spark, sf)
      .select($"l_returnflag", $"exact_parts",
        $"parts_within_tol", $"p50_within_tol", $"p99_within_tol")
      .as[(String, Long, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, _, pt, p50, p99) =>
      assert(pt && p50 && p99, s"$k: tolerance flags ($pt, $p50, $p99)")
    }
    // the exact column the oracle cross-checks really is the exact count
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n")).as[(String, Long)].collect().toMap
    rows.foreach { case (k, n, _, _, _) => assert(exact(k) == n, s"$k: $n != ${exact(k)}") }
  }

  test("token ids: frequency-ranked vocab, in-order encode, OOV as -1") {
    import spark.implicits._
    // counts: a=2, b=2, c=1 -> rank (cnt desc, term asc): a=0, b=1, c=2;
    // vocabSize=2 drops c -> OOV -1
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextStats.tokenIds(df, "doc_id", "text", vocabSize = 2)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == Map(1L -> Seq(0L, 0L, 1L), 2L -> Seq(1L, -1L)))
  }

  test("compression ratio: repetitive text compresses, deterministic") {
    import spark.implicits._
    val df = Seq(
      (1L, "abc " * 200),
      (2L, (0 until 200).map(i => s"w${i * 7919 % 9973}").mkString(" "))
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextStats.compressionRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) < out(2L), s"repetitive ${out(1L)} should compress better than varied ${out(2L)}")
    val again = df.select(TextStats.compressionRatio($"text")).as[Double].collect()
    assert(again.toSeq == Seq(out(1L), out(2L)))
  }

  // -------------------------------------------------------------- multimodal

  test("stub decode features: fixed dim, normalized, deterministic") {
    val f = Multimodal.stubDecodeFeature("hello world".getBytes, 16)
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    assert(f.toSeq == Multimodal.stubDecodeFeature("hello world".getBytes, 16).toSeq)
    assert(Multimodal.stubDecodeFeature(Array.emptyByteArray, 16).sum == 0f)
  }

  test("frame sampling produces fixed-width frames at the right offsets") {
    import spark.implicits._
    val media = Seq((1L, "text/plain", ("abcdefgh" * 20))) // 160 bytes
      .toDF("media_id", "mime", "text")
      .select(col("media_id"), col("mime"), col("text").cast("binary").as("blob"))
      .withColumn("nbytes", octet_length(col("blob")).cast("long"))
    val frames = Multimodal.sampleFrames(media, width = 16, stride = 64)
      .select($"frame_no", $"frame".cast("string"))
      .as[(Long, String)].collect().sortBy(_._1)
    // offsets 0, 64, 128 fit (128+16 <= 160); 192 does not
    assert(frames.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(frames.forall(_._2.length == 16))
    assert(frames(0)._2 == "abcdefgh" * 2)
  }

  test("extractFeatures keeps ids and emits fixed-dim vectors (sf0.001)") {
    import spark.implicits._
    val blobs = Multimodal.documentBlobs(spark, sf)
    val feats = Multimodal.extractFeatures(blobs)
    assert(feats.count() == blobs.count())
    val row = feats.head()
    assert(row.dim == 16 && row.feature.length == 16)
  }

  // ------------------------------------------------- perceptual fingerprint

  /** Independent reimplementation of the b-bit minwise fingerprint:
    * materialize ALL window hashes, group by bucket with a plain sort,
    * take parities — no shared code with the tight-loop production
    * kernel beyond the hash constants. */
  private def phashReference(text: String): Long = {
    val bs = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val hashes = (0 to bs.length - 8).map { i =>
      val r = bs.slice(i, i + 8).foldLeft(0L)((h, b) => h * 1000000007L + (b & 0xffL))
      r * -7046029254386353131L
    }
    (0 until 64).map { k =>
      val bucket = hashes.filter(h => (h >>> 58).toInt == k)
      if (bucket.nonEmpty && (bucket.min & 1L) == 1L) 1L << k else 0L
    }.foldLeft(0L)(_ | _)
  }

  test("perceptualHash64 == independent reference; short payloads hash to 0") {
    val texts = Seq("the quick brown fox jumps over the lazy dog " * 10,
      "lorem ipsum dolor sit amet " * 20, "exactly8", "tiny", "")
    texts.foreach { t =>
      assert(Multimodal.perceptualHash64(t.getBytes("UTF-8")) == phashReference(t), t.take(20))
    }
    assert(Multimodal.perceptualHash64("1234567".getBytes) == 0L) // < one window
    assert(Multimodal.perceptualHash64(Array.emptyByteArray) == 0L)
  }

  test("perceptual hash separates: a small edit stays close, unrelated docs stay far") {
    val rnd = new scala.util.Random(7)
    def doc(words: Int) = Seq.fill(words)("w" + rnd.nextInt(5000)).mkString(" ")
    val base = doc(120)
    val edited = {
      val w = base.split(' '); w(60) = "REPLACED"; w.mkString(" ")
    }
    val unrelated = doc(120)
    def ham(a: String, b: String) = java.lang.Long.bitCount(
      Multimodal.perceptualHash64(a.getBytes) ^ Multimodal.perceptualHash64(b.getBytes))
    assert(ham(base, edited) <= 6, s"near-dup hamming ${ham(base, edited)}")
    assert(ham(base, unrelated) > 7, s"unrelated hamming ${ham(base, unrelated)}")
  }

  test("banded near-dup pairs == brute force over fingerprints (pigeonhole)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def doc(words: Int) = Seq.fill(words)("t" + rnd.nextInt(3000)).mkString(" ")
    val bases = (0 until 20).map(i => (i.toLong, doc(100)))
    // plant near-dups: docs 100+i are one-word edits of docs i (i < 5)
    val dups = (0 until 5).map { i =>
      val w = bases(i)._2.split(' '); w(50) = "EDIT" + i
      (100L + i, w.mkString(" "))
    }
    val media = (bases ++ dups).toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("blob"))
    val banded = Multimodal
      .perceptualNearDupPairs(media, "media_id", "blob", maxHamming = 6)
      .select($"m1", $"m2", $"hamming".cast("long")).as[(Long, Long, Long)]
      .collect().toSet
    val fps = (bases ++ dups).map { case (id, t) =>
      (id, Multimodal.perceptualHash64(t.getBytes("UTF-8")))
    }
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 6
    } yield (a, b, h.toLong)).toSet
    assert(banded == brute)
    assert((0 until 5).forall(i => brute.exists(p => p._1 == i && p._2 == 100 + i)),
      "every planted edit pair must surface")
  }

  test("cross-modal dedup join: near-dup media pairs split by caption equality") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def doc(words: Int) = Seq.fill(words)("t" + rnd.nextInt(3000)).mkString(" ")
    val bases = (0 until 10).map(i => (i.toLong, doc(100)))
    // 100+i: one-word edits of i — near-dup media, DIFFERENT caption
    val recaptioned = (0 until 3).map { i =>
      val w = bases(i)._2.split(' '); w(50) = "EDIT" + i
      (100L + i, w.mkString(" "))
    }
    // 200: byte-identical to base 0 — same media AND same caption
    val exactCopy = Seq((200L, bases(0)._2))
    val caps = (bases ++ recaptioned ++ exactCopy).toDF("doc_id", "text")
    val media = caps.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("blob"))
    val out = Multimodal.crossModalDupPairs(
        media, "media_id", "blob", caps, "doc_id", "text", maxHamming = 6)
      .select($"m1", $"m2", $"hamming".cast("long"), $"same_caption")
      .as[(Long, Long, Long, Boolean)].collect()
    val byPair = out.map(r => (r._1, r._2) -> r._4).toMap
    // the annotated pair set IS the media near-dup pair set
    val pairSet = Multimodal
      .perceptualNearDupPairs(media, "media_id", "blob", maxHamming = 6)
      .select($"m1", $"m2").as[(Long, Long)].collect().toSet
    assert(out.map(r => (r._1, r._2)).toSet == pairSet)
    // exact copy: flagged with same_caption = true at hamming 0
    assert(byPair((0L, 200L)) === true)
    assert(out.find(r => r._1 == 0L && r._2 == 200L).get._3 == 0L)
    // every re-captioned near-dup: flagged with same_caption = false —
    // the pair class ONLY the media side sees (their text fingerprints
    // differ, so q12-style caption dedup passes them both)
    (0 until 3).foreach { i =>
      assert(byPair((i.toLong, 100L + i)) === false,
        s"re-captioned pair ($i, ${100 + i}) must be cross-modal-only")
    }
  }

  test("random projection == independent md5-sign reference; seeded; dims filtered") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 8).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding") union
      Seq((99L, Array(1f, 2f))).toDF("vec_id", "embedding") // wrong dim: dropped
    val got = Similarity.randomProject(df, "vec_id", "embedding", 8, 4, "s1")
      .as[(Long, Seq[Double])].collect().toMap
    // independent sign derivation: full-digest BigInteger formatting (not
    // the production byte-slice path), then an explicit double fold
    def sign(seed: String, k: Int, i: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$k:$i".getBytes("UTF-8"))
      val hex = String.format("%032x", new java.math.BigInteger(1, d))
      (BigInt(hex.substring(0, 8), 16) % 2).toInt * 2 - 1.0
    }
    val exp = rows.map { case (id, v) =>
      id -> (0 until 4).map { k =>
        var acc = 0.0
        var i = 0
        while (i < 8) { acc += v(i).toDouble * sign("s1", k, i); i += 1 }
        acc
      }
    }.toMap
    assert(got.keySet == exp.keySet, "wrong-dim vectors must be dropped")
    got.foreach { case (id, p) =>
      assert(p == exp(id), s"projection of $id must be bit-exact")
    }
    // a different seed draws a different matrix
    val other = Similarity.randomProject(df, "vec_id", "embedding", 8, 4, "s2")
      .as[(Long, Seq[Double])].collect().toMap
    assert(rows.exists { case (id, _) => other(id) != got(id) })
  }

  test("projected top-k at full shortlist == brute force exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val e = (0 until 40).map { i =>
      val v = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val q = e.where($"vec_id" < 5)
    // stage 1 keeps EVERY candidate -> stage 2's exact re-rank must be
    // bit-identical to brute force, rank for rank (the full-probe
    // exactness argument the recall contract's margin rests on)
    val proj = Similarity.projectedTopK(e, q, "vec_id", "embedding",
        k = 3, shortlist = 39, inDim = 16, projDim = 8, seed = "t")
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(proj == brute)
  }

  test("media dup clusters == brute-force CC over pairs; largest payload wins") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def doc(words: Int) = Seq.fill(words)("t" + rnd.nextInt(3000)).mkString(" ")
    val bases = (0 until 15).map(i => (i.toLong, doc(100)))
    // 100+i: one-word edits of i (same length); 200: base 0 with two
    // extra words APPENDED — a longer near-copy, so cluster 0's
    // representative must NOT be the min id
    val edits = (0 until 4).map { i =>
      val w = bases(i)._2.split(' '); w(50) = "EDIT" + i
      (100L + i, w.mkString(" "))
    }
    val longer = Seq((200L, bases(0)._2 + " zz zz"))
    val all = bases ++ edits ++ longer
    val media = all.toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("blob"))
      .withColumn("nbytes", octet_length(col("blob")).cast("long"))
    val got = Multimodal
      .mediaDupClusters(media, "media_id", "blob", "nbytes", maxHamming = 6)
      .select($"media_id", $"cluster_id", $"rep_id", $"keep")
      .as[(Long, Long, Long, Boolean)].collect()
    // brute-force truth: union-find over the operator's own pair predicate
    val fps = all.map { case (id, t) =>
      (id, Multimodal.perceptualHash64(t.getBytes("UTF-8")))
    }
    val parent = scala.collection.mutable.Map(all.map(e => e._1 -> e._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && java.lang.Long.bitCount(fa ^ fb) <= 6
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = all.map { case (id, t) => id -> t.getBytes("UTF-8").length.toLong }.toMap
    val expClusters = all.map(_._1).groupBy(find)
    val expRep = expClusters.map { case (_, members) =>
      find(members.head) -> members.maxBy(m => (sizes(m), -m))
    }
    got.foreach { case (id, cid, rep, keep) =>
      assert(cid == find(id), s"cluster of $id")
      assert(rep == expRep(cid), s"rep of cluster $cid")
      assert(keep == (id == rep))
    }
    // fixture guards: the appended-copy cluster exists, is multi-member,
    // and its representative is the LONGER non-min-id copy
    assert(find(200L) == 0L, "longer copy must join base 0's cluster")
    assert(expRep(0L) == 200L, "largest payload must win cluster 0")
  }

  test("planted corpus near-dups are caught at the declared threshold (sf0.001)") {
    import spark.implicits._
    // truth: exact n-gram jaccard >= 0.7 pairs (q14's oracle-checked
    // machinery); contract: each is within hamming 6 of the q101 gate
    val dd = graft.Tables.load(spark, sf, "documents")
    val truth = Dedup.minHashPairs(dd, "doc_id", "text", threshold = 0.7)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture corpus must contain planted near-dups")
    val flagged = graft.PipelineQueries.mediaPhashPairs(spark, sf)
      .select($"m1", $"m2").as[(Long, Long)].collect().toSet
    val missed = truth -- flagged
    assert(missed.isEmpty, s"planted near-dups not flagged: $missed")
  }
}
