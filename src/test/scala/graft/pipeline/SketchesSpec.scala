package graft.pipeline

import graft.functions.RollingHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic HLL: register arithmetic vs a driver-side reference,
  * max-mergeability, estimate accuracy, partition invariance. */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("sketches-spec")
    .getOrCreate()

  /** Driver-side register reference over the same rolling hash. */
  private def referenceRegisters(values: Seq[String]): Map[Long, Int] = {
    val regs = scala.collection.mutable.Map[Long, Int]()
    for (v <- values) {
      val h = RollingHash.hashString(v)
      val bucket = h >>> 56
      val w = h & ((1L << 56) - 1)
      val rho = if (w == 0L) 57 else 57 - java.lang.Long.toBinaryString(w).length
      regs(bucket) = math.max(regs.getOrElse(bucket, 0), rho)
    }
    regs.toMap
  }

  private def randomStrings(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => (0 until 12).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString)
  }

  test("register table matches the driver-side reference") {
    import spark.implicits._
    val vals = randomStrings(3000, 1)
    val got = Sketches.hllRegisters(
        vals.toDF("v").withColumn("g", lit("x")), Seq("g"), "v")
      .select($"bucket", $"maxrho").as[(Long, Int)].collect().toMap
    assert(got == referenceRegisters(vals))
  }

  test("null values mint no register: sketch equals the non-null-only one") {
    import spark.implicits._
    val vals = randomStrings(300, 9)
    def regs(vs: Seq[Option[String]]) = Sketches.hllRegisters(
        vs.toDF("v").withColumn("g", lit("x")), Seq("g"), "v")
      .select($"bucket", $"maxrho").as[(Long, Int)].collect().toMap
    assert(regs(vals.map(Some(_)) ++ Seq.fill(25)(None)) ==
      regs(vals.map(Some(_))),
      "hashing null would add a phantom (bucket, rho) and inflate the " +
        "nonzero-register mass")
  }

  // ------------------------------------------- log-bucketed quantile sketch

  /** Driver-side bucket index: exact below 2^s, top-s-mantissa above. */
  private def refIdx(v: Long, s: Int): Long = {
    val half = 1L << (s - 1)
    if (v < (1L << s)) v
    else {
      val b = 64 - java.lang.Long.numberOfLeadingZeros(v)
      (v >> (b - s)) + (b - s).toLong * half
    }
  }

  /** Driver-side inclusive upper bound of bucket `idx`. */
  private def refHi(idx: Long, s: Int): Long = {
    val half = 1L << (s - 1)
    if (idx < (1L << s)) idx
    else {
      val e = idx / half - 1
      val u = idx - e * half
      ((u + 1) << e) - 1
    }
  }

  private def qskValues(n: Int, seed: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      // mix exact-region, mid-range, and huge values across decades
      rnd.nextInt(3) match {
        case 0 => rnd.nextInt(128).toLong
        case 1 => rnd.nextInt(1000000).toLong
        case _ => math.abs(rnd.nextLong()) % 1000000000000L
      }
    }
  }

  test("qsketch buckets match the driver-side index on all value ranges") {
    import spark.implicits._
    val vals = qskValues(4000, 31) ++ Seq(0L, 1L, 127L, 128L, 129L,
      255L, 256L, Long.MaxValue)
    val got = Sketches.qsketchBuckets(
        vals.toDF("v").withColumn("g", lit("x")), Seq("g"), "v")
      .select($"qbucket", $"cnt").as[(Long, Long)].collect().toMap
    val exp = vals.groupBy(refIdx(_, 7)).map { case (k, vs) =>
      k -> vs.size.toLong
    }
    assert(got == exp)
    // every bucket's span actually contains its members (hi is an upper
    // bound and the previous bucket's hi is strictly below)
    for (v <- vals) {
      val idx = refIdx(v, 7)
      assert(v <= refHi(idx, 7))
      if (idx > 0) assert(refHi(idx - 1, 7) < v)
    }
  }

  test("qsketch merge property: sketch(A ++ B) == merge(sketch A, sketch B)") {
    import spark.implicits._
    val a = qskValues(2500, 32)
    val b = qskValues(2500, 33)
    def sk(vs: Seq[Long]) = Sketches.qsketchBuckets(
      vs.toDF("v").withColumn("g", lit("x")), Seq("g"), "v")
    val merged = Sketches.qsketchMerge(sk(a), sk(b), Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    val full = sk(a ++ b).as[(String, Long, Long)].collect().toSet
    assert(merged == full,
      "cell-wise count sum must equal the sketch of the union bit for bit")
  }

  test("qsketch quantiles: one-sided with (est - exact) * 64 <= exact") {
    import spark.implicits._
    val vals = qskValues(6000, 34)
    val sorted = vals.sorted
    val n = sorted.size
    def exactQ(p: Double): Long = {
      val k = (BigDecimal(p.toString) * n)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toInt
      sorted(k - 1)
    }
    val sk = Sketches.qsketchBuckets(
      vals.toDF("v").withColumn("g", lit("x")), Seq("g"), "v")
    val got = Sketches.qsketchQuantiles(sk, Seq("g"),
        Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)))
      .select($"sketch_buckets", $"p50", $"p90", $"p99")
      .as[(Long, Long, Long, Long)].head()
    val ests = Seq(got._2 -> exactQ(0.5), got._3 -> exactQ(0.9),
      got._4 -> exactQ(0.99))
    for ((est, exact) <- ests) {
      assert(est >= exact, s"estimate $est must not undershoot $exact")
      assert((est - exact) * 64 <= exact,
        s"estimate $est must be within 1/64 relative of $exact")
    }
    assert(got._1 <= 1920L, "sketch must stay domain-bounded")
  }

  test("qsketch quantiles are exact in the exact region (v < 2^s)") {
    import spark.implicits._
    val vals = (1L to 100L) ++ (1L to 100L)
    val sk = Sketches.qsketchBuckets(
      vals.toDF("v").withColumn("g", lit("x")), Seq("g"), "v")
    val got = Sketches.qsketchQuantiles(sk, Seq("g"),
        Seq(("p50", 0.5), ("p100", 1.0)))
      .select($"p50", $"p100").as[(Long, Long)].head()
    assert(got == ((50L, 100L)))
  }

  test("qsketch rejects negative values loudly and excludes nulls") {
    import spark.implicits._
    val bad = Seq(5L, -3L).toDF("v").withColumn("g", lit("x"))
    val e = intercept[Exception] {
      Sketches.qsketchBuckets(bad, Seq("g"), "v").collect()
    }
    assert(e.getMessage != null)
    val withNull = Seq(Some(5L), None).toDF("v").withColumn("g", lit("x"))
    val rows = Sketches.qsketchBuckets(withNull, Seq("g"), "v")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(("x", 5L, 1L)))
  }

  test("qsketch estimates are bit-identical at any parallelism") {
    import spark.implicits._
    val vals = qskValues(3000, 35)
    def run(parts: Int) = Sketches.qsketchQuantiles(
        Sketches.qsketchBuckets(
          vals.toDF("v").repartition(parts).withColumn("g", lit("x")),
          Seq("g"), "v"),
        Seq("g"), Seq(("p50", 0.5), ("p99", 0.99)))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }

  test("registers are max-mergeable across shards") {
    import spark.implicits._
    val a = randomStrings(2000, 2)
    val b = randomStrings(2000, 3) // overlaps a only by chance
    def regs(vs: Seq[String]) = Sketches.hllRegisters(
        vs.toDF("v").withColumn("g", lit("x")), Seq("g"), "v")
      .select($"bucket", $"maxrho").as[(Long, Int)].collect().toMap
    val merged = (regs(a).toSeq ++ regs(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(regs(a ++ b) == merged,
      "sketch of the union must equal the register-wise max of the shards")
  }

  test("estimate lands within the expected error band at n >> 2.5m") {
    import spark.implicits._
    val n = 20000
    val est = Sketches.hllCardinality(
        randomStrings(n, 4).distinct.toDF("v").withColumn("g", lit("x")),
        Seq("g"), "v")
      .select($"estimate").as[Double].head()
    val exact = randomStrings(n, 4).distinct.size
    assert(math.abs(est - exact) / exact < 0.2,
      s"estimate $est vs exact $exact drifted past 20%")
  }

  test("estimate is bit-identical at any parallelism") {
    import spark.implicits._
    val vals = randomStrings(5000, 5)
    def run(parts: Int) = Sketches.hllCardinality(
        vals.toDF("v").repartition(parts).withColumn("g", lit("x")),
        Seq("g"), "v")
      .select($"estimate", $"harmonic_scaled_d").as[(Double, Double)].head()
    assert(run(1) == run(13))
  }

  test("register artifact round-trips; stored+delta merge == full recompute") {
    import spark.implicits._
    val a = randomStrings(2500, 41).map(("g1", _)) ++
      randomStrings(500, 42).map(("g2", _))
    val b = randomStrings(800, 43).map(("g1", _))
    def regs(vs: Seq[(String, String)]) =
      Sketches.hllRegisters(vs.toDF("g", "v"), Seq("g"), "v")
    val dir = java.nio.file.Files.createTempDirectory("hll-artifact")
      .resolve("regs").toString
    Sketches.saveRegisters(regs(a), dir)
    val loaded = Sketches.loadRegisters(spark, dir)
    assert(loaded.select($"g", $"bucket", $"maxrho")
        .as[(String, Long, Int)].collect().toSet ==
      regs(a).select($"g", $"bucket", $"maxrho")
        .as[(String, Long, Int)].collect().toSet,
      "artifact must round-trip bit-exactly")
    val served = Sketches.hllEstimate(
        Sketches.mergeRegisters(loaded, regs(b), Seq("g")), Seq("g"))
      .select($"g", $"estimate", $"harmonic_scaled_d")
      .as[(String, Double, Double)].collect().toSet
    val direct = Sketches.hllEstimate(regs(a ++ b), Seq("g"))
      .select($"g", $"estimate", $"harmonic_scaled_d")
      .as[(String, Double, Double)].collect().toSet
    assert(served == direct,
      "stored-registers + delta merge must equal the full recompute")
  }

  test("stream-maintained qsketch buckets == one-pass sketch, any order") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val a = qskValues(1500, 61).map(("g", _))
    val b = qskValues(1500, 62).map(("g", _))
    def maintained(chunks: Seq[Seq[(String, Long)]]): Set[(String, Long, Long)] = {
      val base = java.nio.file.Files.createTempDirectory("qsk-stream")
      val skDir = base.resolve("qsketch")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[(String, Long)]
      val q = source.toDS().toDF("g", "v").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val sk = Sketches.qsketchBuckets(batch, Seq("g"), "v")
          val merged =
            if (java.nio.file.Files.exists(skDir))
              Sketches.qsketchMerge(
                Sketches.loadRegisters(spark, skDir.toString), sk, Seq("g"))
            else sk
          val sib = base.resolve(s"next-$id")
          Sketches.saveRegisters(merged, sib.toString)
          graft.Fs.deleteRecursively(skDir)
          java.nio.file.Files.move(sib, skDir)
          ()
        }
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .start()
      try chunks.foreach { c => source.addData(c); q.processAllAvailable() }
      finally q.stop()
      Sketches.loadRegisters(spark, skDir.toString)
        .select($"g", $"qbucket", $"cnt").as[(String, Long, Long)]
        .collect().toSet
    }
    val direct = Sketches.qsketchBuckets((a ++ b).toDF("g", "v"), Seq("g"), "v")
      .select($"g", $"qbucket", $"cnt").as[(String, Long, Long)]
      .collect().toSet
    assert(maintained(Seq(a, b)) == direct,
      "stream-folded counts must equal the one-pass sketch")
    assert(maintained(Seq(b, a)) == direct, "arrival order must not matter")
  }

  test("stream-maintained registers == one-pass sketch, any batch order") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val a = randomStrings(1200, 51).map(("g", _))
    val b = randomStrings(1200, 52).map(("g", _))
    def maintained(chunks: Seq[Seq[(String, String)]]): Set[(String, Long, Int)] = {
      val base = java.nio.file.Files.createTempDirectory("hll-stream")
      val regDir = base.resolve("registers")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[(String, String)]
      val q = source.toDS().toDF("g", "v").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val regs = Sketches.hllRegisters(batch, Seq("g"), "v")
          val merged =
            if (java.nio.file.Files.exists(regDir))
              Sketches.mergeRegisters(
                Sketches.loadRegisters(spark, regDir.toString), regs, Seq("g"))
            else regs
          val sib = base.resolve(s"next-$id")
          Sketches.saveRegisters(merged, sib.toString)
          graft.Fs.deleteRecursively(regDir)
          java.nio.file.Files.move(sib, regDir)
          ()
        }
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .start()
      try chunks.foreach { c => source.addData(c); q.processAllAvailable() }
      finally q.stop()
      Sketches.loadRegisters(spark, regDir.toString)
        .select($"g", $"bucket", $"maxrho").as[(String, Long, Int)]
        .collect().toSet
    }
    val direct = Sketches.hllRegisters((a ++ b).toDF("g", "v"), Seq("g"), "v")
      .select($"g", $"bucket", $"maxrho").as[(String, Long, Int)]
      .collect().toSet
    val ab = maintained(Seq(a, b)) // two real batches: merge path fires
    val ba = maintained(Seq(b, a))
    assert(ab == direct, "stream-maintained must equal the one-pass sketch")
    assert(ba == direct, "batch ORDER must not matter (max-merge commutes)")
  }

  /** Driver-side CMS reference: bucket r = byte r of the salted hash. */
  private def referenceCms(values: Seq[String]): Map[(Int, Long), Long] = {
    val c = scala.collection.mutable.Map[(Int, Long), Long]()
    for (v <- values; r <- 0 until Sketches.CmsDepth) {
      val h = RollingHash.hashString(s"cms:$v")
      val b = (h >>> (8 * r)) & 255L
      c((r, b)) = c.getOrElse((r, b), 0L) + 1L
    }
    c.toMap
  }

  test("count-min counters match the driver-side byte-field reference") {
    import spark.implicits._
    val vals = randomStrings(2000, 6) ++ Seq("a", "b", "a") // short values too
    val got = Sketches.cmsCounters(vals.toDF("v"), "v")
      .select($"r", $"bucket", $"counter").as[(Int, Long, Long)].collect()
      .map { case (r, b, c) => (r, b) -> c }.toMap
    assert(got == referenceCms(vals))
  }

  test("count-min artifact: stored + delta sum-merge == full recompute") {
    import spark.implicits._
    val a = randomStrings(1500, 71) ++ randomStrings(300, 71) // repeats
    val b = randomStrings(700, 72)
    def counters(vs: Seq[String]) = Sketches.cmsCounters(vs.toDF("v"), "v")
    val dir = java.nio.file.Files.createTempDirectory("cms-artifact")
      .resolve("counters").toString
    Sketches.saveRegisters(counters(a), dir)
    val merged = Sketches.mergeCounters(
        Sketches.loadRegisters(spark, dir), counters(b))
      .as[(Int, Long, Long)].collect().toSet
    val full = counters(a ++ b).as[(Int, Long, Long)].collect().toSet
    assert(merged == full,
      "cell-wise counter sum must equal the one-pass counters bit for bit")
  }

  test("count-min counters are sum-mergeable across shards") {
    import spark.implicits._
    val a = randomStrings(1500, 7)
    val b = randomStrings(1500, 8)
    def c(vs: Seq[String]) = Sketches.cmsCounters(vs.toDF("v"), "v")
      .select($"r", $"bucket", $"counter").as[(Int, Long, Long)].collect()
      .map { case (r, bk, ct) => (r, bk) -> ct }.toMap
    val merged = (c(a).toSeq ++ c(b).toSeq).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(c(a ++ b) == merged)
  }

  test("count-min never underestimates; exact when buckets are sparse") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val vocab = randomStrings(50, 10)
    val occurrences = (0 until 5000).map(_ => vocab(rnd.nextInt(vocab.size)))
    val exact = occurrences.groupBy(identity).view.mapValues(_.size.toLong)
    val counters = Sketches.cmsCounters(occurrences.toDF("v"), "v")
    val probes = vocab.distinct.toDF("v")
    val est = Sketches.cmsEstimate(counters, probes, "v")
      .select($"v", $"est_count").as[(String, Long)].collect().toMap
    for ((v, e) <- exact) {
      assert(est(v) >= e, s"CMS underestimated $v: ${est(v)} < $e")
    }
    // 50 values over 4x256 buckets: a full 32-bit cross-row collision is
    // a ~1e-7 event, so the min must be exact here
    assert(exact.forall { case (v, e) => est(v) == e })
  }

  test("join-size estimate: min of per-row inner products on hand counters") {
    import spark.implicits._
    // row 0: 2*3 + 1*4 = 10; row 1: 5*2 = 10; row 2: 1*1 = 1 -> min 1
    val a = Seq((0, 0L, 2L), (0, 1L, 1L), (1, 7L, 5L), (2, 3L, 1L))
      .toDF("r", "bucket", "counter")
    val b = Seq((0, 0L, 3L), (0, 1L, 4L), (1, 7L, 2L), (2, 3L, 1L))
      .toDF("r", "bucket", "counter")
    val est = Sketches.cmsJoinSizeEstimate(a, b)
      .select($"est_join_size".cast("long")).as[Long].head()
    assert(est == 1L)
  }

  test("join-size estimate never underestimates the true equi-join size") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val ka = (0 until 4000).map(_ => s"k${rnd.nextInt(300)}")
    val kb = (0 until 2000).map(_ => s"k${rnd.nextInt(500)}")
    val est = Sketches.cmsJoinSizeEstimate(
        Sketches.cmsCounters(ka.toDF("k"), "k"),
        Sketches.cmsCounters(kb.toDF("k"), "k"))
      .select($"est_join_size".cast("long")).as[Long].head()
    val fa = ka.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = kb.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = fa.map { case (k, c) => c * fb.getOrElse(k, 0L) }.sum
    assert(est >= truth, s"estimate $est under true $truth")
    // and it matches the driver-side reference inner product exactly
    val ra = referenceCms(ka.map(identity))
    val rb = referenceCms(kb)
    val expected = (0 until Sketches.CmsDepth).map { r =>
      ra.collect { case ((`r`, b), c) => c * rb.getOrElse((r, b), 0L) }.sum
    }.min
    assert(est == expected)
  }

  test("ngram stream matches the dedup family's 5-gram construction") {
    import spark.implicits._
    val docs = Seq(("a b c d e f", "s1"), ("x y", "s2")).toDF("text", "source")
    val grams = Sketches.ngramStream(docs, "text", Seq("source"))
      .select($"source", $"gram").as[(String, String)].collect().toSet
    assert(grams == Set(("s1", "a b c d e"), ("s1", "b c d e f")),
      "len-4 docs yield no grams; len-6 yields exactly two overlapping")
  }

  /** Driver-side KMV reference: k smallest DISTINCT rolling hashes in
    * unsigned order. */
  private def referenceKmv(values: Seq[String], k: Int): Seq[Long] =
    values.map(RollingHash.hashString).distinct
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0).take(k)

  test("kmv synopsis matches the driver-side k-min reference") {
    import spark.implicits._
    val vals = randomStrings(3000, 7)
    // with duplication: the synopsis is a function of the value SET
    val got = Sketches.kmvSketch((vals ++ vals.take(500)).toDF("v"),
        Seq.empty, "v", k = 64)
      .select($"kmv").as[Seq[Long]].head()
    assert(got == referenceKmv(vals, 64))
  }

  test("kmv synopsis is bit-identical at any parallelism; nulls excluded") {
    import spark.implicits._
    val vals: Seq[Option[String]] =
      randomStrings(2000, 8).map(Option(_)) ++ Seq.fill(50)(Option.empty[String])
    def sk(parts: Int) =
      Sketches.kmvSketch(vals.toDF("v").repartition(parts), Seq.empty, "v", k = 64)
        .select($"kmv").as[Seq[Long]].head()
    assert(sk(1) == sk(13))
    assert(sk(13) == referenceKmv(vals.flatten, 64))
  }

  test("kmv mergeability: k-min of a union == k-min over the two synopses") {
    import spark.implicits._
    val a = randomStrings(1500, 9)
    val b = randomStrings(1500, 10)
    val full = referenceKmv(a ++ b, 64)
    val ka = referenceKmv(a, 64)
    val kb = referenceKmv(b, 64)
    val merged = (ka ++ kb).distinct
      .sortWith((x, y) => java.lang.Long.compareUnsigned(x, y) < 0).take(64)
    assert(merged == full,
      "the union's k smallest all live in one of the two k-min sets")
  }

  test("kmv set ops are exact when both sets are smaller than k") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"val_$i")       // 20 distinct
    val b = (11 to 35).map(i => s"val_$i")      // 25 distinct, overlap 10
    val ska = Sketches.kmvSketch(a.toDF("v"), Seq.empty, "v", k = 64)
      .select($"kmv".as("kmv_a"))
    val skb = Sketches.kmvSketch(b.toDF("v"), Seq.empty, "v", k = 64)
      .select($"kmv".as("kmv_b"))
    val r = Sketches.kmvSetOps(ska.crossJoin(skb))
      .select($"n_mins", $"union_est", $"jacc_est", $"inter_est")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 35L)                        // |A u B| exactly
    assert(r._2 == 35.0)                       // union estimate exact
    assert(r._3 == 10.0 / 35.0)                // Jaccard exact
    assert(r._4 == (10.0 / 35.0) * 35.0)       // intersection recovers 10
  }

  test("kmv artifact refresh: stored synopsis + delta fold == full recompute") {
    import spark.implicits._
    val old = randomStrings(2000, 12).map(("g1", _)) ++
      randomStrings(1500, 13).map(("g2", _))
    val delta = randomStrings(800, 14).map(("g1", _)) ++
      randomStrings(900, 15).map(("g2", _))
    val stored = Sketches.kmvSketch(old.toDF("grp", "v"), Seq("grp"), "v")
    val refreshed = Sketches.kmvRefresh(
        stored, delta.toDF("grp", "v"), Seq("grp"), "v")
      .as[(String, Seq[Long])].collect().toMap
    val full = Sketches.kmvSketch((old ++ delta).toDF("grp", "v"), Seq("grp"), "v")
      .as[(String, Seq[Long])].collect().toMap
    assert(refreshed == full)
  }

  test("kmv table merge == full recompute; groups missing from one side survive") {
    import spark.implicits._
    val a = randomStrings(1200, 16).map(("g1", _)) ++
      randomStrings(300, 17).map(("gOnlyA", _))
    val b = randomStrings(900, 18).map(("g1", _)) ++
      randomStrings(200, 19).map(("gOnlyB", _))
    val merged = Sketches.kmvMergeTables(
        Sketches.kmvSketch(a.toDF("grp", "v"), Seq("grp"), "v"),
        Sketches.kmvSketch(b.toDF("grp", "v"), Seq("grp"), "v"), Seq("grp"))
      .as[(String, Seq[Long])].collect().toMap
    val full = Sketches.kmvSketch((a ++ b).toDF("grp", "v"), Seq("grp"), "v")
      .as[(String, Seq[Long])].collect().toMap
    assert(merged == full)
    assert(merged.keySet == Set("g1", "gOnlyA", "gOnlyB"))
  }

  test("kmv intersection estimate lands within the binomial error band") {
    import spark.implicits._
    // two 4000-element sets sharing 2000 -> jaccard 1/3, union 6000.
    // Random strings: the estimator assumes a well-mixed hash, and
    // sequential-suffix fixtures (common prefix, trailing counter)
    // cluster the Karp-Rabin fold badly enough to starve the k-min
    // sample of one side entirely (see the ngramStream scaladoc).
    val univ = randomStrings(6000, 11).distinct
    assert(univ.size == 6000)
    val a = univ.take(4000)
    val b = univ.drop(2000)
    val ska = Sketches.kmvSketch(a.toDF("v"), Seq.empty, "v", k = 64)
      .select($"kmv".as("kmv_a"))
    val skb = Sketches.kmvSketch(b.toDF("v"), Seq.empty, "v", k = 64)
      .select($"kmv".as("kmv_b"))
    val r = Sketches.kmvSetOps(ska.crossJoin(skb))
      .select($"union_est", $"jacc_est").as[(Double, Double)].head()
    // union sigma 12.7%, jaccard sigma sqrt(j(1-j)/64) = 5.9%: 4-sigma caps
    assert(math.abs(r._1 - 6000.0) / 6000.0 <= 0.51, s"union_est ${r._1}")
    assert(math.abs(r._2 - 1.0 / 3.0) <= 0.24, s"jacc_est ${r._2}")
  }
}
