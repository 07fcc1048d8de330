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

  test("ngram stream matches the dedup family's 5-gram construction") {
    import spark.implicits._
    val docs = Seq(("a b c d e f", "s1"), ("x y", "s2")).toDF("text", "source")
    val grams = Sketches.ngramStream(docs, "text", Seq("source"))
      .select($"source", $"gram").as[(String, String)].collect().toSet
    assert(grams == Set(("s1", "a b c d e"), ("s1", "b c d e f")),
      "len-4 docs yield no grams; len-6 yields exactly two overlapping")
  }
}
