package graft.operators

import graft.sources.TextTransactions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew utilities, bucketed-join plans, and non-text transaction sources. */
class OperatorsSpec extends AnyFunSuite {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", warehouse)
    .appName("operators-spec")
    .getOrCreate()

  test("saltedJoin equals the plain join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a uniform tail
    val large = (Seq.fill(10000)(1L) ++ (2L to 500L)).map(k => (k, s"v$k"))
      .toDF("k", "payload")
    val small = (1L to 500L).map(k => (k, k * 10)).toDF("k", "dim")
    val plain = large.join(small, "k")
      .select($"k", $"payload", $"dim").as[(Long, String, Long)]
      .collect().sorted.toSeq
    val salted = Skew.saltedJoin(large, small, "k", salts = 8)
      .select($"k", $"payload", $"dim").as[(Long, String, Long)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 10000)
  }

  test("saltedCollectList equals direct collect_list (sorted)") {
    import spark.implicits._
    val df = Seq((1L, "c"), (1L, "a"), (1L, "b"), (2L, "z")).toDF("k", "v")
    val direct = df.groupBy($"k").agg(array_sort(collect_list($"v")).as("v_list"))
      .as[(Long, Seq[String])].collect().toMap
    val salted = Skew.saltedCollectList(df, "k", "v", salts = 4)
      .as[(Long, Seq[String])].collect().toMap
    assert(salted == direct)
  }

  test("bucketed tables co-locate: join and agg plan without Exchange") {
    import spark.implicits._
    val df = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "v")
    // unique external locations: the suite may share a session whose
    // warehouse dir (and leftovers in it) we don't control
    val base = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val (t1, t2) = (s"graft_b1_${System.nanoTime()}", s"graft_b2_${System.nanoTime()}")
    df.write.bucketBy(4, "k").sortBy("k").option("path", s"$base/b1").saveAsTable(t1)
    df.write.bucketBy(4, "k").sortBy("k").option("path", s"$base/b2").saveAsTable(t2)
    // disable auto-broadcast so the planner must pick the co-located
    // bucketed join (at real scale neither side would broadcast anyway)
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(t1).join(spark.table(t2), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1000)
      // bucketed grouping also avoids the shuffle
      val agg = spark.table(t1).groupBy($"k").agg(sum($"v"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $t1")
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }

  test("hive-partitioned writes prune partitions at scan time") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .write.partitionBy("o_orderstatus").parquet(s"$tmp/orders")
    import org.apache.spark.sql.execution.FileSourceScanExec
    // pre-adaptive physical plan exposes the scan with its pruned
    // partition list (AQE wraps executedPlan in stages)
    def partitionsScanned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f.selectedPartitions.partitionCount
      }.sum
    val pruned = partitionsScanned(
      spark.read.parquet(s"$tmp/orders").where($"o_orderstatus" === "F"))
    val full = partitionsScanned(spark.read.parquet(s"$tmp/orders"))
    // real pruning evidence: strictly fewer PARTITIONS scanned, not fewer rows out
    assert(pruned > 0 && pruned < full, s"partitions scanned: $pruned of $full")
    assert(pruned == 1)
  }

  test("morton key matches a bit-by-bit reference; interleave is a bijection") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(500)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonKey(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 10), s"($x,$y)") }
    // bijective over the grid -> distinct inputs keep distinct keys
    assert(got.map(_._3).distinct.length == pts.distinct.length)
  }

  test("zorderBy: per-split spread shrinks in BOTH dimensions vs 1-D sorting") {
    import spark.implicits._
    // Full 64x64 grid, shuffled, 16 range splits by z-key. Aligned equal
    // runs of the z-curve are exact 16x16 tiles; sampled range boundaries
    // straddle a few quadrant edges, so assert the aggregate property:
    // average per-split spread stays tile-sized in BOTH dimensions, while
    // a 1-D sort by x leaves y's spread at the full range in every split.
    val rnd = new scala.util.Random(9)
    val grid = rnd.shuffle(
      (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)).toVector)
    def spreads(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(spark_partition_id().as("p"), col("x"), col("y"))
        .groupBy("p")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .select("sx", "sy").as[(Long, Long)].collect().toSeq
    val z = spreads(Layout.zorderBy(grid.toDF("x", "y"), col("x"), col("y"),
      bits = 6, numFiles = 16))
    val oneD = spreads(grid.toDF("x", "y").repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    assert(z.nonEmpty && oneD.nonEmpty)
    def avg(s: Seq[Long]): Double = s.sum.toDouble / s.size
    assert(avg(z.map(_._1)) <= 32.0, s"x spreads: $z")
    assert(avg(z.map(_._2)) <= 32.0, s"y spreads: $z")
    assert(z.count { case (sx, sy) => sx <= 16 && sy <= 16 } >= z.size / 2, s"$z")
    // the 1-D layout cannot bound the second dimension
    assert(avg(oneD.map(_._2)) >= 48.0, s"1-D y spreads: $oneD")
  }

  test("CSV and JSON transaction sources feed the miner like text does") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-src").toString
    Seq("I1 I2 I5", "I2 I4", "I2 I3", "I1 I3", "I4 I2 I5 I1").toDF("items_str")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    Seq("""{"items": ["I1","I2","I5"]}""", """{"items": ["I2","I4"]}""",
      """{"items": ["I2","I3"]}""", """{"items": ["I1","I3"]}""",
      """{"items": ["I4","I2","I5","I1"]}""").toDF("value")
      .coalesce(1).write.mode("overwrite").text(s"$tmp/json")

    val fromCsv = TextTransactions.fromCsv(spark, s"$tmp/csv", "items_str")
    val fromJson = TextTransactions.fromJson(spark, s"$tmp/json")
    def itemsets(df: org.apache.spark.sql.DataFrame) =
      new graft.fpm.FPGrowth().setMinSupport(0.4).fit(df)
        .freqItemsets.as[(Seq[String], Long)].collect()
        .map { case (i, f) => i.toSet -> f }.toMap
    val expected = itemsets(TextTransactions.fromLines(spark,
      Seq("I1 I2 I5", "I2 I4", "I2 I3", "I1 I3", "I4 I2 I5 I1")))
    assert(itemsets(fromCsv) == expected)
    assert(itemsets(fromJson) == expected)
    assert(expected(Set("I1", "I2", "I5")) == 2L)
  }
}
