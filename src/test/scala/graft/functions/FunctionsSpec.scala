package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** SQL registration + semantics of the native expressions. */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("functions-spec")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("rolling_hash callable from SQL") {
    import spark.implicits._
    val got = spark.sql("SELECT rolling_hash('hello world') AS h").as[Long].head()
    assert(got == RollingHash.hashString("hello world"))
  }

  test("array_dot and array_cosine callable from SQL, float arrays accepted") {
    import spark.implicits._
    val (d, c) = spark.sql(
      """SELECT array_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       array_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c""".stripMargin)
      .as[(Double, Double)].head()
    assert(d == 11.0)
    assert(math.abs(c - 1.0) < 1e-15)
  }

  test("heavy-hitters sketch: guaranteed recall and bounded undercount") {
    import spark.implicits._
    // Zipf-ish stream: item i appears ~N/(i+1) times, shuffled, multi-partition
    val rng = new scala.util.Random(5)
    val stream = rng.shuffle(
      (0 until 50).flatMap(i => Seq.fill(2000 / (i + 1))(s"item$i")))
    val n = stream.size
    val k = 10
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = stream.toDF("item").repartition(7)
      .agg(HeavyHitters.heavy_hitters(col("item"), k).as("hh"))
      .selectExpr("explode(hh) AS e").selectExpr("e.item", "e.min_count")
      .as[(String, Long)].collect().toMap
    assert(sketch.size <= k)
    val bound = n.toDouble / (k + 1)
    // every item with true frequency > n/(k+1) must survive
    exact.collect { case (i, c) if c > bound => i }.foreach { i =>
      assert(sketch.contains(i), s"guaranteed item $i missing")
    }
    // surviving counts undercount by at most n/(k+1), never overcount
    sketch.foreach { case (i, c) =>
      assert(c <= exact(i), s"$i overcounted: $c > ${exact(i)}")
      assert(exact(i) - c <= bound, s"$i undercounted beyond bound")
    }
  }

  test("heavy_hitters callable from SQL with literal k") {
    import spark.implicits._
    val out = Seq("a", "a", "a", "b", "a").toDF("s").createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      "SELECT explode(heavy_hitters(s, 2)) AS e FROM hh_in")
      .selectExpr("e.item", "e.min_count").as[(String, Long)].collect().toMap
    assert(rows.contains("a") && rows("a") >= 2) // freq 4 > n/(k+1)=5/3
  }

  test("kmv_minhash callable from SQL with literal k; unsigned order; dedup") {
    import spark.implicits._
    Seq("a", "b", "c", "a", "b").toDF("s").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmv_minhash(rolling_hash(s), 2) AS m FROM kmv_in")
      .as[Seq[Long]].head()
    val expect = Seq("a", "b", "c").map(RollingHash.hashString).distinct
      .sortWith((x, y) => java.lang.Long.compareUnsigned(x, y) < 0).take(2)
    assert(got == expect)
  }

  test("bloom filter: zero false negatives, bounded false positives, OR-mergeable") {
    import spark.implicits._
    val numBits = 1 << 16
    val numHashes = 5
    val rng = new scala.util.Random(11)
    val inserted = Array.fill(2000)(rng.nextLong())
    val absent = Array.fill(2000)(rng.nextLong()).filterNot(inserted.toSet)
    // multi-partition build exercises partial (update) + final (merge) paths
    val bytes = inserted.toSeq.toDF("k").repartition(7)
      .agg(Bloom.bloom_agg(col("k"), numBits, numHashes))
      .head().getAs[Array[Byte]](0)
    val words = Bloom.fromBytes(bytes)
    assert(words.length == numBits / 64)
    inserted.foreach { k =>
      assert(Bloom.mightContain(words, numHashes, k), s"false negative on $k")
    }
    // n/m ~ 0.03 at 5 hashes -> fp rate ~ (1 - e^-0.15)^5 ~ 5e-5
    val fps = absent.count(Bloom.mightContain(words, numHashes, _))
    assert(fps <= 5, s"$fps false positives out of ${absent.length}")
    // distributed OR-merge == single-partition build, bit for bit
    val single = inserted.toSeq.toDF("k").coalesce(1)
      .agg(Bloom.bloom_agg(col("k"), numBits, numHashes))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytes, single))
  }

  test("bloom_agg callable from SQL with literal sizes") {
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("bf_in")
    val bytes = spark.sql("SELECT bloom_agg(k, 64, 3) FROM bf_in")
      .head().getAs[Array[Byte]](0)
    val words = Bloom.fromBytes(bytes)
    assert(Seq(1L, 2L, 3L).forall(Bloom.mightContain(words, 3, _)))
  }

  test("morton_key callable from SQL, identical to the Column-API fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    pts.toDF("x", "y").createOrReplaceTempView("mk_in")
    def toMap(a: Array[(Long, Long, Long)]) =
      a.map { case (x, y, z) => (x, y) -> z }.toMap
    val viaSql = toMap(spark.sql("SELECT x, y, morton_key(x, y, 10) AS z FROM mk_in")
      .as[(Long, Long, Long)].collect())
    val viaApi = toMap(pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Layout.mortonKey(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect())
    assert(viaSql == viaApi)
  }

  test("item_bit_mask: dictionary fold, unknown/null items, null array, codegen == interpreted") {
    import spark.implicits._
    import ItemBitMask.item_bit_mask
    val dict = Map("a" -> 1L, "b" -> 2L, "c" -> 4L)
    val df = Seq(
      (1L, Seq("a", "c")),          // 1 | 4
      (2L, Seq("a", "a", "zz")),    // duplicate + unknown -> 1
      (3L, Seq.empty[String]),      // 0
      (4L, null),                   // null array -> null mask
      (5L, Seq("a", null, "b"))     // null element skipped -> 1 | 2
    ).toDF("id", "items")
    def run(codegen: Boolean): Map[Long, Option[Long]] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try df.select($"id", item_bit_mask($"items", dict).as("m"))
        .as[(Long, Option[Long])].collect().toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val expected = Map(1L -> Some(5L), 2L -> Some(1L), 3L -> Some(0L),
      4L -> None, 5L -> Some(3L))
    assert(run(codegen = true) == expected)
    assert(run(codegen = false) == expected)
  }

  test("winnow == brute-force per-window rightmost argmin on random docs") {
    // independent reference: hash every k-gram, then literally enumerate
    // windows and take each one's min with rightmost tie-break
    def reference(tokens: Seq[String], k: Int, w: Int): Seq[(Long, Long)] = {
      val hs = tokens.sliding(k).filter(_.length == k)
        .map(g => RollingHash.hashString(g.mkString(" "))).toArray
      if (hs.isEmpty) return Seq.empty
      val ww = math.min(w, hs.length)
      (0 to hs.length - ww).map { s =>
        val best = (s until s + ww).maxBy(q => (-BigInt(hs(q)), q))
        ((best + 1).toLong, hs(best))
      }.distinct
    }
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 60) {
      // tiny vocab forces hash ties; lengths cover empty/sub-k/sub-w/long
      val n = rng.nextInt(30)
      val tokens = Seq.fill(n)("t" + rng.nextInt(4))
      val got = graft.functions.WinnowAlg.select(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
        3, 4)
      val gotPairs = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      assert(gotPairs == reference(tokens, 3, 4), s"trial $trial tokens=$tokens")
    }
  }

  test("winnow guarantee: a shared w+k-1 token run yields a shared fingerprint") {
    def fps(text: String): Set[Long] = {
      val toks = text.split(' ').filter(_.nonEmpty).toSeq
      val arr = graft.functions.WinnowAlg.select(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
        3, 4)
      (0 until arr.numElements()).map(i => arr.getStruct(i, 2).getLong(1)).toSet
    }
    // w + k - 1 = 6 shared tokens embedded at different offsets in
    // otherwise-disjoint documents (SIGMOD'03 theorem 1)
    val shared = "the quick brown fox jumps high"
    val a = fps(s"alpha beta $shared gamma delta epsilon")
    val b = fps(s"one two three four $shared five")
    assert(a.intersect(b).nonEmpty)
  }

  test("winnow callable from SQL, codegen == interpreted, degenerate sizes") {
    import spark.implicits._
    val got = spark.sql(
      """SELECT inline(winnow(array('a','b','c','a','b','c','a','b'), 3, 4))""")
      .as[(Long, Long)].collect().toSeq
    // same tokens through the Column API (interpreted eval path)
    val viaApi = Seq(Seq("a", "b", "c", "a", "b", "c", "a", "b")).toDF("ws")
      .select(org.apache.spark.sql.functions.explode(
        Winnow.winnow(col("ws"), 3, 4)).as("fp"))
      .select("fp.pos", "fp.hash").as[(Long, Long)].collect().toSeq
    assert(got == viaApi && got.nonEmpty)
    // fewer grams than w -> one window; fewer tokens than k -> empty
    assert(spark.sql("SELECT size(winnow(array('x','y','z'), 3, 4)) AS n")
      .as[Int].head() == 1)
    assert(spark.sql("SELECT size(winnow(array('x','y'), 3, 4)) AS n")
      .as[Int].head() == 0)
    // null array elements hash as empty tokens, never NPE
    assert(spark.sql(
      "SELECT size(winnow(array('x', CAST(NULL AS STRING), 'y', 'z'), 3, 4)) AS n")
      .as[Int].head() >= 1)
  }

  test("extensions class registers the same functions") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .appName("functions-ext-spec")
      .getOrCreate()
    // newSession shares the extension-injected registry
    assert(s2.sql("SELECT rolling_hash('x')").head().getLong(0) ==
      RollingHash.hashString("x"))
  }
}
