package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join: semantics, ties, outer rows, and a brute-force differential. */
class AsOfSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("asof-spec")
    .getOrCreate()

  private def quotes = {
    import spark.implicits._
    Seq(
      (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 30L, 120.0),
      (2L, 15L, 200.0)).toDF("sym", "qt", "px")
  }

  test("asOfJoin picks the greatest right time <= left time, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, 5L),  // before any quote -> null match
      (1L, 10L), // exactly at a quote -> that quote (<= semantics)
      (1L, 25L), // between quotes -> qt=20
      (1L, 99L), // after all -> qt=30
      (2L, 15L), // other key isolated
      (2L, 16L)).toDF("sym", "tt")
    val got = AsOf.asOfJoin(trades, quotes, Seq("sym"),
        col("tt"), col("qt"), Seq("qt", "px"))
      .select(col("sym"), col("tt"), col("matched.qt"), col("matched.px"))
      .as[(Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 5L, None, None),
      (1L, 10L, Some(10L), Some(100.0)),
      (1L, 25L, Some(20L), Some(110.0)),
      (1L, 99L, Some(30L), Some(120.0)),
      (2L, 15L, Some(15L), Some(200.0)),
      (2L, 16L, Some(15L), Some(200.0))))
  }

  test("null timestamps never match (right rows dropped, left rows unmatched)") {
    import spark.implicits._
    val right = Seq((1L, Some(10L), 100L), (1L, None, 999L))
      .toDF("k", "rt", "rid")
    val left = Seq((1L, Some(5L)), (1L, Some(15L)), (1L, None))
      .toDF("k", "lt")
    val got = AsOf.asOfJoin(left, right, Seq("k"),
        col("lt"), col("rt"), Seq("rid"))
      .select(col("lt"), col("matched.rid"))
      .as[(Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (Some(5L), None),         // before the only real right row
      (Some(15L), Some(100L)),  // never rid=999 (null right time)
      (None, None)))            // null left time matches nothing
  }

  test("tied right timestamps: the last tieBreak wins, deterministically") {
    import spark.implicits._
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L))
      .toDF("k", "rt", "rid")
    val left = Seq((1L, 10L), (1L, 11L)).toDF("k", "lt")
    val got = AsOf.asOfJoin(left, right, Seq("k"),
        col("lt"), col("rt"), Seq("rid"), tieBreak = Seq("rid"))
      .select(col("k"), col("lt"), col("matched.rid"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 9L), (1L, 11L, 9L)))
  }

  test("lookback horizon: in-horizon matches keep, older ones null out") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 125L), (1L, 200L), (2L, 50L))
      .toDF("sym", "tt")
    val got = AsOf.asOfJoinLookback(left, quotes, Seq("sym"),
        col("tt"), col("qt"), Seq("qt", "px"),
        horizon = 50L, rightTimeField = "qt")
      .select(col("sym"), col("tt"), col("matched.px"))
      .as[(Long, Long, Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 100L, None),        // latest quote qt=30 is 70 old: > horizon
      (1L, 125L, None),        // 95 old
      (1L, 200L, None),        // 170 old
      (2L, 50L, Some(200.0)))) // qt=15, 35 old: within horizon
    // brute-force differential: equals as-of against a per-row
    // horizon-filtered right side
    val rnd = new scala.util.Random(61)
    val l2 = Seq.tabulate(300)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "lt", "lid")
    val r2 = Seq.tabulate(120)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "rt", "rid")
    val h = 60L
    val viaOp = AsOf.asOfJoinLookback(l2, r2, Seq("k"),
        col("lt"), col("rt"), Seq("rt", "rid"), horizon = h,
        rightTimeField = "rt", tieBreak = Seq("rid"))
      .select(col("lid"), col("matched.rid"))
      .as[(Long, Option[Long])].collect().toMap
    l2.createOrReplaceTempView("lb_l"); r2.createOrReplaceTempView("lb_r")
    val want = spark.sql(
      s"""SELECT lid, (SELECT max_by(rid, struct(rt, rid)) FROM lb_r
         |             WHERE lb_r.k = lb_l.k AND rt <= lt AND lt - rt <= $h)
         |FROM lb_l""".stripMargin)
      .as[(Long, Option[Long])].collect().toMap
    assert(viaOp == want)
  }

  test("differential vs brute-force argmax join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(400)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "lt", "lid")
    // unique right times per key (matches the operator's tie contract)
    val right = (for (k <- 0L to 4L; t <- 0 until 100 if rnd.nextBoolean())
      yield (k, t.toLong, k * 1000 + t)).toDF("k", "rt", "rid")
    val got = AsOf.asOfJoin(left, right, Seq("k"),
        col("lt"), col("rt"), Seq("rt", "rid"))
      .select(col("lid"), col("matched.rid"))
      .as[(Long, Option[Long])].collect().toMap
    left.createOrReplaceTempView("l")
    right.createOrReplaceTempView("r")
    val want = spark.sql(
      """SELECT lid, (SELECT max_by(rid, rt) FROM r
        |             WHERE r.k = l.k AND r.rt <= l.lt) AS rid
        |FROM l""".stripMargin)
      .as[(Long, Option[Long])].collect().toMap
    assert(got == want)
  }

  test("bucketed == plain on a single hot key (every bucket width)") {
    import spark.implicits._
    // ONE key owning every row — the shape that serializes the plain
    // variant into a single window task; random times so matches cross
    // bucket boundaries, including buckets with no right rows.
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(300)(i =>
      (7L, rnd.nextInt(1000).toLong, i.toLong)).toDF("k", "lt", "lid")
    val right = Seq.tabulate(60)(i =>
      (7L, rnd.nextInt(1000).toLong, i.toLong)).toDF("k", "rt", "rid")
    val plain = AsOf.asOfJoin(left, right, Seq("k"),
        col("lt"), col("rt"), Seq("rt", "rid"), tieBreak = Seq("rid"))
      .select(col("lid"), col("matched.rid"))
      .as[(Long, Option[Long])].collect().toMap
    // widths: smaller than gaps (forces multi-bucket carry chains), mid,
    // and wider than the whole range (degenerates to the plain shape)
    for (width <- Seq(7L, 100L, 5000L)) {
      val bucketed = AsOf.asOfJoinBucketed(left, right, Seq("k"),
          col("lt"), col("rt"), Seq("rt", "rid"), tieBreak = Seq("rid"),
          bucketSeconds = width)
        .select(col("lid"), col("matched.rid"))
        .as[(Long, Option[Long])].collect().toMap
      assert(bucketed == plain, s"width=$width diverged")
    }
  }

  test("bucketed == plain on multi-key data with ties and null times") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val left = Seq.tabulate(200)(i =>
      (rnd.nextInt(3).toLong, if (i % 17 == 0) None else Some(rnd.nextInt(200).toLong), i.toLong))
      .toDF("k", "lt", "lid")
    // duplicate right times per key exercise the tieBreak contract
    val right = Seq.tabulate(50)(i =>
      (rnd.nextInt(3).toLong,
        if (i % 13 == 0) None else Some(rnd.nextInt(50).toLong * 4), i.toLong))
      .toDF("k", "rt", "rid")
    val plain = AsOf.asOfJoin(left, right, Seq("k"),
        col("lt"), col("rt"), Seq("rt", "rid"), tieBreak = Seq("rid"))
      .select(col("lid"), col("matched.rid"))
      .as[(Long, Option[Long])].collect().toMap
    val bucketed = AsOf.asOfJoinBucketed(left, right, Seq("k"),
        col("lt"), col("rt"), Seq("rt", "rid"), tieBreak = Seq("rid"),
        bucketSeconds = 16L)
      .select(col("lid"), col("matched.rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(bucketed == plain)
  }

  test("bucketed merge window partitions by (key, bucket), not key alone") {
    import spark.implicits._
    val left = Seq((1L, 5L)).toDF("k", "lt")
    val plan = AsOf.asOfJoinBucketed(left, quotes.withColumnRenamed("sym", "k"),
        Seq("k"), col("lt"), col("qt"), Seq("px"), bucketSeconds = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range-join shape leaked:\n$plan")
    // the final merge window's exchange keys include the bucket column
    assert("hashpartitioning\\(k#\\d+L?, __bkt".r.findFirstIn(plan).nonEmpty, plan)
  }

  test("native exec: semantics on the quotes fixture match the composed path") {
    import spark.implicits._
    val trades = Seq(
      (1L, 5L), (1L, 10L), (1L, 25L), (1L, 99L), (2L, 15L), (2L, 16L))
      .toDF("sym", "tt")
    val q = quotes.withColumnRenamed("sym", "qsym")
      .withColumn("qid", col("qt")) // unique per key: the tie column
    val got = graft.plans.AsOfJoinNative.asOfJoin(
        trades, q, "sym", "qsym", "tt", "qt", "qid")
      .select(col("sym"), col("tt"), col("qt"), col("px"))
      .as[(Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 5L, None, None),
      (1L, 10L, Some(10L), Some(100.0)),
      (1L, 25L, Some(20L), Some(110.0)),
      (1L, 99L, Some(30L), Some(120.0)),
      (2L, 15L, Some(15L), Some(200.0)),
      (2L, 16L, Some(15L), Some(200.0))))
  }

  test("native exec == composed window on random data with ties and null times") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val left = Seq.tabulate(500)(i =>
      (rnd.nextInt(6).toLong,
        if (i % 19 == 0) None else Some(rnd.nextInt(300).toLong), i.toLong))
      .toDF("k", "lt", "lid").repartition(7) // odd partitioning on purpose
    // duplicate right times per key exercise the tie contract; null times dropped
    val right = Seq.tabulate(120)(i =>
      (rnd.nextInt(6).toLong,
        if (i % 13 == 0) None else Some(rnd.nextInt(60).toLong * 5), i.toLong))
      .toDF("rk", "rt", "rid").repartition(3)
    val composed = AsOf.asOfJoin(left, right.withColumnRenamed("rk", "k"),
        Seq("k"), col("lt"), col("rt"), Seq("rid"), tieBreak = Seq("rid"))
      .select(col("lid"), col("matched.rid"))
      .as[(Long, Option[Long])].collect().toMap
    val native = graft.plans.AsOfJoinNative.asOfJoin(
        left, right, "k", "rk", "lt", "rt", "rid")
      .select(col("lid"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native == composed)
  }

  test("native exec: self-derived sides (DeduplicateRelations) and empty right") {
    import spark.implicits._
    val base = Seq((1L, 10L, 7L), (1L, 20L, 8L), (2L, 5L, 9L))
      .toDF("k", "t", "v")
    // both sides derive from the SAME frame — the analyzer must re-id the
    // right side without breaking the ordinal bindings
    val got = graft.plans.AsOfJoinNative.asOfJoin(
        base, base.select(col("k").as("rk"), col("t").as("rt"), col("v").as("rv")),
        "k", "rk", "t", "rt", "rv")
      .select(col("k"), col("t"), col("rv"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == Set((1L, 10L, Some(7L)), (1L, 20L, Some(8L)), (2L, 5L, Some(9L))))
    val emptyRight = base.where(col("v") < 0)
      .select(col("k").as("rk"), col("t").as("rt"), col("v").as("rv"))
    val outer = graft.plans.AsOfJoinNative.asOfJoin(
        base, emptyRight, "k", "rk", "t", "rt", "rv")
      .select(col("k"), col("rv")).as[(Long, Option[Long])].collect()
    assert(outer.length == 3 && outer.forall(_._2.isEmpty))
  }

  test("native exec survives AQE coalescing: both shuffles stay co-partitioned") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val left = Seq.tabulate(2000)(i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(5000).toLong, i.toLong))
      .toDF("k", "lt", "lid")
    val right = Seq.tabulate(400)(i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(5000).toLong, i.toLong))
      .toDF("rk", "rt", "rid")
    val expected = AsOf.asOfJoin(left, right.withColumnRenamed("rk", "k"),
        Seq("k"), col("lt"), col("rt"), Seq("rid"), tieBreak = Seq("rid"))
      .select(col("lid"), col("matched.rid"))
      .as[(Long, Option[Long])].collect().toMap
    // both extremes: aggressive coalescing (collapse to ~1 partition) and
    // fine-grained (keep many tiny partitions) — zipPartitions requires
    // the runtime to coalesce BOTH sides identically in each regime
    val keys = Seq("spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      for ((advisory, minSize) <- Seq(("64m", "1m"), ("1024", "256"))) {
        spark.conf.set(keys(0), "true")
        spark.conf.set(keys(1), advisory)
        spark.conf.set(keys(2), minSize)
        val got = graft.plans.AsOfJoinNative.asOfJoin(
            left, right, "k", "rk", "lt", "rt", "rid")
          .select(col("lid"), col("rid"))
          .as[(Long, Option[Long])].collect().toMap
        assert(got == expected, s"advisory=$advisory diverged")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("native exec: ordered-primitive key/time matrix × inner/outer") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // base data in longs; each type case casts key/time to the type under
    // test on BOTH sides and must reproduce the long-typed outer result
    val leftL = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(200).toLong, i.toLong))
      .toDF("k", "lt", "lid")
    val rightL = Seq.tabulate(80)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong * 2, i.toLong))
      .toDF("rk", "rt", "rid")
    val expectedOuter = graft.plans.AsOfJoinNative.asOfJoin(
        leftL, rightL, "k", "rk", "lt", "rt", "rid")
      .select(col("lid"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    val expectedInner = expectedOuter.collect { case (l, Some(r)) => l -> r }
    // int keys+times; timestamp times (micros preserve the long order);
    // date times (day granularity) with int keys
    val casts: Seq[(String, String)] = Seq(
      ("int", "int"),
      ("long", "timestamp"),
      ("int", "date"))
    for ((kt, tt) <- casts) {
      def conv(df: org.apache.spark.sql.DataFrame, k: String, t: String) = df
        .withColumn(k, col(k).cast(kt))
        .withColumn(t,
          if (tt == "timestamp") col(t).cast("timestamp")
          else if (tt == "date") date_add(lit("2020-01-01").cast("date"), col(t).cast("int"))
          else col(t).cast(tt))
      val l = conv(leftL, "k", "lt")
      val r = conv(rightL, "rk", "rt")
      val outer = graft.plans.AsOfJoinNative.asOfJoin(
          l, r, "k", "rk", "lt", "rt", "rid")
        .select(col("lid"), col("rid"))
        .as[(Long, Option[Long])].collect().toMap
      assert(outer == expectedOuter, s"outer keyType=$kt timeType=$tt diverged")
      val inner = graft.plans.AsOfJoinNative.asOfJoin(
          l, r, "k", "rk", "lt", "rt", "rid", inner = true)
        .select(col("lid"), col("rid"))
        .as[(Long, Long)].collect().toMap
      assert(inner == expectedInner, s"inner keyType=$kt timeType=$tt diverged")
    }
  }

  test("auto-fallback: string keys route to the composed path == brute-force argmax") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    // string keys are outside the ordered-primitive family: the native
    // API must fall back to the composed merge window instead of
    // throwing, with the same flat output shape
    val left = Seq.tabulate(300)(i =>
      (s"key-${rnd.nextInt(5)}", rnd.nextInt(200).toLong, i.toLong))
      .toDF("k", "lt", "lid")
    val right = Seq.tabulate(80)(i =>
      (s"key-${rnd.nextInt(5)}", rnd.nextInt(100).toLong * 2, i.toLong))
      .toDF("rk", "rt", "rid")
    val got = graft.plans.AsOfJoinNative.asOfJoin(
        left, right, "k", "rk", "lt", "rt", "rid")
      .select(col("lid"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    left.createOrReplaceTempView("fb_l"); right.createOrReplaceTempView("fb_r")
    val want = spark.sql(
      """SELECT lid, (SELECT max_by(rid, struct(rt, rid)) FROM fb_r
        |             WHERE fb_r.rk = fb_l.k AND fb_r.rt <= fb_l.lt)
        |FROM fb_l""".stripMargin)
      .as[(Long, Option[Long])].collect().toMap
    assert(got == want)
    // inner mode through the fallback: the unmatched rows drop
    val inner = graft.plans.AsOfJoinNative.asOfJoin(
        left, right, "k", "rk", "lt", "rt", "rid", inner = true)
      .select(col("lid"), col("rid"))
      .as[(Long, Long)].collect().toMap
    assert(inner == want.collect { case (l, Some(r)) => l -> r })
    // and the fallback plan is the merge window — never a per-key cross
    // product
    val plan = graft.plans.AsOfJoinNative.asOfJoin(
        left, right, "k", "rk", "lt", "rt", "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("auto-fallback: decimal times keep exact decimal ordering") {
    import spark.implicits._
    // decimals can't cast to long without truncation — the fallback's
    // raw-time route must order on the decimal values themselves:
    // rt=1.7 is AFTER lt=1.2, so only rt=0.9 matches
    val left = Seq(("a", "1.2", 1L), ("a", "1.8", 2L)).toDF("k", "lts", "lid")
      .withColumn("lt", col("lts").cast("decimal(10,2)")).drop("lts")
    val right = Seq(("a", "0.9", 10L), ("a", "1.7", 20L)).toDF("rk", "rts", "rid")
      .withColumn("rt", col("rts").cast("decimal(10,2)")).drop("rts")
    val got = graft.plans.AsOfJoinNative.asOfJoin(
        left, right, "k", "rk", "lt", "rt", "rid")
      .select(col("lid"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(10L), 2L -> Some(20L)))
  }

  test("auto-fallback: null keys and null times keep native semantics") {
    import spark.implicits._
    val left = Seq((Some("a"), Some(10L), 1L), (None, Some(10L), 2L),
      (Some("a"), None, 3L)).toDF("k", "lt", "lid")
    val right = Seq((Some("a"), Some(5L), 100L), (None, Some(1L), 999L))
      .toDF("rk", "rt", "rid")
    val got = graft.plans.AsOfJoinNative.asOfJoin(
        left, right, "k", "rk", "lt", "rt", "rid")
      .select(col("lid"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // null left key and null left time never match; null right key (999)
    // is never a match candidate
    assert(got == Map(1L -> Some(100L), 2L -> None, 3L -> None))
  }

  test("native exec: mismatched key types across sides are rejected at the API") {
    import spark.implicits._
    val l = Seq((1L, 2L)).toDF("k", "lt")
    val r = Seq((1, 2L, 3L)).toDF("rk", "rt", "rid") // int key vs long key
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinNative.asOfJoin(l, r, "k", "rk", "lt", "rt", "rid")
    }
    assert(e.getMessage.contains("key types differ"))
  }

  test("native exec plans as AsOfJoinExec with one exchange and sort per side") {
    import spark.implicits._
    val left = Seq((1L, 5L)).toDF("k", "lt")
    val q = quotes.withColumnRenamed("sym", "qsym").withColumn("qid", col("qt"))
    val plan = graft.plans.AsOfJoinNative.asOfJoin(
        left, q, "k", "qsym", "lt", "qt", "qid")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // exec prints minus the Exec suffix
    assert(!plan.contains("NestedLoop") && !plan.contains("SortMergeJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("native exec: left-only filters push below the join; right filters don't") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import graft.plans.AsOfJoinPlan
    val rnd = new scala.util.Random(47)
    val left = Seq.tabulate(200)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "lt", "lid")
    val right = Seq.tabulate(50)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("rk", "rt", "rid")
    val joined = graft.plans.AsOfJoinNative.asOfJoin(
      left, right, "k", "rk", "lt", "rt", "rid")
    // left-only predicate: lands BELOW the custom node (left child)
    val fl = joined.where(col("lid") < 50L)
    val ol = fl.queryExecution.optimizedPlan
    val pushedLeft = ol.collect {
      case j: AsOfJoinPlan if j.left.isInstanceOf[LFilter] => j
    }
    assert(pushedLeft.nonEmpty, ol.toString)
    assert(ol.collect { case f: LFilter if f.child.isInstanceOf[AsOfJoinPlan] => f }
      .isEmpty, ol.toString)
    // and the pushed plan computes the same rows as filtering afterwards
    val expected = joined.collect().filter(_.getLong(2) < 50L)
      .map(r => (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    val got = fl.collect()
      .map(r => (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    assert(got == expected)
    // right-side predicate: must NOT push (it would change which earlier
    // right row is some left row's match) — stays above the join
    val fr = joined.where(col("rid") =!= 3L)
    val or = fr.queryExecution.optimizedPlan
    assert(or.collect {
      case f: LFilter if f.child.isInstanceOf[AsOfJoinPlan] => f
    }.nonEmpty, or.toString)
  }

  test("native exec: a pushed left filter reaches the parquet scan's PushedFilters") {
    val dir = "/root/testdata/sf0.001"
    def ord = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"))
    val right = ord.select(col("o_custkey").as("rk"),
      col("o_orderkey").as("rt"), col("o_orderkey").as("rid"))
    val j = graft.plans.AsOfJoinNative.asOfJoin(
        ord, right, "o_custkey", "rk", "o_orderkey", "rt", "rid")
      .where(col("o_custkey") < 100L)
    val p = j.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the rule moved the predicate below the custom node; the stock
    // rules then carried it into the LEFT side's scan metadata
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey), LessThan(o_custkey,100)]"), p)
  }

  test("native exec: column pruning reaches through the custom node") {
    import spark.implicits._
    val left = Seq((1L, 5L)).toDF("k", "lt")
    val right = Seq((1L, 3L, 9L, "payload", 1.5))
      .toDF("rk", "rt", "rid", "junk", "extra")
      .withColumn("rtie", col("rid"))
    val j = graft.plans.AsOfJoinNative.asOfJoin(
        left, right, "k", "rk", "lt", "rt", "rtie")
      .select("k", "lt", "rid") // junk/extra unused downstream
    val plan = j.queryExecution.executedPlan.toString
    // the unused right payload never enters the exchange
    assert(!plan.contains("junk#") && !plan.contains("extra#"), plan)
    assert(j.as[(Long, Long, Option[Long])].collect().toSeq ==
      Seq((1L, 5L, Some(9L))))
  }

  test("plan has exactly one exchange (the window shuffle), no range join") {
    import spark.implicits._
    val left = Seq((1L, 5L)).toDF("k", "lt")
    val plan = AsOf.asOfJoin(left, quotes.withColumnRenamed("sym", "k"),
      Seq("k"), col("lt"), col("qt"), Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range-join shape leaked:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
