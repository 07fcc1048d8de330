package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 history build: change detection, interval assembly, tie order,
  * coverage invariants, driver-side reference differential. */
class Scd2Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("scd2-spec")
    .getOrCreate()

  private def build(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    RelQueries.scd2History(rows.toDF("u", "t", "i", "y"), "u", "t", "i", "y")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
  }

  test("repeats merge; versions carry half-open validity intervals") {
    // user 1: a@1 a@2 b@3 a@4 — the repeat at t=2 opens no version
    val got = build(Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "a"),
      (1L, 3L, 3L, "b"), (1L, 4L, 4L, "a")))
    assert(got == Set(
      (1L, "a", 1L, Some(3L), false),
      (1L, "b", 3L, Some(4L), false),
      (1L, "a", 4L, None, true)))
  }

  test("equal timestamps order by event id") {
    // both at t=5: id 1 (x) precedes id 2 (y) -> two versions, y current
    val got = build(Seq((1L, 5L, 1L, "x"), (1L, 5L, 2L, "y")))
    assert(got == Set((1L, "x", 5L, Some(5L), false),
      (1L, "y", 5L, None, true)))
  }

  test("random histories: contiguous coverage and one current per key") {
    val rnd = new scala.util.Random(17)
    val rows = for {
      u <- 1L to 25L
      k <- 1 to (1 + rnd.nextInt(15))
    } yield (u, k.toLong * 10, u * 1000 + k, s"s${rnd.nextInt(3)}")
    val got = build(rows)
    val byUser = got.groupBy(_._1)
    for ((u, vs) <- byUser) {
      assert(vs.count(_._5) == 1, s"user $u must have exactly one current")
      val sorted = vs.toSeq.sortBy(_._3)
      assert(sorted.head._3 == rows.filter(_._1 == u).map(_._2).min,
        "history starts at the first event")
      for (Seq(p, n) <- sorted.sliding(2) if sorted.size >= 2)
        assert(p._4.contains(n._3), "valid_to chains to the next valid_from")
      assert(sorted.last._4.isEmpty, "the last version is open")
      for (Seq(p, n) <- sorted.sliding(2) if sorted.size >= 2)
        assert(p._2 != n._2, "consecutive versions differ in state")
    }
    // differential: replay states driver-side
    val expect = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3))
      val changes = ordered.foldLeft(List.empty[(Long, String)]) {
        case (acc, r) =>
          if (acc.headOption.exists(_._2 == r._4)) acc
          else (r._2, r._4) :: acc
      }.reverse
      changes.zipWithIndex.map { case ((t, s), ix) =>
        val to = changes.lift(ix + 1).map(_._1)
        (u, s, t, to, to.isEmpty)
      }
    }.toSet
    assert(got == expect)
  }

  test("join-agg view: delta merge == direct recompute on a fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // contributions via the public operator shape: exact decimal sums
    val orders = Seq((1L, 10L, 10.5), (2L, 10L, 1.25), (10L, 20L, 3.75),
      (20L, 10L, 2.0), (11L, 99L, 7.0)) // 99 has no customer row
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq((10L, 1), (20L, 2)).toDF("c_custkey", "c_nationkey")
    def direct = orders.join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,4)")).cast("double")
          .as("revenue"))
      .as[(Int, Long, Double)].collect().toSet
    // base = keys not divisible by 10, delta = the rest (the q133 split)
    val base = orders.where($"o_orderkey" % 10 =!= 0)
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"))
      .agg(sum(lit(1L)).as("n"),
        sum($"o_totalprice".cast("decimal(18,4)")).as("rev"))
    val delta = orders.where($"o_orderkey" % 10 === 0)
      .join(cust, $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".as("nation"), lit(1L).as("n"),
        $"o_totalprice".cast("decimal(28,4)").as("rev"))
    val merged = base.unionByName(delta)
      .groupBy($"nation")
      .agg(sum($"n").as("n_orders"), sum($"rev").cast("double").as("revenue"))
      .as[(Int, Long, Double)].collect().toSet
    assert(merged == direct)
    assert(direct.exists(_._1 == 2), "delta-only nation must appear")
  }

  test("inter-arrival gaps: hand-computed order statistics, per-user scope") {
    import spark.implicits._
    // user 1 at 0,10,30,100 -> gaps 10,20,70; user 2 at 5,6 -> gap 1;
    // gaps never cross users (no 5-100 artifact)
    val rows = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 30L, 3L),
      (1L, 100L, 4L), (2L, 5L, 5L), (2L, 6L, 6L))
      .map { case (u, tsu, i) => (u, tsu * 1000, i) } // ts nanos
      .toDF("user_id", "ts", "event_id")
    val got = RelQueries.interArrivalFromEvents(rows)
      .as[(String, Long, Long, Long, Long)].collect()
    // sorted gaps: 1, 10, 20, 70 -> p50 = 2nd = 10, p90 = p99 = 4th = 70
    assert(got.toSeq == Seq(("all", 4L, 10L, 70L, 70L)))
  }

  test("derived sessions: p99-gap timeout splits exactly the outlier gaps") {
    import spark.implicits._
    // user 1 at 0,10,30,100; user 2 at 5,6 -> gaps 10,20,70,1; p99 = 70,
    // so ONLY gaps > 70 split. No gap exceeds it -> each user one session.
    val rows = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 30L, 3L),
      (1L, 100L, 4L), (2L, 5L, 5L), (2L, 6L, 6L))
      .map { case (u, tsu, i) => (u, tsu * 1000, i) } // ts nanos
      .toDF("user_id", "ts", "event_id")
    val got = RelQueries.derivedSessionsFromEvents(rows)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 4L, 4L, 70L), (2L, 1L, 2L, 2L, 70L)))
    // shrink the largest gap's rank: drop user 2 so gaps are 10,20,70
    // -> p99 still 70; now plant a 200 gap -> p99=200? instead lower the
    // timeout by adding many small gaps so 70 becomes the >p99 outlier
    val many = (0 until 120).map(k => (3L, (1000L + k) * 1000, 100L + k))
    val rows2 = (Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 30L, 3L),
      (1L, 100L, 4L)).map { case (u, t, i) => (u, t * 1000, i) } ++ many)
      .toDF("user_id", "ts", "event_id")
    // gaps: 119 x 1 (user 3) + 10, 20, 70 (user 1); n=122, p99 rank 121
    // -> sorted 120th/121st/122nd are 10/20/70 -> p99 = 20; 70 splits
    val got2 = RelQueries.derivedSessionsFromEvents(rows2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got2 == Set((1L, 2L, 4L, 3L, 20L), (3L, 1L, 120L, 120L, 20L)))
  }

  test("decayed popularity: exact half-life weights, anchor at max time") {
    import spark.implicits._
    val D = 86400000000L // one day in micros
    // item 1: one event today + one a day ago + one 2 days ago
    // item 2: two events 3 days ago; item 3: one 70-days-old (weight 0
    // under the 63-shift clamp)
    val rows = Seq(
      (3L * D, 1L), (2L * D, 1L), (1L * D, 1L),
      (0L * D, 2L), (0L * D, 2L),
      (-67L * D, 3L)) // ages relative to max tsu = 3 days
      .map { case (tsu, it) => (tsu, it) }
    val got = RelQueries.decayedPopularityFromEvents(rows.toDF("tsu", "item"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) == ((3L, 1.0 + 0.5 + 0.25)))
    assert(got(2L) == ((2L, 2 * 0.125)))
    assert(got(3L) == ((1L, 0.0)), "ancient events clamp to zero weight")
  }

  test("volume trend: exact OLS on a perfect line and a planted ramp") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // counts forming the exact line c = 2h + 3 at hours 0..4 for type
    // "up"; constant 5 for type "flat". ts nanos = h * 3600e9.
    val rows = (for {
      h <- 0L to 4L
      i <- 1L to (2 * h + 3)
    } yield ("up", h * 3600000000000L, i)) ++
      (for { h <- 0L to 4L; i <- 1L to 5L }
        yield ("flat", h * 3600000000000L, i))
    val df = rows.toDF("event_type", "ts", "i")
    val res = RelQueries.volumeTrendFromEvents(df)
      .select($"event_type", $"slope", $"intercept")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(res("up") == ((2.0, 3.0)), "a perfect line fits exactly")
    assert(res("flat") == ((0.0, 5.0)))
  }

  test("winsorization clips into the per-source band and keeps every row") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = graft.PipelineQueries.lengthWinsorize(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where($"text".isNotNull).count()
    assert(got.length.toLong == docs, "clipping drops no rows")
    assert(got.forall(r => r._6 >= r._4 && r._6 <= r._5),
      "every clipped value sits inside [p05, p95]")
    assert(got.exists(r => r._6 != r._3),
      "the tails actually clip on this distribution")
    assert(got.filter(r => r._3 >= r._4 && r._3 <= r._5)
      .forall(r => r._6 == r._3), "in-band values pass through unchanged")
  }

  test("quality suite: planted violations count per check class") {
    import spark.implicits._
    val orders = Seq(
      (1L, Some(10L), "O", 5.0),     // clean
      (2L, None, "F", 1.0),          // null custkey
      (3L, Some(99L), "X", -2.0),    // orphan + bad status + bad price
      (4L, Some(10L), "P", 3.5))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq((1L, 10.0), (1L, 0.5), (77L, 51.0))
      .toDF("l_orderkey", "l_quantity") // orphan 77, two range violations
    val customer = Seq(10L).toDF("c_custkey")
    val got = RelQueries.qualityChecks(orders, lineitem, customer)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("orders.custkey_not_null") == ((4L, 1L, false)))
    assert(got("orders.totalprice_positive") == ((4L, 1L, false)))
    assert(got("orders.status_in_set") == ((4L, 1L, false)))
    assert(got("lineitem.quantity_in_range") == ((3L, 2L, false)))
    // null-custkey rows are orphans too (no customer matches null)
    assert(got("orders.fk_customer") == ((4L, 2L, false)))
    assert(got("lineitem.fk_orders") == ((3L, 1L, false)))
  }

  test("column profiler: nulls, exact distincts, canonical bounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(7L), "A"), (Some(100L), "B"), (None, "A"), (Some(7L), null))
      .toDF("k", "s")
    val got = RelQueries.profileColumns(df, Seq(
        "k" -> lpad($"k".cast("string"), 4, "0"), "s" -> $"s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    // zero-padding makes the numeric order the lexicographic one
    assert(got("k") == (("k", 4L, 1L, 2L, Some("0007"), Some("0100"))))
    assert(got("s") == (("s", 4L, 1L, 2L, Some("A"), Some("B"))))
  }
}
