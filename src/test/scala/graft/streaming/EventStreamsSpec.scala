package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming paths must reproduce their oracle-checked batch twins. */
class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("streams-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("windowed streaming aggregation == batch hourly aggregate") {
    import spark.implicits._
    // complete mode: in append, windows not yet past the watermark (the
    // stream's final hours) would still be buffered in state at EOF.
    runToMemory(EventStreams.hourlyStream(spark, sf), "hourly", "complete")
    val streamed = spark.table("hourly")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = EventStreams.hourlyBatch(spark, sf)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("windowed quantile-sketch stream == batch cells per hour window") {
    import spark.implicits._
    // complete mode (the hourly-test convention) so EOF-open windows
    // surface too; the q159 declared row instead pins append-mode
    // eviction against the watermark-restricted oracle.
    runToMemory(EventStreams.hourlyQsketchStream(spark, sf), "hqsk", "complete")
    val streamed = spark.table("hqsk")
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.pipeline.Sketches.qsketchBuckets(
        graft.Tables.load(spark, sf, "events")
          .select(org.apache.spark.sql.functions.expr(
            s"ts div ${3600L * 1000 * 1000 * 1000}L").as("hour_bucket"),
            org.apache.spark.sql.functions.expr(
              "cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
          .where($"cents" >= 0),
        Seq("hour_bucket"), "cents")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      "per-window sketch cells must equal the batch construction")
    assert(batch.nonEmpty)
  }

  test("hopping-window streaming aggregation == batch hopping counts (q60)") {
    import spark.implicits._
    runToMemory(EventStreams.hoppingStream(spark, sf), "hopping", "complete")
    val streamed = spark.table("hopping")
      .as[(Long, String, Long)].collect().toSet
    val batch = graft.RelQueries.eventHopping(spark, sf)
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream interval join == batch interval-join pairs (q45 pre-agg)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    runToMemory(EventStreams.followupsStream(spark, sf), "followups")
    val streamed = spark.table("followups")
      .as[(Long, Long)].collect().toSet
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"user_id", $"event_id".as("follow_id"), expr("ts div 1000L").as("tsu"))
    val batch = graft.Tables.load(spark, sf, "events")
      .where($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), expr("ts div 1000L").as("st"))
      .join(ev, Seq("user_id"))
      .where($"tsu" > $"st" && $"tsu" <= $"st" + 3600000000L)
      .select($"signup_id", $"follow_id")
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("native session_window == gap-split batch sessions (strict > boundary)") {
    import spark.implicits._
    runToMemory(EventStreams.sessionWindowStream(spark, sf), "swin", "complete")
    val streamed = spark.table("swin")
      .as[(Long, Long, Long, Long)].collect().toSet
    // batch replay of the BUILT-IN's semantics: gap-equal events MERGE
    // (UpdatingSessionsIterator splits only when start > current end)
    val e = graft.Tables.load(spark, sf, "events")
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.expr("ts div 1000L").as("tus"))
      .as[(Long, Long, Long)].collect()
    val expected = e.groupBy(_._1).flatMap { case (u, rows) =>
      val ts = rows.map(r => (r._3, r._2)).sortBy(identity).map(_._1)
      val sessions = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
      var cur = scala.collection.mutable.ArrayBuffer[Long]()
      for (t <- ts) {
        if (cur.nonEmpty && t - cur.last > 1800000000L) {
          sessions += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer[Long]()
        }
        cur += t
      }
      if (cur.nonEmpty) sessions += cur.toSeq
      sessions.map(s =>
        (u, s.head, s.last + 1800000000L, s.size.toLong))
    }.toSet
    assert(streamed == expected,
      "built-in session windows must equal the strict->-split gap replay")
    assert(expected.nonEmpty)
  }

  test("session_window gap-EQUAL boundary: merges, never splits (pinned fixture)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(Long, Long)] // (user_id, epoch_us)
    val t0 = 1700000000000000L
    val gap = 1800000000L // 30 min in µs
    // user 1: exactly gap apart — must MERGE into one session
    // user 2: gap - 1µs — strictly inside, merges
    // user 3: gap + 1µs — strictly outside, splits
    src.addData((1L, t0), (1L, t0 + gap),
                (2L, t0), (2L, t0 + gap - 1),
                (3L, t0), (3L, t0 + gap + 1))
    val df = src.toDS().toDF("user_id", "tus")
      .withColumn("event_time", timestamp_micros($"tus"))
      .withWatermark("event_time", "0 seconds")
      .groupBy($"user_id", session_window($"event_time", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"session_window.start").as("s"),
        unix_micros($"session_window.end").as("e"), $"n")
    val q = df.writeStream.format("memory").queryName("swin_boundary")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("swin_boundary")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, t0, t0 + 2 * gap, 2L),           // gap-equal pair: ONE session
      (2L, t0, t0 + 2 * gap - 1, 2L),       // inside: one session
      (3L, t0, t0 + gap, 1L),               // outside: two sessions
      (3L, t0 + gap + 1, t0 + 2 * gap + 1, 1L)),
      s"session_window boundary semantics moved: $got")
  }

  test("flatMapGroupsWithState sessionization == batch window sessionization") {
    import spark.implicits._
    runToMemory(EventStreams.sessionsStream(spark, sf), "sessions")
    val streamed = spark.table("sessions")
      .select("user_id", "session_no", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = EventStreams.sessionsBatch(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("event-time-timeout sessionization == batch twin across multiple batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStreams.SessionEvent

    // Time-ordered thirds of the sf0.001 events (micros), split strictly
    // between distinct timestamps so no batch carries events at or below
    // the previous batch's watermark.
    val evs = graft.Tables.load(spark, sf, "events")
      .select($"user_id", $"event_id", org.apache.spark.sql.functions.expr("ts div 1000L").as("ts"))
      .as[SessionEvent].collect().sortBy(e => (e.ts, e.event_id))
    val cut1 = evs(evs.length / 3).ts
    val cut2 = evs(2 * evs.length / 3).ts
    val chunks = Seq(
      evs.filter(_.ts <= cut1),
      evs.filter(e => e.ts > cut1 && e.ts <= cut2),
      evs.filter(_.ts > cut2))
    assert(chunks.forall(_.nonEmpty))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val q = EventStreams.sessionsClosedFromEvents(source.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("closed_sessions").start()
    try {
      chunks.foreach { c => source.addData(c.toSeq); q.processAllAvailable() }
      // Two far-future probes: the first advances the watermark past every
      // open session's gap; the second runs a batch in which those
      // timeouts fire (watermark is computed from the PREVIOUS batch).
      val far = evs.last.ts + EventStreams.SessionGapUs * 1000
      source.addData(Seq(SessionEvent(-1L, -1L, far)))
      q.processAllAvailable()
      source.addData(Seq(SessionEvent(-1L, -2L, far + EventStreams.SessionGapUs * 2)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("closed_sessions")
      .where($"user_id" >= 0) // drop the probe user's own sessions
      .select("user_id", "session_no", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = EventStreams.sessionsBatch(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"closed-session stream diverged: ${streamed.size} vs ${batch.size} sessions")
    assert(batch.nonEmpty)
  }

  test("streaming as-of enrichment == batch attribution (q44), file source") {
    import spark.implicits._
    runToMemory(EventStreams.attributionStream(spark, sf), "attr")
    val streamed = spark.table("attr")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val batch = graft.RelQueries.eventAttribution(spark, sf)
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.exists(_._4 >= 0)) // real matches present, not all -1
  }

  test("streaming as-of enrichment == batch across multiple ordered batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStreams.AttrEvent
    // thirds split between distinct timestamps: cross-batch matches must
    // come from the O(1) per-user LastPurchase state, not batch locality
    val evs = graft.Tables.load(spark, sf, "events")
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.expr("ts div 1000L").as("ts"), $"event_type")
      .as[AttrEvent].collect().sortBy(e => (e.ts, e.event_id))
    val cut1 = evs(evs.length / 3).ts
    val cut2 = evs(2 * evs.length / 3).ts
    val chunks = Seq(
      evs.filter(_.ts <= cut1),
      evs.filter(e => e.ts > cut1 && e.ts <= cut2),
      evs.filter(_.ts > cut2))
    assert(chunks.forall(_.nonEmpty))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[AttrEvent]
    val q = EventStreams.attributionFromEvents(source.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_batches").start()
    try chunks.foreach { c => source.addData(c.toSeq); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("attr_batches")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val batch = graft.RelQueries.eventAttribution(spark, sf)
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    // matches that REQUIRE carried state: an event in a later chunk whose
    // attributed purchase happened in an earlier chunk
    val purchaseTs = evs.filter(_.event_type == "purchase")
      .map(e => e.event_id -> e.ts).toMap
    val crossBatch = spark.table("attr_batches")
      .as[(Long, Long, String, Long, Long)].collect()
      .filter(r => r._4 >= 0 && purchaseTs.get(r._4).exists(_ <= cut1))
      .filter { r => val e = evs.find(_.event_id == r._1).get; e.ts > cut1 }
    assert(crossBatch.nonEmpty, "no cross-batch attributions exercised")
  }

  test("evicting as-of: state dropped past the horizon, kept within it") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStreams.AttrEvent
    val s = 1000000L // 1 second in the micros domain
    // user 1 purchases at 1s; far-future traffic from user 2 advances the
    // watermark past the 10s horizon; a LATER batch with no user-1 data
    // lets the timeout fire (a batch carrying user-1 data would take the
    // data path); then user 1 returns at 102s
    val batches = Seq(
      Seq(AttrEvent(1L, 10L, 1 * s, "purchase"), AttrEvent(1L, 11L, 1 * s + 1000, "view")),
      Seq(AttrEvent(2L, 20L, 100 * s, "view")),
      Seq(AttrEvent(2L, 21L, 101 * s, "view")),
      Seq(AttrEvent(1L, 12L, 102 * s, "view"), AttrEvent(2L, 22L, 102 * s, "view")))
    def run(evict: Boolean, name: String): Map[Long, Long] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[AttrEvent]
      val ds =
        if (evict) EventStreams.attributionFromEventsEvicting(source.toDS(), 10 * s)
        else EventStreams.attributionFromEvents(source.toDS())
      val q = ds.writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try batches.foreach { b => source.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[(Long, Long, String, Long, Long)]
        .collect().map(r => r._1 -> r._4).toMap
    }
    val kept = run(evict = false, "attr_keep")
    val evicted = run(evict = true, "attr_evict")
    // within the horizon both attribute identically
    assert(kept(11L) == 10L && evicted(11L) == 10L)
    // past the horizon: NoTimeout still attributes the 101s-old purchase,
    // the evicting variant has dropped it — the user re-entered as fresh
    assert(kept(12L) == 10L)
    assert(evicted(12L) == -1L)
    // the other user's rows are unaffected by the eviction machinery
    assert(Seq(20L, 21L, 22L).forall(id => kept(id) == evicted(id)))
  }

  test("evicting as-of: data racing the timeout still evicts (no crash, no stale match)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStreams.AttrEvent
    val s = 1000000L
    // user 1's return event arrives in the SAME batch that would have
    // fired their timeout: Spark delivers data before expired timeouts,
    // so the function sees stale state on the data path — it must treat
    // it as evicted (manual expiry) and must not crash re-arming a
    // timeout at or before the advanced watermark
    val batches = Seq(
      Seq(AttrEvent(1L, 10L, 1 * s, "purchase")),
      Seq(AttrEvent(2L, 20L, 100 * s, "view")), // watermark -> 100s >> 11s horizon
      Seq(AttrEvent(1L, 12L, 101 * s, "view"))) // u1 data races the timeout
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[AttrEvent]
    val q = EventStreams.attributionFromEventsEvicting(source.toDS(), 10 * s)
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_race").start()
    try batches.foreach { b => source.addData(b); q.processAllAvailable() }
    finally q.stop()
    val rows = spark.table("attr_race").as[(Long, Long, String, Long, Long)]
      .collect().map(r => r._1 -> r._4).toMap
    assert(rows(10L) == 10L)  // the purchase attributes to itself
    assert(rows(12L) == -1L)  // past the horizon: stale state NOT used
  }

  test("streaming SCD2 == batch closed versions, incl. cross-batch closes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStreams.AttrEvent
    val rnd = new scala.util.Random(29)
    val types = Seq("a", "b", "c")
    val evs = (for {
      u <- 1L to 12L
      k <- 1 to (2 + rnd.nextInt(10))
    } yield AttrEvent(u, u * 100 + k, k.toLong * 1000,
      types(rnd.nextInt(types.size)))).toIndexedSeq
    // cut between distinct timestamps so no tie group straddles batches
    val cut = 5000L
    val chunks = Seq(evs.filter(_.ts <= cut), evs.filter(_.ts > cut))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[AttrEvent]
    val q = EventStreams.scd2FromEvents(source.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("scd2_batches").start()
    try chunks.foreach { c => source.addData(c); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("scd2_batches")
      .as[(Long, String, Long, Long)].collect().toSet
    val batch = graft.RelQueries.scd2History(
        evs.toDF("user_id", "event_id", "ts", "event_type")
          .select($"user_id", $"ts", $"event_id", $"event_type"),
        "user_id", "ts", "event_id", "event_type")
      .where($"valid_to".isNotNull)
      .select($"user_id", $"state", $"valid_from", $"valid_to")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    // at least one version must OPEN before the cut and CLOSE after it —
    // the carried-state case the single-batch declared row can't exercise
    assert(streamed.exists(v => v._3 <= cut && v._4 > cut),
      "no cross-batch version close exercised")
  }

  test("streaming funnel == batch completed conversions across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStreams.AttrEvent
    val rnd = new scala.util.Random(41)
    val types = Seq("view", "click", "purchase", "error")
    val evs = (for {
      u <- 1L to 30L
      k <- 1 to (2 + rnd.nextInt(8))
    } yield AttrEvent(u, u * 100 + k, k.toLong * 1000,
      types(rnd.nextInt(types.size)))).toIndexedSeq
    val cut = 4000L
    val chunks = Seq(evs.filter(_.ts <= cut), evs.filter(_.ts > cut))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[AttrEvent]
    val q = EventStreams.funnelFromEvents(source.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_batches").start()
    try chunks.foreach { c => source.addData(c); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("funnel_batches")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = graft.RelQueries.funnelStages(
        evs.toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .where($"stage" === 3L)
      .select($"user_id", $"step0_ts", $"step1_ts", $"step2_ts")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture produced no completed funnels")
    // a conversion must straddle the cut (view before, purchase after)
    assert(streamed.exists(v => v._2 <= cut && v._4 > cut),
      "no cross-batch conversion exercised")
  }
}
