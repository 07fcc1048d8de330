package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming over the events table. The reference declares a
 * spark-streaming dependency but never uses it (SURVEY.md §2.9); this
 * module supplies the streaming surface a production pipeline needs:
 * watermarked windowed aggregation and custom stateful sessionization via
 * `flatMapGroupsWithState` — with batch twins whose results the streaming
 * paths must reproduce (spec-enforced, and the batch twins are
 * DuckDB-oracle-checked as q26/q27).
 *
 * `ts` arrives as Long nanoseconds (normalized at load — `Tables.normalizeEventTs`).
 */
object EventStreams {

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000 // 30 min (microseconds)
  val HourNs: Long = 3600L * 1000 * 1000 * 1000

  private def eventCols(df: DataFrame): DataFrame =
    df.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"),
      // `div`, not `/`: Divide casts the ~1.7e18 Long to double (> 2^53)
      // and can shift event_time by up to 1 us across a window boundary
      timestamp_micros(expr("ts div 1000L")).as("event_time"))

  /** Batch twin: per-hour per-type counts + exact value sums. */
  def hourlyBatch(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "events")
      .groupBy(
        // `div`: integer division — ts is ~1.7e18, past double precision
        expr(s"ts div ${HourNs}L").as("hour_bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** Shared file-source recipe: schema from the batch table, directory
    * source narrowed to events.parquet. */
  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    // Schema must match the FILE (ts may be TIMESTAMP(MICROS) on disk);
    // normalize to canonical Long-ns AFTER the source, like the batch load.
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  /** Streaming version: file source + watermark + 1h tumbling window. */
  def hourlyStream(spark: SparkSession, dir: String): DataFrame = {
    eventCols(eventStream(spark, dir))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        expr(s"(unix_micros(window.start) * 1000L) div ${HourNs}L").as("hour_bucket"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /**
   * NATIVE session-window aggregation — Spark's built-in
   * `session_window` operator, the declarative complement of
   * [[sessionsClosedStream]]'s flatMapGroupsWithState machinery (q91):
   * the engine surfaces BOTH ways to sessionize a stream, custom state
   * for bespoke lifecycle logic and the built-in for the common case.
   * Boundary semantics pinned empirically (gap-equal fixture in
   * EventStreamsSpec): `session_window` MERGES a gap-equal event into
   * the running session — UpdatingSessionsIterator starts a new session
   * only when the incoming window's start is strictly past the current
   * session's end, i.e. a strict `> gap` split, the SAME boundary as
   * the q27/q91 gap-split. The q160 oracle replays that `>`-split.
   * Append mode emits a session once the watermark passes its end
   * (last event + gap); state is the open-session set, gap-bounded.
   */
  def sessionWindowStream(spark: SparkSession, dir: String): DataFrame = {
    eventCols(eventStream(spark, dir))
      .withWatermark("event_time", "0 seconds")
      .groupBy(col("user_id"),
        session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
  }

  /**
   * WATERMARKED WINDOWED quantile-SKETCH aggregation — the q92 shape
   * with the sketch CELL in the grouping key: each event folds into its
   * hour window's `(qbucket, cnt)` cell via the log-bucket index of its
   * value cents ([[graft.pipeline.Sketches.qsketchIndexExpr]]), and
   * append mode emits a window's finished cell table once the
   * watermark passes its end. This is a NATIVE streaming sketch (state
   * machinery, not a foreachBatch artifact fold): per-hour latency/size
   * quantiles over an unbounded stream with state bounded by
   * live windows × occupied cells (≤ ~1.9k per window, the sketch's
   * domain bound) — the shape an SLO monitor runs forever. Quantile
   * extraction stays a batch read over the emitted cells
   * ([[graft.pipeline.Sketches.qsketchQuantiles]]).
   *
   * Cents via decimal, never double×100 (a double product truncates
   * where DECIMAL rounds — the q92 value discipline).
   */
  def hourlyQsketchStream(spark: SparkSession, dir: String): DataFrame = {
    eventCols(eventStream(spark, dir))
      // watermark BEFORE the value filter: every event must advance the
      // watermark even when its value is dropped below, else a stream
      // whose latest events carry null/negative values would close
      // fewer windows than the oracle's max(ts)-over-ALL-events wm
      .withWatermark("event_time", "1 hour")
      .withColumn("__qv",
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
      // nulls and negatives excluded here: the batch constructor
      // raises on negatives, but a raise inside a streaming query kills
      // the stream — a monitor drops them at the gate instead
      .where(col("__qv") >= 0L)
      .groupBy(window(col("event_time"), "1 hour"),
        graft.pipeline.Sketches.qsketchIndexExpr("__qv").as("qbucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        expr(s"(unix_micros(window.start) * 1000L) div ${HourNs}L").as("hour_bucket"),
        col("qbucket"), col("cnt"))
  }

  /**
   * Streaming twin of the hopping-window counts (q60): 30-minute windows
   * sliding every 10, watermarked — each window closes and emits once the
   * watermark passes its end, so state is bounded by window/slide x the
   * active key set, not the stream's lifetime.
   */
  def hoppingStream(spark: SparkSession, dir: String): DataFrame = {
    eventCols(eventStream(spark, dir))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "30 minutes", "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n"))
  }

  /**
   * Stream-stream INNER join — the Structured Streaming join surface the
   * module was missing: signup events joined with the same user's
   * follow-up events in the following hour, the streaming twin of q45's
   * interval-join pair generation (spec-enforced set equality with the
   * batch pairs). Both sides are watermarked and the join condition
   * time-bounds `f_time` to `(s_time, s_time + 1h]`, so each side's
   * buffered rows are evicted once the OTHER side's watermark clears the
   * bound — state stays proportional to one join-window of traffic, not
   * the stream's lifetime (the stream-stream join contract). Inner join
   * emits pairs as they match (append mode, no watermark wait).
   */
  def followupsStream(spark: SparkSession, dir: String): DataFrame = {
    val signups = eventCols(eventStream(spark, dir))
      .where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"),
        col("event_time").as("s_time"))
      .withWatermark("s_time", "1 hour")
    val follows = eventCols(eventStream(spark, dir))
      .select(col("user_id").as("f_user"), col("event_id").as("follow_id"),
        col("event_time").as("f_time"))
      .withWatermark("f_time", "2 hours")
    signups.join(follows,
      col("s_user") === col("f_user") &&
        col("f_time") > col("s_time") &&
        col("f_time") <= col("s_time") + expr("INTERVAL 1 HOUR"))
      .select(col("signup_id"), col("follow_id"))
  }

  /** Batch twin of sessionization: 30-min-gap sessions via window funcs. */
  def sessionsBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    graft.Tables.load(spark, dir, "events")
      // micros, not nanos: DuckDB (the oracle) truncates TIMESTAMP_NS to
      // microsecond precision on read, so the comparable unit is us.
      .select(col("user_id"), col("event_id"), expr("ts div 1000L").as("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("is_start")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("start_us"),
        max(col("ts")).as("end_us"))
  }

  case class SessionEvent(user_id: Long, event_id: Long, ts: Long)
  case class SessionState(events: List[(Long, Long)]) // (event_id, ts)
  case class Session(user_id: Long, session_no: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /**
   * Streaming sessionization: custom state per user via
   * `flatMapGroupsWithState`. For the bounded test corpus the state holds
   * the user's events and emits all closed sessions at the final batch; a
   * production variant would emit on event-time timeout with the same
   * session math.
   */
  def sessionsStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stream = eventStream(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000L").as("ts")).as[SessionEvent]

    def flush(userId: Long, evs: List[(Long, Long)]): Iterator[Session] = {
      val sorted = evs.sortBy { case (id, ts) => (ts, id) }
      if (sorted.isEmpty) Iterator.empty
      else {
        var sessionNo = 0L
        var prevTs = Long.MinValue
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        sorted.foreach { case (_, ts) =>
          if (prevTs == Long.MinValue || ts - prevTs > SessionGapUs) sessionNo += 1
          out += ((sessionNo, ts, ts))
          prevTs = ts
        }
        out.groupBy(_._1).toSeq.sortBy(_._1).iterator.map { case (no, rows) =>
          Session(userId, no, rows.size.toLong, rows.map(_._2).min, rows.map(_._3).max)
        }
      }
    }

    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          val prior = state.getOption.map(_.events).getOrElse(Nil)
          val all = prior ++ events.map(e => (e.event_id, e.ts))
          state.update(SessionState(all))
          // Bounded-source test mode: emit the full session set each batch;
          // the memory-sink spec reads only the final complete emission.
          flush(userId, all)
        })
    sessions.toDF()
  }

  /** Watermark-tracking state for [[sessionsClosedStream]]: only the OPEN
    * session's events (bounded by the session itself, not the stream's
    * lifetime) plus the count of sessions already closed for numbering. */
  case class OpenSession(events: List[(Long, Long)], closedSoFar: Long)

  /** [[SessionEvent]] plus the watermarked timestamp column — the
    * event-time-timeout checker requires the watermark column to reach the
    * stateful operator itself. */
  case class WmEvent(
      user_id: Long, event_id: Long, ts: Long, event_time: java.sql.Timestamp)

  /**
   * Production sessionization: closed sessions emit on EVENT-TIME TIMEOUT
   * and per-user state holds only the open session.
   *
   * Mechanics: events within `SessionGapUs` extend the open session; a
   * batch's events that jump the gap close the prior session immediately
   * (emitted that batch); otherwise the state times out once the watermark
   * passes `last_event + gap` and the session closes then. State size is
   * one open session per ACTIVE user — unlike [[sessionsStream]]'s
   * keep-everything test mode, an idle user's state is freed at timeout,
   * so a year-long stream holds state proportional to concurrent activity,
   * not history. Late events beyond the watermark delay are dropped by the
   * watermark (the standard streaming-correctness trade).
   *
   * Equality with [[sessionsBatch]] on a bounded replayed source is
   * spec-enforced (StreamingSpec).
   */
  def sessionsClosedStream(
      spark: SparkSession, dir: String, watermarkDelay: String = "0 seconds")
      : DataFrame = {
    import spark.implicits._
    val stream = eventStream(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000L").as("ts"))
      .as[SessionEvent]
    sessionsClosedFromEvents(stream, watermarkDelay)
  }

  /** [[sessionsClosedStream]]'s core over any streaming `ts`-in-micros
    * event source (the spec drives it with a MemoryStream, batch by
    * batch, to prove timeout emission against the batch twin). */
  def sessionsClosedFromEvents(
      events: Dataset[SessionEvent], watermarkDelay: String = "0 seconds")
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val stream = events
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .as[WmEvent]

    def close(userId: Long, no: Long, evs: List[(Long, Long)]): Session = {
      val ts = evs.map(_._2)
      Session(userId, no, evs.size.toLong, ts.min, ts.max)
    }

    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, events: Iterator[WmEvent], state: GroupState[OpenSession]) => {
          val prior = state.getOption.getOrElse(OpenSession(Nil, 0L))
          if (!events.hasNext && state.hasTimedOut) {
            // Watermark passed the open session's gap: close it and free
            // the event list. The ordinal counter must survive (the output
            // contract numbers a user's sessions across their lifetime), so
            // state shrinks to a 8-byte counter rather than removing — a
            // variant keyed by session start_us instead of ordinals could
            // remove() outright. No new timeout: counter-only state is
            // never woken again until the user's next event.
            val out = close(userId, prior.closedSoFar + 1, prior.events)
            state.update(OpenSession(Nil, prior.closedSoFar + 1))
            Iterator.single(out)
          } else {
            // Sort THIS BATCH's events (cross-batch order is guaranteed by
            // the watermark: a batch only arrives after earlier sessions'
            // horizon), then fold: gap jumps close sessions inline.
            val batch = events.map(e => (e.event_id, e.ts)).toList
              .sortBy { case (id, ts) => (ts, id) }
            var open = prior.events
            var closedSoFar = prior.closedSoFar
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            batch.foreach { case (id, ts) =>
              if (open.nonEmpty && ts - open.head._2 > SessionGapUs) {
                closedSoFar += 1
                out += close(userId, closedSoFar, open.reverse)
                open = Nil
              }
              open = (id, ts) :: open // head = latest event
            }
            if (open.nonEmpty) {
              state.update(OpenSession(open, closedSoFar))
              // Timeout once the watermark passes last-event + gap. Round
              // the micros->millis conversion UP: truncating could fire the
              // timeout ~1ms before last+gap, closing a session that a
              // boundary event at exactly ts = last+gap (which the batch
              // fold EXTENDS — its close test is strict >) should extend.
              state.setTimeoutTimestamp((open.head._2 + SessionGapUs + 999L) / 1000L)
            } else {
              state.remove()
            }
            out.iterator
          }
        })
    sessions.toDF()
  }

  case class AttrEvent(user_id: Long, event_id: Long, ts: Long, event_type: String)
  case class LastPurchase(pts: Long, purchase_id: Long)
  case class AttributedEvent(
      event_id: Long, user_id: Long, event_type: String,
      purchase_id: Long, us_since_purchase: Long)

  /**
   * Streaming as-of enrichment — the streaming twin of q44/q75: every
   * event carries its user's most recent purchase at-or-before it (a
   * purchase attributes to itself). Per-user state is ONE row — the
   * latest purchase seen — so a year-long stream holds O(active users)
   * fixed-width state, the bounded-state property that makes streaming
   * feature enrichment viable where a stream-stream join would buffer a
   * full join window of traffic per side.
   *
   * Ordering contract: events are processed in event-time order WITHIN a
   * batch (sorted here; purchases at a timestamp apply before any event
   * at that timestamp emits, ties among simultaneous purchases resolve
   * to the greatest event id — q75's tie rule), and batches must arrive
   * in event-time order for cross-batch matches. One sharper edge of
   * that contract: a (user, timestamp) TIE GROUP must not straddle a
   * batch boundary — an event emitted in batch N cannot see a
   * same-timestamp purchase arriving in batch N+1, where the batch twin
   * (`tsu >= ptsu`) would attribute it. Cut batches between distinct
   * timestamps (the specs do) or accept boundary-tie divergence; a
   * production deployment with late data would pair this with a
   * watermark-delayed replay, the same trade [[sessionsClosedStream]]
   * documents for its late events.
   */
  /** The shared per-group pass: purchases at a timestamp apply before any
    * event at that timestamp emits; returns the emitted rows and the new
    * latest-purchase state (null if none seen yet). */
  private def attributeGroup(
      uid: Long, evs: Iterator[AttrEvent], prior: LastPurchase)
      : (scala.collection.mutable.ArrayBuffer[AttributedEvent], LastPurchase) = {
    var last = prior
    val sorted = evs.toArray.sortBy(e => (e.ts, e.event_id))
    val out = new scala.collection.mutable.ArrayBuffer[AttributedEvent](sorted.length)
    var i = 0
    while (i < sorted.length) {
      val t = sorted(i).ts
      var j = i
      while (j < sorted.length && sorted(j).ts == t) {
        val e = sorted(j)
        if (e.event_type == "purchase" &&
            (last == null || t > last.pts ||
              (t == last.pts && e.event_id > last.purchase_id))) {
          last = LastPurchase(t, e.event_id)
        }
        j += 1
      }
      while (i < j) {
        val e = sorted(i)
        if (last == null) out += AttributedEvent(e.event_id, uid, e.event_type, -1L, -1L)
        else out += AttributedEvent(e.event_id, uid, e.event_type,
          last.purchase_id, e.ts - last.pts)
        i += 1
      }
    }
    (out, last)
  }

  def attributionFromEvents(events: Dataset[AttrEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[AttrEvent], state: GroupState[LastPurchase]) => {
          val (out, last) = attributeGroup(uid, evs, state.getOption.orNull)
          if (last != null) state.update(last)
          out.iterator
        })
      .toDF()
  }

  /**
   * [[attributionFromEvents]] with state EVICTION — the variant for
   * unbounded key churn (anonymous sessions, device ids), where
   * never-expiring per-key state would grow with every key ever seen.
   * A user's state times out once the event-time watermark passes
   * `horizonUs` past their latest purchase; a timed-out user re-enters
   * as fresh, so the attribution lost is exactly what the horizon
   * declares expired (an event after the horizon attributes to no
   * purchase, as q44 would if its right side were horizon-filtered).
   * State size: O(users purchased within the horizon), not O(users
   * ever seen). Same ordering contract and output as the NoTimeout
   * variant inside the horizon (spec-enforced divergence outside it).
   */
  def attributionFromEventsEvicting(
      events: Dataset[AttrEvent], horizonUs: Long,
      delayThreshold: String = "0 seconds"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", delayThreshold)
      .as[AttrEvent] // extra watermark column drops out of the typed view
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[AttrEvent], state: GroupState[LastPurchase]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wmMs = state.getCurrentWatermarkMs()
            val prior0 = state.getOption.orNull
            // Manual expiry on the data path: a key whose horizon the
            // watermark has passed but whose timeout hasn't FIRED yet
            // (Spark delivers a batch's data before expired timeouts)
            // must behave as already evicted — otherwise the same event
            // attributes differently depending on whether it raced the
            // timeout firing.
            // mirror the timer EXACTLY: Spark fires an event-time timeout
            // only when timeoutTimestamp < watermark (strict — verified
            // against FlatMapGroupsWithStateExecBase's comparison), so
            // the manual check uses the same rounded-UP instant the
            // timeout below arms at AND the same strict inequality
            val prior =
              if (prior0 != null &&
                  (prior0.pts + horizonUs + 999L) / 1000L < wmMs) null
              else prior0
            val (out, last) = attributeGroup(uid, evs, prior)
            if (last != null) {
              state.update(last)
              // Millisecond event-time instants: round UP (the +999, as
              // sessionsClosedStream does) so state never evicts inside
              // the horizon, and clamp past the current watermark —
              // setTimeoutTimestamp THROWS on a timestamp at or before
              // it (reachable when stale state survives into this batch
              // because data arrived in the same batch the timeout
              // would have fired).
              state.setTimeoutTimestamp(math.max(
                (last.pts + horizonUs + 999L) / 1000L, wmMs + 1L))
            } else if (prior0 != null) {
              state.remove() // manually-expired state with no replacement
            }
            out.iterator
          }
        })
      .toDF()
  }

  /** File-source wrapper over [[attributionFromEvents]]. */
  def attributionStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    attributionFromEvents(
      eventStream(spark, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000L").as("ts"), col("event_type"))
        .as[AttrEvent])
  }

  /** The open SCD2 version a key's stream currently holds. */
  case class Scd2Open(state: String, validFrom: Long)
  case class Scd2Closed(
      user_id: Long, state: String, valid_from: Long, valid_to: Long)

  /** Per-group SCD2 pass: change detection over the batch's events in
    * (ts, event_id) order against the carried open version; returns the
    * versions CLOSED by this batch and the new open version. */
  private def scd2Group(
      uid: Long, evs: Iterator[AttrEvent], prior: Scd2Open)
      : (scala.collection.mutable.ArrayBuffer[Scd2Closed], Scd2Open) = {
    val sorted = evs.toArray.sortBy(e => (e.ts, e.event_id))
    val out = new scala.collection.mutable.ArrayBuffer[Scd2Closed]()
    var cur = prior
    for (e <- sorted) {
      if (cur == null) cur = Scd2Open(e.event_type, e.ts)
      else if (e.event_type != cur.state) {
        out += Scd2Closed(uid, cur.state, cur.validFrom, e.ts)
        cur = Scd2Open(e.event_type, e.ts)
      }
      // a repeat extends the open version; nothing closes, nothing emits
    }
    (out, cur)
  }

  /**
   * STREAMING SCD2 history build — the streaming twin of q122's batch
   * `scd2History`: per-key change detection maintained as ONE open
   * version of state per key (`flatMapGroupsWithState`), emitting a
   * version the moment a state-changing event CLOSES it. The open
   * (current) version stays in state — append-mode streams can only
   * emit finished facts, exactly the closed-versions restriction the
   * declared row's oracle states.
   *
   * State is O(keys) fixed width (the [[attributionFromEvents]]
   * property); the same cross-batch ordering contract applies (batches
   * arrive in event-time order; ties within a batch order by event id).
   */
  def scd2FromEvents(events: Dataset[AttrEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[AttrEvent], state: GroupState[Scd2Open]) => {
          val (out, cur) = scd2Group(uid, evs, state.getOption.orNull)
          if (cur != null) state.update(cur)
          out.iterator
        })
      .toDF()
  }

  def scd2Stream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scd2FromEvents(
      eventStream(spark, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000L").as("ts"), col("event_type"))
        .as[AttrEvent])
  }

  /** Funnel progress per key: timestamps of the completed step prefix
    * (`stepTs(i)` set iff step i matched), plus the done flag that
    * makes completion emit exactly once. */
  case class FunnelProgress(stepTs: Seq[Long], done: Boolean)
  case class FunnelConversion(
      user_id: Long, view_ts: Long, click_ts: Long, purchase_ts: Long)

  /** Per-group funnel pass. Greedy in-order matching equals the batch
    * q115 chain (each step takes the FIRST qualifying event after the
    * previous step's time, which is that step's minimum). */
  private def funnelGroup(
      uid: Long, evs: Iterator[AttrEvent], steps: Seq[String],
      prior: FunnelProgress)
      : (Option[FunnelConversion], FunnelProgress) = {
    val sorted = evs.toArray.sortBy(e => (e.ts, e.event_id))
    var ts = if (prior == null) Vector.empty[Long] else prior.stepTs.toVector
    var done = prior != null && prior.done
    var emit: Option[FunnelConversion] = None
    for (e <- sorted if !done) {
      val k = ts.length
      if (k < steps.length && e.event_type == steps(k) &&
          (k == 0 || e.ts > ts(k - 1))) {
        ts = ts :+ e.ts
        if (ts.length == steps.length) {
          done = true
          emit = Some(FunnelConversion(uid, ts(0), ts(1), ts(2)))
        }
      }
    }
    (emit, FunnelProgress(ts, done))
  }

  /**
   * STREAMING conversion detection — the streaming twin of q115's batch
   * funnel, restricted (as append mode demands) to COMPLETED funnels:
   * each key holds its step-prefix timestamps as fixed-width state and
   * emits ONE conversion row the moment the final step matches. The
   * strict `ts > previous step` comparison and first-match-wins
   * greediness reproduce the batch min-chain exactly, so the declared
   * row's oracle is q115 at `stage = 3`.
   *
   * Same cross-batch ordering contract as [[attributionFromEvents]].
   */
  def funnelFromEvents(
      events: Dataset[AttrEvent],
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.length == 3, "the typed conversion row is three-step")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[AttrEvent],
         state: GroupState[FunnelProgress]) => {
          val (emit, next) = funnelGroup(uid, evs, steps,
            state.getOption.orNull)
          state.update(next)
          emit.iterator
        })
      .toDF()
  }

  def funnelStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    funnelFromEvents(
      eventStream(spark, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000L").as("ts"), col("event_type"))
        .as[AttrEvent])
  }
}
