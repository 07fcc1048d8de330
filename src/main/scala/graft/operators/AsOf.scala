package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (most-recent-at-or-before) join: every left row picks the single
 * right row with the greatest `rightTime <= leftTime` within the same key —
 * the standard temporal-attribution / point-in-time-lookup operator (what
 * DuckDB/kdb call ASOF JOIN). Spark has no built-in; the naive rewrites are
 * both scale-killers:
 *
 *   - `left JOIN right ON key AND rt <= lt` + argmax dedup: a range join
 *     Catalyst can only run as a per-key cross product — every left row
 *     pairs with every earlier right row (O(L*R) per key) before the argmax
 *     throws almost all of it away.
 *   - per-key `collect_list` + UDF binary search: materializes a key's whole
 *     right history as one row — unbounded row size on hot keys.
 *
 * This one is a MERGE: union the two sides with a side marker, one window
 * per key ordered by (time, side), and carry the last non-null right
 * payload forward. Exactly ONE shuffle (the window's Exchange on key), each
 * row touched once, memory bounded by Spark's external window sort — the
 * plan shape that survives 100 TB of events. Right rows sort BEFORE left
 * rows at an equal timestamp, so a right row at exactly `leftTime` matches
 * (`<=`, ASOF semantics).
 *
 * Left-outer semantics: left rows before their key's first right row get a
 * null match struct. Determinism: among right rows tied on (key, time) the
 * LAST in `tieBreak` order wins; pass a unique right column (or leave the
 * default — ties only matter when right times collide per key).
 *
 * Skew note: one window partition per key — a single pathologically hot key
 * serializes into one task. At that extreme use [[asOfJoinBucketed]]: the
 * same semantics partitioned by (key, coarse time bucket), with each
 * bucket's carry-in right row injected from a metadata-sized per-bucket
 * summary.
 *
 * Returns the left rows (all columns) plus `matchedCol`: a struct of the
 * right payload columns, null when nothing preceded.
 */
object AsOf {

  /**
   * [[asOfJoin]] with a bounded LOOKBACK horizon — the batch semantics
   * the evicting attribution stream
   * ([[graft.streaming.EventStreams.attributionFromEventsEvicting]])
   * enforces through state timeout: a match older than `horizon` (in
   * the time columns' own units) does not count and the row emits with
   * a null `matchedCol`, exactly as if no right row existed. A
   * post-filter on the plain as-of IS the lookback join: the as-of
   * match is the LATEST right time at or before the left time, so if it
   * falls outside the horizon every other candidate is older still —
   * no per-row range join needed. `rightTimeField` names the right-time
   * column inside the matched payload (it must be in `rightPayload`)
   * so the age is computed from the join's own output.
   */
  def asOfJoinLookback(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], horizon: Long, rightTimeField: String,
      matchedCol: String = "matched",
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(rightPayload.contains(rightTimeField),
      s"rightTimeField '$rightTimeField' must be part of rightPayload " +
        s"(${rightPayload.mkString(", ")}) so the match age is computable")
    asOfJoin(left, right, keyCols, leftTime, rightTime, rightPayload,
        matchedCol, tieBreak)
      .withColumn(matchedCol,
        when(leftTime - col(s"$matchedCol.$rightTimeField") <= horizon,
          col(matchedCol)))
  }

  def asOfJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], matchedCol: String = "matched",
      tieBreak: Seq[String] = Nil): DataFrame =
    asOfJoinImpl(left, right, keyCols, leftTime, rightTime, rightPayload,
      matchedCol, tieBreak, castTimes = true)

  /** [[asOfJoin]] keeping the time columns' NATIVE type and ordering
    * (both sides must agree on the type): the `as-of <=` becomes the
    * type's own ordering — lexicographic for strings, exact for
    * decimals — instead of the epoch-long cast. This is the fallback
    * route [[graft.plans.AsOfJoinNative.asOfJoin]] takes for time types
    * outside the ordered-primitive family, where a long cast would be
    * lossy (decimals) or null (strings). */
  private[graft] def asOfJoinRawTime(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], matchedCol: String = "matched",
      tieBreak: Seq[String] = Nil): DataFrame =
    asOfJoinImpl(left, right, keyCols, leftTime, rightTime, rightPayload,
      matchedCol, tieBreak, castTimes = false)

  private def asOfJoinImpl(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], matchedCol: String,
      tieBreak: Seq[String], castTimes: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin needs at least one key column")
    val reserved = Seq("__t", "__side", "__rp", "__lp", "__tie")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input uses a reserved column name (${reserved.mkString(", ")})")

    val rp = struct(rightPayload.map(col): _*)
    val rpType = right.select(rp.as(matchedCol)).schema.head.dataType
    val tie: Column =
      if (tieBreak.isEmpty) lit(0L) else struct(tieBreak.map(col): _*)

    // A null right time never matches (`rt <= t` is null in SQL): drop the
    // row, or NULLS FIRST ordering would make it an "earliest" fallback
    // match for every left row.
    val rT = if (castTimes) rightTime.cast("long") else rightTime
    val lT = if (castTimes) leftTime.cast("long") else leftTime
    val rSide = right.where(rightTime.isNotNull).select(
      keyCols.map(col) ++ Seq(
        rT.as("__t"), lit(0).as("__side"),
        tie.as("__tie"), rp.as("__rp"),
        lit(null).cast(left.schema).as("__lp")): _*)
    val lSide = left.select(
      keyCols.map(col) ++ Seq(
        lT.as("__t"), lit(1).as("__side"),
        lit(null).cast(rSide.schema("__tie").dataType).as("__tie"),
        lit(null).cast(rpType).as("__rp"),
        struct(left.columns.map(col): _*).as("__lp")): _*)

    // Right rows first at equal time (side 0 < 1): `<=` match. __tie only
    // ever compares right rows with each other (left rows differ on __side
    // before __tie is reached), so the last tieBreak among tied rights wins.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn(matchedCol, last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__lp.*"), col(matchedCol))
  }

  /**
   * Hot-key variant of [[asOfJoin]] — identical semantics (spec-enforced
   * equality), but the merge window partitions by (key, coarse time
   * bucket) instead of key alone, so a single pathologically hot key
   * spreads over `timeRange / bucketSeconds` tasks instead of serializing
   * into one.
   *
   * Matches that cross a bucket boundary are preserved by a two-phase
   * carry: (1) per (key, bucket) the LAST right row is aggregated — one
   * row per non-empty bucket, bounded metadata relative to the event
   * data; (2) a per-key window over those BUCKET SUMMARIES (rows =
   * buckets, not events — the per-key serialization this variant retains
   * is over metadata) computes each left bucket's carry-in = the latest
   * right row of any STRICTLY earlier bucket, which is injected into the
   * bucket as a synthetic right row sorting before every real row. The
   * in-bucket merge is then exactly [[asOfJoin]]'s window.
   *
   * Cost: two shuffles of the event data (the summary groupBy partially
   * aggregates map-side) vs [[asOfJoin]]'s one — the price of splitting
   * a key's timeline. Use the plain variant unless a key is hot enough
   * to dominate a stage.
   */
  def asOfJoinBucketed(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], matchedCol: String = "matched",
      tieBreak: Seq[String] = Nil, bucketSeconds: Long = 86400L): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoinBucketed needs at least one key column")
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val reserved = Seq("__t", "__side", "__rp", "__lp", "__tie", "__bkt", "__avail", "__carry")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input uses a reserved column name (${reserved.mkString(", ")})")

    val rp = struct(rightPayload.map(col): _*)
    val rpType = right.select(rp.as(matchedCol)).schema.head.dataType
    val tie: Column =
      if (tieBreak.isEmpty) lit(0L) else struct(tieBreak.map(col): _*)
    val key = keyCols.map(col)

    // Bucket id is a floorDiv: plain `div` truncates toward zero on
    // negative epochs, but t - pmod(t, b) is exactly divisible (pmod is
    // non-negative), so the division below is exact for any sign.
    val rSide = right.where(rightTime.isNotNull).select(
      key ++ Seq(
        rightTime.cast("long").as("__t"), lit(0).as("__side"),
        tie.as("__tie"), rp.as("__rp"),
        lit(null).cast(left.schema).as("__lp")): _*)
      .withColumn("__bkt",
        expr(s"(__t - pmod(__t, $bucketSeconds)) div $bucketSeconds"))
    val lSide = left.select(
      key ++ Seq(
        leftTime.cast("long").as("__t"), lit(1).as("__side"),
        lit(null).cast(rSide.schema("__tie").dataType).as("__tie"),
        lit(null).cast(rpType).as("__rp"),
        struct(left.columns.map(col): _*).as("__lp")): _*)
      .withColumn("__bkt",
        expr(s"(__t - pmod(__t, $bucketSeconds)) div $bucketSeconds"))

    // (1) last right row per (key, bucket): max over the same (__t, __tie)
    // order the merge window uses, so tie resolution matches asOfJoin.
    val rSummary = rSide
      .groupBy(key :+ col("__bkt"): _*)
      .agg(max_by(col("__rp"), struct(col("__t"), col("__tie"))).as("__rp"))
      .select(key ++ Seq((col("__bkt") + 1).as("__avail"), lit(0).as("__side"), col("__rp")): _*)

    // (2) carry-in per LEFT bucket: the latest right summary whose bucket
    // is strictly earlier (__avail = right bucket + 1 <= left bucket).
    // Window input is bucket summaries + distinct left-bucket markers —
    // metadata-sized, never event rows.
    val lBuckets = lSide.select(key :+ col("__bkt").as("__avail"): _*).distinct()
      .withColumn("__side", lit(1))
      .withColumn("__rp", lit(null).cast(rpType))
    val wCarry = Window.partitionBy(key: _*)
      .orderBy(col("__avail").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryRows = lBuckets.unionByName(rSummary)
      .withColumn("__carry", last(col("__rp"), ignoreNulls = true).over(wCarry))
      .where(col("__side") === 1 && col("__carry").isNotNull)
      .select(key ++ Seq(
        lit(Long.MinValue).as("__t"), lit(0).as("__side"),
        lit(null).cast(rSide.schema("__tie").dataType).as("__tie"),
        col("__carry").as("__rp"),
        lit(null).cast(left.schema).as("__lp"),
        col("__avail").as("__bkt")): _*)

    // (3) asOfJoin's merge window, partitioned by (key, bucket); the
    // carry-in's MinValue timestamp sorts it before every real row.
    val w = Window.partitionBy(key :+ col("__bkt"): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide).unionByName(carryRows)
      .withColumn(matchedCol, last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__lp.*"), col(matchedCol))
  }
}
