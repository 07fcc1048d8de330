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
 * serializes into one task. The fix at that extreme is time-bucketing the
 * key (salt by coarse time range, replicate each bucket's last right row
 * into the next bucket) — [[Skew]] covers the general pattern.
 *
 * Returns the left rows (all columns) plus `matchedCol`: a struct of the
 * right payload columns, null when nothing preceded.
 */
object AsOf {

  def asOfJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], matchedCol: String = "matched",
      tieBreak: Seq[String] = Nil): DataFrame = {
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
    val rSide = right.where(rightTime.isNotNull).select(
      keyCols.map(col) ++ Seq(
        rightTime.cast("long").as("__t"), lit(0).as("__side"),
        tie.as("__tie"), rp.as("__rp"),
        lit(null).cast(left.schema).as("__lp")): _*)
    val lSide = left.select(
      keyCols.map(col) ++ Seq(
        leftTime.cast("long").as("__t"), lit(1).as("__side"),
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
}
