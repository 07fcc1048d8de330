package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval join: each point row pairs with every interval row of
 * the same key whose `[start, end]` contains the point's time (both ends
 * inclusive; shift a bound by one tick for open semantics).
 *
 * Catalyst runs a raw `ON key AND t BETWEEN s AND e` as an equi-join on key
 * followed by a per-key CROSS PRODUCT of points x intervals before the
 * range filter — O(P*I) per key, a scale-killer on anything hot. This
 * operator TIME-BUCKETS instead: a point lands in exactly one bucket of
 * width `bucketWidth`, an interval replicates to each bucket it overlaps,
 * and the join becomes a plain equi-join on (key..., bucket) + the exact
 * range predicate. Each qualifying pair meets in exactly one cell (the
 * point's bucket), so no dedup pass. Work is O(P + I*r + matches) with
 * r = interval_len/bucketWidth + 1 replication — pick `bucketWidth` about
 * the typical interval length so r <= 2 while a bucket's population stays
 * bounded (the standard interval-join recipe, cf. Flink's interval join).
 *
 * Returns interval columns + point columns (keys once). Intervals with
 * `end < start` are empty and dropped (`sequence()` would otherwise step
 * DOWNWARD and replicate them).
 */
object IntervalJoin {

  def intervalJoin(
      points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      pointTime: Column, startCol: Column, endCol: Column,
      bucketWidth: Long): DataFrame = {
    require(keyCols.nonEmpty, "intervalJoin needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("__t", "__s", "__e", "__b")
    require(!(points.columns ++ intervals.columns).exists(reserved.contains),
      s"input uses a reserved column name (${reserved.mkString(", ")})")

    val p = points
      .withColumn("__t", pointTime.cast("long"))
      .withColumn("__b", expr(s"__t div ${bucketWidth}L"))
    val i = intervals
      .withColumn("__s", startCol.cast("long"))
      .withColumn("__e", endCol.cast("long"))
      .where(col("__e") >= col("__s"))
      .withColumn("__b",
        explode(sequence(
          expr(s"__s div ${bucketWidth}L"), expr(s"__e div ${bucketWidth}L"))))
    i.join(p, keyCols :+ "__b")
      .where(col("__t").between(col("__s"), col("__e")))
      .drop("__t", "__s", "__e", "__b")
  }
}
