package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout utilities: Z-order (Morton) clustering keys for
 * multi-dimensional scan pruning.
 *
 * At 100 TB, a table laid out by one column prunes scans on that column
 * only; interleaving the bits of two (or more) dimension keys and
 * range-partitioning by the interleaved key gives every file a tight
 * min/max envelope in EVERY interleaved dimension, so predicate pushdown
 * on any of them skips most files. This is the standard lakehouse
 * OPTIMIZE ZORDER BY move, expressed as plain column algebra: the key is
 * codegen'd integer bit math (no UDF), and the layout step is
 * `repartitionByRange(zkey) + sortWithinPartitions(zkey) + write`.
 */
object Layout {

  /**
   * BUCKETED table layout — pre-pay the join/aggregation shuffle ONCE
   * at write time. The table is hash-partitioned into `numBuckets`
   * files per write-partition by `bucketCol` and registered with its
   * bucket spec in the session catalog; every later equi-join or
   * aggregation keyed on the bucket column reads co-located buckets
   * and plans WITHOUT an Exchange on that key (Spark's bucketed scan
   * reports the hash distribution; two tables bucketed by the same key
   * with the same bucket count sort-merge join shuffle-free —
   * plan-pinned in PlanSpec for q153).
   *
   * The 100 TB arithmetic: a fact-fact join (orders ⋈ lineitem) at
   * that scale shuffles BOTH tables every query; bucketing moves that
   * cost to one write, after which the daily joins, incremental-view
   * refreshes, and dedup-by-key passes on the same key are exchange-
   * free forever. `sortBy` additionally pre-sorts each bucket file so
   * the sort-merge join's per-partition sort reads mostly-ordered
   * input. Bucket count is a LAYOUT property (files per partition),
   * decoupled from `spark.sql.shuffle.partitions` — pick it for file
   * sizing at the table's scale.
   */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(table)
  }

  /**
   * Morton key of two dimensions, `bits` bits each: x's bit i lands at
   * output bit 2i, y's at 2i+1. Inputs are masked to `bits` bits first
   * (callers bucket raw values into [0, 2^bits) — rank, day number,
   * hash-mod — since z-locality is only meaningful over bounded bucket
   * spaces). A literal fold of shift/and/or terms: stays inside
   * whole-stage codegen, constant-folds where inputs do.
   */
  def mortonKey(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /**
   * Cluster `df` for multi-dimensional pruning: range-partition into
   * `numFiles` splits by the Morton key of the two dimension columns and
   * sort within each split, so a downstream per-partition write produces
   * files whose min/max envelopes are tight in both dimensions.
   * (The locality guarantee — every split's per-dimension spread shrinks
   * as splits grow — is spec-enforced in OperatorsSpec.)
   */
  def zorderBy(
      df: DataFrame, x: Column, y: Column, bits: Int,
      numFiles: Int): DataFrame = {
    val zCol = "__graft_zkey"
    require(!df.columns.contains(zCol), s"input already has a $zCol column")
    // the key column is dropped again: partition placement and intra-
    // partition order survive the projection, and a downstream write must
    // not grow an undocumented layout column
    df.withColumn(zCol, mortonKey(x, y, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
  }
}
