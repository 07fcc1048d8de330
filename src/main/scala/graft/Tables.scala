package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.apache.spark.storage.StorageLevel

import java.util.concurrent.ConcurrentHashMap

/** Testdata loaders + the canonical basket-izations (FIXTURES.md §3). */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /**
   * Canonical event-time representation: `ts` as Long epoch NANOSECONDS.
   * Testdata generations have shipped the column as TIMESTAMP(NANOS)
   * (which Spark reads as Long under `nanosAsLong` — already canonical)
   * and as TIMESTAMP(MICROS) naive (read as TIMESTAMP_NTZ). Normalize at
   * the one load point so every downstream query keeps its integer-exact
   * `div` arithmetic. Naive micros are interpreted as UTC — every session
   * in this engine pins `spark.sql.session.timeZone=UTC`, matching
   * DuckDB's tz-free `epoch_ns(naive_ts)` on the oracle side.
   */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case _ => df // already Long nanoseconds
    }

  // The basket table feeds several queries + the model fit; build it once
  // per (context, sf dir) and keep it cached (it is small: one row per
  // order). The context id in the key prevents a later session from
  // receiving a DataFrame bound to a stopped SparkContext.
  private val basketCache = new ConcurrentHashMap[String, DataFrame]()

  // applicationId + startTime, NOT identityHashCode: stable for the
  // context's lifetime and never reused after GC (an identity hash can be
  // recycled, handing a new session a DataFrame bound to a stopped context).
  private[graft] def cacheKey(spark: SparkSession, dir: String): String = {
    val sc = spark.sparkContext
    s"${sc.applicationId}@${sc.startTime}|$dir"
  }

  /** Unpersist and drop every cached basket table (mirrors Dedup's). */
  def clearCaches(): Unit = {
    basketCache.values.forEach { df =>
      try df.unpersist() catch { case _: Throwable => }
    }
    basketCache.clear()
  }

  /**
   * order -> distinct part brands basket: `items: array<string>` sorted so
   * the set has one canonical form on both the Spark and DuckDB side.
   * The part dimension is tiny -> broadcast join, no shuffle of lineitem
   * for the probe side beyond the final groupBy.
   */
  def orderBrandBaskets(spark: SparkSession, dir: String): DataFrame =
    basketCache.computeIfAbsent(cacheKey(spark, dir), _ => {
      val li = load(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
      val part = load(spark, dir, "part").select("p_partkey", "p_brand")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("p_brand"))).as("items"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    })

  /** user -> distinct event types basket. */
  def userEventBaskets(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("event_type"))).as("items"))

  /** order -> distinct suppliers basket (wider item domain than brands). */
  def orderSupplierBaskets(spark: SparkSession, dir: String): DataFrame =
    basketCache.computeIfAbsent(cacheKey(spark, dir) + "#supplier", _ =>
      load(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_suppkey").cast("string"))).as("items"))
        .persist(StorageLevel.MEMORY_AND_DISK))
}
