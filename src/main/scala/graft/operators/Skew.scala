package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling utilities (SURVEY.md / SCALE.md: skewed keys -> salting or
 * AQE). AQE's skew-join handles sort-merge joins automatically; explicit
 * salting is still the tool when one side must be broadcast-replicated or
 * when a single hot key dominates a shuffle.
 */
object Skew {

  /**
   * Salted equi-join of a skewed large side against a small side: the large
   * side gets a per-row salt in [0, salts), the small side is replicated
   * once per salt value, and the join key becomes (key, salt) — a hot key's
   * rows spread over `salts` shuffle partitions instead of one.
   *
   * The salt is derived from a deterministic per-row hash of all large-side
   * columns, which distributes rows regardless of key skew. Results equal
   * the unsalted join exactly (spec-enforced).
   */
  def saltedJoin(
      large: DataFrame, small: DataFrame,
      key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltCol = pmod(hash(large.columns.map(col).toSeq: _*), lit(salts))
    val l = large.withColumn("_salt", saltCol)
    val s = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /**
   * Two-phase aggregation for aggregates WITHOUT partial-merge shrinkage
   * (e.g. collect_list): pre-aggregate per (key, salt), then merge the
   * per-salt partials per key. For sums/counts Catalyst's partial
   * aggregation already does this — use it only when the agg state itself
   * is the skew problem.
   */
  def saltedCollectList(
      df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(collect_list(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(array_sort(flatten(collect_list(col("_partial")))).as(s"${valueCol}_list"))
  }
}
