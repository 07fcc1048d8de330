package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-handling utilities (SURVEY.md / SCALE.md: skewed keys -> salting or
 * AQE). AQE's skew-join handles sort-merge joins automatically; explicit
 * salting is still the tool when one side must be broadcast-replicated or
 * when a single hot key dominates a shuffle.
 */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Per-row salt in [0, salts): row-position based, NOT content based — a
    * content hash would assign identical duplicate rows (the classic hot
    * key shape) one salt and spread nothing. */
  private def withSalt(df: DataFrame, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!df.columns.contains(SaltCol), s"input already has a $SaltCol column")
    df.withColumn(SaltCol, pmod(monotonically_increasing_id(), lit(salts.toLong)))
  }

  /**
   * Salted equi-join of a skewed large side against a small side: the large
   * side gets a per-row salt, the small side is replicated once per salt
   * value, and the join key becomes (key, salt) — a hot key's rows spread
   * over `salts` shuffle partitions instead of one. Results equal the
   * unsalted join exactly (spec-enforced).
   */
  def saltedJoin(
      large: DataFrame, small: DataFrame,
      key: String, salts: Int): DataFrame = {
    require(!small.columns.contains(SaltCol), s"input already has a $SaltCol column")
    val l = withSalt(large, salts)
    val s = small
      .withColumn(SaltCol, explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(s, Seq(key, SaltCol)).drop(SaltCol)
  }

  /**
   * Two-phase aggregation for aggregates WITHOUT partial-merge shrinkage
   * (e.g. collect_list): pre-aggregate per (key, salt), then merge the
   * per-salt partials per key. For sums/counts Catalyst's partial
   * aggregation already does this — use it only when the agg state itself
   * is the skew problem.
   */
  def saltedCollectList(
      df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    withSalt(df, salts)
      .groupBy(col(key), col(SaltCol))
      .agg(collect_list(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(array_sort(flatten(collect_list(col("_partial")))).as(s"${valueCol}_list"))
}
