package graft.fpm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, udf}

import scala.collection.mutable

/**
 * Broadcast rule-table prediction (the reference's hand-rolled broadcast
 * join, `pfp/FPGrowth.scala:151-177`): for each row, consequents of rules
 * whose antecedent is a subset of the row's items and whose consequent is
 * not already present, ordered by lift desc (ties: consequent asc), deduped
 * keeping the best-lift occurrence, joined with ", ".
 */
object Predictor {

  /** Rules must be pre-sorted by (lift desc, consequent asc). */
  def predict(
      data: DataFrame,
      rules: Array[(Array[String], String, Double)],
      itemsCol: String,
      predictionCol: String): DataFrame = {
    val bcRules = data.sparkSession.sparkContext.broadcast(rules)
    val predictUDF = udf { items: Seq[String] =>
      if (items == null) null
      else {
        val itemset = items.toSet
        val picked = mutable.LinkedHashSet.empty[String]
        bcRules.value.foreach { case (ant, cons, _) =>
          if (!itemset.contains(cons) && ant.forall(itemset.contains)) picked += cons
        }
        picked.mkString(", ")
      }
    }
    data.withColumn(predictionCol, predictUDF(col(itemsCol)))
  }

  def sortRules(
      rules: Array[(Array[String], String, Double)]): Array[(Array[String], String, Double)] =
    rules.sortBy { case (_, cons, lift) => (-lift, cons) }

  /**
   * Fully relational prediction — same semantics as [[predict]] but as
   * declarative algebra Catalyst can plan: broadcast-join the rule table
   * with the native [[graft.functions.ArrayContainsAll]] subset probe,
   * then per-key ordered aggregation ((lift desc, consequent asc),
   * `array_distinct` keeps first occurrences = best-lift per consequent).
   * `keyCols` must uniquely key the input rows.
   */
  def predictRelational(
      data: DataFrame,
      rules: DataFrame, // antecedent array<string>, consequent array<string>, lift
      keyCols: Seq[String],
      itemsCol: String,
      predictionCol: String): DataFrame = {
    import graft.functions.ArrayContainsAll.array_contains_all
    import org.apache.spark.sql.functions._
    val r = broadcast(rules.select(
      col("antecedent").as("r_ant"),
      col("consequent").getItem(0).as("r_cons"),
      col("lift").as("r_lift")))
    val key = keyCols.map(col)
    val matches = data.select(key :+ col(itemsCol).as("b_items"): _*)
      .join(r,
        array_contains_all(col("b_items"), col("r_ant")) &&
          !array_contains(col("b_items"), col("r_cons")))
      .groupBy(key: _*)
      .agg(array_join(
        array_distinct(transform(
          sort_array(collect_list(struct((-col("r_lift")).as("nl"), col("r_cons").as("c")))),
          s => s.getField("c"))), ", ").as(predictionCol))
    data.join(matches, keyCols, "left")
      // null baskets predict null (matching predict's UDF), not "": only
      // non-null item arrays that matched no rule coalesce to empty.
      .withColumn(predictionCol,
        when(col(itemsCol).isNotNull, coalesce(col(predictionCol), lit(""))))
  }
}
