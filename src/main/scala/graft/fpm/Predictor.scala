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
}
