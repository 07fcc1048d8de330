package graft.fpm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Association-rule generation from frequent itemsets — single-item
 * consequents, like the reference
 * (`/root/reference/src/main/java/fdu/cst/bigdata/pfp/AssociationRules.scala:60-82`).
 *
 * Where the reference drops to an RDD flatMap + shuffled RDD join keyed by
 * `Seq[Item]`, this is pure DataFrame algebra, so Catalyst plans it:
 *  - candidate generation = `explode(items)` as the consequent +
 *    `array_remove` as the antecedent (no custom generator needed);
 *  - the antecedent-frequency lookup = an equi-join back onto the itemset
 *    table on an `array_sort`-canonicalized array key (SURVEY.md J1: array
 *    join keys must be canonicalized; itemsets arrive in rank order but the
 *    sorted key makes the join order-insensitive by construction);
 *  - the consequent-support lookup for lift = a broadcast join against the
 *    (tiny, minSupport-bounded) L1 item-support table.
 *
 * Output schema matches `pfp/FPGrowth.scala:212-219`:
 * `antecedent array, consequent array, confidence double, lift double,
 * support double`.
 */
object AssociationRules {

  def fromFreqItemsets(
      freqItemsets: DataFrame,
      itemSupport: Map[String, Double],
      numTransactions: Long,
      minConfidence: Double): DataFrame = {
    val spark = freqItemsets.sparkSession
    import spark.implicits._

    val supportDF = broadcast(
      itemSupport.toSeq.toDF("c_item", "c_support"))

    val antecedentFreq = freqItemsets
      .select(array_sort(col("items")).as("ant_key"), col("freq").as("freq_antecedent"))

    freqItemsets
      .where(size(col("items")) > 1)
      .select(col("freq").as("freq_union"), explode(col("items")).as("cons_item"), col("items"))
      .select(
        array_remove(col("items"), col("cons_item")).as("antecedent"),
        col("cons_item"),
        col("freq_union"))
      .join(antecedentFreq, array_sort(col("antecedent")) === col("ant_key"))
      .join(supportDF, col("cons_item") === col("c_item"))
      .select(
        col("antecedent"),
        array(col("cons_item")).as("consequent"),
        (col("freq_union").cast("double") / col("freq_antecedent")).as("confidence"),
        ((col("freq_union").cast("double") / col("freq_antecedent")) / col("c_support"))
          .as("lift"),
        (col("freq_union").cast("double") / lit(numTransactions.toDouble)).as("support"))
      .where(col("confidence") >= minConfidence)
  }
}
