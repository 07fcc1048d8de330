package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: EPFP-style FP-Growth over order->brand baskets at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    FpmQueries.freqItemsets(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_baskets" -> ((s, d) => FpmQueries.baskets(s, d)),
    "q02_l1_freq_items" -> ((s, d) => FpmQueries.l1FreqItems(s, d)),
    "q03_freq_itemsets" -> ((s, d) => FpmQueries.freqItemsets(s, d)),
    "q04_assoc_rules" -> ((s, d) => FpmQueries.assocRules(s, d)),
    "q05_predict" -> ((s, d) => FpmQueries.predict(s, d)),
    "q06_pricing_summary" -> ((s, d) => RelQueries.pricingSummary(s, d)),
    "q07_nation_revenue" -> ((s, d) => RelQueries.nationRevenue(s, d)),
    "q08_top_orders" -> ((s, d) => RelQueries.topOrders(s, d)),
    "q09_distinct_status" -> ((s, d) => RelQueries.distinctStatus(s, d)),
    "q10_word_count" -> ((s, d) => RelQueries.wordCount(s, d)),
    "q11_event_stats" -> ((s, d) => RelQueries.eventStats(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_baskets" -> FpmQueries.BasketsSql,
    "q02_l1_freq_items" -> FpmQueries.l1Sql(),
    "q03_freq_itemsets" -> FpmQueries.FreqItemsetsSql,
    "q04_assoc_rules" -> FpmQueries.AssocRulesSql,
    "q05_predict" -> FpmQueries.PredictSql,
    "q06_pricing_summary" -> RelQueries.PricingSummarySql,
    "q07_nation_revenue" -> RelQueries.NationRevenueSql,
    "q08_top_orders" -> RelQueries.TopOrdersSql,
    "q09_distinct_status" -> RelQueries.DistinctStatusSql,
    "q10_word_count" -> RelQueries.WordCountSql,
    "q11_event_stats" -> RelQueries.EventStatsSql,
  )
}
