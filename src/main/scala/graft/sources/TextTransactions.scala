package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Reference transaction-text ingestion (FIXTURES.md §1): one transaction
 * per line, single-space-separated items, deduplicated per line —
 * `epfp/EPFP.scala:26-27`. Pure Catalyst (`split` + `array_distinct`), so
 * the scan/pruning/pushdown story is Spark's, not hand-rolled: the
 * reference instead runs a Scala `map` over a Dataset[String] (and Apriori
 * even collects the file to the driver, `apriori/Apriori.scala:62-64` —
 * not reproduced).
 */
object TextTransactions {

  /** `items: array<string>` from a whitespace-tokenized text file. */
  def fromText(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path)
      .select(array_distinct(split(col("value"), " ")).as("items"))

  /** Same, from an in-memory corpus (tests / micro-fixtures). */
  def fromLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.toDF("value")
      .select(array_distinct(split(col("value"), " ")).as("items"))
  }

  /**
   * CSV source: one transaction per row, items in `itemsField` delimited by
   * `sep` (other columns pass through untouched). Header-based schema.
   */
  def fromCsv(
      spark: SparkSession, path: String,
      itemsField: String = "items", sep: String = " "): DataFrame =
    spark.read.option("header", "true").csv(path)
      .withColumn("items",
        array_distinct(split(col(itemsField), java.util.regex.Pattern.quote(sep))))

  /**
   * JSON-lines source: each record carries an `itemsField` string array
   * (deduplicated on ingest, same invariant as the text path).
   */
  def fromJson(
      spark: SparkSession, path: String, itemsField: String = "items"): DataFrame =
    spark.read.json(path)
      .withColumn("items", array_distinct(col(itemsField).cast("array<string>")))
}
