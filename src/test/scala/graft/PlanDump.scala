package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Throwaway: dump a query's formatted plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // normalizeEventTs's TIMESTAMP_NTZ branch assumes UTC — every
      // session builder (Verify, Bench, specs) pins it; ad-hoc dumps on a
      // non-UTC host must not silently shift event timestamps
      .config("spark.sql.session.timeZone", "UTC")
      .appName("plan-dump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pos = args.filterNot(_.startsWith("--")) // flags are not positionals
    val df = SparkEntry.queries(pos(0))(spark, pos.lift(1).getOrElse("/root/testdata/sf0.001"))
    // collect() executes THIS DataFrame's QueryExecution, so the AQE plan
    // printed below is the final one with codegen annotations
    if (args.contains("--exec")) df.collect()
    println(df.queryExecution.explainString(FormattedMode))
  }
}
