package graft

import org.apache.spark.sql.SparkSession

/**
 * Ad-hoc per-query timing harness (test scope, not shipped): runs each
 * named query N times in one warm JVM so a query's own cost can be read
 * separately from shared-cache materialization (model fit, basket cache),
 * which the first run absorbs.
 *
 *   sbt "Test/runMain graft.PerfProbe sfDir reps q05_predict q05b_..."
 */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("perf-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PROBE $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
