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
    // SPARK_GRAFT_CPUS=4 reproduces the perf-bound specs' config
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("perf-probe")
    // extra confs: SPARK_PROBE_CONF="k=v;k2=v2"
    sys.env.get("SPARK_PROBE_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"PROBE $name%-28s run$i ${(t2 - t0) / 1e9}%7.2f s " +
          f"(build ${(t1 - t0) / 1e9}%5.2f, exec ${(t2 - t1) / 1e9}%5.2f)")
      }
    }
    spark.stop()
  }
}
