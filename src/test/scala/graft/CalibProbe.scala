package graft

import org.apache.spark.sql.SparkSession

/** Manual calibration probe (never part of `sbt test`): prints warm
  * passes of both [[Bench.calibrate]] (short) and
  * [[Bench.calibrateSustained]] under the bench config — re-run this
  * on an idle host to re-base `CalibBaseline` /
  * `SustainedCalibBaseline` whenever either workload changes.
  * `sbt "Test/runMain graft.CalibProbe"` */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.calibrate(spark) // JIT burn, untimed (as in the bench)
    (1 to 3).foreach { i =>
      println(f"short pass $i: ${Bench.calibrate(spark)}%.3f s")
    }
    Bench.calibrateSustained(spark) // JIT burn
    (1 to 4).foreach { i =>
      println(f"sustained pass $i: ${Bench.calibrateSustained(spark)}%.3f s")
    }
    spark.stop()
  }
}
