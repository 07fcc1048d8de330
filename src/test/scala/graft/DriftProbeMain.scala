package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: print the q104 stale-index recall measurement per SF dir. */
object DriftProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val e = Tables.load(spark, d, "embeddings")
      val trainSplit = e.where(col("vec_id") % 2 === 0)
      val served = e.where(col("vec_id") % 2 === 1)
      val q = served.where(col("vec_id") < 200)
      val cents = Similarity.trainIvfCentroids(trainSplit, "vec_id", "embedding")
      val cb = Similarity.trainPqCodebookResidual(trainSplit, "vec_id", "embedding", cents)
      val codes = Similarity.ivfPqEncode(served, "vec_id", "embedding", cents, cb)
      val approx = Similarity.ivfPqTopKRerankedFromCodes(
        codes, served, q, "vec_id", "embedding", k = 5, shortlist = 100,
        cents, cb, nProbe = 12)
      val exact = Similarity.bruteForceTopK(served, q, "vec_id", "embedding", k = 5)
      println(s"[drift] $d stale: " +
        Similarity.recallProbe(approx, exact).collect().mkString)
      // fresh-quantizer comparison (same corpus, quantizer trained on it)
      val cents2 = Similarity.trainIvfCentroids(served, "vec_id", "embedding")
      val cb2 = Similarity.trainPqCodebookResidual(served, "vec_id", "embedding", cents2)
      val codes2 = Similarity.ivfPqEncode(served, "vec_id", "embedding", cents2, cb2)
      val approx2 = Similarity.ivfPqTopKRerankedFromCodes(
        codes2, served, q, "vec_id", "embedding", k = 5, shortlist = 100,
        cents2, cb2, nProbe = 12)
      println(s"[drift] $d fresh: " +
        Similarity.recallProbe(approx2, exact).collect().mkString)
    }
    spark.stop()
  }
}
