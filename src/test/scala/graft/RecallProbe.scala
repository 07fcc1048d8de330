package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Recall probe for the approximate-ANN contract rows: prints the
 * measured recall of the DECLARED q86 (PQ) and q87 (IVFADC)
 * configurations against exact brute force at each given SF dir —
 * the number the recall-contract oracles pin >= 0.7. Usage:
 *   sbt "Test/runMain graft.RecallProbe /root/testdata/sf0.01 ..."
 */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("recall-probe").getOrCreate()
    import spark.implicits._
    for (d <- args) {
      val e = Tables.load(spark, d, "embeddings")
      val q = e.where(col("vec_id") < 100)
      val exact = pipeline.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val cbRaw = pipeline.Similarity.trainPqCodebook(e, "vec_id", "embedding")
      val pq = pipeline.Similarity.pqTopKReranked(
          e, q, "vec_id", "embedding", 5, 100, cbRaw)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val cents = pipeline.Similarity.trainIvfCentroids(e, "vec_id", "embedding")
      val cb = pipeline.Similarity.trainPqCodebookResidual(e, "vec_id", "embedding", cents)
      val ivfpq = pipeline.Similarity.ivfPqTopKReranked(
          e, q, "vec_id", "embedding", 5, 100, cents, cb, nProbe = 12)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      // the DECLARED q118 config: projDim 32, shortlist max(200, n/4)
      val sl = math.max(200L, e.count() / 4).toInt
      val proj = pipeline.Similarity.projectedTopK(
          e, q, "vec_id", "embedding", k = 5, shortlist = sl,
          inDim = 64, projDim = 32, seed = "jl")
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      println(f"[recall-probe] $d q86_pq=${(pq & exact).size.toDouble / exact.size}%.3f q87_ivfpq=${(ivfpq & exact).size.toDouble / exact.size}%.3f q118_proj(32,$sl)=${(proj & exact).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
