package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding
 * column.
 *
 *  - [[cosine]]: pure Catalyst (`zip_with` + `aggregate`), all math in
 *    double, left-to-right accumulation — deterministic bit-for-bit.
 *  - [[bruteForceTopK]]: exact baseline. The query side is broadcast (the
 *    usual shape: few queries vs a huge corpus), cosine is codegen'd
 *    column algebra, top-k via window `row_number` partitioned by query.
 *    A 100x corpus scales linearly with no shuffle of the corpus — the
 *    only shuffle is the final per-query top-k (tiny).
 *  - [[lshTopK]]: the scale path. Random-hyperplane LSH (seeded,
 *    deterministic planes broadcast as literals), multi-table to recover
 *    recall, bucket-equality candidate join, exact cosine re-rank. Probes
 *    `n_tables * bucket` instead of the full corpus.
 */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, p) => acc + p)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /**
   * Exact top-k neighbors for each query vector (self-matches excluded).
   * Deterministic ordering: (cosine desc, neighbor id asc).
   */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("query_vec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic unit hyperplanes: dims x planes, seeded. */
  private[pipeline] def hyperplanes(
      numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** 32-bit sign-pattern bucket of a vector under the given planes. */
  private def bucketCol(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val proj = aggregate(
        zip_with(vec, planeLit, (v, w) => v.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * LSH-bucketed approximate top-k: candidates = pairs sharing a bucket in
   * any table, re-ranked by exact cosine. Recall rises with numTables;
   * candidate cost falls with numPlanes.
   */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 6, numTables: Int = 16, seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val tables = (0 until numTables).map { t =>
      struct(lit(t).as("table"),
        bucketCol(col(vecCol), hyperplanes(numPlanes, dim, seed + t)).as("bucket"))
    }
    def withBuckets(df: DataFrame, side: String): DataFrame = df
      .select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_vec"),
        explode(array(tables: _*)).as("tb"))
      .select(col(s"${side}_id"), col(s"${side}_vec"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))

    val qb = broadcast(withBuckets(queries, "query"))
    val cb = withBuckets(corpus, "neighbor")
    val cand = cb.join(qb,
        Seq("table", "bucket")).where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_vec"), col("neighbor_vec"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("query_vec"), col("neighbor_vec")).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding summary stats (norm etc.), all-double sequential math. */
  def embeddingStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val sumSq = aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val s = aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double"))
    df.select(
      col(idCol),
      size(v).cast("long").as("dim"),
      sqrt(sumSq).as("l2_norm"),
      (s / size(v)).as("mean_val"))
  }
}
