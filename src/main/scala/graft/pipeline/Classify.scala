package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-space classification for curation filters: the
 * nearest-class-centroid (Rocchio) classifier a training-data pipeline
 * uses as its quality/domain gate (the fastText-classifier role of
 * CCNet/DCLM, expressed embedding-native) — train per-label centroids in
 * one aggregation, score every vector against the bounded centroid set
 * in-scan, keep the margin as the filter signal.
 *
 * Cross-engine exactness (the [[Unigram]] discipline): centroid
 * components are exact ratios of 1e-6 FIXED-POINT integer sums (the
 * per-dimension sums are order-free int64 adds, so partitioning cannot
 * perturb them), and every score is [[graft.functions.VectorExprs]]'
 * left-to-right double dot product — bit-identical to the oracle's
 * `list_reduce` replay. Argmax ties break to the LOWEST label; the
 * margin (best minus runner-up score) is the same two doubles
 * subtracted in both engines.
 */
object Classify {

  /** Fixed-point resolution of centroid sums: floor(x * 1e6) per
    * component before the integer aggregation. Resolution headroom:
    * |sum| < 2^63 needs class sizes below ~9e12/max|x| rows — far past
    * any real corpus at unit-scale embeddings. */
  private val FixedPoint = 1e6

  /**
   * Per-label mean embeddings: `(label, centroid array<double>, n)` —
   * ONE shuffle of (label x dim) fixed-point cells with map-side
   * combine; the result is bounded metadata (labels x dims).
   */
  def labelCentroids(
      df: DataFrame, vecCol: String, labelCol: String): DataFrame =
    df.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("lab"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .groupBy(col("lab"), col("i"))
      .agg(sum(floor(col("x") * FixedPoint).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col("lab"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("i"), col("s"), col("n")))),
          e => e.getField("s").cast("double") / e.getField("n").cast("double")
            / lit(FixedPoint))
          .as("centroid"),
        first(col("n")).as("n"))

  /**
   * Classify every row by its nearest class centroid (highest dot
   * product; ties to the LOWEST label): `(idCol, labelCol, pred,
   * correct, margin)` with `margin = best - runnerUp` score (null when
   * only one class exists). The scoring pass is PURE PROJECTION — the
   * bounded centroid table embeds as literals, each row pays
   * `labels` codegen'd dots, and no shuffle or join touches the corpus
   * (argmax and runner-up fold over an in-row struct array) — the
   * centroid training aggregation is the plan's only exchange.
   */
  def centroidClassify(
      df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // labels are class INDICES (bounded vocabularies by definition) —
    // normalized to int internally so integral label columns of any
    // width work; the output `label`/`pred` columns are int either way
    val cents = labelCentroids(
        df.withColumn(labelCol, col(labelCol).cast("int")), vecCol, labelCol)
      .select(col("lab"), col("centroid"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1)
    // empty-input schema mirrors the non-empty branch: id keeps the
    // INPUT column's type, label/pred are the normalized int
    val emptySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        df.schema(idCol).dataType),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("pred",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("correct",
        org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("margin",
        org.apache.spark.sql.types.DoubleType)))
    if (cents.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    // struct (dot, -label): array_max's lexicographic struct order makes
    // the max the highest dot with ties to the LOWEST label; removing
    // the max (labels are distinct, so exactly one element matches) and
    // taking the max again yields the runner-up for the margin
    val scores: Column = array(cents.map { case (lab, c) =>
      struct(
        graft.functions.VectorExprs.array_dot(
          col("__v"), typedlit(c)).as("dot"),
        lit(-lab).as("neglab"))
    }: _*)
    df.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("vec_id"), col(labelCol).cast("int").as("label"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__scores", scores)
      .withColumn("__best", array_max(col("__scores")))
      .withColumn("__second", array_max(array_remove(col("__scores"), col("__best"))))
      .select(
        col("vec_id"), col("label"),
        (-col("__best.neglab")).as("pred"),
        (col("label") === -col("__best.neglab")).as("correct"),
        (col("__best.dot") - col("__second.dot")).as("margin"))
  }

  /**
   * Per-class evaluation table from a prediction frame — the standard
   * confusion-derived report (tp/fp/fn, precision, recall, F1) every
   * classifier run in the pipeline publishes next to its predictions.
   * Derived from TWO class-keyed aggregates joined full-outer (a class
   * that is only ever predicted, or only ever true, still gets a row):
   * `tp(c) = |label=c ∧ pred=c|`, `fp(c) = |pred=c| - tp`,
   * `fn(c) = |label=c| - tp`. Undefined ratios stay NULL (precision
   * with zero predictions, recall with zero true rows, F1 when both
   * components are 0 or either is null) — never a silent 0 that reads
   * as "measured and bad".
   *
   * Determinism: counts are exact; each ratio is ONE double division
   * and F1 the pinned product/sum `(2 * p * r) / (p + r)` computed per
   * output row — no order-sensitive float aggregation anywhere. Scale
   * shape: two partial-aggregated class-keyed exchanges over the
   * prediction scan and a class-cardinality-sized join — free at any
   * corpus size.
   */
  def classifierEval(
      preds: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val byTrue = preds.groupBy(col(labelCol).as("class"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col(labelCol) === col(predCol), 1L).otherwise(0L)).as("tp"))
    val byPred = preds.groupBy(col(predCol).as("class"))
      .agg(count(lit(1)).as("n_pred"))
    val p = col("tp").cast("double") / col("n_pred").cast("double")
    val r = col("tp").cast("double") / col("n_true").cast("double")
    byTrue.join(byPred, Seq("class"), "full_outer")
      .select(col("class"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_true") - col("tp"))
      .withColumn("precision", when(col("n_pred") > 0L, p))
      .withColumn("recall", when(col("n_true") > 0L, r))
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
          (col("precision") + col("recall")) > 0.0,
          (lit(2.0) * col("precision") * col("recall")) /
            (col("precision") + col("recall"))))
  }
}
