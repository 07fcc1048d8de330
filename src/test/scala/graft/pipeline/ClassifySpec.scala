package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nearest-centroid classifier: centroid arithmetic, tie-break,
  * separable-cluster accuracy, partition invariance. */
class ClassifySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("classify-spec")
    .getOrCreate()

  test("centroids are exact fixed-point mean ratios") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(2.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Classify.labelCentroids(df, "embedding", "label")
      .select($"lab", $"centroid").as[(Int, Seq[Double])].collect().toMap
    // label 0: floor-fixed-point sums (1e6 + 0, 0 + 1e6) / 2 / 1e6
    assert(cents(0) == Seq(500000.0 / 1e6, 500000.0 / 1e6))
    assert(cents(1) == Seq(2.0, 2.0))
  }

  test("argmax ties break to the lowest label") {
    import spark.implicits._
    // two identical classes: every vector scores both equally
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 7),
      (2L, Seq(1.0f, 0.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val out = Classify.centroidClassify(df, "vec_id", "embedding", "label")
      .select($"vec_id", $"pred", $"margin").as[(Long, Int, Double)].collect()
    assert(out.forall(_._2 == 3), "tie must resolve to the lowest label")
    assert(out.forall(_._3 == 0.0), "identical centroids have zero margin")
  }

  test("separable clusters classify correctly with positive margins") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Seq(
      Array(10.0, 0.0, 0.0), Array(0.0, 10.0, 0.0), Array(0.0, 0.0, 10.0))
    val rows = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong,
        centers(c).map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq,
        c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Classify.centroidClassify(df, "vec_id", "embedding", "label")
      .select($"correct", $"margin").as[(Boolean, Double)].collect()
    assert(out.length == 90)
    assert(out.forall(_._1), "separable clusters must classify perfectly")
    assert(out.forall(_._2 > 0.0), "separable predictions must have margin")
  }

  test("output is partition-invariant (fixed-point sums are order-free)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat), i % 4)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    def run(d: org.apache.spark.sql.DataFrame) =
      Classify.centroidClassify(d, "vec_id", "embedding", "label")
        .as[(Long, Int, Int, Boolean, Double)].collect().sortBy(_._1).toSeq
    assert(run(df.repartition(1)) == run(df.repartition(7)))
  }

  test("knn label vote == brute-force neighbors + driver-side majority") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = graft.PipelineQueries.knnLabelVote(spark, sf)
      .as[(Long, Int, Int, Boolean)].collect().sortBy(_._1).toSeq
    val e = graft.Tables.load(spark, sf, "embeddings")
    val labels = e.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val want = Similarity
      .bruteForceTopK(e, e, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).toSeq.map { case (q, ns) =>
        val votes = ns.map(n => labels(n._2)).groupBy(identity)
          .map { case (l, g) => (l, g.size) }
        // majority, ties to the lowest label — the declared tie order
        val pred = votes.toSeq.minBy { case (l, v) => (-v, l) }._1
        (q, labels(q), pred, pred == labels(q))
      }.sortBy(_._1)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("hard negatives: different-label only, ranked among negatives") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables.load(spark, sf, "embeddings")
    val labels = e.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val got = Similarity.hardNegativesTopK(
        e, e.where($"vec_id" < 20), "vec_id", "embedding", "label", k = 5)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(got.nonEmpty)
    // every mined negative carries a different label than its anchor
    got.foreach { case (q, _, n) =>
      assert(labels(q) != labels(n), s"same-label pair ($q, $n)")
    }
    // ranks are contiguous 1..k per anchor (the filter ran BEFORE the
    // ranking — a post-filtered overall top-k would leave gaps)
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"non-contiguous ranks for anchor $q")
    }
  }

  test("empty input yields an empty result with the output schema") {
    import spark.implicits._
    val df = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val out = Classify.centroidClassify(df, "vec_id", "embedding", "label")
    assert(out.columns.toSeq ==
      Seq("vec_id", "label", "pred", "correct", "margin"))
    assert(out.count() == 0)
  }

  test("classifierEval: hand-computed confusion, null-not-zero ratio semantics") {
    import spark.implicits._
    val preds = Seq(
      (0, 0), (0, 0), (0, 1),      // class 0: tp 2, fn 1
      (1, 1), (1, 0),              // class 1: tp 1
      (2, 2), (2, 3),              // class 3 only ever predicted
      (4, 0),                      // class 4 only ever true
      (5, 6), (6, 5)               // both counts > 0, tp 0 -> p + r == 0
    ).toDF("label", "pred")
    val got = Classify.classifierEval(preds, "label", "pred")
      .as[(Int, Long, Long, Long, Long, Long,
           Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    def f1(p: Double, r: Double) = (2.0 * p * r) / (p + r)
    assert(got(0) == ((0, 3L, 4L, 2L, 2L, 1L,
      Some(2.0 / 4), Some(2.0 / 3), Some(f1(2.0 / 4, 2.0 / 3)))))
    assert(got(1) == ((1, 2L, 2L, 1L, 1L, 1L,
      Some(0.5), Some(0.5), Some(0.5))))
    assert(got(2) == ((2, 2L, 1L, 1L, 0L, 1L,
      Some(1.0), Some(0.5), Some(f1(1.0, 0.5)))))
    // never true: recall undefined (null), precision a real 0.0
    assert(got(3) == ((3, 0L, 1L, 0L, 1L, 0L, Some(0.0), None, None)))
    // never predicted: precision undefined, recall a real 0.0
    assert(got(4) == ((4, 1L, 0L, 0L, 0L, 1L, None, Some(0.0), None)))
    // measured on both sides but entirely wrong: p + r == 0 -> F1 null
    assert(got(5) == ((5, 1L, 1L, 0L, 1L, 1L, Some(0.0), Some(0.0), None)))
    assert(got(6) == ((6, 1L, 1L, 0L, 1L, 1L, Some(0.0), Some(0.0), None)))
  }
}
