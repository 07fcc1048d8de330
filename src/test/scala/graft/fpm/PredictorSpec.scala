package graft.fpm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** UDF vs relational prediction: identical output strings by construction. */
class PredictorSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("predictor-spec")
    .getOrCreate()

  test("predictRelational == predict (broadcast UDF) on sf0.001 baskets") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val baskets = graft.Tables.orderBrandBaskets(spark, dir)
    val model = graft.FpmQueries.model(spark, dir)
    val rulesDF = model.associationRules

    val rulesArr = rulesDF
      .select($"antecedent", $"consequent".getItem(0), $"lift")
      .as[(Array[String], String, Double)].collect()
    val viaUdf = Predictor.predict(
        baskets, Predictor.sortRules(rulesArr), "items", "prediction")
      .select($"l_orderkey", $"prediction")
      .as[(Long, String)].collect().toMap

    val viaRel = Predictor.predictRelational(
        baskets, rulesDF, Seq("l_orderkey"), "items", "prediction")
      .select($"l_orderkey", $"prediction")
      .as[(Long, String)].collect().toMap

    assert(viaRel.size == viaUdf.size)
    val diffs = viaUdf.collect {
      case (k, v) if viaRel(k) != v => (k, v, viaRel(k))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
    assert(viaUdf.values.exists(_.nonEmpty))
  }
}
