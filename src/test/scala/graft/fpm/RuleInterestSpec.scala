package graft.fpm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Leverage/conviction interestingness: hand-computed fixture + the
  * shared-column agreement with the q04 generator. */
class RuleInterestSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("rule-interest-spec")
    .getOrCreate()

  test("hand-computed fixture: leverage/conviction exact, NULL conviction for exact rules") {
    import spark.implicits._
    // N = 10 baskets; counts: a=6, b=5, ab=4 -> rule a->b:
    //   confidence 4/6, lift (4/6)/(5/10), support 4/10
    //   leverage (4*10 - 6*5)/100 = 0.10
    //   conviction ((10-5)*6)/(10*(6-4)) = 30/20 = 1.5
    // c=3, ac=3 -> rule c->a has confidence 1 -> conviction NULL
    val itemsets = Seq(
      (Seq("a"), 6L), (Seq("b"), 5L), (Seq("c"), 3L),
      (Seq("a", "b"), 4L), (Seq("a", "c"), 3L)).toDF("items", "freq")
    val got = AssociationRules.interestingness(itemsets, 10L, 0.0)
      .select(concat_ws(",", col("antecedent")).as("ant"),
        col("consequent").getItem(0).as("cons"),
        col("confidence"), col("lift"), col("support"),
        col("leverage"), col("conviction"))
      .as[(String, String, Double, Double, Double, Double, Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    val ab = got(("a", "b"))
    assert(ab._1 == 4.0 / 6.0 && ab._2 == (4.0 / 6.0) / (5.0 / 10.0))
    assert(ab._3 == 0.4 && ab._4 == 0.10 && ab._5.contains(1.5))
    val ca = got(("c", "a"))
    assert(ca._1 == 1.0 && ca._5.isEmpty, "exact rule must have NULL conviction")
    // negative-dependence direction: leverage of b->a equals a->b (symmetric)
    assert(got(("b", "a"))._4 == 0.10)
  }

  test("shared columns agree with the q04 generator on sf0.001") {
    import spark.implicits._
    val m = graft.FpmQueries.model(spark, "/root/testdata/sf0.001")
    val base = m.associationRules
      .select(concat_ws(",", array_sort(col("antecedent"))).as("ant"),
        col("consequent").getItem(0).as("cons"),
        col("confidence"), col("lift"), col("support"))
      .as[(String, String, Double, Double, Double)].collect().toSet
    val ext = AssociationRules.interestingness(
        m.freqItemsets, m.numTransactions, graft.FpmQueries.MinConfidence)
      .select(concat_ws(",", array_sort(col("antecedent"))).as("ant"),
        col("consequent").getItem(0).as("cons"),
        col("confidence"), col("lift"), col("support"))
      .as[(String, String, Double, Double, Double)].collect().toSet
    assert(base.nonEmpty)
    assert(ext == base,
      "interestingness must reproduce q04's columns bit for bit")
  }
}
