package graft.fpm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Non-redundant rule flags: hand lattice (incl. the equal-confidence
  * boundary), naive pairwise differential, arity guard. */
class RuleBasisSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("rule-basis-spec")
    .getOrCreate()

  private def rulesDf(rows: Seq[(Seq[String], String, Double)]) = {
    import spark.implicits._
    rows.toDF("antecedent", "cons", "confidence")
      .select(col("antecedent"), array(col("cons")).as("consequent"),
        col("confidence"))
  }

  test("hand lattice: domination, equal-confidence boundary, missing generals") {
    import spark.implicits._
    val got = AssociationRules.nonRedundantFlags(rulesDf(Seq(
        (Seq("a"), "y", 0.9),
        (Seq("a", "b"), "y", 0.8),       // dominated by a->y
        (Seq("a", "c"), "y", 0.95),      // beats its only general rule
        (Seq("b"), "z", 0.7),
        (Seq("b", "a"), "z", 0.7),       // EQUAL confidence dominates
        (Seq("c", "b"), "w", 0.5),       // no general rules at all
        (Seq("a", "b", "c"), "y", 0.85)  // 3 generals present, 2 dominate
      )))
      .as[(String, String, Double, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
    assert(got(("a", "y")) == ((0L, 0L, false)))
    assert(got(("a,b", "y")) == ((1L, 1L, true)))
    assert(got(("a,c", "y")) == ((1L, 0L, false)))
    assert(got(("b", "z")) == ((0L, 0L, false)))
    assert(got(("a,b", "z")) == ((1L, 1L, true)),
      "an equally-confident general rule must dominate")
    assert(got(("b,c", "w")) == ((0L, 0L, false)))
    assert(got(("a,b,c", "y")) == ((3L, 2L, true)))
  }

  test("differential vs naive pairwise containment on random rule tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val items = Seq("p", "q", "r", "s", "t")
    val rows = (1 to 60).map { _ =>
      val ant = rnd.shuffle(items).take(1 + rnd.nextInt(3)).sorted
      (ant, items(rnd.nextInt(items.size)), (rnd.nextInt(100) + 1) / 100.0)
    }.distinct
      // one rule per (antecedent-set, consequent), like mining output
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val got = AssociationRules.nonRedundantFlags(rulesDf(rows))
      .as[(String, String, Double, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
    val naive = rows.map { case (ant, cons, conf) =>
      val generals = rows.filter { case (a2, c2, _) =>
        c2 == cons && a2 != ant && a2.toSet.subsetOf(ant.toSet)
      }
      (ant.mkString(","), cons) ->
        ((generals.size.toLong,
          generals.count(_._3 >= conf).toLong,
          generals.exists(_._3 >= conf)))
    }.toMap
    assert(got == naive)
  }

  test("antecedent arity beyond the hard cap fails loudly") {
    val wide = rulesDf(Seq(((1 to 21).map(i => s"i$i"), "y", 0.5)))
    val e = intercept[Exception] {
      AssociationRules.nonRedundantFlags(wide).collect()
    }
    assert(e.getMessage != null)
  }
}
