package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q186 sequence rules prefix->last: hand-checked confidence/lift on a
  * planted pattern lattice, anti-monotonicity (every rule's antecedent
  * resolves), exactness of the two-division lift, empty input. */
class SequentialRulesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("seqrules-spec")
    .getOrCreate()

  private def rules(pat: Seq[(String, Int, Long)], nUsers: Long) = {
    import spark.implicits._
    RelQueries.sequenceRulesFrom(
        pat.toDF("pattern", "plen", "support"),
        Seq(nUsers).toDF("n_users"))
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
  }

  test("hand lattice: confidence and lift exact to the defining divisions") {
    // 10 users; a:8 b:6 c:5, a->b:4, a->c:2(below some thresholds but
    // present in the table => still yields a rule), a->b->c:2
    val got = rules(Seq(
      ("a", 1, 8L), ("b", 1, 6L), ("c", 1, 5L),
      ("a->b", 2, 4L), ("a->c", 2, 2L), ("a->b->c", 3, 2L)), 10L)
    assert(got.size == 3)
    val ab = got(("a", "b"))
    assert((ab._3, ab._4, ab._5) == ((4L, 8L, 6L)))
    assert(ab._6 == 4.0 / 8.0)
    assert(ab._7 == (4.0 / 8.0) / (6.0 / 10.0))
    val abc = got(("a->b", "c"))
    assert((abc._3, abc._4, abc._5) == ((2L, 4L, 5L)))
    assert(abc._6 == 2.0 / 4.0)
    assert(abc._7 == (2.0 / 4.0) / (5.0 / 10.0))
    val ac = got(("a", "c"))
    assert(ac._6 == 2.0 / 8.0 && ac._7 == (2.0 / 8.0) / (5.0 / 10.0))
  }

  test("length-3 antecedent joins back onto its length-2 prefix support") {
    val got = rules(Seq(
      ("v", 1, 5L), ("c", 1, 4L), ("p", 1, 3L),
      ("v->c", 2, 4L), ("v->c->p", 3, 2L)), 5L)
    // v->c->p: antecedent "v->c" (support 4), consequent "p" (support 3)
    val r = got(("v->c", "p"))
    assert(r._3 == 2L && r._4 == 4L && r._5 == 3L)
    assert(r._6 == 0.5 && r._7 == 0.5 / (3.0 / 5.0))
  }

  test("anti-monotone closure: every length>=2 pattern emits exactly one rule") {
    // A proper frequent-sequence table (q121 output shape) always
    // contains each pattern's prefix and each singleton — so the rule
    // count equals the number of length>=2 rows.
    val pat = Seq(
      ("a", 1, 9L), ("b", 1, 7L),
      ("a->a", 2, 5L), ("a->b", 2, 6L), ("b->a", 2, 4L),
      ("a->a->b", 3, 3L), ("a->b->a", 3, 2L))
    assert(rules(pat, 9L).size == pat.count(_._2 >= 2))
  }

  test("empty pattern table yields no rules") {
    assert(rules(Seq.empty, 7L).isEmpty)
  }
}
