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

  // ---- q201 next-event prediction (sequencePredictFrom core) ----

  private def predict(
      seqs: Seq[(Long, Seq[String])],
      rules: Seq[(Seq[String], String, Double)]): Map[Long, String] = {
    import spark.implicits._
    RelQueries.sequencePredictFrom(
        seqs.toDF("user_id", "seq"),
        rules.sortBy { case (_, c, l) => (-l, c) })
      .as[(Long, String)].collect().toMap
  }

  test("q201 hand fixture: containment fires, done consequents skip, lift orders, dedup keeps max") {
    val rules = Seq(
      (Seq("v"), "c", 2.0),          // fires for anyone with v, no c
      (Seq("v", "c"), "p", 5.0),     // needs v before c
      (Seq("c"), "p", 1.5),          // same consequent, lower lift
      (Seq("x"), "z", 9.0))          // never fires (no x)
    val got = predict(Seq(
      1L -> Seq("v", "c"),           // v->c fires p(5.0); c fires p(1.5)
                                     // dedup -> "p"; v->c? c present, skip
      2L -> Seq("v"),                // only v: c(2.0) -> "c"
      3L -> Seq("c", "v"),           // v before c ABSENT (order!), c fires
                                     // p(1.5); v fires c? c present, skip
      4L -> Seq("p", "c", "v")       // all done except... v->c needs v
                                     // before c: absent; c->p: p present;
                                     // v->c(2.0): c present -> ""
      ), rules)
    assert(got == Map(1L -> "p", 2L -> "c", 3L -> "p", 4L -> ""))
  }

  test("q201 fire order: higher lift first, equal lift by consequent asc") {
    val rules = Seq(
      (Seq("a"), "m", 3.0),
      (Seq("a"), "k", 3.0),  // equal lift: k before m alphabetically
      (Seq("a"), "z", 7.0))  // highest lift first
    val got = predict(Seq(1L -> Seq("a")), rules)
    assert(got(1L) == "z, k, m")
  }

  test("q201 matches a driver-side reference on random logs and rules") {
    val rnd = new scala.util.Random(41)
    val types = Seq("v", "c", "p", "e", "s")
    val seqs = (1L to 50L).map(u =>
      u -> Seq.fill(2 + rnd.nextInt(8))(types(rnd.nextInt(types.size))))
    val rules: Seq[(Seq[String], String, Double)] = (1 to 12).map { i =>
      val aLen = 1 + rnd.nextInt(2)
      (Seq.fill(aLen)(types(rnd.nextInt(types.size))),
        types(rnd.nextInt(types.size)),
        (rnd.nextInt(40) + 1) / 8.0) // coarse lifts so ties occur
    }
    def contains(s: Seq[String], p: Seq[String]): Boolean = {
      var m = 0
      for (x <- s if m < p.length) if (x == p(m)) m += 1
      m == p.length
    }
    val ordered = rules.sortBy { case (_, c, l) => (-l, c) }
    val want = seqs.map { case (u, s) =>
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      ordered.foreach { case (a, c, _) =>
        if (!s.contains(c) && contains(s, a)) out += c
      }
      u -> out.mkString(", ")
    }.toMap
    assert(predict(seqs, rules) == want)
  }

  test("q201 empty rule table predicts empty string for every user") {
    val got = predict(Seq(1L -> Seq("v"), 2L -> Seq()), Seq.empty)
    assert(got == Map(1L -> "", 2L -> ""))
  }

  test("q202: prediction from refresh-derived rules == prediction from the mine (transform is artifact-stable)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val viaArtifact = RelQueries.sequentialPredictFromArtifact(spark, dir)
      .as[(Long, String)].collect().toMap
    val viaMine = RelQueries.sequentialPredict(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(viaArtifact.size == viaMine.size)
    val diffs = viaMine.collect {
      case (k, v) if viaArtifact(k) != v => (k, v, viaArtifact(k))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
  }
}
