package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** TextRank: edge extraction, hand-computed round arithmetic,
  * driver-side reference differential, partition invariance. */
class GraphRankSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graphrank-spec")
    .getOrCreate()

  /** Driver-side reference: same tokenization, same canonical edges,
    * same integer fixed-point rounds — plain Scala maps. */
  private def referenceRank(
      texts: Seq[String], minEdge: Long, iters: Int): Map[String, Long] = {
    val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
    for (t <- texts) {
      val ws = t.toLowerCase.split(" ").filter(_.nonEmpty)
      for (Array(x, y) <- ws.sliding(2) if ws.length >= 2 && x != y) {
        val k = if (x < y) (x, y) else (y, x)
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1L
      }
    }
    val edges = pairCounts.filter(_._2 >= minEdge).toSeq
    val adj = edges.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val wdeg = adj.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var score: Map[String, Long] =
      adj.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val mass = scala.collection.mutable.Map[String, Long]()
      for ((src, dst, w) <- adj) {
        val c = (score(src) * w) / wdeg(src)
        mass(dst) = mass.getOrElse(dst, 0L) + c
      }
      score = mass.map { case (n, m) => n -> (150000L + (85L * m) / 100L) }
        .toMap
    }
    score
  }

  test("co-occurrence edges: canonical order, weights, hapax pruning") {
    import spark.implicits._
    val docs = Seq("b a b a", "x y", "c c c").toDF("text")
    val edges = GraphRank.cooccurrenceEdges(docs, "text", minEdgeCount = 2L)
      .as[(String, String, Long)].collect().toSet
    // "b a b a": pairs (b,a),(a,b),(b,a) -> canonical (a,b) x3
    // "x y": weight 1 -> pruned; "c c c": self-pairs -> dropped
    assert(edges == Set(("a", "b", 3L)))
  }

  test("one round matches hand-computed fixed-point arithmetic") {
    import spark.implicits._
    // path graph a -3- b -3- c; wdeg a=3, b=6, c=3
    val docs = Seq("a b a b", "b c b c").toDF("text")
    val out = GraphRank.textRank(docs, "text", minEdgeCount = 2L,
        iterations = 1)
      .as[(String, Long)].collect().toMap
    // a: (1e6*3) div 6 = 500000 -> 150000 + (85*500000) div 100 = 575000
    // b: (1e6*3) div 3 twice = 2e6 -> 150000 + 1700000 = 1850000
    assert(out == Map("a" -> 575000L, "b" -> 1850000L, "c" -> 575000L))
  }

  test("ten rounds equal the driver-side reference on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 'p').map(_.toString)
    val texts = (0 until 120).map { _ =>
      (0 until (3 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val expected = referenceRank(texts, minEdge = 2L, iters = 10)
    val got = GraphRank.textRank(texts.toDF("text"), "text",
        minEdgeCount = 2L, iterations = 10)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("result is partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'j').map(_.toString)
    val texts = (0 until 60).map { _ =>
      (0 until (2 + rnd.nextInt(8)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val one = GraphRank.textRank(
        texts.toDF("text").coalesce(1), "text", 2L, 5)
      .as[(String, Long)].collect().toMap
    val many = GraphRank.textRank(
        texts.toDF("text").repartition(7), "text", 2L, 5)
      .as[(String, Long)].collect().toMap
    assert(one == many)
  }

  test("isolated and below-floor words are absent; scores bounded below") {
    import spark.implicits._
    val docs = Seq("a b a b", "z", "q r").toDF("text")
    val out = GraphRank.textRank(docs, "text", 2L, 3)
      .as[(String, Long)].collect().toMap
    assert(out.keySet == Set("a", "b"))
    assert(out.values.forall(_ >= 150000L), "teleport mass is the floor")
  }

  test("distributed rounds equal the in-memory path bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = ('a' to 'n').map(_.toString)
    val texts = (0 until 90).map { _ =>
      (0 until (3 + rnd.nextInt(10)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val docs = texts.toDF("text")
    val local = GraphRank.textRank(docs, "text", 2L, 6)
      .as[(String, Long)].collect().toMap
    val dist = GraphRank.textRank(docs, "text", 2L, 6,
        distributedThreshold = 0L)
      .as[(String, Long)].collect().toMap
    assert(local == dist)
  }

  test("hub edges past Long: both paths match a BigInt reference, no wrap") {
    import spark.implicits._
    // Round one multiplies score 1e6 by weight 1e13 = 1e19 > Long.MaxValue;
    // unwidened arithmetic wraps negative and poisons every later round.
    val es = Seq(("a", "b", 10000000000000L), ("b", "c", 3000000000000L))
    val adj = es.flatMap { case (a, b, w) =>
      Seq((a, b, BigInt(w)), (b, a, BigInt(w)))
    }
    val wdeg = adj.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    var score: Map[String, BigInt] =
      wdeg.map { case (k, _) => k -> BigInt(1000000) }
    for (_ <- 1 to 2) {
      val mass = scala.collection.mutable.Map[String, BigInt]()
      for ((s, d, w) <- adj)
        mass(d) = mass.getOrElse(d, BigInt(0)) + score(s) * w / wdeg(s)
      score = mass.map { case (k, m) =>
        k -> (BigInt(150000) + BigInt(85) * m / 100)
      }.toMap
    }
    val expected = score.map { case (k, v) => k -> v.toLong }
    assert(expected.values.forall(_ > 0L))
    val edges = es.toDF("word_a", "word_b", "weight")
    val local = GraphRank.textRankLocal(edges, 2)
      .as[(String, Long)].collect().toMap
    val dist = GraphRank.textRankDistributed(edges, 2)
      .as[(String, Long)].collect().toMap
    assert(local == expected)
    assert(dist == expected)
  }

  test("triangle census on a hand graph: triangle + pendant") {
    import spark.implicits._
    // a-b, a-c, b-c (triangle) + c-d (pendant)
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L),
      ("c", "d", 1L)).toDF("word_a", "word_b", "weight")
    val row = GraphRank.triangleCensus(edges)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
    // degrees a=2 b=2 c=3 d=1 -> wedges 1+1+3+0 = 5; clustering 3*1/5
    assert(row.toSeq == Seq((4L, 4L, 5L, 1L, Some(0.6))))
  }

  test("triangle census matches brute force on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val nodes = ('a' to 'l').map(_.toString)
    val edgeSet = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if rnd.nextDouble() < 0.35
    } yield (nodes(i), nodes(j))).toSet
    val got = GraphRank.triangleCensus(
        edgeSet.toSeq.map { case (a, b) => (a, b, 1L) }
          .toDF("word_a", "word_b", "weight"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    val present = edgeSet ++ edgeSet.map(_.swap)
    val ns = present.map(_._1)
    val deg = ns.map(n => n -> present.count(_._1 == n)).toMap
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val nsq = ns.toSeq.sorted
    val tris = (for {
      a <- nsq; b <- nsq if a < b && edgeSet((a, b))
      c <- nsq if b < c && edgeSet((b, c)) && edgeSet((a, c))
    } yield (a, b, c)).size.toLong
    assert(got == ((ns.size.toLong, edgeSet.size.toLong, wedges, tris,
      if (wedges > 0) Some(3.0 * tris / wedges) else None)))
  }

  test("triangle census emits zero rows on an empty graph") {
    import spark.implicits._
    val empty = Seq.empty[(String, String, Long)]
      .toDF("word_a", "word_b", "weight")
    assert(GraphRank.triangleCensus(empty).count() == 0L)
  }
}
