package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Differential fuzz for the signal operators: the distributed DataFrame
 * implementations must equal a brute-force local Scala computation on
 * generated corpora (seeded, so failures replay). One Spark job per
 * operator over the whole generated corpus — ScalaCheck's
 * one-job-per-case shape would spend minutes on scheduler latency.
 */
class SignalsPropertiesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("signals-properties-spec")
    .getOrCreate()

  // word-salad corpus over a small vocab (repeats guaranteed), with some
  // empty-ish and single-word docs mixed in
  private val docsFixture: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff", "g", "hh", "i", "jj")
    (0 until 120).map { id =>
      val n = rnd.nextInt(30)
      val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      (id.toLong, words.mkString(" "))
    }
  }

  private def tokens(t: String): Seq[String] =
    t.toLowerCase.split(' ').filter(_.nonEmpty).toSeq

  test("repetition == brute force on a generated corpus") {
    import spark.implicits._
    val df = docsFixture.toDF("doc_id", "text")
    val got = Signals.repetition(df, "doc_id", "text", n = 2)
      .select($"doc_id", $"n_grams", $"top_cnt", $"dup_cnt")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    docsFixture.foreach { case (id, text) =>
      val grams = tokens(text).sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val byGram = grams.groupBy(identity).view.mapValues(_.size.toLong)
      val n = grams.size.toLong
      val top = if (byGram.isEmpty) 0L else byGram.values.max
      val dup = byGram.values.filter(_ > 1).sum
      assert(got(id) == ((id, n, top, dup)), s"doc $id '$text'")
    }
  }

  test("oovRate == brute force with the same vocabulary cut") {
    import spark.implicits._
    val df = docsFixture.toDF("doc_id", "text")
    val v = 4
    val got = Signals.oovRate(df, "doc_id", "text", vocabSize = v)
      .select($"doc_id", $"n_tokens", $"n_oov")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val freq = docsFixture.flatMap(d => tokens(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }.take(v).map(_._1).toSet
    docsFixture.foreach { case (id, text) =>
      val ts = tokens(text)
      if (ts.isEmpty) assert(!got.contains(id), s"doc $id should have no row")
      else {
        val oov = ts.count(t => !vocab.contains(t)).toLong
        assert(got(id) == ((id, ts.size.toLong, oov)), s"doc $id '$text'")
      }
    }
  }

  test("contamination == brute force distinct-gram overlap") {
    import spark.implicits._
    val df = docsFixture.toDF("doc_id", "text")
    val n = 3
    val got = Signals.contamination(df, "doc_id", "text", _ % 10 === 0, n)
      .select($"doc_id", $"n_grams", $"n_contam")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    def gramSet(t: String): Set[String] =
      tokens(t).sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
    val evalGrams = docsFixture.filter(_._1 % 10 == 0).flatMap(d => gramSet(d._2)).toSet
    docsFixture.filter(_._1 % 10 != 0).foreach { case (id, text) =>
      val gs = gramSet(text)
      if (gs.isEmpty) assert(!got.contains(id), s"doc $id should have no row")
      else {
        val hit = gs.count(evalGrams.contains).toLong
        assert(got(id) == ((id, gs.size.toLong, hit)), s"doc $id '$text'")
      }
    }
  }

  test("incrementalDedup == brute-force cross-set jaccard") {
    import spark.implicits._
    val df = docsFixture.toDF("doc_id", "text")
    val n = 3
    val thr = 0.5
    val got = Signals.incrementalDedup(df, "doc_id", "text", _ % 5 === 4, n, thr)
      .select($"doc_id", $"n_dups", $"keep")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    def gramSet(t: String): Set[String] =
      tokens(t).sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
    val batch = docsFixture.filter(_._1 % 5 == 4)
    val corpus = docsFixture.filter(_._1 % 5 != 4).map(d => gramSet(d._2))
      .filter(_.nonEmpty)
    batch.foreach { case (id, text) =>
      val g = gramSet(text)
      val dups =
        if (g.isEmpty) 0L
        else corpus.count { c =>
          val i = (g & c).size
          i.toDouble / (g.size + c.size - i) >= thr
        }.toLong
      assert(got(id) == ((id, dups, dups == 0L)), s"doc $id '$text'")
    }
  }
}
