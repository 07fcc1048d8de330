package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** FastSS edit-distance pairs: planted typos, brute-force completeness
  * differential, distance-1 mode, count floor. */
class EditDistanceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("editdistance-spec")
    .getOrCreate()

  private def mine(words: Seq[String], maxDist: Int, minCount: Long = 1L) = {
    import spark.implicits._
    Dedup.editDistancePairs(words.map(w => s"$w").toDF("text"),
        "text", maxDist, minCount)
      .select($"word_a", $"word_b", $"dist").as[(String, String, Int)]
      .collect().toSet
  }

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("planted typos: substitution, deletion, transposition distances") {
    val got = mine(Seq("color", "colour", "colr", "dog"), 2)
    assert(got == Set(
      ("color", "colour", 1), // insertion
      ("color", "colr", 1),   // deletion
      ("colour", "colr", 2))) // dog is far from everything
  }

  test("blocked join finds exactly the brute-force pairs (completeness)") {
    val rnd = new scala.util.Random(37)
    val base = Seq("spark", "query", "shuffle", "join", "table", "scan")
    // mutate each base word a few ways: delete, substitute, append
    val vocab = (base ++ base.flatMap { w =>
      Seq(w.drop(1), w.dropRight(1) + "x",
        w.updated(rnd.nextInt(w.length), 'z'), w + "s")
    }).distinct
    for (k <- Seq(1, 2)) {
      val got = mine(vocab, k)
      val expect = (for {
        a <- vocab; b <- vocab if a < b
        d = levenshtein(a, b) if d <= k
      } yield (a, b, d)).toSet
      assert(got == expect, s"maxDist=$k diverged from brute force")
    }
  }

  test("one-character words pair through the empty-string variant") {
    val got = mine(Seq("a", "b", "ab"), 1)
    assert(got == Set(("a", "b", 1), ("a", "ab", 1), ("ab", "b", 1)))
  }

  test("the count floor prunes rare words before blocking") {
    val words = Seq.fill(5)("spark") ++ Seq("spork") // spork appears once
    assert(mine(words, 2, minCount = 2L).isEmpty)
    assert(mine(words, 2, minCount = 1L).nonEmpty)
  }
}
