package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer: greedy merge semantics, deterministic argmax, early stop. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("bpe-spec")
    .getOrCreate()

  test("mergePair: greedy left-to-right, non-overlapping, adjacent sites") {
    assert(Bpe.mergePair(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergePair(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.mergePair(Seq("x", "a", "b", "y"), "a", "b") == Seq("x", "ab", "y"))
    assert(Bpe.mergePair(Seq("a"), "a", "b") == Seq("a"))
    assert(Bpe.mergePair(Seq.empty, "a", "b") == Seq.empty)
  }

  test("charSymbols splits on code points, not UTF-16 units") {
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16: a per-char
    // split would emit two lone-surrogate "symbols" that diverge from
    // the oracle's codepoint split and mangle on the UTF-8 boundary
    val astral = new String(Character.toChars(0x1D11E))
    assert(Bpe.charSymbols(s"a${astral}b") == Seq("a", astral, "b"))
    assert(Bpe.applyMerges(s"$astral$astral", Seq((astral, astral)))
      == Seq(astral + astral))
  }

  test("hand-computed merges on a tiny corpus") {
    import spark.implicits._
    // "low" x3, "lower" x2: pair counts round 1 — (l,o)=5, (o,w)=5,
    // (w,e)=2, (e,r)=2; tie on 5 broken lexicographically -> (l,o)
    val docs = Seq("low low lower", "low lower").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 3, minPairCount = 2L)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges(0) == ((1L, "l", "o", 5L)))
    // round 2: (lo,w)=5 dominates
    assert(merges(1) == ((2L, "lo", "w", 5L)))
    // round 3: (w,e)=0 now (w fused); remaining pairs: (low,e)=2, (e,r)=2
    // -> lexicographic tie-break picks (e,r)
    assert(merges(2) == ((3L, "e", "r", 2L)))
  }

  test("early stop: merging exhausts qualifying pairs below numMerges") {
    import spark.implicits._
    val docs = Seq("ab ab").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 10, minPairCount = 2L)
      .as[(Long, String, String, Long)].collect().toSeq
    // one merge (a,b)=2; afterwards every word is a single symbol
    assert(merges == Seq((1L, "a", "b", 2L)))
  }

  test("empty corpus trains zero merges without throwing") {
    import spark.implicits._
    val docs = Seq.empty[String].toDF("text")
    assert(Bpe.trainMerges(docs, "text", numMerges = 5).count() == 0L)
  }

  test("trainer == independent in-memory BPE on random corpora") {
    import spark.implicits._
    // reference implementation sharing NO code with the operator: plain
    // Scala collections, its own pair counting, argmax, and merge apply
    def refBpe(docs: Seq[String], numMerges: Int, minPairCount: Long)
        : Seq[(Long, String, String, Long)] = {
      val wordCnt = docs.flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      var symsOf: Map[String, Vector[String]] =
        wordCnt.keys.map(w => w -> w.split("").toVector).toMap
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var continue = true
      var step = 1
      while (step <= numMerges && continue) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, syms) <- symsOf; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + wordCnt(w)
        val qualified = counts.filter(_._2 >= minPairCount)
        if (qualified.isEmpty) continue = false
        else {
          val ((a, b), c) = qualified.minBy { case ((x, y), n) => (-n, x, y) }
          out += ((step.toLong, a, b, c))
          symsOf = symsOf.view.mapValues { syms =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                nb += a + b; i += 2
              } else { nb += syms(i); i += 1 }
            }
            nb.result()
          }.toMap
          step += 1
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3) {
      val alphabet = "abcd"
      val docs = Seq.fill(20 + rnd.nextInt(30))(
        Seq.fill(1 + rnd.nextInt(12))(
          Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(4))).mkString)
          .mkString(" "))
      val want = refBpe(docs, numMerges = 8, minPairCount = 2L)
      Bpe.clearCaches()
      val got = Bpe.trainMerges(docs.toDF("text"), "text", numMerges = 8,
          minPairCount = 2L)
        .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"trial $trial diverged:\ncorpus=$docs")
    }
  }

  test("distributed training path == in-memory path on random corpora") {
    // the size gate routes every spec-sized dictionary to the in-memory
    // trainer, so drive the distributed rounds DIRECTLY and require the
    // identical merge sequence (same argmax total order, same greedy
    // apply) — the differential pin that lets the gate pick either path
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 3) {
      val alphabet = "abc"
      val docs = Seq.fill(15 + rnd.nextInt(25))(
        Seq.fill(1 + rnd.nextInt(10))(
          Seq.fill(1 + rnd.nextInt(5))(alphabet(rnd.nextInt(3))).mkString)
          .mkString(" "))
      val dictDf = docs.toDF("text")
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.lower(
              org.apache.spark.sql.functions.col("text")), " ")).as("word"))
        .where(org.apache.spark.sql.functions.col("word") =!= "")
        .groupBy("word").count().withColumnRenamed("count", "cnt")
      val dist = Bpe.trainDistributed(dictDf, numMerges = 6, minPairCount = 2L)
      val dict = dictDf.as[(String, Long)].collect()
      val mem = Bpe.trainInMemory(dict, numMerges = 6, minPairCount = 2L)
      assert(dist == mem, s"trial $trial diverged:\ncorpus=$docs")
    }
  }

  test("merge artifact: save -> load round trip is exact, encode accepts it") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "low lower")).toDF("id", "text")
    Bpe.clearCaches()
    val merges = Bpe.trainMerges(docs, "text", numMerges = 3, minPairCount = 2L)
    val dir = java.nio.file.Files.createTempDirectory("bpe-spec-merges")
    try {
      Bpe.saveMerges(merges, dir.toString)
      val loaded = Bpe.loadMerges(spark, dir.toString)
      // bit-exact artifact round trip, in step order
      assert(loaded.as[(Long, String, String, Long)].collect().toSeq ==
        merges.as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq)
      // the external-table encode path == the self-train path
      val viaArtifact = Bpe.encode(docs, "id", "text", loaded)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      val selfTrained = Bpe.encode(docs, "id", "text", 3, 2L)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(viaArtifact == selfTrained)
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("shipped artifact: train on corpus A, encode corpus B") {
    import spark.implicits._
    val trainCorpus = Seq((1L, "low low lower"), (2L, "low lower")).toDF("id", "text")
    val other = Seq((9L, "slower low")).toDF("id", "text")
    Bpe.clearCaches()
    val merges = Bpe.trainMerges(trainCorpus, "text", 3, 2L)
    // merges: (l,o), (lo,w), (e,r) — "slower" under them: s|low|er
    val got = Bpe.encode(other, "id", "text", merges)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((9L, 2L, 4L, "s|low|er low")))
  }

  test("encode: documents re-tokenized under the trained merges, in word order") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "low lower")).toDF("id", "text")
    // merges (see the trainer test): (l,o), (lo,w), (e,r)
    val got = Bpe.encode(docs, "id", "text", numMerges = 3, minPairCount = 2L)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 4L, "low low low|er"),
      (2L, 2L, 3L, "low low|er")))
  }

  test("encode shares one training run with the trainer (keyed merge cache)") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab aa")).toDF("id", "text")
    Bpe.clearCaches()
    val m1 = Bpe.trainedMerges(docs, "text", 2, 1L)
    val m2 = Bpe.trainedMerges(docs, "text", 2, 1L)
    assert(m1 eq m2) // same cached instance, not a re-train
    assert(Bpe.encode(docs, "id", "text", 2, 1L).count() == 1L)
  }

  test("encode of an untrained (empty) tokenizer is the character split") {
    import spark.implicits._
    // every pair unique -> below minPairCount=2 -> zero merges
    val docs = Seq((1L, "abc de")).toDF("id", "text")
    import org.apache.spark.sql.functions.col
    val row = Bpe.encode(docs, "id", "text", numMerges = 5, minPairCount = 2L)
      .select(col("n_words"), col("n_tokens"), col("encoded"))
      .as[(Long, Long, String)].head()
    assert(row == ((2L, 5L, "a|b|c d|e")))
  }
}
