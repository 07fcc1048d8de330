package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Unigram-LM tokenizer: the distributed trainer is differential-tested
 * against an INDEPENDENT brute-force reference that enumerates every
 * segmentation of every word explicitly (no lattice, no forward/backward
 * recurrences — a structurally different computation of the same EM
 * quantities), plus Viterbi semantics, artifact round-trip, and the
 * open-vocabulary fallback.
 */
class UnigramSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("unigram-spec")
    .getOrCreate()

  // ---------------------------------------------------------------------
  // Independent reference: brute-force segmentation enumeration.
  // ---------------------------------------------------------------------

  /** All segmentations of `word` into pieces of ≤ 4 codepoints. */
  private def segmentations(word: Vector[String]): Seq[Vector[Vector[String]]] =
    if (word.isEmpty) Seq(Vector.empty)
    else (1 to math.min(Unigram.MaxPieceLen, word.length)).flatMap { k =>
      val (head, tail) = word.splitAt(k)
      segmentations(tail).map(head +: _)
    }

  private def cps(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n); i += n
    }
    out.result()
  }

  /** Brute-force EM expected counts: per word, sum path probabilities
    * containing each piece OCCURRENCE, divided by the total path mass —
    * mathematically identical to forward–backward but computed by
    * explicit enumeration (different float summation order, so the
    * comparison is at tolerance, then floored counts at ±1). */
  private def bruteExpected(
      dict: Seq[(String, Long)], model: Map[String, Double]): Map[String, Double] = {
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    dict.foreach { case (w, cnt) =>
      val segs = segmentations(cps(w))
        .map(_.map(_.mkString))
        .filter(_.forall(model.contains))
      val probs = segs.map(s => s.map(model).product)
      val z = probs.sum
      if (z > 0) segs.zip(probs).foreach { case (s, pr) =>
        s.foreach { piece =>
          acc(piece) = acc.getOrElse(piece, 0.0) + pr / z * cnt
        }
      }
    }
    acc.toMap
  }

  /** Brute-force reference trainer following the documented schedule
    * (seed → EM1 → prune → EM2) with the same selection rules but none
    * of the distributed machinery. */
  private def referenceTrain(
      docsText: Seq[String], seedSize: Int, vocabSize: Int,
      minSeedCount: Long): Seq[(String, Double)] = {
    val words = docsText.flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
    val dict = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val subW = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, cnt) =>
      val c = cps(w)
      for (j <- c.indices; k <- 1 to math.min(Unigram.MaxPieceLen, c.length - j)) {
        val piece = c.slice(j, j + k).mkString
        subW(piece) = subW.getOrElse(piece, 0L) + cnt
      }
    }
    def isSingle(s: String) = s.codePointCount(0, s.length) == 1
    val singles = subW.filter(kv => isSingle(kv._1)).toSeq
    val multis = subW.filter(kv => !isSingle(kv._1) && kv._2 >= minSeedCount)
      .toSeq.sortBy { case (p, w) => (-w, p) }.take(seedSize)
    val w0 = (singles ++ multis).map(_._2).sum
    var model: Map[String, Double] =
      (singles ++ multis).map { case (p, w) => p -> w.toDouble / w0.toDouble }.toMap
    var round = 1
    while (round <= 2) {
      val exp = bruteExpected(dict, model)
      val floored = model.keys.map { p =>
        p -> math.floor(exp.getOrElse(p, 0.0) * 1e12).toLong
      }.toMap
      val keptSingles = floored.filter(kv => isSingle(kv._1))
        .map { case (p, e) => p -> math.max(e, 1L) }
      val keptMultisAll = floored.filter(kv => !isSingle(kv._1) && kv._2 > 0)
      val keptMultis =
        if (round == 1)
          keptMultisAll.toSeq.sortBy { case (p, e) => (-e, p) }.take(vocabSize)
        else keptMultisAll.toSeq
      val kept = keptSingles.toSeq ++ keptMultis
      val t = kept.map(_._2).sum
      model = kept.map { case (p, e) => p -> e.toDouble / t.toDouble }.toMap
      round += 1
    }
    model.toSeq.sortBy(_._1)
  }

  test("trainer differential vs brute-force segmentation enumeration") {
    import spark.implicits._
    val texts = Seq(
      "the cat sat on the mat", "the cat ate the rat", "a cat and a rat",
      "rats and cats sat", "the mat sat flat")
    val docs = texts.toDF("text")
    val got = Unigram.trainModel(docs, "text", seedSize = 50, vocabSize = 10,
        minSeedCount = 2L)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val want = referenceTrain(texts, seedSize = 50, vocabSize = 10,
      minSeedCount = 2L)
    assert(got.map(_._1).toSeq == want.map(_._1),
      "piece vocabularies differ from the brute-force reference")
    // The reference sums path probabilities in a different order, so the
    // pre-floor expectations can differ in the last ulp; compare at
    // tolerance (the ORACLE, which mirrors the float order exactly,
    // pins bit-equality — this differential pins the MATH).
    got.zip(want).foreach { case ((p1, _, pg), (p2, pw)) =>
      assert(p1 == p2)
      assert(math.abs(pg - pw) <= 1e-9, s"prob mismatch for piece '$p1'")
    }
    Unigram.clearCaches()
  }

  test("viterbi picks the max-probability segmentation (brute-force check)") {
    import spark.implicits._
    val texts = Seq("abcd abcd abc bcd ab cd", "abcd ab cd abc d")
    val model = Unigram.trainModel(texts.toDF("text"), "text",
        seedSize = 50, vocabSize = 20, minSeedCount = 1L)
      .as[(String, Long, Double)].collect()
    val probs = model.map { case (p, _, pr) => p -> pr }.toMap
    val enc = Unigram.encode(texts.toDF("text").withColumn("id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
      "id", "text",
      model.toSeq.toDF("piece", "e", "p"))
      .as[(Long, Long, Long, String)].collect()
    enc.foreach { case (_, _, _, encoded) =>
      encoded.split(" ").foreach { wordToks =>
        val toks = wordToks.split("\\|").toVector
        val word = toks.mkString
        // concatenation invariant
        assert(toks.forall(_.nonEmpty))
        val best = segmentations(cps(word)).map(_.map(_.mkString))
          .filter(_.forall(probs.contains))
          .map(s => s.map(probs).product).max
        val gotP = toks.map(probs).product
        assert(math.abs(gotP - best) <= best * 1e-12,
          s"viterbi path for '$word' is not maximal: $gotP vs $best")
      }
    }
    Unigram.clearCaches()
  }

  test("viterbi ties break to the longest piece") {
    // Model where 'ab' has exactly the prob of 'a'·'b' scaled to force an
    // exact tie: p(a)=p(b)=0.25, p(ab)=0.0625 == 0.25*0.25.
    val model = Seq(("a", 1L, 0.25), ("b", 1L, 0.25), ("ab", 1L, 0.0625))
    val probs = Unigram.viterbiTokens("ab", toProbsOf(model))
    assert(probs.toSeq == Seq("ab"))
  }

  test("unknown codepoints segment as lone zero-probability pieces") {
    val model = Seq(("a", 1L, 0.5), ("b", 1L, 0.5))
    assert(Unigram.viterbiTokens("axb", toProbsOf(model)).toSeq
      == Seq("a", "x", "b"))
  }

  private def toProbsOf(rows: Seq[(String, Long, Double)]) = {
    // mirror of the private toProbs via the public encode path is
    // overkill for unit granularity; rebuild the structure directly
    val idx = new java.util.HashMap[String, Integer]()
    val arr = new Array[Double](rows.size)
    rows.zipWithIndex.foreach { case ((p, _, pr), i) =>
      idx.put(p, i); arr(i) = pr
    }
    new Unigram.Probs(idx, arr)
  }

  test("greedy encode: maximum munch at every position, unknown passthrough") {
    val model = Seq(("a", 1L, 0.1), ("ab", 1L, 0.1), ("abc", 1L, 0.1),
      ("bcd", 1L, 0.1), ("d", 1L, 0.1))
    val m = toProbsOf(model)
    // greedy takes 'abc' even though 'a'+'bcd' would cover more known
    // pieces — maximum munch is positional, not global
    assert(Unigram.greedyTokens("abcd", m).toSeq == Seq("abc", "d"))
    assert(Unigram.greedyTokens("abd", m).toSeq == Seq("ab", "d"))
    // unknown codepoints pass through as lone pieces
    assert(Unigram.greedyTokens("xabcy", m).toSeq == Seq("x", "abc", "y"))
    // property on a trained model: each emitted token is the longest
    // in-vocab piece at its position (or a lone fallback codepoint)
    import spark.implicits._
    val texts = Seq("the cat sat on the mat", "the mat sat flat cats")
    val trained = Unigram.trainModel(texts.toDF("text"), "text", 50, 20, 1L)
      .as[(String, Long, Double)].collect()
    val probs = toProbsOf(trained.toSeq)
    val enc = Unigram.encodeGreedy(
        texts.toDF("text").withColumn("id",
          org.apache.spark.sql.functions.monotonically_increasing_id()),
        "id", "text", trained.toSeq.toDF("piece", "e", "p"))
      .as[(Long, Long, Long, String)].collect()
    enc.flatMap(_._4.split(" ")).foreach { wordToks =>
      val toks = wordToks.split("\\|")
      val word = toks.mkString
      var pos = 0
      toks.foreach { t =>
        val rest = word.substring(pos)
        val longest = (math.min(Unigram.MaxPieceLen, rest.length) to 2 by -1)
          .find(k => probs.prob(rest.take(k)) >= 0.0)
        longest match {
          case Some(k) => assert(t == rest.take(k), s"not maximal at $word/$pos")
          case None => assert(t == rest.take(1))
        }
        pos += t.length
      }
      assert(pos == word.length)
    }
    Unigram.clearCaches()
  }

  test("artifact round-trip: save/load/encode equals direct encode") {
    import spark.implicits._
    val texts = Seq("banana bandana ban", "anna and banana")
    val docs = texts.toDF("text").withColumn("id",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val model = Unigram.trainModel(docs, "text", 50, 20, 1L)
    val dir = java.nio.file.Files.createTempDirectory("unigram-spec")
    try {
      Unigram.saveModel(model, dir.toString)
      val loaded = Unigram.loadModel(spark, dir.toString)
      val a = Unigram.encode(docs, "id", "text", model)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      val b = Unigram.encode(docs, "id", "text", loaded)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(a == b)
      assert(a.nonEmpty && a.forall(_._4.nonEmpty))
    } finally graft.Fs.deleteRecursively(dir)
    Unigram.clearCaches()
  }

  test("cpOffsets and cpLess handle supplementary-plane codepoints") {
    val astral = new String(Character.toChars(0x1D11E)) // U+1D11E
    val off = Unigram.cpOffsets(s"a${astral}b")
    assert(off.toSeq == Seq(0, 1, 3, 4))
    // UTF-16 compareTo mis-orders astral (surrogates) vs U+FFFD-class
    // chars; cpLess follows codepoint (UTF-8 binary) order like the
    // oracle's collation
    assert(Unigram.cpLess("�", astral)) // U+FFFD < U+1D11E
    assert(astral.compareTo("�") < 0) // while UTF-16 order disagrees
    assert(Unigram.cpLess("ab", "b"))
    assert(!Unigram.cpLess("b", "ab"))
    assert(Unigram.cpLess("a", "ab"))
  }

  test("single codepoints survive training with floored counts") {
    import spark.implicits._
    // 'q' occurs once in one word dominated by longer pieces; it must
    // stay in the model (coverage) with e >= 1
    val docs = Seq("zzzz zzzz zzzq").toDF("text")
    val model = Unigram.trainModel(docs, "text", 50, 20, 1L)
      .as[(String, Long, Double)].collect()
    val singles = model.filter(_._1.codePointCount(0, 1) == 1)
      .filter(r => r._1.length == 1)
    assert(singles.exists(_._1 == "q"))
    assert(model.filter(_._1 == "q").forall(_._2 >= 1L))
    assert(model.filter(_._1 == "z").forall(_._2 >= 1L))
    Unigram.clearCaches()
  }

  test("tokenizer report: char conservation, token bounds, exact divisions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "cats and dogs and cats"),
      (4L, "the the the cat cat dog"))
      .toDF("doc_id", "text")
    val model = Unigram.trainModel(docs, "text", 50, 20, 1L)
    def stats(df: org.apache.spark.sql.DataFrame, regime: String) =
      df.agg(count(lit(1)).cast("long"), sum("n_words").cast("long"),
        sum("n_tokens").cast("long"),
        sum(length(translate(col("encoded"), "| ", ""))).cast("long"))
        .as[(Long, Long, Long, Long)].head()
    val regimes = Map(
      "bpe" -> Bpe.encode(docs, "doc_id", "text", 5, 1L),
      "unigram" -> Unigram.encode(docs, "doc_id", "text", model),
      "wordpiece" -> Unigram.encodeGreedy(docs, "doc_id", "text", model))
    val wordChars = docs
      .select(explode(filter(split(lower(col("text")), " "), w => w =!= ""))
        .as("w"))
      .agg(sum(length(col("w"))).cast("long"), count(lit(1)).cast("long"))
      .as[(Long, Long)].head()
    regimes.foreach { case (name, df) =>
      val (nDocs, nWords, nTokens, nChars) = stats(df, name)
      assert(nDocs == 4L, s"$name n_docs")
      assert(nWords == wordChars._2, s"$name must see every corpus word")
      // encodes PARTITION each word's characters: no regime may create
      // or drop a character
      assert(nChars == wordChars._1, s"$name char conservation")
      assert(nTokens >= nWords && nTokens <= nChars, s"$name token bounds")
    }
    Unigram.clearCaches()
    Bpe.clearCaches()
  }
}
