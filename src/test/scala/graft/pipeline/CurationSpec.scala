package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators: cluster resolution, band filter, sampling, packing. */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("curation-spec")
    .getOrCreate()

  test("connected components: transitive closure over a chain + isolated pair") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3: needs >1 propagation round), pair 7-8,
    // plus 5 as a doc with no edges at all.
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (8L, 7L)).toDF("d1", "d2")
    val docs = (1L to 8L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = Curation.dupClusters(docs, "doc_id", edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, // one transitive cluster
      5L -> 5L, 6L -> 6L,                     // edge-free docs self-cluster
      7L -> 7L, 8L -> 7L))
  }

  test("connected components: min label wins regardless of edge direction") {
    import spark.implicits._
    val edges = Seq((10L, 2L), (2L, 30L)).toDF("d1", "d2")
    val got = Curation.connectedComponents(edges, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 2L, 2L -> 2L, 30L -> 2L))
  }

  test("alternating CC == min-label CC on chains, stars, and a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 5000 edges: large enough that a per-round sum of uniform 64-bit
    // pair-hashes would overflow Long (the ANSI ARITHMETIC_OVERFLOW that
    // killed q40b in the round-3 bench) — the convergence signature must
    // stay overflow-free (bit_xor) at any edge count.
    val random = (0 until 5000).map(_ =>
      (rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong)).filter(p => p._1 != p._2)
    val cases = Seq(
      Seq((2L, 1L), (2L, 3L), (3L, 4L), (8L, 7L)),
      // 150-node path: min-label needs ~150 rounds, alternating O(log n)
      (1L until 150L).map(i => (i, i + 1)),
      random)
    cases.foreach { edgeSeq =>
      val edges = edgeSeq.toDF("d1", "d2")
      val viaProp = Curation.connectedComponents(edges, "d1", "d2", maxIter = 200)
        .as[(Long, Long)].collect().toMap
      val viaStar = Curation.connectedComponentsAlternating(edges, "d1", "d2")
        .as[(Long, Long)].collect().toMap
      assert(viaStar == viaProp, s"mismatch on ${edgeSeq.take(5)}...")
    }
  }

  test("cluster representatives: longest doc wins, ties to the lowest id") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = graft.PipelineQueries.clusterRepresentatives(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    assert(out.length == docs.size, "every doc gets a cluster row")
    out.groupBy(_._2).foreach { case (cluster, rows) =>
      val repIds = rows.map(_._3).distinct
      assert(repIds.length == 1, s"cluster $cluster has several reps")
      val rep = repIds.head
      // rep = argmax by (n_chars desc, doc_id asc) within the cluster
      val want = rows.map(_._1).minBy(id => (-docs(id), id))
      assert(rep == want, s"cluster $cluster rep $rep != $want")
      rows.foreach { case (id, _, r, keep) => assert(keep == (id == r)) }
    }
    // the corpus has at least one multi-doc cluster whose longest member
    // is NOT the min id (otherwise this row would degenerate to q40)
    val multi = out.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture must contain dup clusters")
  }

  test("quantile band: thresholds are exact order statistics") {
    import spark.implicits._
    // values 1..100, one row each: p05 cut at ceil(.05*100)=5th smallest=5,
    // p95 at 95 -> band [5, 95], 91 rows.
    val df = (1 to 100).map(i => (i.toLong, "x" * i)).toDF("doc_id", "text")
    val got = Curation.quantileBand(df, "doc_id", length(col("text")), 0.05, 0.95)
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(got.length == 91)
    assert(got.head._2 == 5L && got.last._2 == 95L)
  }

  test("grouped quantiles: exact per-group order statistics, matches global form") {
    import spark.implicits._
    // group A: values 1..100 -> p50 = 50, p90 = 90; group B: all equal 7
    val df = ((1 to 100).map(i => ("A", i)) ++ (1 to 10).map(_ => ("B", 7)))
      .toDF("grp", "v")
    val got = Curation.groupedQuantiles(df, "grp", col("v"),
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .as[(String, Long, Long)].collect()
      .map { case (g, a, b) => g -> (a, b) }.toMap
    assert(got == Map("A" -> (50L, 90L), "B" -> (7L, 7L)))
  }

  test("grouped quantiles: decimal-exact thresholds, null measures excluded") {
    import spark.implicits._
    // 100 * 0.07 = 7.000000000000001 in IEEE double -> ceil 8 -> the
    // WRONG (8th) order statistic; the decimal path must return the 7th.
    val df = (1 to 100).map(i => ("A", i)).toDF("grp", "v")
    val got = Curation.groupedQuantiles(df, "grp", col("v"), Seq("p07" -> 0.07))
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 7L))
    // null measures must not shift cumulative counts (Spark sorts nulls
    // first, DuckDB last — excluded on both sides instead)
    val withNulls = ((1 to 10).map(i => ("B", Some(i))) ++
      Seq.fill(5)(("B", None: Option[Int]))).toDF("grp", "v")
    val got2 = Curation.groupedQuantiles(withNulls, "grp", col("v"), Seq("p50" -> 0.5))
      .as[(String, Long)].collect().toMap
    assert(got2 == Map("B" -> 5L)) // ceil(0.5*10)=5th of the 10 non-null
  }

  test("grouped quantiles: differential fuzz vs brute-force order statistics") {
    import spark.implicits._
    // many (p, n) pairs in one Spark job; brute force = the definition:
    // smallest value whose 1-based sorted rank reaches ceil(p * n) exactly
    val rnd = new scala.util.Random(13)
    val data = (0 until 40).flatMap { g =>
      val n = 1 + rnd.nextInt(300)
      (0 until n).map(_ => (s"g$g", rnd.nextInt(50)))
    }
    val ps = Seq("q01" -> 0.01, "q07" -> 0.07, "q33" -> 0.33, "q50" -> 0.5,
      "q90" -> 0.9, "q99" -> 0.99)
    val got = Curation.groupedQuantiles(data.toDF("grp", "v"), "grp", col("v"), ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getLong(i + 1))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(_._2.toLong).sorted
      ps.zipWithIndex.foreach { case ((_, p), i) =>
        val k = (BigDecimal(p.toString) * sorted.length)
          .setScale(0, BigDecimal.RoundingMode.CEILING).toInt
        val expected = sorted(math.max(k, 1) - 1)
        assert(got(g)(i) == expected, s"group $g p=$p n=${sorted.length}")
      }
    }
  }

  test("stratified sample: deterministic, respects per-stratum rates") {
    import spark.implicits._
    val df = (0 until 1000).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "lang")
    val once = Curation.stratifiedSample(df, "doc_id", "lang", Map("en" -> 10), 50)
      .as[(Long, String, Long)].collect().toSet
    val twice = Curation.stratifiedSample(df, "doc_id", "lang", Map("en" -> 10), 50)
      .as[(Long, String, Long)].collect().toSet
    assert(once == twice, "hash-gated sampling must be replayable")
    val byLang = once.groupBy(_._2).view.mapValues(_.size).toMap
    // 500 docs per stratum; md5 buckets are near-uniform: en ~50, de ~250
    assert(byLang("en") > 20 && byLang("en") < 90, s"en=${byLang("en")}")
    assert(byLang("de") > 200 && byLang("de") < 300, s"de=${byLang("de")}")
    assert(once.forall { case (_, l, b) => b < (if (l == "en") 10 else 50) })
  }

  test("mixture sample: rates hit the recipe, clamp at 1, drop unlisted strata") {
    import spark.implicits._
    // three strata, 100 tokens per doc: a (200 docs / 20k tokens),
    // b (50 docs / 5k), c (100 docs / 10k, unlisted)
    val df = ((0 until 200).map(i => (i.toLong, "a", 100L)) ++
      (1000 until 1050).map(i => (i.toLong, "b", 100L)) ++
      (2000 until 2100).map(i => (i.toLong, "c", 100L)))
      .toDF("doc_id", "source", "n_tokens")
    // budget 10k: a's share 50% -> 5k of 20k = rate 250k ppm (partial);
    // b's share 80% -> 8k of 5k = clamps to 1e6 (keeps ALL of b)
    val got = Curation.mixtureSample(df, "doc_id", "source", "n_tokens",
        Map("a" -> 500000L, "b" -> 800000L), budgetTokens = 10000L)
      .select("doc_id", "source", "rate_ppm")
      .as[(Long, String, Long)].collect()
    val rates = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(rates("a") == Set(250000L), s"a rate: ${rates.get("a")}")
    assert(rates("b") == Set(1000000L), s"b rate: ${rates.get("b")}")
    assert(!rates.contains("c"), "unlisted stratum must drop entirely")
    assert(got.count(_._2 == "b") == 50, "clamped stratum keeps every row")
    // partial stratum: md5-uniform ~50 of 200 docs at rate 0.25
    val aKept = got.count(_._2 == "a")
    assert(aKept > 25 && aKept < 75, s"a kept $aKept of 200 at rate 0.25")
    // replayable: the gate is pure hash state
    val again = Curation.mixtureSample(df, "doc_id", "source", "n_tokens",
        Map("a" -> 500000L, "b" -> 800000L), budgetTokens = 10000L)
      .select("doc_id", "source", "rate_ppm")
      .as[(Long, String, Long)].collect()
    assert(got.toSet == again.toSet)
  }

  test("mixture sample: zero-token stratum keeps rows; zero budget keeps none") {
    import spark.implicits._
    val df = Seq((1L, "a", 0L), (2L, "a", 0L), (3L, "b", 10L), (4L, "z", 0L))
      .toDF("doc_id", "source", "n_tokens")
    val zeroTok = Curation.mixtureSample(df, "doc_id", "source", "n_tokens",
        Map("a" -> 500000L, "b" -> 500000L), budgetTokens = 100L)
      .select("doc_id").as[Long].collect().toSet
    // a has 0 tokens -> its share can't be expressed -> keep all of a
    assert(Set(1L, 2L).subsetOf(zeroTok))
    // z is zero-token AND unlisted: weight 0 wins — must still drop
    assert(!zeroTok.contains(4L), "unlisted zero-token stratum must drop")
    val zeroBudget = Curation.mixtureSample(df, "doc_id", "source", "n_tokens",
        Map("b" -> 1000000L), budgetTokens = 0L)
      .where(col("source") === "b").count()
    assert(zeroBudget == 0, "zero budget must keep nothing from token-bearing strata")
  }

  test("leakage-safe split: cluster members share a split; no pairs == datasetSplit") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => Tuple1(i)).toDF("doc_id")
    // two transitive chains (0~1, 1~2) and (10~11), rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("d1", "d2")
    val got = Curation.leakageSafeSplit(docs, "doc_id", pairs,
        valPct = 30, testPct = 30)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(got.length == 60, "split must cover every doc exactly once")
    val bySplit = got.map(r => r._1 -> r._3).toMap
    // transitive: 0,1,2 share a split even though (0,2) was never a pair
    assert(Set(bySplit(0L), bySplit(1L), bySplit(2L)).size == 1)
    assert(bySplit(10L) == bySplit(11L))
    // cluster ids are the canonical minimum; singletons cluster to self
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId(2L) == 0L && byId(11L) == 10L && byId(42L) == 42L)
    // with no edges, degenerates to exactly the doc-keyed datasetSplit
    val noPairs = Curation.leakageSafeSplit(docs, "doc_id",
        Seq.empty[(Long, Long)].toDF("d1", "d2"), valPct = 30, testPct = 30)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val plain = Curation.datasetSplit(docs, "doc_id", valPct = 30, testPct = 30)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(noPairs == plain)
  }

  test("sequence packing: offsets contiguous per shard, chunk = offset div budget") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "w " * 300), (2L, "a", "w " * 300), (3L, "a", "w " * 100),
      (4L, "b", "w " * 600)).toDF("doc_id", "lang", "text")
    val got = Curation.packSequences(df, "doc_id", "text", "lang", budget = 512L)
      .select("doc_id", "n_tokens", "start_offset", "chunk_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 300L, 0L, 0L),    // starts chunk 0
      (2L, 300L, 300L, 0L),  // first token at 300 < 512 -> chunk 0
      (3L, 100L, 600L, 1L),  // starts at 600 -> chunk 1
      (4L, 600L, 0L, 0L)))   // shard b packs independently from offset 0
  }

  test("chunking: stride windows, short tail, sub-window doc, empty doc") {
    import spark.implicits._
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b"),                            // shorter than one window
      (3L, "   ")                             // no tokens -> no chunks
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocuments(df, "doc_id", "text", window = 4, stride = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),   // overlap of window-stride = 1 token
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (1L, 3L, 1L, "t10"),           // short tail window
      (2L, 0L, 2L, "a b")))
  }

  test("chunking with stride == window partitions every doc exactly") {
    import spark.implicits._
    val docs = Seq.tabulate(20) { i =>
      (i.toLong, Seq.tabulate(i * 3 + 1)(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val got = Curation.chunkDocuments(docs, "doc_id", "text", window = 7, stride = 7)
      .as[(Long, Long, Long, String)].collect()
    // non-overlapping chunks reassemble each document verbatim
    val rebuilt = got.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._4).mkString(" ")).toMap
    val expect = docs.as[(Long, String)].collect().toMap
    assert(rebuilt == expect)
    // and token counts sum to the doc length
    val sums = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(sums == expect.view.mapValues(_.split(' ').count(_.nonEmpty).toLong).toMap)
  }

  test("dataset split: disjoint+complete, growth-stable, salt-keyed") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Curation.datasetSplit(docs, "doc_id", valPct = 10, testPct = 10)
      .as[(Long, Long, String)].collect()
    assert(got.length == 1000 && got.map(_._1).distinct.length == 1000)
    val bySplit = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("val") > 50 && bySplit("val") < 150, bySplit)   // ~100 expected
    assert(bySplit("test") > 50 && bySplit("test") < 150, bySplit)
    // growth stability: a document's split never changes as the corpus grows
    val full = got.map(r => r._1 -> r._3).toMap
    val half = Curation.datasetSplit(
        docs.where($"doc_id" <= 500), "doc_id", valPct = 10, testPct = 10)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(half.forall { case (k, v) => full(k) == v })
    // a different salt keys an independent experiment
    val salted = Curation.datasetSplit(docs, "doc_id", 10, 10, salt = "exp2")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(salted != full)
  }

  test("snapshot diff: added/removed/changed/unchanged, null-safe content compare") {
    import spark.implicits._
    val old = Seq(
      (1L, "same text"), (2L, "will change"), (3L, "gone in new"),
      (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "Same   TEXT "),     // normalizes equal -> unchanged
      (2L, "has changed"),      // fingerprint differs -> changed
      (4L, "brand new"),        // new only -> added
      (5L, null.asInstanceOf[String]), // null both sides -> unchanged
      (6L, "now has text")      // null -> text -> changed
    ).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "changed"))
  }

  test("incremental word count == direct recompute; vanished words drop") {
    import spark.implicits._
    val old = Seq(
      (1L, "alpha beta beta"),      // unchanged
      (2L, "gamma delta"),          // changed below
      (3L, "unique vanishing word") // removed: its words must net out
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "alpha beta beta"),
      (2L, "gamma epsilon"),        // delta -> epsilon
      (4L, "alpha zeta")            // added
    ).toDF("doc_id", "text")
    val got = Curation.incrementalWordCount(old, neu, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    val direct = neu
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap
    assert(got == direct)
    // the removed doc's words are GONE, not zero-count rows
    assert(!got.contains("vanishing") && !got.contains("delta"))
    assert(got("alpha") == 2L && got("epsilon") == 1L)
  }

  test("dupClusters shares one CC run per edge plan; cached == uncached labels") {
    import spark.implicits._
    val sc = spark.sparkContext
    Curation.clearCheckpoints()
    def edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    def docs = (1L to 12L).map(Tuple1(_)).toDF("doc_id")
    val first = Curation.dupClusters(docs, "doc_id", edges)
    first.count() // materializes the (checkpointed) CC labels
    val stored = sc.getPersistentRDDs.keySet
    // q89's shape: same edge plan through leakageSafeSplit — the CC half
    // must come from the cache, not a second propagation run
    val split = Curation.leakageSafeSplit(docs, "doc_id", edges,
      valPct = 10, testPct = 10)
    val splitRows = split.as[(Long, Long, Long, String)].collect()
    assert(sc.getPersistentRDDs.keySet == stored,
      "the shared edge plan must reuse the cached CC labels, not re-run CC")
    // cached labels == an uncached run's labels (equality vs the
    // uncached path), and the gate respects them cluster-wise
    val uncached = Curation.connectedComponents(edges, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    val firstMap = first.as[(Long, Long)].collect().toMap
    assert(firstMap == uncached.map(identity) ++
      (1L to 12L).filterNot(uncached.contains).map(i => i -> i).toMap)
    val byCluster = splitRows.groupBy(_._2).values
    assert(byCluster.forall(rows => rows.map(_._4).distinct.length == 1),
      "cluster members must share a split")
    Curation.clearCheckpoints()
  }

  test("repeated CC runs + clearCheckpoints leave zero net storage growth") {
    import spark.implicits._
    val sc = spark.sparkContext
    // returned frames are kept strongly referenced until after the sweep:
    // the registry is intentionally WEAK (dropped frames stay reclaimable
    // by the ContextCleaner), so the deterministic-sweep contract is over
    // frames the caller still holds
    def run(): Seq[org.apache.spark.sql.DataFrame] = {
      val rnd = new scala.util.Random(3)
      val edges = Seq.tabulate(200)(_ =>
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).toDF("d1", "d2")
      val a = Curation.connectedComponents(edges, "d1", "d2")
      val b = Curation.connectedComponentsAlternating(edges, "d1", "d2")
      a.count(); b.count()
      Seq(a, b)
    }
    // first run + sweep establishes the baseline (shared session caches
    // from other suites persist across — only GROWTH is the leak signal)
    val warm = run()
    Curation.clearCheckpoints()
    val base = sc.getPersistentRDDs.keySet
    val frames = (1 to 3).flatMap(_ => run())
    Curation.clearCheckpoints()
    val leaked = sc.getPersistentRDDs.keySet -- base
    assert(leaked.isEmpty,
      s"${leaked.size} persistent RDDs leaked after sweep: ${leaked.take(5)}")
    assert(warm.size + frames.size == 8) // keeps the frames live past the sweep
  }

  test("histogramDrift: buckets, one-sided buckets, planted drift flag") {
    import spark.implicits._
    // width 10, 3 buckets (last open): old = 4x[0], 4x[1]; new = 4x[0],
    // 4x[2-open] (incl. an overflow value 95 clamped into bucket 2)
    val old = Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L).toDF("v")
    val neu = Seq(5L, 6L, 7L, 8L, 21L, 22L, 23L, 95L).toDF("v")
    val got = Curation.histogramDrift(old, neu, "v", 10L, 3, 0.3)
      .select($"bucket", $"c_old", $"c_new", $"share_old", $"share_new",
        $"drifted")
      .as[(Long, Long, Long, Double, Double, Boolean)].collect()
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 4L, 4L, 0.5, 0.5, false),
      (1L, 4L, 0L, 0.5, 0.0, true),
      (2L, 0L, 4L, 0.0, 0.5, true)))
  }

  test("histogramDrift: identical sides show zero drift everywhere") {
    import spark.implicits._
    val df = (1L to 200L).toDF("v")
    val got = Curation.histogramDrift(df, df, "v", 25L, 5, 0.0001)
      .select($"share_delta_abs", $"drifted").as[(Double, Boolean)].collect()
    assert(got.nonEmpty && got.forall(r => r._1 == 0.0 && !r._2))
  }

  test("mergeComponents: delta fold == full recompute on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val nodes = (1L to 40L)
      val oldPairs = (1 to 25).map(_ =>
        (nodes(rnd.nextInt(30)), nodes(rnd.nextInt(30)))).filter(p => p._1 != p._2)
      // delta touches new nodes (31..40) AND bridges old clusters
      val deltaPairs = ((1 to 10).map(_ =>
        (nodes(30 + rnd.nextInt(10)), nodes(rnd.nextInt(40)))) ++
        (1 to 4).map(_ => (nodes(rnd.nextInt(30)), nodes(rnd.nextInt(30)))))
        .filter(p => p._1 != p._2)
      val oldDocs = (1L to 30L).toDF("doc_id")
      val stored = Curation.dupClusters(oldDocs, "doc_id",
          oldPairs.toDF("d1", "d2"))
        .select($"doc_id".as("node"), $"cluster_id")
      val merged = Curation.mergeComponents(stored, deltaPairs.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      val fullDocs = (1L to 30L).map(i => i) ++
        deltaPairs.flatMap(p => Seq(p._1, p._2)).filter(_ > 30L).distinct
      val full = Curation.dupClusters(fullDocs.distinct.toDF("doc_id"), "doc_id",
          (oldPairs ++ deltaPairs).toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      assert(merged == full,
        s"trial $trial: delta fold must equal full recompute")
    }
  }

  test("mergeComponents: three sequential delta folds == one full recompute") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    def randPairs(n: Int, lo: Long, hi: Long) = (1 to n).map { _ =>
      (lo + rnd.nextInt((hi - lo).toInt), lo + rnd.nextInt((hi - lo).toInt))
    }.filter(p => p._1 != p._2)
    val base = randPairs(20, 1L, 25L)
    val deltas = Seq(randPairs(8, 1L, 35L), randPairs(8, 10L, 45L),
      randPairs(8, 1L, 50L))
    var artifact = Curation.dupClusters((1L to 25L).toDF("doc_id"), "doc_id",
        base.toDF("d1", "d2"))
      .select($"doc_id".as("node"), $"cluster_id")
    for (delta <- deltas)
      artifact = Curation.mergeComponents(artifact, delta.toDF("d1", "d2"))
    val got = artifact.as[(Long, Long)].collect().toMap
    val allPairs = base ++ deltas.flatten
    val allNodes = ((1L to 25L) ++ allPairs.flatMap(p => Seq(p._1, p._2)))
      .distinct
    val full = Curation.dupClusters(allNodes.toDF("doc_id"), "doc_id",
        allPairs.toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(got == full,
      "repeated O(delta) folds must compose to the full recompute — " +
        "the amortized-maintenance claim")
  }

  test("mergeComponents: empty delta is the identity; bridge merges relabel") {
    import spark.implicits._
    val stored = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("node", "cluster_id")
    val noop = Curation.mergeComponents(stored,
        Seq.empty[(Long, Long)].toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(noop == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L))
    // one bridge pair merges clusters {1,2} and {3,4} under min id 1
    val bridged = Curation.mergeComponents(stored,
        Seq((2L, 4L)).toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(bridged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L))
    // a pair inside one cluster changes nothing
    val internal = Curation.mergeComponents(stored,
        Seq((3L, 4L)).toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(internal == noop)
  }

  test("histogramDrift: an empty side yields zero shares, never NaN") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("v")
    val neu = Seq(1L, 2L, 11L, 12L).toDF("v")
    val got = Curation.histogramDrift(empty, neu, "v", 10L, 3, 0.3)
      .select($"bucket", $"share_old", $"share_new", $"share_delta_abs",
        $"drifted")
      .as[(Long, Double, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(got.forall(r => !r._2.isNaN && !r._3.isNaN && !r._4.isNaN),
      "0/0 must not surface as NaN (Spark orders NaN above any threshold)")
    assert(got.toSeq == Seq(
      (0L, 0.0, 0.5, 0.5, true),
      (1L, 0.0, 0.5, 0.5, true)))
    assert(Curation.histogramDrift(empty, empty, "v", 10L, 3, 0.3)
      .count() == 0L, "two empty sides have no buckets, not a NaN table")
  }

  test("rendezvous routing: a null key routes to a NULL shard") {
    import spark.implicits._
    val ids = Seq(Some("a"), Some("b"), None).toDF("k")
    val got = Curation.rendezvousShard(ids, "k", 8)
      .as[(Option[String], Option[Int])].collect().toMap
    assert(got(Some("a")).isDefined && got(Some("b")).isDefined)
    assert(got(None).isEmpty,
      "a null key must not silently co-locate on a concrete shard " +
        "(concat_ws skips nulls; SQL || null-propagates)")
  }

  test("rendezvous routing: only keys the new shard wins ever move") {
    import spark.implicits._
    val ids = (1L to 3000L).toDF("k")
    val r8 = Curation.rendezvousShard(ids, "k", 8, shardCol = "s8")
    val both = Curation.rendezvousShard(r8, "k", 9, shardCol = "s9")
      .as[(Long, Int, Int)].collect()
    assert(both.forall { case (_, s8, s9) => s8 == s9 || s9 == 8 },
      "HRW: a surviving shard's weight is unchanged, so moves only go " +
        "to the new shard")
    val movedFrac = both.count(r => r._2 != r._3).toDouble / both.length
    assert(movedFrac > 0.06 && movedFrac < 0.17,
      s"moved fraction $movedFrac should sit near 1/9")
    assert(both.map(_._2).forall(s => s >= 0 && s < 8))
  }

  test("rendezvous routing is partition-invariant and salt-keyed") {
    import spark.implicits._
    val ids = (1L to 500L).toDF("k")
    def route(parts: Int, salt: String) =
      Curation.rendezvousShard(ids.repartition(parts), "k", 8, salt)
        .as[(Long, Int)].collect().toMap
    assert(route(1, "") == route(7, ""))
    assert(route(3, "") != route(3, "x"),
      "a different salt draws a different ring")
  }

  test("exactKSample: exact quota per stratum, short strata kept whole") {
    import spark.implicits._
    val df = ((1L to 20L).map(i => (i, "big")) ++
      Seq((100L, "small"), (101L, "small"))).toDF("doc_id", "source")
    val got = Curation.exactKSample(df, "source", "doc_id", k = 5)
      .select($"source", $"doc_id").as[(String, Long)].collect()
    val bySrc = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc == Map("big" -> 5, "small" -> 2),
      "exactly k from the big stratum, all of the short one")
  }

  test("exactKSample is replayable and partition-invariant; salts differ") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    def ids(parts: Int, salt: String) = Curation.exactKSample(
        df.repartition(parts), "source", "doc_id", 7, salt)
      .select($"doc_id", $"rk").as[(Long, Long)].collect().toSet
    assert(ids(1, "") == ids(11, ""), "same sample at any parallelism")
    assert(ids(3, "") != ids(3, "x"),
      "a different salt draws a different sample")
  }

  test("stream-maintained exact-k sample == one-pass batch, any order, evicts") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val (half1, half2) = all.splitAt(30)
    val k = 3
    val batchRef = Curation.exactKSample(
        all.toDF("doc_id", "source"), "source", "doc_id", k)
      .as[(String, Long, String, Long)].collect().toSet

    def run(first: Seq[(Long, String)], second: Seq[(Long, String)],
        tag: String): (Set[(String, Long, String, Long)], Set[(String, Long, String, Long)]) = {
      val dir = java.nio.file.Files.createTempDirectory(s"ekstream-$tag")
      val art = dir.resolve("sample")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[(Long, String)]
      val q = source.toDS().toDF("doc_id", "source").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          Curation.exactKSampleMaintain(spark, art, batch,
            "source", "doc_id", k, batchId = id)
          ()
        }
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .start()
      try {
        source.addData(first)
        q.processAllAvailable()
        val mid = spark.read.parquet(art.toString)
          .as[(String, Long, String, Long)].collect().toSet
        source.addData(second)
        q.processAllAvailable()
        val fin = spark.read.parquet(art.toString)
          .as[(String, Long, String, Long)].collect().toSet
        (mid, fin)
      } finally q.stop()
    }

    val (mid12, fin12) = run(half1, half2, "fwd")
    val (_, fin21) = run(half2, half1, "rev")
    assert(fin12 == batchRef, "streamed sample must equal one-pass batch")
    assert(fin21 == batchRef, "arrival order must not matter")
    assert((mid12 -- fin12).nonEmpty,
      "a later-arriving smaller key must EVICT a first-batch rank-k row")
    assert(mid12 == Curation.exactKSample(
        half1.toDF("doc_id", "source"), "source", "doc_id", k)
      .as[(String, Long, String, Long)].collect().toSet,
      "after one batch the artifact is that batch's exact sample")
  }

  test("exactKSample ranks are contiguous from 1 within each stratum") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, "s")).toDF("doc_id", "source")
    val rks = Curation.exactKSample(df, "source", "doc_id", 10)
      .select($"rk").as[Long].collect().sorted
    assert(rks.toSeq == (1L to 10L))
  }

  test("stripFrequentChunks: hot chunks drop, order holds, dead doc stays") {
    import spark.implicits._
    // chunk = 3: "a b c" occurs in docs 1-4 (hot at minDocs = 4);
    // "x y z" occurs in docs 1-3 only (kept). Doc 4 is ONLY the hot
    // chunk, so it must survive as an auditable empty row; doc 6 has no
    // tokens at all and produces no row.
    val docs = Seq(
      (1L, "a b c x y z p q r"),
      (2L, "x y z a b c"),
      (3L, "q q q a b c x y z"),
      (4L, "a b c"),
      (5L, "u v w"),
      (6L, "")).toDF("doc_id", "text")
    val got = Curation
      .stripFrequentChunks(docs, "doc_id", "text", chunk = 3, minDocs = 4L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((3L, 1L, "x y z p q r")),
      2L -> ((2L, 1L, "x y z")),
      3L -> ((3L, 1L, "q q q x y z")),
      4L -> ((1L, 1L, "")),
      5L -> ((1L, 0L, "u v w"))))
  }

  test("stripFrequentChunks: no-drop reassembly is the identity; minDocs too low kills all") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 40L).map { i =>
      val n = rnd.nextInt(10)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val tokenized = concat_ws(" ",
      filter(split(lower(col("text")), " "), t => t =!= ""))
    val keepAll = Curation
      .stripFrequentChunks(docs, "doc_id", "text", chunk = 3,
        minDocs = Long.MaxValue)
    assert(keepAll.join(docs, "doc_id")
      .where(col("clean_text") =!= tokenized || col("n_dropped") =!= 0L)
      .count() == 0L, "with an unreachable threshold, reassembly must be identity")
    assert(keepAll.count() ==
      docs.where(size(filter(split(lower(col("text")), " "),
        t => t =!= "")) > 0).count())
    val killAll = Curation
      .stripFrequentChunks(docs, "doc_id", "text", chunk = 3, minDocs = 1L)
    assert(killAll
      .where(col("clean_text") =!= "" || col("n_dropped") =!= col("n_chunks"))
      .count() == 0L, "every chunk occurs in >= 1 doc, so all must drop")
  }

  test("chunkCounts: disjoint-batch merge == full recompute; artifact round trip") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (1L to 60L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    def counts(df: org.apache.spark.sql.DataFrame) =
      Curation.chunkCounts(df, "doc_id", "text", chunk = 2)
    val full = counts(docs).as[(String, Long)].collect().toMap
    // three disjoint batches folded in two merges, one through parquet
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-spec")
    try {
      Curation.saveChunkCounts(counts(docs.where($"doc_id" % 3 === 0)),
        dir.toString)
      val merged = Curation.mergeChunkCounts(
        Curation.mergeChunkCounts(
          Curation.loadChunkCounts(spark, dir.toString),
          counts(docs.where($"doc_id" % 3 === 1))),
        counts(docs.where($"doc_id" % 3 === 2)))
      assert(merged.as[(String, Long)].collect().toMap == full,
        "additive fold over a corpus partition must equal one-pass counts")
    } finally graft.Fs.deleteRecursively(dir)
    // serving from the full table == the self-counting strip
    val viaCounts = Curation.stripWithChunkCounts(docs, counts(docs),
      "doc_id", "text", chunk = 2, minDocs = 3L)
      .as[(Long, Long, Long, String)].collect().toSet
    val direct = Curation.stripFrequentChunks(docs, "doc_id", "text",
      chunk = 2, minDocs = 3L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(viaCounts == direct)
  }

  test("stripWithChunkCounts: a chunk missing from a stale artifact is kept") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b x y")).toDF("doc_id", "text")
    // stale artifact knows only "a b" (hot); "c d" / "x y" are absent ->
    // count 0 -> kept, never invented as hot
    val stale = Seq(("a b", 5L)).toDF("chunk_text", "n_docs")
    val got = Curation.stripWithChunkCounts(docs, stale, "doc_id", "text",
      chunk = 2, minDocs = 3L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((2L, 1L, "c d")), 2L -> ((2L, 1L, "x y"))))
  }

  test("epochShuffleOrder: complete cover, contiguous positions, epochs differ") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    val got = Curation.epochShuffleOrder(docs, "doc_id", epochs = 3,
      numShards = 4)
    val rows = got.as[(Long, Long, Long, Long)].collect()
    // every doc appears exactly once per epoch, shards in range
    assert(rows.length == 600)
    assert(rows.groupBy(r => (r._1, r._2)).forall(_._2.length == 1))
    assert(rows.forall(r => r._3 >= 0 && r._3 < 4))
    // positions contiguous from 1 within each (epoch, shard)
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq == (1L to g.length))
    }
    // epochs produce genuinely different orders (and different shards
    // for at least some docs)
    val byEpoch = rows.groupBy(_._2).map { case (e, g) =>
      e -> g.sortBy(r => (r._3, r._4)).map(_._1).toSeq
    }
    assert(byEpoch(0L) != byEpoch(1L) && byEpoch(1L) != byEpoch(2L))
    // deterministic under repartitioning
    val re = Curation.epochShuffleOrder(docs.repartition(7), "doc_id",
      epochs = 3, numShards = 4).as[(Long, Long, Long, Long)].collect()
    assert(re.toSet == rows.toSet)
  }

  test("lengthBucketedBatches: hand-checked batches, zero padding when uniform") {
    import spark.implicits._
    // bucket width 4, batch size 2. Lengths: 5,5,6,7 land in bucket 1;
    // 2,3 in bucket 0; 9 alone in bucket 2.
    def doc(i: Long, n: Int) = (i, Seq.fill(n)("w").mkString(" "))
    val docs = Seq(doc(1, 5), doc(2, 5), doc(3, 6), doc(4, 7),
      doc(5, 2), doc(6, 3), doc(7, 9), (8L, "")).toDF("doc_id", "text")
    val got = Curation
      .lengthBucketedBatches(docs, "doc_id", "text", bucketWidth = 4,
        batchSize = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == Map(
      // bucket 1, longest first: 7,6 | 5,5 — second batch pads nothing
      (1L, 0L) -> ((2L, 7L, 13L, 1L)),
      (1L, 1L) -> ((2L, 5L, 10L, 0L)),
      // bucket 0: 3,2 in one batch, one pad token
      (0L, 0L) -> ((2L, 3L, 5L, 1L)),
      // bucket 2: a single doc batch pads nothing
      (2L, 0L) -> ((1L, 9L, 9L, 0L))))
    // empty doc contributes nowhere
    assert(got.values.map(_._1).sum == 7L)
  }

  test("lengthBucketedBatches: batches full except the bucket tail, padding bounded") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val docs = (1L to 300L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(96))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Curation
      .lengthBucketedBatches(docs, "doc_id", "text", bucketWidth = 16,
        batchSize = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      // within a bucket only the LAST batch may be short
      val last = g.map(_._2).max
      g.foreach { r =>
        if (r._2 != last) assert(r._3 == 8L, s"non-tail batch short: $r")
      }
    }
    rows.foreach { r =>
      assert(r._6 >= 0L && r._6 <= r._3 * 15L,
        s"padding must stay under n * (bucketWidth - 1): $r")
    }
    assert(rows.map(_._3).sum == 300L)
  }

  test("poissonBootstrapCI: deterministic, ordered band, exact point estimate") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 100L + rnd.nextInt(900)))
      .toDF("doc_id", "lang", "n_chars")
    def run() = Curation
      .poissonBootstrapCI(df, "doc_id", "lang", "n_chars", replicas = 16)
      .as[(String, Long, Option[Double], Option[Double], Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val a = run()
    assert(a == run(), "hash-gated draws must be bit-identical across runs")
    a.foreach { case (lang, (n, lo, hi, mean)) =>
      assert(n == 16L, s"$lang: all replicas must survive on a 200-row stratum")
      assert(lo.get <= hi.get && lo.get > 0 && hi.get < 1000)
      val exact = df.where($"lang" === lang)
        .agg((sum($"n_chars") / count(lit(1))).as("m"))
        .as[Double].head()
      assert(mean == exact, s"$lang point estimate must be the exact mean")
    }
  }

  test("poissonBootstrapCI: constant stratum collapses the band; tiny stratum guards") {
    import spark.implicits._
    val df = ((1L to 50L).map(i => (i, "const", 7L)) :+ ((99L, "one", 5L)))
      .toDF("doc_id", "lang", "n_chars")
    val got = Curation
      .poissonBootstrapCI(df, "doc_id", "lang", "n_chars", replicas = 8)
      .as[(String, Long, Option[Double], Option[Double], Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val (nc, loC, hiC, meanC) = got("const")
    assert(nc == 8L && loC.contains(7.0) && hiC.contains(7.0) && meanC == 7.0)
    val (n1, lo1, hi1, mean1) = got("one")
    // a single-row stratum draws w = 0 on ~37% of replicas; every
    // surviving replica mean is exactly 5.0, and the band is null
    // whenever fewer than 3 replicas survive
    assert(n1 <= 8L && mean1 == 5.0)
    if (n1 >= 3) assert(lo1.contains(5.0) && hi1.contains(5.0))
    else assert(lo1.isEmpty && hi1.isEmpty)
  }

  /** Driver-side reference for [[Curation.prioritySample]] priorities:
    * the same md5(prio<salt>:id) 13-hex-char uniform and two-division
    * chain. */
  private def referencePriority(id: Long, w: Long, salt: String = ""): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"prio$salt:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370496.0
    w.toDouble / u
  }

  test("prioritySample: top-k by the driver-reference priorities, any parallelism") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, (i % 37) + 1L)) // weights 1..37
    val expect = rows
      .map { case (id, w) => (id, w, referencePriority(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }.take(50)
      .map { case (id, w, p) => (id, w, p) }
    def run(parts: Int) = Curation.prioritySample(
        rows.toDF("doc_id", "w").repartition(parts), "doc_id", "w", k = 50)
      .select($"doc_id", $"w", $"priority").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(run(1).toSeq.sortBy(_._1) == expect.sortBy(_._1))
    assert(run(11).toSeq.sortBy(_._1) == expect.sortBy(_._1))
    // tau is the (k+1)-th reference priority, on every row
    val tau = Curation.prioritySample(
        rows.toDF("doc_id", "w"), "doc_id", "w", k = 50)
      .select($"tau").distinct().as[Double].collect()
    val refTau = rows.map { case (id, w) => (id, referencePriority(id, w)) }
      .sortBy { case (id, p) => (-p, id) }.apply(50)._2
    assert(tau.toSeq == Seq(refTau))
  }

  test("prioritySample: corpus <= k is exact (tau = 0, w_est = w); w <= 0 excluded") {
    import spark.implicits._
    val rows = Seq((1L, 5L), (2L, 9L), (3L, 0L), (4L, -2L)).toDF("doc_id", "w")
    val got = Curation.prioritySample(rows, "doc_id", "w", k = 10)
      .select($"doc_id", $"w", $"tau", $"w_est")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // zero/negative weight out
    assert(got.forall(r => r._3 == 0.0 && r._4 == r._2.toDouble))
  }

  test("prioritySampleMaintain: any batching == one-pass sample, tau included") {
    import spark.implicits._
    val rows = (1L to 800L).map(i => (i, (i % 53) + 1L))
    val onePass = Curation.prioritySample(
        rows.toDF("doc_id", "w"), "doc_id", "w", k = 40)
      .as[(Long, Long, Double, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // three different batchings, including one that forces eviction (the
    // high-priority rows arriving LAST must displace stored rank-k rows)
    val batchings = Seq(
      Seq(rows),
      Seq(rows.take(400), rows.drop(400)),
      Seq(rows.drop(100), rows.take(100), Seq.empty))
    batchings.zipWithIndex.foreach { case (batches, bi) =>
      val dir = java.nio.file.Files.createTempDirectory(s"prio-maint-$bi")
        .resolve("sample")
      batches.zipWithIndex.foreach { case (b, id) =>
        Curation.prioritySampleMaintain(spark, dir,
          b.toDF("doc_id", "w"), "doc_id", "w", k = 40, batchId = id.toLong)
      }
      val served = Curation.finishPrioritySample(
          spark.read.parquet(dir.toString), "doc_id", "w", k = 40)
        .as[(Long, Long, Double, Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(served == onePass, s"batching $bi diverged")
    }
  }

  test("mixtureInterleave: hand pattern, prefix proportionality, weight guard") {
    import spark.implicits._
    // w(a)=2, w(b)=1, lcm 2, one shard: v_a = i, v_b = 2i ->
    // reading order a a b a a b ... regardless of which doc lands at
    // which within-source rank
    val docs = ((1L to 4L).map(i => (i, "a")) ++ (5L to 6L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val weight = when(col("source") === "a", 2).otherwise(1)
    val pattern = Curation.mixtureInterleave(
        docs, "doc_id", "source", weight, lcm = 2, numShards = 1)
      .orderBy(col("pos")).select(col("source")).as[String].collect().toSeq
    assert(pattern == Seq("a", "a", "b", "a", "a", "b"))

    // equal-size sources with weights 1/2/3: every prefix of the shard
    // order keeps each source within a small lag of its weight share
    val big = (1L to 600L).map { i =>
      (i, Seq("s1", "s2", "s3")((i % 3).toInt))
    }.toDF("doc_id", "source")
    val w3 = when(col("source") === "s1", 1)
      .when(col("source") === "s2", 2).otherwise(3)
    val order = Curation.mixtureInterleave(
        big, "doc_id", "source", w3, lcm = 6, numShards = 1)
      .orderBy(col("pos")).select(col("source")).as[String].collect()
    val wMap = Map("s1" -> 1.0, "s2" -> 2.0, "s3" -> 3.0)
    val seen = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    order.zipWithIndex.foreach { case (src, idx) =>
      seen(src) += 1
      val t = idx + 1
      // once any source runs dry (200 docs each; s3 first, ~t=400) the
      // survivors absorb its slots — proportionality is only promised
      // while every source still has documents
      if (wMap.keys.forall(s => seen(s) < 200)) {
        wMap.foreach { case (s, w) =>
          val expect = t * w / 6.0
          assert(math.abs(seen(s) - expect) <= 4.0,
            s"prefix $t: $s served ${seen(s)}, expected ~$expect")
        }
      }
    }

    // a weight that does not divide lcm fails loudly
    val bad = intercept[Exception] {
      Curation.mixtureInterleave(docs, "doc_id", "source",
        when(col("source") === "a", 4).otherwise(1), lcm = 6, numShards = 1)
        .collect()
    }
    assert(bad.getMessage != null)
  }

  test("rrfFuse: hand ranks, consensus wins, per-group independence, topK") {
    import spark.implicits._
    // group g: s1 ranks d1,d2,d3; s2 ranks d2,d3,d1 ->
    // rrf(d2) = 1/62 + 1/61 beats rrf(d1) = 1/61 + 1/63 (consensus
    // runner-up beats a single-signal winner)
    val df = Seq(
      ("g", 1L, 30.0, 5.0), ("g", 2L, 20.0, 9.0), ("g", 3L, 10.0, 7.0),
      ("h", 7L, 1.0, 1.0), ("h", 8L, 2.0, 2.0)
    ).toDF("grp", "id", "s1", "s2")
    val got = Curation.rrfFuse(df, "grp", "id",
        Seq("a" -> col("s1"), "b" -> col("s2")), topK = 2)
      .as[(String, Long, Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._6) -> ((r._2, r._3, r._4, r._5))).toMap
    val (d2, r2a, r2b, rrf2) = (got(("g", 1L))._1, got(("g", 1L))._2,
      got(("g", 1L))._3, got(("g", 1L))._4)
    assert(d2 == 2L && r2a == 2L && r2b == 1L)
    assert(rrf2 == 1.0 / 62.0 + 1.0 / 61.0)
    assert(got(("g", 2L))._1 == 1L)            // d1 fused second
    assert(!got.contains(("g", 3L)))           // topK = 2 drops d3
    assert(got(("h", 1L))._1 == 8L)            // group h fuses on its own
  }

  test("waterFillBudget: hand waterline, defining inequality, full-budget identity") {
    import spark.implicits._
    // supplies 10/20/100, budget 3/5 of 130 = 78: the line lands in
    // [20, 100): 10 + 20 + W <= 78 -> W* = 48, allocations 10/20/48
    val sup = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("g", "s")
    val got = Curation.waterFillBudget(sup, "g", "s", 3, 5)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") == ((10L, 10L, 48L, 78L)))
    assert(got("b") == ((20L, 20L, 48L, 78L)))
    assert(got("c") == ((100L, 48L, 48L, 78L)))

    // defining inequality on random supplies: A(W*) <= B < A(W* + 1)
    val rnd = new scala.util.Random(31)
    (1 to 5).foreach { trial =>
      val sizes = (1 to 12).map(i => (s"g$i", rnd.nextInt(5000).toLong + 1L))
      val out = Curation.waterFillBudget(sizes.toDF("g", "s"), "g", "s", 1, 3)
        .as[(String, Long, Long, Long, Long)].collect()
      val (wl, b) = (out.head._4, out.head._5)
      def a(wCap: Long) = sizes.map { case (_, s) => math.min(s, wCap) }.sum
      assert(a(wl) <= b, s"trial $trial: A(W*) over budget")
      if (wl < sizes.map(_._2).max)
        assert(a(wl + 1) > b, s"trial $trial: W* not maximal")
      assert(out.forall(r => r._3 == math.min(r._2, wl)))
    }

    // budget >= total supply: everyone keeps everything
    val full = Curation.waterFillBudget(sup, "g", "s", 1, 1)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(full.forall(r => r._3 == r._2))
  }

  test("prioritySample: sum of w_est estimates total weight within the band") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1L to 4000L).map(i => (i, rnd.nextInt(1000).toLong + 1L))
    val total = rows.map(_._2).sum.toDouble
    val est = Curation.prioritySample(
        rows.toDF("doc_id", "w"), "doc_id", "w", k = 150)
      .agg(sum($"w_est")).as[Double].head()
    // priority sampling's relative error at k=150 is ~1/sqrt(k-1) = 8.2%;
    // 4x band for a single draw
    assert(math.abs(est - total) / total <= 0.33, s"est $est vs total $total")
  }
}
