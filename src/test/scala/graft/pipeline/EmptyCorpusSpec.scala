package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Degenerate-corpus robustness: every declared document/embedding query
 * must PLAN AND EXECUTE (returning zero or more rows, never throwing) on
 * an empty corpus with the production schema — the shape a pipeline hits
 * on a fresh partition, an all-filtered shard, or a dry backfill window.
 * Catches head()-on-empty, ceil-of-zero, and empty-window edge cases that
 * fixture-sized data never exercises.
 */
class EmptyCorpusSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // events.parquet carries TIMESTAMP(NANOS); read as Long like the mains
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("empty-corpus-spec")
    .getOrCreate()

  private lazy val emptyDir: String = {
    // Builder configs are ignored when another suite created the shared
    // session first (one JVM, getOrCreate); set the nanos conf at runtime
    // so the events.parquet read below works regardless of suite order.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-sf").toString
    val src = "/root/testdata/sf0.001"
    // real schemas, zero rows — the full warehouse
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // every declared query whose only inputs are documents/embeddings
  private val docQueries = Seq(
    "q12_dedup_exact", "q13_ngram_jaccard",
    "q14_minhash_lsh", "q15_simhash_pairs", "q16_text_quality",
    "q17_lang_id", "q18_token_counts", "q19_fingerprint_md5",
    "q20_fingerprint_rolling", "q21_embedding_stats", "q22_cosine_topk",
    "q23_ann_lsh", "q24_frame_samples", "q25_media_features",
    "q33_embedding_neardup", "q33b_neardup_grid", "q34_ann_ivf",
    "q35_tfidf", "q39_heavy_hitters", "q40_dup_clusters",
    "q40b_dup_clusters_logn", "q41_quality_band", "q42_stratified_sample",
    "q43_seq_packing", "q46_repetition", "q47_oov_rate",
    "q48_contamination", "q48b_contamination_bloom", "q49_incremental_dedup",
    "q50_mixture_sample", "q52_lang_percentiles", "q53_bigram_model",
    "q54_repeated_spans", "q55_token_ids", "q59_curation_pipeline",
    "q66_lm_doc_score", "q67_pii_redaction", "q68_embedding_quantize",
    "q69_dataset_split")

  private def assertAllEmpty(names: Seq[String]): Unit = {
    val failures = names.flatMap { name =>
      try {
        val n = graft.SparkEntry.queries(name)(spark, emptyDir).count()
        assert(n == 0L, s"$name returned $n rows from empty input")
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every document query executes on an empty corpus without throwing") {
    assertAllEmpty(docQueries)
  }

  test("every remaining query executes on an empty warehouse without throwing") {
    assertAllEmpty((graft.SparkEntry.queries.keySet -- docQueries).toSeq.sorted)
  }
}
