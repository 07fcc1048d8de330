package graft

import org.apache.spark.sql.SparkSession

/** Merge-count scaling probe for the BPE trainer: times a full training
  * run at each requested merge count over the documents table, printing
  * total seconds and per-merge seconds. Flat (or falling) per-merge cost
  * as the count grows is the contract of BOTH paths now — the
  * delta-maintained in-memory trainer and the delta-maintained
  * distributed rounds (`SPARK_BPE_FORCE_DIST=1` probes the latter; its
  * old re-derive-all formulation showed per-merge cost linear in the
  * count, the signature this probe exists to catch).
  *
  *   sbt "Test/runMain graft.BpeProbe /root/testdata/sf0.1 50 100 250 500"
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(50, 100, 250, 500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "synthetic" instead of a dir: a 60k-distinct-word hex corpus whose
    // pair structure supports thousands of merges — the real sf0.1
    // vocabulary is fully merged after ~89 rounds, too small to probe
    // the merge-count axis
    // "synthetic" = 60k distinct words (below the 100k routing gate —
    // probes the in-memory path, or the distributed one under
    // SPARK_BPE_FORCE_DIST); "synthetic:<rows>" sizes it — e.g.
    // synthetic:60000 yields 120k distinct words, ABOVE the gate, so
    // trainMerges routes distributed naturally
    val docs =
      if (sfDir.startsWith("synthetic")) {
        val rows = sfDir.stripPrefix("synthetic").stripPrefix(":") match {
          case "" => 30000
          case s => s.toInt
        }
        spark.range(rows).selectExpr(
          "concat(md5(cast(id as string)), ' ', md5(cast(id + 7 as string))) AS text")
      } else spark.read.parquet(s"$sfDir/documents.parquet")
    // warm the scan so the first measurement isn't charged for parquet
    // decode + JIT warm-up the others skip
    docs.write.format("noop").mode("overwrite").save()
    // minPairCount = 1 so high merge counts actually train (sf0.1's
    // corpus exhausts >=2-count pairs near 90 merges).
    // SPARK_BPE_FORCE_DIST=1 drives the distributed re-derive-all path
    // on the same dictionary for the quadratic-vs-flat comparison.
    val forceDist = sys.env.get("SPARK_BPE_FORCE_DIST").contains("1")
    counts.foreach { m =>
      graft.pipeline.Bpe.clearCaches()
      val t0 = System.nanoTime()
      val trained =
        if (forceDist) {
          import org.apache.spark.sql.functions._
          val dict = docs
            .select(explode(filter(split(lower(col("text")), " "),
              w => w =!= "")).as("word"))
            .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
            .persist()
          try {
            dict.count()
            graft.pipeline.Bpe.trainDistributed(dict.coalesce(4), m, 1L).size
          } finally dict.unpersist()
        } else graft.pipeline.Bpe.trainMerges(docs, "text", m, 1L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // "auto" follows the 100k-word routing gate (a synthetic:60000
      // dictionary is 120k words -> the distributed path, naturally)
      val mode = if (forceDist) "dist-forced" else "auto"
      println(f"[bpe-probe] mode=$mode merges=$m%5d trained=$trained%5d total=$sec%8.3f s  per-merge=${sec / m * 1000}%8.3f ms")
    }
    spark.stop()
  }
}
