package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The one-call sweep over every keyed cache family. */
class CachesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("caches-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("clearAll releases every cache family's storage; lazily rebuilt after") {
    // start from a swept state: suites sharing this forked JVM's session
    // may have populated the same (dir-keyed) caches already, which
    // would make the populate step below a no-op against a raw baseline
    Caches.clearAll()
    // baseline: non-graft persists other suites may hold (untouched by
    // clearAll, so constant across this test)
    val before = spark.sparkContext.getPersistentRDDs.size
    // populate three independent families (baskets, shingle index, LM)
    assert(Tables.orderBrandBaskets(spark, sf).count() > 0)
    assert(PipelineQueries.contamination(spark, sf).count() >= 0)
    assert(PipelineQueries.bigramModel(spark, sf).count() >= 0)
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "populating the caches should have persisted storage")
    Caches.clearAll()
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "clearAll must release every graft-owned persisted block")
    // everything re-materializes lazily — a sweep is never a correctness event
    assert(Tables.orderBrandBaskets(spark, sf).count() > 0)
    assert(PipelineQueries.bigramModel(spark, sf).count() >= 0)
    Caches.clearAll()
  }

  test("ANN broadcasts are tracked and swept; a swept plan still executes") {
    import org.apache.spark.sql.functions.col
    Caches.clearAll()
    assert(graft.pipeline.Similarity.liveBroadcastCount == 0)
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.where(col("vec_id") < 10)
    // an IVF query batch creates a centroid broadcast; a PQ batch a
    // codebook + LUT one — each invocation leaks them without the sweep
    val cents = graft.pipeline.Similarity.trainIvfCentroids(
      e, "vec_id", "embedding", numCentroids = 4, sampleSize = 256)
    val ivf = graft.pipeline.Similarity.ivfTopKWithCentroids(
      e, q, "vec_id", "embedding", 5, cents, nProbe = 2)
    assert(ivf.count() > 0)
    assert(graft.pipeline.Similarity.liveBroadcastCount > 0,
      "ANN query batches must register their broadcasts for the sweep")
    Caches.clearAll()
    assert(graft.pipeline.Similarity.liveBroadcastCount == 0,
      "clearAll must sweep the ANN broadcast registry")
    // unpersist (not destroy): the already-built lazy plan still executes
    // (tasks re-fetch the value from the driver) — a sweep is always safe
    assert(ivf.count() > 0)
  }
}
