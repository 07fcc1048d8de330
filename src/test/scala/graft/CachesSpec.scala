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
}
