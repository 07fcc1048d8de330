package graft.apps

import graft.sources.TextTransactions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** App-surface parity on the textbook fixture (FIXTURES.md §1). */
class AppsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("apps-spec")
    .getOrCreate()

  private def train = TextTransactions.fromLines(spark,
    Seq("I1 I2 I5", "I2 I4", "I2 I3", "I1 I3", "I4 I2 I5 I1"))
  private def probe = TextTransactions.fromLines(spark,
    Seq("I1", "I2", "I3", "I4", "I5 I2 I3"))

  test("EPFP/PFP/FP variants produce identical rule and prediction sets") {
    val epfp = Apps.run(train, probe, 3, 0.4, 0.6, balanced = true)
    val pfp = Apps.run(train, probe, 3, 0.4, 0.6, balanced = false)
    val fp = Apps.run(train, probe, 1, 0.4, 0.6, balanced = false)
    assert(epfp.rules == pfp.rules)
    assert(pfp.rules == fp.rules)
    assert(epfp.predictions == pfp.predictions)
    assert(pfp.predictions == fp.predictions)
    assert(epfp.rules.nonEmpty && epfp.predictions.size == 5)
    assert(epfp.fitMillis >= 0)
  }

  test("rule lines carry confidence/lift/support in the printed format") {
    val r = Apps.run(train, probe, 2, 0.4, 0.6, balanced = true)
    r.rules.foreach { line =>
      assert(line.matches(""".*=>.*: confidence=\d+\.\d{4}, lift=\d+\.\d{4}, support=\d+\.\d{4}"""),
        line)
    }
  }
}
