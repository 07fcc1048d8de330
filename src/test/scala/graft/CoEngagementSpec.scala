package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Item co-engagement: hand fixture, naive-join differential, floor,
  * duplicate-event collapse. */
class CoEngagementSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("coengagement-spec")
    .getOrCreate()

  private def mine(rows: Seq[(Long, Long)], minCo: Long) = {
    import spark.implicits._
    RelQueries.coEngagement(rows.toDF("u", "it"), "u", "it", minCo)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
  }

  test("hand fixture: counts, sizes, jaccard") {
    // items 1,2 share users {1,2}; item 3 only user 1
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L))
    val got = mine(rows, 1L)
    assert(got == Set(
      (1L, 2L, 2L, 2L, 2L, 2.0 / 2.0),
      (1L, 3L, 1L, 2L, 1L, 1.0 / 2.0),
      (2L, 3L, 1L, 2L, 1L, 1.0 / 2.0)))
  }

  test("repeated events collapse to one engagement") {
    val rows = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (2L, 2L))
    val got = mine(rows, 2L)
    assert(got == Set((1L, 2L, 2L, 2L, 2L, 1.0)))
  }

  test("matches the naive join formulation on random engagement data") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = for {
      u <- 1L to 60L; _ <- 1 to (3 + rnd.nextInt(12))
    } yield (u, rnd.nextInt(15).toLong)
    val got = mine(rows, 3L)
    // independent naive formulation: distinct + self-join + size joins
    val ui = rows.toDF("u", "it").distinct()
    val sz = ui.groupBy($"it").agg(count(lit(1)).as("n"))
    val expected = ui.as("a").join(ui.as("b"),
        $"a.u" === $"b.u" && $"a.it" < $"b.it")
      .groupBy($"a.it".as("ia"), $"b.it".as("ib"))
      .agg(count(lit(1)).as("co"))
      .where($"co" >= 3L)
      .join(sz.select($"it".as("ia"), $"n".as("na")), "ia")
      .join(sz.select($"it".as("ib"), $"n".as("nb")), "ib")
      .select($"ia", $"ib", $"co", $"na", $"nb",
        ($"co".cast("double") / ($"na" + $"nb" - $"co").cast("double")))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("the co-user floor prunes sparse pairs") {
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L))
    assert(mine(rows, 2L).isEmpty)
  }
}
