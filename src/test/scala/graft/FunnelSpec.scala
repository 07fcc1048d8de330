package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-funnel resolution: strict event-time ordering, out-of-order
  * steps never advance, repeated steps take the earliest valid time. */
class FunnelSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("funnel-spec")
    .getOrCreate()

  test("stages advance only in strict order; earliest valid time per step") {
    import spark.implicits._
    val events = Seq(
      // user 1: full funnel, with a decoy early click BEFORE the view —
      // the click that counts is the later one
      (1L, 10L, "view"), (1L, 5L, "click"), (1L, 20L, "click"),
      (1L, 30L, "purchase"),
      // user 2: view then click, purchase BEFORE the click -> stage 2
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 15L, "purchase"),
      // user 3: only out-of-order activity (click, purchase, no view)
      (3L, 1L, "click"), (3L, 2L, "purchase"),
      // user 4: view only
      (4L, 7L, "view"),
      // user 5: simultaneous view and click (strict >: click must not
      // count), later click does
      (5L, 10L, "view"), (5L, 10L, "click"), (5L, 11L, "click"),
      // user 6: repeated full funnels; every step takes its earliest
      // valid completion
      (6L, 1L, "view"), (6L, 2L, "click"), (6L, 3L, "purchase"),
      (6L, 4L, "view"), (6L, 5L, "click"), (6L, 6L, "purchase"))
      .toDF("user_id", "tsu", "event_type")
    val got = RelQueries.funnelStages(
        events, "user_id", "tsu", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(got(2L) == ((Some(10L), Some(20L), None, 2L)))
    assert(got(3L) == ((None, None, None, 0L)))
    assert(got(4L) == ((Some(7L), None, None, 1L)))
    assert(got(5L) == ((Some(10L), Some(11L), None, 2L)))
    assert(got(6L) == ((Some(1L), Some(2L), Some(3L), 3L)))
    assert(got.size == 6)
  }

  test("single-step funnel degenerates to min-ts per user") {
    import spark.implicits._
    val events = Seq((1L, 9L, "view"), (1L, 4L, "view"), (2L, 3L, "click"))
      .toDF("user_id", "tsu", "event_type")
    val got = RelQueries.funnelStages(
        events, "user_id", "tsu", "event_type", Seq("view"))
      .as[(Long, Option[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((Some(4L), 1L)), 2L -> ((None, 0L))))
  }

  test("multi-touch attribution: horizon bounds, equal credit, no-touch purchases absent") {
    import spark.implicits._
    val h = 100L
    val rows = Seq(
      // user 1: purchase at 200; touches at 100 (in, boundary), 150 (in),
      // 99 (out), 200 (in, same instant), plus an error event (never a touch)
      (1L, 10L, 100L, "view"), (1L, 11L, 150L, "click"),
      (1L, 12L, 99L, "view"), (1L, 13L, 200L, "view"),
      (1L, 14L, 160L, "error"), (1L, 20L, 200L, "purchase"),
      // user 2: purchase with no touches in horizon
      (2L, 30L, 500L, "purchase"), (2L, 31L, 10L, "view"))
      .toDF("user_id", "event_id", "tsu", "event_type")
    val got = RelQueries.multiTouchFromEvents(rows, h)
      .as[(Long, Long, String, Long, Double)].collect()
    assert(got.map(_._1).toSet == Set(20L), "only the touched purchase appears")
    assert(got.map(_._2).toSet == Set(10L, 11L, 13L),
      "boundary-inclusive window; out-of-horizon and error events excluded")
    assert(got.forall(r => r._4 == 3L && r._5 == 1.0 / 3.0))
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-12,
      "credits sum to one conversion")
  }
}
