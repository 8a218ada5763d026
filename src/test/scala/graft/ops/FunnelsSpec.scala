package graft.ops

import graft.testkit.SparkTestBase

class FunnelsSpec extends SparkTestBase {
  import spark.implicits._

  // ts as plain longs — funnel only needs an ordered column
  private def events = Seq(
    // user 1: full path in order
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    // user 2: clicked BEFORE viewing -> click doesn't count, stops at 1
    (2L, 20L, "click"), (2L, 25L, "view"),
    // user 3: view then click, no purchase
    (3L, 5L, "view"), (3L, 6L, "click"), (3L, 6L, "error"),
    // user 4: purchase without view -> never enters the funnel
    (4L, 1L, "purchase"),
    // user 5: view -> click at the SAME ts -> strictly-after excludes it
    (5L, 7L, "view"), (5L, 7L, "click")
  ).toDF("user_id", "ts", "event_type")

  private val steps = Seq("view", "click", "purchase")

  test("funnel counts only strictly-ordered step progress") {
    val out = Funnels.funnel(events, "user_id", "ts", "event_type", steps)
      .select($"user_id", $"steps_reached").as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 5L -> 1L) // user 4 absent
  }

  test("funnelCounts aggregates the conversion histogram") {
    val out = Funnels.funnelCounts(events, "user_id", "ts", "event_type", steps)
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 1L)
  }
}
