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

  test("retentionCohorts keys each user to its first bucket, counts returns once") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, "w1"), (1L, "w1"), (1L, "w2"), // u1: cohort w1, returns w2 (dup visit collapses)
      (2L, "w1"), // u2: cohort w1, never returns
      (3L, "w2"), (3L, "w2") // u3: cohort w2
    ).toDF("user_id", "b")
    val out = Funnels.retentionCohorts(ev, "user_id", col("b"))
      .as[(String, String, Long)].collect().toSet
    out shouldBe Set(("w1", "w1", 2L), ("w1", "w2", 1L), ("w2", "w2", 1L))
  }

  test("transitionCounts pairs consecutive events per user, exactly") {
    // tie-broken by the third column (unique "event id" = ts here is not
    // unique for user 3/5, so use an explicit id)
    val ev = Seq(
      (1L, 10L, 100L, "view"), (1L, 20L, 101L, "click"), (1L, 30L, 102L, "purchase"),
      (2L, 20L, 103L, "click"), (2L, 25L, 104L, "view"),
      (3L, 5L, 105L, "view"), (3L, 6L, 106L, "click"), (3L, 7L, 107L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnels.transitionCounts(ev, "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    // 5 transitions total: view->click x2, click->purchase x1, click->view x2
    out shouldBe Set(
      ("view", "click", 2L, 400000L),
      ("click", "purchase", 1L, 200000L),
      ("click", "view", 2L, 400000L))
  }

  test("transitionCounts is invariant to input partitioning") {
    val ev = (1L to 200L).map(i => (i % 7, i, i, if (i % 3 == 0) "a" else "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val one = Funnels.transitionCounts(ev.coalesce(1), "user_id", "ts", "event_type", "event_id")
      .collect().toSet
    val many = Funnels.transitionCounts(ev.repartition(11), "user_id", "ts", "event_type", "event_id")
      .collect().toSet
    one shouldBe many
  }

  test("transitionCounts matches a naive in-memory reference on seeded random data") {
    val rnd = new scala.util.Random(42)
    val types = Array("view", "click", "buy", "err")
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong, types(rnd.nextInt(4)))
    }
    // event ids unique; (ts, id) is a total order per user
    val naivePairs = rows.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect { case Seq(a, b) => (a, b) }
    }.toSeq
    val naiveCounts = naivePairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = naivePairs.size.toLong
    val expected = naiveCounts.map { case ((f, t), n) =>
      (f, t, n, (BigInt(n) * 1000000 / total).toLong)
    }.toSet
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    Funnels.transitionCounts(df.repartition(9), "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long, Long)].collect().toSet shouldBe expected
  }

  test("retentionCohorts matches a naive in-memory reference on seeded random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(_ => (rnd.nextInt(30).toLong, f"2026-${1 + rnd.nextInt(6)}%02d"))
    val firstBucket = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = rows.distinct
      .groupBy { case (u, b) => (firstBucket(u), b) }
      .view.mapValues(_.map(_._1).distinct.size.toLong)
      .toMap.map { case ((c, b), n) => (c, b, n) }.toSet
    val df = rows.toDF("user_id", "b")
    Funnels.retentionCohorts(df.repartition(9), "user_id", org.apache.spark.sql.functions.col("b"))
      .as[(String, String, Long)].collect().toSet shouldBe expected
  }

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
