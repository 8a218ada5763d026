package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  // 30 days x interleaved users: user u is active on day u % 30 and (u*7) % 30
  private lazy val events = (0L until 10000L).flatMap { u =>
    Seq((u % 30, u), ((u * 7) % 30, u))
  }.toDF("day", "user_id")

  test("sketch estimate is within HLL error bounds of the exact count") {
    val est = events.agg(Sketches.estimate(Sketches.hllSketch($"user_id")).cast("long"))
      .as[Long].head()
    val exact = 10000L
    math.abs(est - exact).toDouble / exact should be < 0.05 // lgK=12 ~ 1.6% typical
  }

  test("daily sketches union to exactly the global sketch's estimate") {
    val daily = Sketches.distinctRollup(events, Seq("day"), "user_id")
    daily.count() shouldBe 30
    val merged = Sketches.reRollup(daily.withColumn("all", lit(1)), Seq("all"))
      .select($"distinct_est").as[Long].head()
    val direct = events.agg(Sketches.estimate(Sketches.hllSketch($"user_id")).cast("long"))
      .as[Long].head()
    // union of per-day sketches reconstructs the same register state as one
    // pass over everything: identical estimate, not merely close
    merged shouldBe direct
  }

  test("rollups chain: daily -> weekly re-rollup tracks direct weekly within error") {
    val weekly = Sketches.reRollup(
      Sketches.distinctRollup(events, Seq("day"), "user_id")
        .withColumn("week", expr("day DIV 7")),
      Seq("week"))
    val direct = Sketches.distinctRollup(
      events.withColumn("week", expr("day DIV 7")), Seq("week"), "user_id")
    val a = weekly.select($"week", $"distinct_est").as[(Long, Long)].collect().toMap
    val b = direct.select($"week", $"distinct_est").as[(Long, Long)].collect().toMap
    a.keySet shouldBe b.keySet
    // NOT exact: unioning small (coupon-mode) sketches promotes to dense
    // HLL, whose estimator differs slightly from the coupon-exact direct
    // sketch — chained rollups agree within the sketch's error bound
    a.foreach { case (week, est) =>
      math.abs(est - b(week)).toDouble / b(week) should be < 0.02
    }
  }
}
