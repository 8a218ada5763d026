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

  // (id, value) stream where value = id: quantiles of the group are known
  private lazy val measured = (1L to 5000L).map(i => (i % 10, i, i.toDouble))
    .toDF("day", "id", "v")

  test("quantile sketch: daily re-rollup is EXACTLY the directly-built sketch") {
    val daily = Sketches.quantileSketch(measured, Seq("day"), "id", "v", k = 64)
    daily.count() shouldBe 10
    val merged = Sketches.reRollupQuantileSketch(
      daily.withColumn("all", lit(1)), Seq("all"), k = 64)
      .select($"q_sample").collect().head.getSeq[Any](0)
    val direct = Sketches.quantileSketch(
      measured.withColumn("all", lit(1)), Seq("all"), "id", "v", k = 64)
      .select($"q_sample").collect().head.getSeq[Any](0)
    // bottom-k by a deterministic hash rank merges exactly, unlike HLL
    merged shouldBe direct
  }

  test("quantile sketch is partition-invariant and tracks exact quantiles") {
    val sketch = Sketches.quantileSketch(
      measured.withColumn("all", lit(1)), Seq("all"), "id", "v", k = 256)
    val reparted = Sketches.quantileSketch(
      measured.repartition(17).withColumn("all", lit(1)), Seq("all"), "id", "v", k = 256)
    sketch.collect() shouldBe reparted.collect()
    val (p50, p90) = sketch.select(
      Sketches.quantileFromSketch($"q_sample", 0.5),
      Sketches.quantileFromSketch($"q_sample", 0.9)).as[(Double, Double)].head()
    // values are 1..5000 uniform: exact p50=2500, p90=4500; k=256 -> ~1/16 error
    math.abs(p50 - 2500) / 2500 should be < 0.15
    math.abs(p90 - 4500) / 4500 should be < 0.15
  }

  test("bottom-k sample is the k smallest hash ranks, ascending") {
    val df = (1L to 100L).map(i => (1, i, i.toDouble)).toDF("g", "id", "v")
    val sample = Sketches.quantileSketch(df, Seq("g"), "id", "v", k = 7)
      .select($"q_sample").collect().head.getSeq[org.apache.spark.sql.Row](0)
    sample should have size 7
    val hashes = sample.map(_.getString(0))
    hashes shouldBe hashes.sorted
    val expected = (1L to 100L).map(i =>
      java.security.MessageDigest.getInstance("MD5").digest(i.toString.getBytes)
        .map("%02x".format(_)).mkString).sorted.take(7)
    hashes shouldBe expected
  }
}
