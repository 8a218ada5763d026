package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  // (user, id, ts_us, type) — micros as longs for readable arithmetic
  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("u", "id", "tsl", "typ")
      .withColumn("ts", timestamp_micros($"tsl")).drop("tsl")

  private val conv = col("typ") === "buy"
  private val touch = col("typ").isin("click", "view")

  private def last(df: org.apache.spark.sql.DataFrame, lookbackUs: Long = 100L) =
    Attribution.lastTouch(df, "u", "id", "ts", conv, touch, col("typ"), lookbackUs)
      .select($"conversion_id", $"channel")
      .as[(Long, Option[String])].collect().toMap

  test("lastTouch picks the latest in-window touch; outside the window is null") {
    val df = ev(
      (1L, 1L, 10L, "click"), (1L, 2L, 20L, "view"), (1L, 3L, 30L, "buy"),
      (1L, 4L, 200L, "buy"),            // latest touch (20) is 180us back: outside
      (2L, 5L, 50L, "buy"))             // no touch at all
    val out = last(df)
    out(3L) shouldBe Some("view")
    out(4L) shouldBe None
    out(5L) shouldBe None
  }

  test("lastTouch breaks timestamp ties by event id, at-or-before semantics") {
    val df = ev(
      (1L, 2L, 10L, "click"),   // same ts as conversion, smaller id: counts
      (1L, 5L, 10L, "buy"),
      (1L, 7L, 10L, "view"))    // same ts, larger id: after the conversion
    last(df)(5L) shouldBe Some("click")
  }

  test("lastTouch attributes each conversion independently (second buy sees later touch)") {
    val df = ev(
      (1L, 1L, 10L, "click"), (1L, 2L, 20L, "buy"),
      (1L, 3L, 30L, "view"), (1L, 4L, 40L, "buy"))
    val out = last(df)
    out(2L) shouldBe Some("click")
    out(4L) shouldBe Some("view")
  }

  private def linear(df: org.apache.spark.sql.DataFrame, lookbackUs: Long = 100L) =
    Attribution.linear(df, "u", "id", "ts", conv, touch, col("typ"), lookbackUs)
      .select($"conversion_id", $"channel", $"credit_ppm", $"n_touches")
      .as[(Long, String, Long, Long)].collect()

  test("linear splits credit equally with the remainder on the latest touch") {
    val df = ev(
      (1L, 1L, 10L, "click"), (1L, 2L, 20L, "view"), (1L, 3L, 30L, "click"),
      (1L, 4L, 40L, "buy"))
    val out = linear(df).map(r => r._2 -> r._3).toMap
    // 3 touches: base 333333, latest (click at 30) gets 1e6 - 2*333333 = 333334
    out("click") shouldBe (333333L + 333334L)
    out("view") shouldBe 333333L
    linear(df).map(_._3).sum shouldBe 1000000L
  }

  test("linear credit always sums to exactly 1e6 per conversion, any touch count") {
    for (n <- Seq(1, 2, 6, 7, 13)) {
      val touches = (1 to n).map(i => (1L, i.toLong, 10L + i, "click"))
      val df = ev(touches :+ (1L, 99L, 50L, "buy"): _*)
      val rows = linear(df)
      withClue(s"n=$n") {
        rows.map(_._3).sum shouldBe 1000000L
        rows.map(_._4).sum shouldBe n.toLong
      }
    }
  }

  test("linear omits conversions with no in-window touch and respects the lookback") {
    val df = ev(
      (1L, 1L, 10L, "click"), (1L, 2L, 300L, "buy"),  // touch 290us back: outside
      (2L, 3L, 10L, "buy"))
    linear(df) shouldBe empty
  }
}
