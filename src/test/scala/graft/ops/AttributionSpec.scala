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

  private def first(df: org.apache.spark.sql.DataFrame, lookbackUs: Long = 100L) =
    Attribution.firstTouch(df, "u", "id", "ts", conv, touch, col("typ"), lookbackUs)
      .select($"conversion_id", $"channel")
      .as[(Long, Option[String])].collect().toMap

  test("firstTouch picks the earliest in-window touch, dual of lastTouch") {
    val df = ev(
      (1L, 1L, 10L, "click"), (1L, 2L, 20L, "view"), (1L, 3L, 30L, "buy"),
      (2L, 4L, 50L, "buy"))
    val out = first(df)
    out(3L) shouldBe Some("click")
    out(4L) shouldBe None
  }

  test("firstTouch's window slides: an old touch expires out of the lookback") {
    val df = ev(
      (1L, 1L, 10L, "click"), (1L, 2L, 90L, "view"),
      (1L, 3L, 50L, "buy"),    // both in window: first = click@10
      (1L, 4L, 150L, "buy"))   // click@10 expired (140 back): first = view@90
    val out = first(df)
    out(3L) shouldBe Some("click")
    out(4L) shouldBe Some("view")
  }

  test("firstTouch mirrors the (ts, id) tie rule at the conversion timestamp") {
    val a = ev((1L, 7L, 10L, "click"), (1L, 5L, 10L, "buy"))
    first(a)(5L) shouldBe None          // same ts, larger id: after the conversion
    val b = ev((1L, 2L, 10L, "click"), (1L, 5L, 10L, "buy"))
    first(b)(5L) shouldBe Some("click") // same ts, smaller id: counts
  }

  private def position(df: org.apache.spark.sql.DataFrame, lookbackUs: Long = 100L) =
    Attribution.positionBased(df, "u", "id", "ts", conv, touch, col("typ"), lookbackUs)
      .select($"conversion_id", $"channel", $"credit_ppm")
      .as[(Long, String, Long)].collect()

  test("positionBased: 40/40/20 with the middle remainder on the last touch") {
    // 5 touches: first 400k, last 400k + rem, 3 middles at 66666 (rem 2)
    val df = ev(
      (1L, 1L, 10L, "click"), (1L, 2L, 20L, "view"), (1L, 3L, 30L, "view"),
      (1L, 4L, 40L, "view"), (1L, 5L, 50L, "click"), (1L, 6L, 60L, "buy"))
    val out = position(df).map(r => r._2 -> r._3).toMap
    // click: first (400000) + last (400000 + 200000 - 3*66666 = 400002)
    out("click") shouldBe 800002L
    out("view") shouldBe (3L * 66666L)
    position(df).map(_._3).sum shouldBe 1000000L
  }

  test("positionBased degenerates: single touch takes all, two touches split evenly") {
    val one = ev((1L, 1L, 10L, "view"), (1L, 2L, 20L, "buy"))
    position(one).map(_._3).toSeq shouldBe Seq(1000000L)
    val two = ev((1L, 1L, 10L, "click"), (1L, 2L, 20L, "view"), (1L, 3L, 30L, "buy"))
    position(two).map(r => r._2 -> r._3).toMap shouldBe
      Map("click" -> 500000L, "view" -> 500000L)
  }

  test("positionBased conserves exactly 1e6 for any touch count") {
    for (n <- Seq(3, 4, 7, 11)) {
      val touches = (1 to n).map(i => (1L, i.toLong, 10L + i, "click"))
      val df = ev(touches :+ (1L, 99L, 50L, "buy"): _*)
      withClue(s"n=$n") { position(df).map(_._3).sum shouldBe 1000000L }
    }
  }
}
