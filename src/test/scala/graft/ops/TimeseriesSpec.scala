package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class TimeseriesSpec extends SparkTestBase {
  import spark.implicits._

  test("gapFill densifies each key's span with carry-forward and gap flags") {
    val df = Seq(
      ("a", 10L, 100L), ("a", 13L, 130L), ("a", 14L, 140L),
      ("b", 5L, 50L)).toDF("k", "day", "v")
    val out = Timeseries.gapFill(df, Seq("k"), "day", Seq("v"))
      .select($"k", $"day", $"v", $"v_filled", $"was_gap")
      .as[(String, Long, Option[Long], Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    out shouldBe Array(
      ("a", 10L, Some(100L), Some(100L), false),
      ("a", 11L, None, Some(100L), true),
      ("a", 12L, None, Some(100L), true),
      ("a", 13L, Some(130L), Some(130L), false),
      ("a", 14L, Some(140L), Some(140L), false),
      ("b", 5L, Some(50L), Some(50L), false))
  }

  test("gapFill is insensitive to input partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- Seq("x", "y", "z"); d <- 0 to 50 if rnd.nextBoolean())
      yield (k, d.toLong, rnd.nextInt(1000).toLong)
    val expected = Timeseries.gapFill(
      rows.toDF("k", "day", "v").repartition(1), Seq("k"), "day", Seq("v"))
      .select($"k", $"day", $"v_filled", $"was_gap")
      .as[(String, Long, Long, Boolean)].collect().sorted
    for (parts <- Seq(3, 13)) {
      val got = Timeseries.gapFill(
        rows.toDF("k", "day", "v").repartition(parts), Seq("k"), "day", Seq("v"))
        .select($"k", $"day", $"v_filled", $"was_gap")
        .as[(String, Long, Long, Boolean)].collect().sorted
      withClue(s"parts=$parts") { got shouldBe expected }
    }
  }

  test("truncatedEwma matches the hand-computed calendar-weighted average") {
    // key a: days 0, 1, 3 with values 8, 16, 32; lags = 2 so weights are
    // 2^(2 - distance). At day 3: day 0 is out of range, day 1 is at
    // distance 2 (w=1), day 3 at distance 0 (w=4)
    val df = Seq(("a", 0L, 8L), ("a", 1L, 16L), ("a", 3L, 32L))
      .toDF("k", "day", "v")
    val out = Timeseries.truncatedEwma(df, Seq("k"), "day", "v", lags = 2)
      .select($"day", $"ewma_milli").as[(Long, Long)].collect().toMap
    out(0L) shouldBe 8000L                      // only itself: 8 * 1000
    out(1L) shouldBe (2L * 8 + 4 * 16) * 1000 / 6 // days 0 (w=2) + 1 (w=4)
    out(3L) shouldBe (1L * 16 + 4 * 32) * 1000 / 5
  }

  test("truncatedEwma evaluates only at observed days and ignores other keys") {
    val df = Seq(("a", 0L, 10L), ("a", 5L, 20L), ("b", 5L, 999L))
      .toDF("k", "day", "v")
    val out = Timeseries.truncatedEwma(df, Seq("k"), "day", "v", lags = 3)
    out.count() shouldBe 3
    // a's day-5 row is beyond lags of day 0: pure self-average, b untouched
    out.where($"k" === "a" && $"day" === 5).select($"ewma_milli")
      .as[Long].head() shouldBe 20000L
    out.where($"k" === "b").select($"ewma_milli").as[Long].head() shouldBe 999000L
  }

  test("lagCorrelation finds the planted lag with a perfect fit") {
    // y(t) = 2 * x(t - 3) exactly: lag 3 must fit r2 = 1e6, slope 2e6
    val xs = (0L to 40L).map(d => (d, d % 7 + 1)).toDF("day", "x")
    val ys = (0L to 43L).map(d => (d, if (d >= 3) 2 * ((d - 3) % 7 + 1) else 0L))
      .toDF("day", "y")
    val out = Timeseries.lagCorrelation(xs, ys, "day", "x", "y", maxLag = 5)
      .select($"lag", $"slope_ppm", $"r2_ppm").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    out(3L) shouldBe ((2000000L, 1000000L))
    // other lags see the shuffled phase: strictly worse fit
    for (l <- Seq(0L, 1L, 2L, 4L, 5L))
      withClue(s"lag=$l") { out(l)._2 should be < 1000000L }
  }

  test("lagCorrelation n reflects the shifted overlap per lag") {
    val xs = (0L to 9L).map(d => (d, d + 1)).toDF("day", "x")
    val ys = (0L to 9L).map(d => (d, d * 2 + 1)).toDF("day", "y")
    val n = Timeseries.lagCorrelation(xs, ys, "day", "x", "y", maxLag = 3)
      .select($"lag", $"n").as[(Long, Long)].collect().toMap
    n shouldBe Map(0L -> 10L, 1L -> 9L, 2L -> 8L, 3L -> 7L)
  }

  test("cusum equals the sequential max(0, S + (x - k)) recurrence") {
    val rnd = new scala.util.Random(21)
    val rows = for (k <- Seq("a", "b"); d <- 0L to 300L)
      yield (k, d, rnd.nextInt(20).toLong)
    val naive = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var s = 0L
      rs.sortBy(_._2).map { case (_, d, v) => s = math.max(0L, s + v - 9L); (k, d) -> s }
    }
    for (parts <- Seq(1, 13)) {
      val out = Timeseries.cusum(
        rows.toDF("k", "day", "v").repartition(parts), Seq("k"), "day", "v",
        drift = 9L, threshold = 50L)
        .select($"k", $"day", $"cusum").as[(String, Long, Long)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      withClue(s"parts=$parts") { out shouldBe naive }
    }
  }

  test("cusum alarms on a sustained shift, stays silent on a single spike") {
    // baseline 10 with allowance 12: a lone spike of 50 adds 38, below the
    // 60 threshold and decaying 2/day; a shift to 20 accumulates 8/day
    val spiky = (0L to 30L).map(d => ("s", d, if (d == 5) 50L else 10L))
    val shifted = (0L to 30L).map(d => ("d", d, if (d >= 10) 20L else 10L))
    val out = Timeseries.cusum((spiky ++ shifted).toDF("k", "day", "v"),
      Seq("k"), "day", "v", drift = 12L, threshold = 60L)
    out.where($"k" === "s" && $"alarm").count() shouldBe 0
    val alarms = out.where($"k" === "d" && $"alarm").select($"day").as[Long].collect()
    alarms.min shouldBe 17L // 8/day from day 10: S(17) = 64 first tops 60
    alarms.max shouldBe 30L
  }

  test("seasonalIndex: hand-computed cross-multiplied ppm") {
    // key a: phase 0 days {0, 2(->phase 2), ...} build explicitly:
    // days 0,7 value 30 each (phase 0); days 1,8 value 10 each (phase 1)
    // total = 80 over 4 days; phase 0 avg 30 vs overall 20 -> 1.5e6
    val df = Seq(("a", 0L, 30L), ("a", 7L, 30L), ("a", 1L, 10L), ("a", 8L, 10L))
      .toDF("k", "day", "v")
    val out = Timeseries.seasonalIndex(df, Seq("k"), "day", "v", period = 7)
      .select($"phase", $"n", $"value_sum", $"idx_ppm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    out(0L) shouldBe ((0L, 2L, 60L, 1500000L))
    out(1L) shouldBe ((1L, 2L, 20L, 500000L))
  }

  test("trailing: RANGE frame shrinks over calendar gaps, ROWS would not") {
    // days 0,1,9: at day 9 the trailing-7 set is {9} alone (days 0,1 are
    // out of calendar range even though they are the 2 preceding ROWS)
    val df = Seq(("a", 0L, 10L), ("a", 1L, 20L), ("a", 9L, 40L))
      .toDF("k", "day", "v")
    val out = Timeseries.trailing(df, Seq("k"), "day", "v", window = 7)
      .select($"day", $"trailing_sum", $"trailing_n", $"trailing_avg_milli")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    out(0L) shouldBe ((0L, 10L, 1L, 10000L))
    out(1L) shouldBe ((1L, 30L, 2L, 15000L))
    out(9L) shouldBe ((9L, 40L, 1L, 40000L))
  }

  test("trailing is keyed: other keys never leak into the frame") {
    val df = Seq(("a", 5L, 100L), ("b", 5L, 999L)).toDF("k", "day", "v")
    val out = Timeseries.trailing(df, Seq("k"), "day", "v", window = 7)
      .select($"k", $"trailing_sum").as[(String, Long)].collect().toMap
    out shouldBe Map("a" -> 100L, "b" -> 999L)
  }

  test("seasonalIndex: zero key total yields null index, not a crash") {
    val df = Seq(("z", 0L, 0L), ("z", 1L, 0L)).toDF("k", "day", "v")
    val out = Timeseries.seasonalIndex(df, Seq("k"), "day", "v")
      .select($"idx_ppm").as[Option[Long]].collect()
    out.toSeq shouldBe Seq(None, None)
  }

  test("holtForecast: hand-replayed recurrence digits, rising series") {
    // y = 10, 20, 30, 40 (milli: x1000), l1 = 10000, b1 = 0
    // t2: l = 15000, b = 2500; t3: l = 23750, b = 5625
    // t4: l = (40000 + 23750 + 5625) DIV 2 = 34687 (truncated .5)
    //     b = (34687 - 23750 + 5625) DIV 2 = 8281
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L), ("k", 4L, 40L))
      .toDF("k", "day", "v")
    Timeseries.holtForecast(df, Seq("k"), "day", "v", horizon = 2)
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("k", 4L, 34687L, 8281L, 51249L))
  }

  test("holtForecast: negative trend truncates toward zero; single day; nulls") {
    // y = 40, 30: l2 = 35000, b2 = (35000 - 40000) DIV 2 = -2500
    val falling = Seq(("k", 1L, 40L), ("k", 2L, 30L)).toDF("k", "day", "v")
    Timeseries.holtForecast(falling, Seq("k"), "day", "v", horizon = 1)
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("k", 2L, 35000L, -2500L, 32500L))
    // a single observation is its own level, zero trend
    val one = Seq(("k", 7L, 5L)).toDF("k", "day", "v")
    Timeseries.holtForecast(one, Seq("k"), "day", "v", horizon = 9)
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("k", 1L, 5000L, 0L, 5000L))
    // null values and null days drop before the fold
    val nulls = Seq(("k", Some(1L), Some(10L)), ("k", None, Some(99L)),
      ("k", Some(2L), None)).toDF("k", "day", "v")
    Timeseries.holtForecast(nulls, Seq("k"), "day", "v")
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("k", 1L, 10000L, 0L, 10000L))
  }

  test("theilSen: hand-computed slope median; one outlier can't move it") {
    // days 1..3, values 10, 20, 60: slopes 10e6, 25e6, 40e6 -> median 25e6
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 60L))
      .toDF("k", "day", "v")
    Timeseries.theilSen(df, "k", "day", "v")
      .as[(String, Long, Long)].collect().head shouldBe (("k", 3L, 25000000L))
    // a clean +10/day line with one wild endpoint: 6 of 10 pair slopes are
    // exactly 10e6, so the median stays 10e6 (OLS would chase the spike)
    val spiked = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L),
      ("k", 4L, 40L), ("k", 5L, 1000L)).toDF("k", "day", "v")
    Timeseries.theilSen(spiked, "k", "day", "v")
      .as[(String, Long, Long)].collect().head shouldBe (("k", 10L, 10000000L))
  }

  test("theilSen: negative slopes truncate toward zero; partition purity") {
    val down = Seq(("k", 0L, 10L), ("k", 3L, 0L)).toDF("k", "day", "v")
    Timeseries.theilSen(down, "k", "day", "v")
      .as[(String, Long, Long)].collect().head shouldBe (("k", 1L, -3333333L))
    val up = Seq(("k", 0L, 0L), ("k", 3L, 10L)).toDF("k", "day", "v")
    Timeseries.theilSen(up, "k", "day", "v")
      .as[(String, Long, Long)].collect().head shouldBe (("k", 1L, 3333333L))
    val rnd = new scala.util.Random(47)
    val rows = (1 to 2).flatMap(k => (1L to 40L).map(d =>
      ("k" + k, d, rnd.nextInt(500).toLong)))
    def run(parts: Int) =
      Timeseries.theilSen(rows.toDF("k", "day", "v").repartition(parts),
        "k", "day", "v").collect().map(_.toSeq).toSet
    run(1) shouldBe run(11)
  }

  test("mannKendall: sign sum, tie-corrected var18, degenerate zero") {
    val df = Seq(
      ("up", 1L, 1L), ("up", 2L, 2L), ("up", 3L, 3L),       // S=3
      ("tie", 1L, 1L), ("tie", 2L, 2L), ("tie", 3L, 2L),    // S=2, one 2-tie
      ("flat", 1L, 7L), ("flat", 2L, 7L), ("flat", 3L, 7L), // all tied
      ("down", 1L, 3L), ("down", 2L, 2L), ("down", 3L, 1L)) // S=-3
      .toDF("k", "day", "v")
    val out = Timeseries.mannKendall(df, "k", "day", "v")
      .as[(String, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    out("up") shouldBe ((3L, 3L, 3L, 66L))    // var18 = 3*2*11
    out("tie") shouldBe ((3L, 3L, 2L, 48L))   // 66 - 2*1*9
    out("flat") shouldBe ((3L, 3L, 0L, 0L))   // no test possible
    out("down") shouldBe ((3L, 3L, -3L, 66L))
  }

  test("mannKendall matches the naive pair count and is partition-pure") {
    val rnd = new scala.util.Random(59)
    val rows = (1 to 2).flatMap(k => (1L to 50L).map(d =>
      ("k" + k, d, rnd.nextInt(8).toLong)))
    val expected = rows.groupBy(_._1).map { case (k, rs) =>
      val s = (for {
        a <- rs; b <- rs if b._2 > a._2
      } yield java.lang.Long.signum(b._3 - a._3).toLong).sum
      k -> s
    }
    def run(parts: Int) =
      Timeseries.mannKendall(rows.toDF("k", "day", "v").repartition(parts),
        "k", "day", "v")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._4).toMap
    run(1) shouldBe expected
    run(11) shouldBe expected
  }

  test("changepoint: the level-shift day wins; flat series ties to day one") {
    // 10,10,20,20: D = -20,-40,-20,0 -> |D| peaks at day 2 (the shift point)
    val step = Seq(("k", 1L, 10L), ("k", 2L, 10L), ("k", 3L, 20L), ("k", 4L, 20L))
      .toDF("k", "day", "v")
    Timeseries.changepoint(step, Seq("k"), "day", "v")
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("k", 4L, 60L, 2L, 40L))
    // flat: every deviation 0, tie law picks the smallest day
    val flat = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 5L)).toDF("k", "day", "v")
    Timeseries.changepoint(flat, Seq("k"), "day", "v")
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("k", 3L, 15L, 1L, 0L))
    // symmetric bump: |D| = 10 at days 1 AND 2 -> smallest day wins
    val bump = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 10L)).toDF("k", "day", "v")
    Timeseries.changepoint(bump, Seq("k"), "day", "v")
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("k", 3L, 40L, 1L, 10L))
  }

  test("changepoint recovers a planted shift and is partition-pure") {
    val rnd = new scala.util.Random(61)
    // 60-day series, level jumps 100 -> 200 after day 40 (noise ±5)
    val rows = (1L to 60L).map(d =>
      ("k", d, (if (d <= 40) 100L else 200L) + rnd.nextInt(11) - 5))
    val got = Timeseries.changepoint(rows.toDF("k", "day", "v"),
      Seq("k"), "day", "v")
      .as[(String, Long, Long, Long, Long)].collect().head
    got._4 shouldBe 40L +- 1L
    def run(parts: Int) =
      Timeseries.changepoint(rows.toDF("k", "day", "v").repartition(parts),
        Seq("k"), "day", "v").collect().map(_.toSeq).toSet
    run(1) shouldBe run(7)
  }

  test("holtForecast is order- and partitioning-independent") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 3).flatMap(k => (1L to 300L).map(d =>
      ("k" + k, d, rnd.nextInt(2000).toLong - 500L)))
    val df = rows.toDF("k", "day", "v")
    val a = Timeseries.holtForecast(df.orderBy(rand(7)).repartition(13),
      Seq("k"), "day", "v", horizon = 3).collect().map(_.toSeq).toSet
    val b = Timeseries.holtForecast(df.coalesce(1), Seq("k"), "day", "v",
      horizon = 3).collect().map(_.toSeq).toSet
    a shouldBe b
    // and it replays the driver-side fold exactly
    val expected = rows.groupBy(_._1).map { case (k, rs) =>
      val ys = rs.sortBy(_._2).map(_._3 * 1000L)
      val (l, bb) = ys.tail.foldLeft((ys.head, 0L)) { case ((pl, pb), y) =>
        val nl = (y + pl + pb) / 2 // JVM / truncates toward zero like DIV
        (nl, (nl - pl + pb) / 2)
      }
      k -> ((l, bb, l + 3 * bb))
    }
    val got = Timeseries.holtForecast(df, Seq("k"), "day", "v", horizon = 3)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    got shouldBe expected
  }
}
