package graft.ops

import graft.testkit.SparkTestBase
import org.apache.spark.sql.functions._

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  private def fit(rows: Seq[(String, Long, Long)]) =
    Stats.olsFit(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("a perfect line recovers exact slope, intercept and r2 = 1e6") {
    val out = fit(Seq(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L)))
    out("a") shouldBe ((3L, Some(2000000L), Some(1000000L), Some(1000000L)))
  }

  test("negative slopes truncate toward zero like the oracle") {
    val out = fit(Seq(("a", 0L, 5L), ("a", 1L, 3L), ("a", 2L, 1L)))
    out("a") shouldBe ((3L, Some(-2000000L), Some(5000000L), Some(1000000L)))
  }

  test("imperfect fit: hand-computed truncated digits, r2 = 750000 ppm") {
    val out = fit(Seq(("a", 0L, 0L), ("a", 1L, 1L), ("a", 2L, 1L)))
    // dxx=6 dxy=3 dyy=2: slope 3e6/6, intercept (2e6-1.5e6)/3, r2 9/12
    out("a") shouldBe ((3L, Some(500000L), Some(166666L), Some(750000L)))
  }

  test("constant x yields null slope; constant y yields zero slope, null r2") {
    val out = fit(Seq(
      ("cx", 5L, 1L), ("cx", 5L, 9L),
      ("cy", 1L, 7L), ("cy", 2L, 7L), ("cy", 3L, 7L)))
    out("cx") shouldBe ((2L, None, None, None))
    out("cy") shouldBe ((3L, Some(0L), Some(7000000L), None))
  }

  test("null x or y rows are excluded before the sums") {
    val df = Seq(
      ("a", Some(0L), Some(1L)), ("a", Some(1L), Some(3L)), ("a", Some(2L), Some(5L)),
      ("a", None, Some(99L)), ("a", Some(9L), None)).toDF("g", "x", "y")
    val out = Stats.olsFit(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])].collect()
    out.head._2 shouldBe 3L
    out.head._3 shouldBe Some(2000000L)
  }

  test("daily sums merge to the identical fit (the incremental path)") {
    val day1 = Seq(("a", 0L, 1L), ("a", 1L, 3L)).toDF("g", "x", "y")
    val day2 = Seq(("a", 2L, 5L), ("a", 3L, 6L)).toDF("g", "x", "y")
    val whole = day1.unionByName(day2)
    val direct = Stats.olsFit(whole, Seq("g"), "x", "y").collect().map(_.toSeq).toSet
    val merged = Stats.olsFromSums(
      Stats.mergeOlsSums(
        Stats.olsSums(day1, Seq("g"), "x", "y")
          .unionByName(Stats.olsSums(day2, Seq("g"), "x", "y")),
        Seq("g")),
      Seq("g")).collect().map(_.toSeq).toSet
    merged shouldBe direct
  }

  private def chi(rows: Seq[(String, Boolean, Boolean)]) =
    Stats.chiSquare2x2(rows.toDF("g", "e", "o"), Seq("g"), "e", "o")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("chiSquare2x2: independence scores zero, perfect association scores n") {
    val indep = Seq.fill(5)(Seq(("i", true, true), ("i", true, false),
      ("i", false, true), ("i", false, false))).flatten
    // a=d=20, b=c=0: chi2 = n = 40 exactly
    val perfect = (1 to 20).flatMap(_ => Seq(("p", true, true), ("p", false, false)))
    val out = chi(indep ++ perfect)
    out("i") shouldBe ((5L, 5L, 5L, 5L, Some(0L), Some(0L)))
    out("p") shouldBe ((20L, 0L, 0L, 20L, Some(1000000L), Some(40000000L)))
  }

  test("chiSquare2x2: hand-computed staged digits on an unbalanced table") {
    // a=6 b=2 c=2 d=6: ad-bc=32, m1m2=64, m3m4=64, n=16
    // q1 = 32*32*1000 DIV 64 = 16000; chi2 = 16000*16*1000 DIV 64 = 4_000_000
    val rows = (1 to 6).map(_ => ("u", true, true)) ++
      (1 to 2).map(_ => ("u", true, false)) ++
      (1 to 2).map(_ => ("u", false, true)) ++
      (1 to 6).map(_ => ("u", false, false))
    val out = chi(rows)
    // lift: 6e6 DIV 8 - 2e6 DIV 8 = 750000 - 250000
    out("u") shouldBe ((6L, 2L, 2L, 6L, Some(500000L), Some(4000000L)))
  }

  test("chiSquare2x2: zero margins null the statistic, empty arm nulls the lift") {
    val out = chi(Seq(("z", true, true), ("z", true, true))) // only exposed+converted
    out("z") shouldBe ((2L, 0L, 0L, 0L, None, None))
  }

  test("withRunningMaxBefore: exclusive best-so-far, null first row, any partitioning") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 9L), (5L, 1L)).toDF("k", "v")
    val out = Intervals.withRunningMaxBefore(df.repartition(3), "m", "v", $"k")
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1)
    out.map(_._3) shouldBe Seq(None, Some(5L), Some(5L), Some(9L), Some(9L))
  }

  test("paretoFront2D matches the brute-force dominance filter") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map(i => (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val front = Stats.paretoFront2D(rows.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    val brute = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(t => (t._1, t._2, t._3)).toSet
    front.map(r => (r._2, r._3)) shouldBe brute.map(r => (r._2, r._3))
    front shouldBe brute // equal-(x,y) twins both survive
  }

  test("paretoFront2D: a single totally-dominating point leaves a one-row front") {
    val front = Stats.paretoFront2D(
      Seq((1L, 1L, 1L), (2L, 9L, 9L), (3L, 9L, 2L), (4L, 2L, 9L))
        .toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    front shouldBe Set((2L, 9L, 9L))
  }

  test("fit is a pure function of the data, not its partitioning") {
    val rows = (1L to 200L).map(i => ("g" + (i % 3), i, i * i % 97))
    val a = fit(rows)
    val b = Stats.olsFit(rows.toDF("g", "x", "y").repartition(13), Seq("g"), "x", "y")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    a shouldBe b
  }

  test("modeBy: highest count wins, count ties go to the largest value") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"),        // clear winner b
      ("g2", "x"), ("g2", "y"),                     // tie -> larger value y
      ("g3", "q")).toDF("g", "v")
    val out = Stats.modeBy(df, Seq("g"), "v")
      .as[(String, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out shouldBe Map("g1" -> (("b", 2L)), "g2" -> (("y", 1L)), "g3" -> (("q", 1L)))
  }

  test("modeBy is deterministic under any partitioning, numeric values too") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 1000).map(_ => ("g" + rnd.nextInt(5), rnd.nextInt(8).toLong))
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val counts = rs.groupBy(_._2).map { case (v, vs) => (v, vs.size.toLong) }
      // same tie law: (count, value) max
      g -> counts.maxBy { case (v, c) => (c, v) }
    }
    for (parts <- Seq(1, 17)) {
      val out = Stats.modeBy(rows.toDF("g", "v").repartition(parts), Seq("g"), "v")
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      withClue(s"parts=$parts") { out shouldBe expected }
    }
  }

  test("modeFromCounts: sliced counts merge to the exact whole-data mode") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 600).map(i => (i % 4, "g" + (i % 3), "v" + rnd.nextInt(5)))
    val whole = Stats.modeBy(rows.map(r => (r._2, r._3)).toDF("g", "v"), Seq("g"), "v")
      .as[(String, String, Long)].collect().toSet
    val sliced = rows.toDF("day", "g", "v")
      .groupBy($"day", $"g", $"v").count().withColumnRenamed("count", "cnt")
    val merged = Stats.modeFromCounts(sliced, Seq("g"), "v")
      .as[(String, String, Long)].collect().toSet
    merged shouldBe whole
  }

  private def rho(rows: Seq[(String, Long, Long, Long)], parts: Int = 4) =
    Stats.spearman(rows.toDF("g", "x", "y", "id").repartition(parts),
        Seq("g"), "x", "y", "id")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("spearman: perfect monotone agreement is 1e6, reversal is -1e6") {
    val up = (1L to 9L).map(i => ("up", i, i * i, i)) // monotone, not linear
    val dn = (1L to 8L).map(i => ("dn", i, 100L - 3 * i, i))
    val out = rho(up ++ dn)
    out("up") shouldBe ((9L, Some(1000000L)))
    out("dn") shouldBe ((8L, Some(-1000000L)))
  }

  test("spearman: hand-computed truncated digits on a mid case") {
    // ranks x (1,2,3), y (2,1,3): sum d^2 = 2; 1e6 - 12e6 DIV 24 = 500000
    val out = rho(Seq(("a", 10L, 20L, 1L), ("a", 20L, 10L, 2L), ("a", 30L, 30L, 3L)))
    out("a") shouldBe ((3L, Some(500000L)))
  }

  test("spearman: ties break by the id column on BOTH axes") {
    // x all equal: rank_x = id order; y = reverse id order -> exact -1e6
    val out = rho(Seq(("t", 5L, 30L, 1L), ("t", 5L, 20L, 2L), ("t", 5L, 10L, 3L)))
    out("t") shouldBe ((3L, Some(-1000000L)))
  }

  test("spearman: null x/y rows drop; singleton groups yield null rho") {
    val df = Seq(
      ("a", Some(1L), Some(1L), 1L), ("a", Some(2L), Some(2L), 2L),
      ("a", None, Some(9L), 3L), ("a", Some(9L), None, 4L),
      ("s", Some(7L), Some(7L), 5L)).toDF("g", "x", "y", "id")
    val out = Stats.spearman(df, Seq("g"), "x", "y", "id")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out("a") shouldBe ((2L, Some(1000000L)))
    out("s") shouldBe ((1L, None))
  }

  private def kappa(rows: Seq[(String, String, String)], parts: Int = 4) =
    Stats.cohenKappa(rows.toDF("g", "a", "b").repartition(parts), Seq("g"), "a", "b")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("cohenKappa: hand-computed digits; perfect = 1e6, anti-agreement = -1e6") {
    // n=4 agree=3, na(x)=2 na(y)=2, nb(x)=1 nb(y)=3, S=8:
    // po=750000 pe=500000 kappa=(12-8)e6 DIV 8 = 500000
    val out = kappa(Seq(
      ("m", "x", "x"), ("m", "x", "y"), ("m", "y", "y"), ("m", "y", "y"),
      ("p", "x", "x"), ("p", "y", "y"),
      ("n", "x", "y"), ("n", "y", "x")))
    out("m") shouldBe ((4L, Some(750000L), Some(500000L), Some(500000L)))
    out("p") shouldBe ((2L, Some(1000000L), Some(500000L), Some(1000000L)))
    out("n") shouldBe ((2L, Some(0L), Some(500000L), Some(-1000000L)))
  }

  test("cohenKappa: identical constant raters null out (chance explains all)") {
    val out = kappa(Seq(("c", "x", "x"), ("c", "x", "x"), ("c", "x", "x")))
    out("c") shouldBe ((3L, Some(1000000L), Some(1000000L), None))
  }

  test("cohenKappa: null labels drop; one-sided labels contribute zero to S") {
    val df = Seq(
      ("g", Some("x"), Some("x")), ("g", Some("z"), Some("w")),
      ("g", None, Some("x")), ("g", Some("x"), None)).toDF("g", "a", "b")
    // n=2 agree=1; na: x=1,z=1; nb: x=1,w=1; S = 1 (only x on both sides)
    // po=500000 pe=250000 kappa=(2-1)e6 DIV (4-1)=333333
    Stats.cohenKappa(df, Seq("g"), "a", "b")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])].collect()
      .head shouldBe (("g", 2L, Some(500000L), Some(250000L), Some(333333L)))
  }

  test("cohenKappa is a pure function of the data, not its partitioning") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map(_ =>
      ("g" + rnd.nextInt(3), "l" + rnd.nextInt(4), "l" + rnd.nextInt(4)))
    val expected = kappa(rows, parts = 1)
    for (parts <- Seq(5, 16)) {
      withClue(s"parts=$parts") { kappa(rows, parts) shouldBe expected }
    }
  }

  private def fleiss(rows: Seq[(String, Long, String)], n: Int, parts: Int = 4) =
    Stats.fleissKappa(rows.toDF("g", "subj", "cat").repartition(parts),
        Seq("g"), "subj", "cat", n)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("fleissKappa: hand-computed digits, perfect panel, chance-only null") {
    // mid: subj1 (x,x), subj2 (x,y): Po_num=2, Nn=4, S=3²+1=10
    // po=500000 pe=625000 kappa=(2*4-10)e6 DIV (16-10) = -333333
    val out = fleiss(Seq(
      ("m", 1L, "x"), ("m", 1L, "x"), ("m", 2L, "x"), ("m", 2L, "y"),
      ("p", 1L, "x"), ("p", 1L, "x"), ("p", 2L, "y"), ("p", 2L, "y"),
      ("c", 1L, "x"), ("c", 1L, "x"), ("c", 2L, "x"), ("c", 2L, "x")), n = 2)
    out("m") shouldBe ((2L, 0L, Some(500000L), Some(625000L), Some(-333333L)))
    // perfect: subj1 xx, subj2 yy -> po 1e6, pe 500000, kappa 1e6
    out("p") shouldBe ((2L, 0L, Some(1000000L), Some(500000L), Some(1000000L)))
    // all ratings one category: S = (Nn)² -> chance explains everything
    out("c") shouldBe ((2L, 0L, Some(1000000L), Some(1000000L), None))
  }

  test("fleissKappa: three raters, unbalanced subjects excluded and counted") {
    // kept: subj1 xxx, subj2 yyy (Po_num=12, Nn=6, S=18 -> kappa=1e6)
    // subj3 has 2 ratings, subj4 has 4 -> both excluded
    val rows = Seq(
      ("g", 1L, "x"), ("g", 1L, "x"), ("g", 1L, "x"),
      ("g", 2L, "y"), ("g", 2L, "y"), ("g", 2L, "y"),
      ("g", 3L, "x"), ("g", 3L, "y"),
      ("g", 4L, "x"), ("g", 4L, "x"), ("g", 4L, "y"), ("g", 4L, "y"))
    fleiss(rows, n = 3)("g") shouldBe
      ((2L, 2L, Some(1000000L), Some(500000L), Some(1000000L)))
  }

  test("fleissKappa: all subjects excluded yields zero-subject nulls") {
    fleiss(Seq(("g", 1L, "x"), ("g", 1L, "y")), n = 3)("g") shouldBe
      ((0L, 1L, None, None, None))
  }

  test("fleissKappa is a pure function of the data, not its partitioning") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 200).flatMap(s => (1 to 3).map(_ =>
      ("g" + s % 2, s.toLong, "c" + rnd.nextInt(4))))
    val expected = fleiss(rows, n = 3, parts = 1)
    for (parts <- Seq(5, 16)) {
      withClue(s"parts=$parts") { fleiss(rows, n = 3, parts) shouldBe expected }
    }
  }

  test("calibrationBins + eceFromBins: hand-computed bins, clamps, weighted gap") {
    val df = Seq(
      (100000L, false), (200000L, true),           // bin 0 of 4
      (600000L, true), (700000L, true), (650000L, false), // bin 2
      (1000000L, true)                             // 4 -> clamped to bin 3
    ).map { case (s, o) => ("g", s, o) }.toDF("g", "score", "good")
    val bins = Stats.calibrationBins(df, Seq("g"), "score", "good", bins = 4)
    bins.as[(String, Long, Long, Long, Long)].collect().toSet shouldBe Set(
      ("g", 0L, 2L, 150000L, 500000L),
      ("g", 2L, 3L, 650000L, 666666L),
      ("g", 3L, 1L, 1000000L, 1000000L))
    // ECE = (2*350000 + 3*16666 + 1*0) DIV 6 = 749998 DIV 6 = 124999
    Stats.eceFromBins(bins, Seq("g")).as[(String, Long, Option[Long])]
      .collect().head shouldBe (("g", 6L, Some(124999L)))
  }

  test("calibrationCells + calibrationFromCells: sliced cells == whole-data bins") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 500).map(i =>
      (i % 4, "g" + (i % 2), rnd.nextInt(1000001).toLong, rnd.nextBoolean()))
    val whole = Stats.calibrationBins(
      rows.map(r => (r._2, r._3, r._4)).toDF("g", "s", "o"), Seq("g"), "s", "o")
      .collect().map(_.toSeq).toSet
    val daily = Stats.calibrationCells(rows.toDF("day", "g", "s", "o"),
      Seq("day", "g"), "s", "o")
    val merged = Stats.calibrationFromCells(
      daily.groupBy($"g", $"bin").agg(sum($"n").as("n"),
        sum($"sum_score").as("sum_score"), sum($"pos").as("pos")), Seq("g"))
    merged.collect().map(_.toSeq).toSet shouldBe whole
  }

  test("calibration bins re-aggregate across slices to the whole-data ECE") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 600).map(i =>
      (i % 3, "g" + (i % 2), rnd.nextInt(1000001).toLong, rnd.nextBoolean()))
    val whole = Stats.eceFromBins(
      Stats.calibrationBins(rows.map(r => (r._2, r._3, r._4)).toDF("g", "s", "o"),
        Seq("g"), "s", "o"), Seq("g"))
      .as[(String, Long, Option[Long])].collect().toSet
    // slice by day, re-sum the bin NUMERATORS, then finish — the exact path
    val daily = rows.toDF("day", "g", "s", "o")
      .groupBy($"day", $"g",
        least(greatest(expr("s * 10 DIV 1000000"), lit(0L)), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum($"s").as("sum_s"),
        sum(when($"o", 1L).otherwise(0L)).as("pos"))
    val merged = daily.groupBy($"g", $"bin")
      .agg(sum($"n").as("n"), sum($"sum_s").as("sum_s"), sum($"pos").as("pos"))
      .withColumn("mean_score_ppm", expr("CAST(sum_s DIV n AS BIGINT)"))
      .withColumn("pos_rate_ppm",
        expr("CAST(CAST(pos AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)"))
    Stats.eceFromBins(merged, Seq("g")).as[(String, Long, Option[Long])]
      .collect().toSet shouldBe whole
  }

  test("spearman is a pure function of the data, not its partitioning") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 500).map(i =>
      ("g" + (i % 3), rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, i.toLong))
    val expected = rho(rows, parts = 1)
    for (parts <- Seq(3, 16)) {
      withClue(s"parts=$parts") { rho(rows, parts) shouldBe expected }
    }
  }

  test("rankNormalize: mid-rank quantiles, id-tie law, null passthrough") {
    val df = Seq(
      ("g", Some(30L), 1L), ("g", Some(10L), 2L), ("g", Some(20L), 3L),
      ("g", Some(10L), 4L), // value tie -> id breaks it
      ("g", None, 5L),      // null value -> null quantile, row kept
      ("h", Some(7L), 6L)   // single-row group -> median 500000
    ).toDF("g", "v", "id")
    val out = Stats.rankNormalize(df, Seq("g"), "v", "id")
      .select($"id", $"q_ppm").as[(Long, Option[Long])].collect().toMap
    // g ranks under (v, id): 10@2 -> 1, 10@4 -> 2, 20@3 -> 3, 30@1 -> 4; n=4
    out(2L) shouldBe Some(125000L)
    out(4L) shouldBe Some(375000L)
    out(3L) shouldBe Some(625000L)
    out(1L) shouldBe Some(875000L)
    out(5L) shouldBe None
    out(6L) shouldBe Some(500000L)
  }

  test("winsorize: exact nearest-rank caps, both tails clip, null passthrough") {
    // g: values 1..10 -> p20 cap = ceil(10*20/100)=rank 2 -> 2; p80 -> rank 8 -> 8
    val df = ((1L to 10L).map(v => ("g", Some(v))) :+ (("g", None: Option[Long])))
      .toDF("g", "v")
    val out = Stats.winsorize(df, "g", "v", loPct = 20, hiPct = 80, outCol = "w")
      .select($"v", $"w", $"clipped_lo", $"clipped_hi")
      .as[(Option[Long], Option[Long], Option[Boolean], Option[Boolean])].collect().toSet
    out should contain((Some(1L), Some(2L), Some(true), Some(false)))   // clamped up
    out should contain((Some(2L), Some(2L), Some(false), Some(false)))  // at the cap
    out should contain((Some(5L), Some(5L), Some(false), Some(false)))  // untouched
    out should contain((Some(9L), Some(8L), Some(false), Some(true)))   // clamped down
    out should contain((None, None, None, None))                        // null passthrough
    // row count preserved: winsorizing never drops rows
    Stats.winsorize(df, "g", "v").count() shouldBe 11
  }

  test("winsorize equals the naive per-group clamp under any partitioning") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 3000).map(i => ("g" + rnd.nextInt(3), rnd.nextInt(10000).toLong))
    def naive: Map[String, (Long, Long)] = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      def cap(p: Int) = sorted(((sorted.size * p + 99) / 100 - 1).toInt)
      g -> (cap(5), cap(95))
    }
    val expected = rows.map { case (g, v) =>
      val (lo, hi) = naive(g); (g, v, math.min(math.max(v, lo), hi))
    }.groupBy(x => x).view.mapValues(_.size).toMap
    def run(parts: Int) =
      Stats.winsorize(rows.toDF("g", "v").repartition(parts), "g", "v", 5, 95, "w")
        .select($"g", $"v", $"w").as[(String, Long, Long)]
        .collect().toSeq.groupBy(x => x).view.mapValues(_.size).toMap
    run(1) shouldBe expected
    run(13) shouldBe expected
  }

  test("rankNormalize is a pure function of the data, not its partitioning") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 4000).map(i => ("g" + rnd.nextInt(3), rnd.nextInt(50).toLong, i.toLong))
    def run(parts: Int) =
      Stats.rankNormalize(rows.toDF("g", "v", "id").repartition(parts), Seq("g"), "v", "id")
        .collect().map(_.toSeq).toSet
    run(1) shouldBe run(17)
  }

  test("cramersV: perfect association hits 1e6, independence clamps to 0") {
    // x == y on 2x2 -> chi2 = n, V² = 1
    val perfect = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")).toDF("x", "y")
    val p = Stats.cramersV(perfect, Seq.empty, "x", "y")
      .select($"n", $"r", $"c", $"chi2_micro", $"v2_ppm")
      .as[(Long, Long, Long, Long, Long)].head()
    p._1 shouldBe 4L
    p._4 shouldBe 4000000L // n * 1e6
    p._5 shouldBe 1000000L
    // exactly independent 2x2 (all four cells equal): chi2 floors to 0
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")).toDF("x", "y")
    val i = Stats.cramersV(indep, Seq.empty, "x", "y")
      .select($"chi2_micro", $"v2_ppm").as[(Long, Long)].head()
    i shouldBe ((0L, 0L))
  }

  test("cramersV: hand-computed mid table via the observed-cell identity") {
    // cells: (a,u)=3 (a,v)=1 (b,u)=1 (b,v)=3; r=c=(4,4), n=8
    // sum o²n·1e6/(rc): two cells of 9*8e6/16 = 4500000, two of 1*8e6/16=500000
    // chi2 = 10000000 - 8000000 = 2000000 micro (exact: chi2 = 2)
    val df = (Seq.fill(3)(("a", "u")) ++ Seq(("a", "v")) ++
      Seq(("b", "u")) ++ Seq.fill(3)(("b", "v"))).toDF("x", "y")
    val out = Stats.cramersV(df, Seq.empty, "x", "y")
      .select($"n", $"chi2_micro", $"v2_ppm").as[(Long, Long, Long)].head()
    out shouldBe ((8L, 2000000L, 250000L)) // V² = 2/8 = 0.25
  }

  test("cramersV: degenerate tables null out, nulls drop, grouping works") {
    val df = Seq(
      ("g1", Some("a"), Some("u")), ("g1", Some("a"), Some("v")),
      ("g1", Some("b"), Some("u")), ("g1", Some("b"), Some("v")),
      ("g1", None, Some("u")), ("g1", Some("a"), None), // dropped rows
      ("g2", Some("a"), Some("u")), ("g2", Some("a"), Some("v")) // 1 row cat
    ).toDF("g", "x", "y")
    val out = Stats.cramersV(df, Seq("g"), "x", "y")
      .select($"g", $"n", $"r", $"c", $"chi2_micro", $"v2_ppm")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    out("g1")._2 shouldBe 4L // null rows dropped
    out("g1")._5 shouldBe Some(0L)
    out("g2")._3 shouldBe 1L // r < 2 -> null statistic
    out("g2")._5 shouldBe None
    out("g2")._6 shouldBe None
  }

  test("cramersV is a pure function of the data, not its partitioning") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map(_ => ("x" + rnd.nextInt(5), "y" + rnd.nextInt(4)))
    def run(parts: Int) =
      Stats.cramersV(rows.toDF("x", "y").repartition(parts), Seq.empty, "x", "y")
        .collect().map(_.toSeq).toSet
    run(1) shouldBe run(17)
  }

  test("labelBalance: hand-computed gini/majority, null accounting, tie law") {
    val df = Seq(
      ("a", Some("en")), ("a", Some("en")), ("a", Some("en")), ("a", Some("de")),
      ("b", Some("x")), ("b", Some("y")), // tie -> majority = largest label
      ("c", Some("zz")), ("c", None)
    ).toDF("g", "lbl")
    val out = Stats.labelBalance(df, Seq("g"), "lbl")
      .as[(String, Long, Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // a: n=4, counts {en:3, de:1}: majority en 750000, gini = 1e6 - (9+1)*1e6/16
    out("a") shouldBe (("a", 4L, 0L, 2L, "en", 750000L, 1000000L - 10L * 1000000L / 16L))
    // b: 2 labels tied at 1 -> majority 'y' (largest), gini = 1e6 - 2*1e6/4
    out("b") shouldBe (("b", 2L, 0L, 2L, "y", 500000L, 500000L))
    // c: one non-null label -> gini 0; the null row surfaces in n_null
    out("c") shouldBe (("c", 1L, 1L, 1L, "zz", 1000000L, 0L))
  }

  test("labelBalance is a pure function of the data, not its partitioning") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 2000).map(_ =>
      ("s" + rnd.nextInt(3), if (rnd.nextInt(10) == 0) None else Some("l" + rnd.nextInt(6))))
    def run(parts: Int) =
      Stats.labelBalance(rows.toDF("g", "lbl").repartition(parts), Seq("g"), "lbl")
        .collect().map(_.toSeq).toSet
    run(1) shouldBe run(17)
  }

  test("prSweep: hand-computed confusion counts at every threshold") {
    // scores: pos at 10, 30, 30; neg at 20, 30  (thresholds 10, 20, 30)
    val df = Seq(("g", 10L, true), ("g", 30L, true), ("g", 30L, true),
      ("g", 20L, false), ("g", 30L, false)).toDF("g", "s", "pos")
    val rows = Stats.prSweep(df, Seq("g"), "s", col("pos"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._2 -> r).toMap
    // threshold 10 (>= 10 -> everything positive): tp=3 fp=2 fn=0
    rows(10L) shouldBe (("g", 10L, 3L, 2L, 3L, 2L, 0L, 600000L, 1000000L, 750000L))
    // threshold 20: tp=2 (the two 30s) fp=2 fn=1
    rows(20L) shouldBe (("g", 20L, 3L, 2L, 2L, 2L, 1L, 500000L, 666666L, 571428L))
    // threshold 30: tp=2 fp=1 fn=1
    rows(30L) shouldBe (("g", 30L, 3L, 2L, 2L, 1L, 1L, 666666L, 666666L, 666666L))
  }

  test("prSweep: no positives nulls recall, null scores/labels drop, partition-pure") {
    val noPos = Seq(("g", 5L, false), ("g", 7L, false)).toDF("g", "s", "pos")
    val r = Stats.prSweep(noPos, Seq("g"), "s", col("pos")).collect()
    r.foreach { row =>
      row.isNullAt(row.fieldIndex("recall_ppm")) shouldBe true
      row.getLong(row.fieldIndex("precision_ppm")) shouldBe 0L
    }
    val withNulls = Seq((Some(5L), Some(true)), (None, Some(true)),
      (Some(6L), None)).map { case (s, p) => ("g", s, p) }.toDF("g", "s", "pos")
    Stats.prSweep(withNulls, Seq("g"), "s", col("pos")).count() shouldBe 1L

    val rnd = new scala.util.Random(23)
    val big = Seq.fill(500)(("g" + rnd.nextInt(2), rnd.nextInt(40).toLong,
      rnd.nextBoolean())).toDF("g", "s", "pos")
    Stats.prSweep(big.coalesce(1), Seq("g"), "s", col("pos"))
      .collect().map(_.toSeq).toSet shouldBe
      Stats.prSweep(big.repartition(13), Seq("g"), "s", col("pos"))
        .collect().map(_.toSeq).toSet
  }

  test("cupedAdjust: hand-computed pooled theta moves both arm means") {
    // arm0 units (x,y): (0,10),(10,30); arm1: (20,30),(30,50)
    // pooled: N=4 SX=60 SY=120 SXX=1400 SXY=2400
    // dxx = 4*1400-3600 = 2000; dxy = 4*2400-7200 = 2400 -> theta = 1.2
    // arm0: mean_y=20e6, mean_x=5e6, pooled_x=15e6 -> adj = 20e6 + 12e6
    // arm1: mean_y=40e6, mean_x=25e6            -> adj = 40e6 - 12e6
    // raw lift +20e6 becomes -4e6: the covariate explained it and more
    val df = Seq(("g", 0L, 0L, 10L), ("g", 0L, 10L, 30L),
      ("g", 1L, 20L, 30L), ("g", 1L, 30L, 50L)).toDF("g", "arm", "x", "y")
    val out = Stats.cupedAdjust(df, Seq("g"), "arm", "y", "x")
      .as[(String, Long, Long, Long, Option[Long], Long)]
      .collect().map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    out(0L) shouldBe ((2L, 20000000L, Some(1200000L), 32000000L))
    out(1L) shouldBe ((2L, 40000000L, Some(1200000L), 28000000L))
  }

  test("cupedAdjust: constant covariate nulls theta and leaves means; nulls drop") {
    val flat = Seq(("g", 0L, 7L, 10L), ("g", 0L, 7L, 20L),
      ("g", 1L, 7L, 30L)).toDF("g", "arm", "x", "y")
    val out = Stats.cupedAdjust(flat, Seq("g"), "arm", "y", "x")
      .as[(String, Long, Long, Long, Option[Long], Long)]
      .collect().map(r => r._2 -> ((r._4, r._5, r._6))).toMap
    out(0L) shouldBe ((15000000L, None, 15000000L))
    out(1L) shouldBe ((30000000L, None, 30000000L))

    val withNulls = Seq(
      (Some(0L), Some(1L), Some(2L)), (None, Some(1L), Some(2L)),
      (Some(0L), None, Some(2L)), (Some(0L), Some(1L), None))
      .map { case (a, x, y) => ("g", a, x, y) }.toDF("g", "arm", "x", "y")
    Stats.cupedAdjust(withNulls, Seq("g"), "arm", "y", "x")
      .agg(sum(col("n"))).as[Long].collect().head shouldBe 1L
  }

  test("cupedAdjust is a pure function of the data, not its partitioning") {
    val rnd = new scala.util.Random(37)
    val rows = Seq.fill(400)(("g" + rnd.nextInt(2), rnd.nextInt(2).toLong,
      rnd.nextInt(100).toLong, rnd.nextInt(100).toLong - 30L))
    def run(parts: Int) =
      Stats.cupedAdjust(rows.toDF("g", "arm", "x", "y").repartition(parts),
        Seq("g"), "arm", "y", "x").collect().map(_.toSeq).toSet
    run(1) shouldBe run(13)
  }

  test("srmCheck: textbook chi-squared digits; balanced splits score zero") {
    // 60/40 on n=100: chi2 = (10²/50)*2 = 4 -> 4,000,000 micro
    val df = (Seq.fill(60)(("g", 0L)) ++ Seq.fill(40)(("g", 1L)) ++
      Seq.fill(50)(("ok", 0L)) ++ Seq.fill(50)(("ok", 1L)) ++
      Seq.fill(10)(("k3", 0L)) ++ Seq.fill(10)(("k3", 1L)) ++
      Seq.fill(40)(("k3", 2L))).toDF("g", "arm")
    val out = Stats.srmCheck(df, Seq("g"), "arm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    out("g") shouldBe ((100L, 2L, 4000000L))
    out("ok") shouldBe ((100L, 2L, 0L))
    // (10,10,40): sum(3o-60)² = 5400, /(60*3) = 30
    out("k3") shouldBe ((60L, 3L, 30000000L))
  }

  test("srmCheck: null arms drop, single arm scores zero, partition-pure") {
    val df = Seq(("g", Some(0L)), ("g", Some(0L)), ("g", None)).toDF("g", "arm")
    Stats.srmCheck(df, Seq("g"), "arm")
      .as[(String, Long, Long, Long)].collect().head shouldBe (("g", 2L, 1L, 0L))
    val rnd = new scala.util.Random(67)
    val rows = Seq.fill(800)(("g" + rnd.nextInt(3), rnd.nextInt(4).toLong))
    def run(parts: Int) =
      Stats.srmCheck(rows.toDF("g", "arm").repartition(parts), Seq("g"), "arm")
        .collect().map(_.toSeq).toSet
    run(1) shouldBe run(13)
  }

  test("mcnemar: only disagreements count; agreement-only groups are null") {
    // b = 6 (A right, B wrong), c = 2: chi2 = 16/8 = 2 -> 2,000,000 micro
    val df = (Seq.fill(10)(("g", true, true)) ++ Seq.fill(5)(("g", false, false)) ++
      Seq.fill(6)(("g", true, false)) ++ Seq.fill(2)(("g", false, true)))
      .toDF("g", "a", "b")
    val r = Stats.mcnemar(df, Seq("g"), col("a"), col("b")).collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) shouldBe
      ((23L, 10L, 5L, 6L, 2L))
    r.getLong(r.fieldIndex("mcnemar_micro")) shouldBe 2000000L
    // models that never disagree carry no information -> null, not 0
    val agree = Seq(("g", true, true), ("g", false, false)).toDF("g", "a", "b")
    val ag = Stats.mcnemar(agree, Seq("g"), col("a"), col("b")).collect().head
    ag.isNullAt(ag.fieldIndex("mcnemar_micro")) shouldBe true
    // sign symmetry: swapping the models leaves the statistic unchanged
    val swapped = Stats.mcnemar(df, Seq("g"), col("b"), col("a")).collect().head
    swapped.getLong(swapped.fieldIndex("mcnemar_micro")) shouldBe 2000000L
  }

  test("brierScore: oracle 0, always-half 250000, hand digits, null laws") {
    val df = Seq(
      ("oracle", 1000000L, true), ("oracle", 0L, false),
      ("half", 500000L, true), ("half", 500000L, false),
      // (0.8, y=1) -> 0.04; (0.4, y=0) -> 0.16; mean = 0.10
      ("hand", 800000L, true), ("hand", 400000L, false))
      .toDF("g", "score", "y")
    val out = Stats.brierScore(df, Seq("g"), "score", "y")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    out("oracle") shouldBe 0L
    out("half") shouldBe 250000L
    out("hand") shouldBe 100000L
    // null scores/outcomes drop before the mean
    val nulls = Seq(("g", Some(500000L), Some(true)), ("g", None, Some(true)),
      ("g", Some(1L), None)).toDF("g", "score", "y")
    Stats.brierScore(nulls, Seq("g"), "score", "y")
      .as[(String, Long, Long)].collect().head._2 shouldBe 1L
  }

  test("f1FromConfusion: hand digits; never-true and never-predicted classes both appear") {
    val cells = Seq(("a", "a", 8L), ("a", "b", 2L), ("b", "b", 3L),
      ("b", "a", 1L), ("c", "a", 1L), ("a", "d", 1L)).toDF("t", "p", "n")
    val out = Stats.f1FromConfusion(cells, Seq.empty, "t", "p", "n")
      .as[(String, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    out("a") shouldBe ((8L, 2L, 3L, Some(800000L), Some(727272L), Some(761904L)))
    out("b") shouldBe ((3L, 2L, 1L, Some(600000L), Some(750000L), Some(666666L)))
    // c is true-only: no predictions ever -> precision null, recall 0
    out("c") shouldBe ((0L, 0L, 1L, None, Some(0L), Some(0L)))
    // d is predicted-only: the damning 0 precision, recall undefined
    out("d") shouldBe ((0L, 1L, 0L, Some(0L), None, Some(0L)))
  }

  test("f1FromConfusion: sliced cells merge to the whole-data readout") {
    val rnd = new scala.util.Random(73)
    val rows = Seq.fill(400)(("g" + rnd.nextInt(2), "c" + rnd.nextInt(4),
      "c" + rnd.nextInt(4)))
    def toCells(rs: Seq[(String, String, String)]) =
      rs.toDF("g", "t", "p").groupBy($"g", $"t", $"p")
        .agg(count(lit(1)).as("n"))
    val whole = Stats.f1FromConfusion(toCells(rows), Seq("g"), "t", "p", "n")
      .collect().map(_.toSeq).toSet
    // two row slices produce DUPLICATE (g, t, p) cells — they must ADD
    val sliced = toCells(rows.take(200)).unionByName(toCells(rows.drop(200)))
    Stats.f1FromConfusion(sliced, Seq("g"), "t", "p", "n")
      .collect().map(_.toSeq).toSet shouldBe whole
  }

  test("effectiveSampleSize: flat weights keep every row, a heavy weight collapses it") {
    val df = Seq(("flat", 1L), ("flat", 1L), ("flat", 1L), ("flat", 1L),
      ("mono", 10L), ("mono", 0L),
      ("skew", 3L), ("skew", 1L),
      ("zero", 0L), ("zero", 0L)).toDF("g", "w")
    val out = Stats.effectiveSampleSize(df, Seq("g"), "w")
      .as[(String, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    out("flat") shouldBe ((4L, Some(4000000L), Some(1000000L)))
    out("mono") shouldBe ((2L, Some(1000000L), Some(500000L)))
    out("skew") shouldBe ((2L, Some(1600000L), Some(800000L))) // 16/10
    out("zero") shouldBe ((2L, None, None))
  }

  test("diffInDiff: control trend cancels; an empty cell nulls the estimate") {
    // treated pre 10,20 (mean 15); treated post 30; control pre 5; post 10
    // DiD = (30 - 15) - (10 - 5) = 10 (micro x1e6)
    val df = Seq(("g", true, false, 10L), ("g", true, false, 20L),
      ("g", true, true, 30L), ("g", false, false, 5L), ("g", false, true, 10L))
      .toDF("g", "t", "p", "y")
    val r = Stats.diffInDiff(df, Seq("g"), col("t"), col("p"), "y").collect().head
    r.getLong(r.fieldIndex("mean_t0_micro")) shouldBe 15000000L
    r.getLong(r.fieldIndex("did_micro")) shouldBe 10000000L
    // no control-post rows -> the whole estimate is null, not zero
    val missing = df.where(!(col("t") === false && col("p") === true))
    val r2 = Stats.diffInDiff(missing, Seq("g"), col("t"), col("p"), "y")
      .collect().head
    r2.isNullAt(r2.fieldIndex("mean_cp_micro")) shouldBe true
    r2.isNullAt(r2.fieldIndex("did_micro")) shouldBe true
  }

  test("srmFromCounts: sliced counts merge to the whole-data guardrail") {
    val rnd = new scala.util.Random(71)
    val rows = Seq.fill(500)(("g" + rnd.nextInt(2), rnd.nextInt(3).toLong,
      rnd.nextInt(4).toLong)) // (group, arm, day-slice)
    val df = rows.toDF("g", "arm", "day")
    val whole = Stats.srmCheck(df, Seq("g"), "arm").collect().map(_.toSeq).toSet
    val sliced = df.groupBy($"day", $"g", $"arm").count()
    Stats.srmFromCounts(sliced, Seq("g"), "arm", "count")
      .collect().map(_.toSeq).toSet shouldBe whole
  }

  test("mantelHaenszel: hand digits across two strata; degenerate strata carry nothing") {
    def stratum(s: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)(("g", s, true, true)) ++ Seq.fill(b)(("g", s, true, false)) ++
        Seq.fill(c)(("g", s, false, true)) ++ Seq.fill(d)(("g", s, false, false))
    // s1: (8,2,3,2) n=15  r=floor(16000/15)=1066  s=floor(6000/15)=400
    //     E=floor(10*11*1000/15)=7333 dev=8000-7333=667
    //     var=(50000 DIV 15)*(44000 DIV 15) DIV 14 = 3333*2933 DIV 14 = 698263
    // s2: (2,8,1,9) n=20  r=900  s=400  E=1500 dev=500
    //     var=5000*2550 DIV 19 = 671052
    // or = (1066+900)*1e6 DIV 800 = 2457500
    // chi2 = 1167^2 * 1e6 DIV 1369315 = 994576
    val df = (stratum(1, 8, 2, 3, 2) ++ stratum(2, 2, 8, 1, 9)).toDF("g", "s", "x", "o")
    val r = Stats.mantelHaenszel(df, Seq("g"), "s", "x", "o").collect().head
    r.getLong(r.fieldIndex("n_strata")) shouldBe 2L
    r.getLong(r.fieldIndex("n")) shouldBe 35L
    r.getLong(r.fieldIndex("or_mh_ppm")) shouldBe 2457500L
    r.getLong(r.fieldIndex("cmh_chi2_micro")) shouldBe 994576L
    // an all-exposed stratum (zero !x margin) moves NEITHER statistic:
    // its cross-products are 0 and its E/Var are excluded as degenerate
    val df2 = (stratum(1, 8, 2, 3, 2) ++ stratum(2, 2, 8, 1, 9) ++
      stratum(3, 5, 5, 0, 0)).toDF("g", "s", "x", "o")
    val r2 = Stats.mantelHaenszel(df2, Seq("g"), "s", "x", "o").collect().head
    r2.getLong(r2.fieldIndex("n_strata")) shouldBe 3L
    r2.getLong(r2.fieldIndex("or_mh_ppm")) shouldBe 2457500L
    r2.getLong(r2.fieldIndex("cmh_chi2_micro")) shouldBe 994576L
    // every stratum degenerate -> both statistics null, not zero
    val r3 = Stats.mantelHaenszel(stratum(1, 5, 5, 0, 0).toDF("g", "s", "x", "o"),
      Seq("g"), "s", "x", "o").collect().head
    r3.isNullAt(r3.fieldIndex("or_mh_ppm")) shouldBe true
    r3.isNullAt(r3.fieldIndex("cmh_chi2_micro")) shouldBe true
  }

  test("etaSquared: hand digits, perfect separation, no-signal zero, constant null") {
    // A:(2,4) B:(10,12): t=18+242=260, num=4*260-784=256, den=4*264-784=272
    val df = Seq(("g", "A", 2L), ("g", "A", 4L), ("g", "B", 10L), ("g", "B", 12L))
      .toDF("g", "c", "v")
    val r = Stats.etaSquared(df, Seq("g"), "c", "v").collect().head
    r.getLong(r.fieldIndex("n")) shouldBe 4L
    r.getLong(r.fieldIndex("k")) shouldBe 2L
    r.getLong(r.fieldIndex("eta2_ppm")) shouldBe 941176L // 256e6 DIV 272
    // category determines the value exactly -> 1e6
    val perfect = Seq(("g", "A", 5L), ("g", "A", 5L), ("g", "B", 9L), ("g", "B", 9L))
      .toDF("g", "c", "v")
    Stats.etaSquared(perfect, Seq("g"), "c", "v")
      .select($"eta2_ppm").as[Long].head() shouldBe 1000000L
    // identical distributions per category -> 0
    val flat = Seq(("g", "A", 3L), ("g", "A", 7L), ("g", "B", 3L), ("g", "B", 7L))
      .toDF("g", "c", "v")
    Stats.etaSquared(flat, Seq("g"), "c", "v")
      .select($"eta2_ppm").as[Long].head() shouldBe 0L
    // constant value: zero total variance -> null, not zero
    val const = Seq(("g", "A", 5L), ("g", "B", 5L)).toDF("g", "c", "v")
    val rc = Stats.etaSquared(const, Seq("g"), "c", "v").collect().head
    rc.isNullAt(rc.fieldIndex("eta2_ppm")) shouldBe true
  }

  test("etaSquared: sliced cells' union equals whole-data; partition-pure") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(400)(("g" + rnd.nextInt(2), rnd.nextInt(7).toString,
      rnd.nextInt(1000).toLong))
    def go(p: Int) = Stats.etaSquared(rows.toDF("g", "c", "v").repartition(p),
      Seq("g"), "c", "v").collect().map(_.toSeq).toSet
    go(1) shouldBe go(16)
  }

  test("mantelHaenszel: day-sliced cells merge to the whole-data readout") {
    val rnd = new scala.util.Random(73)
    val rows = Seq.fill(600)(("g" + rnd.nextInt(2), rnd.nextInt(4).toLong,
      rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextInt(3)))
    val df = rows.toDF("g", "s", "x", "o", "day")
    val whole = Stats.mantelHaenszel(df, Seq("g"), "s", "x", "o")
      .collect().map(_.toSeq).toSet
    // daily cells ADD per (group, stratum) before finishing
    def cell(p: org.apache.spark.sql.Column) = sum(when(p, 1L).otherwise(0L))
    val daily = df.groupBy($"day", $"g", $"s")
      .agg(cell($"x" && $"o").as("a"), cell($"x" && !$"o").as("b"),
        cell(!$"x" && $"o").as("c"), cell(!$"x" && !$"o").as("d"))
    val merged = daily.groupBy($"g", $"s")
      .agg(sum($"a").as("a"), sum($"b").as("b"), sum($"c").as("c"), sum($"d").as("d"))
    Stats.mantelHaenszelFromCells(merged, Seq("g"))
      .collect().map(_.toSeq).toSet shouldBe whole
  }

  test("kaplanMeier: hand-replayed curve — censoring shrinks risk, not survival") {
    // durations: 1 event, 2 censored, 3 event x2, 4 censored (N = 5)
    // t=1: S = 1e6*4 DIV 5 = 800000; t=2 censored only: S unchanged;
    // t=3: S = 800000*(3-2) DIV 3 = 266666 (truncated); t=4: unchanged
    val df = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true),
      ("g", 3L, true), ("g", 4L, false)).toDF("g", "t", "ev")
    val out = Stats.kaplanMeier(df, Seq("g"), "t", col("ev"))
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    out(1L) shouldBe ((5L, 1L, 0L, 800000L))
    out(2L) shouldBe ((4L, 0L, 1L, 800000L))
    out(3L) shouldBe ((3L, 2L, 0L, 266666L))
    out(4L) shouldBe ((1L, 0L, 1L, 266666L))
  }

  test("kaplanMeier: all-censored stays at 1e6; matches a driver fold; partition-pure") {
    val cens = Seq(("g", 1L, false), ("g", 5L, false)).toDF("g", "t", "ev")
    Stats.kaplanMeier(cens, Seq("g"), "t", col("ev"))
      .select(col("surv_ppm")).as[Long].collect().toSet shouldBe Set(1000000L)

    val rnd = new scala.util.Random(53)
    val rows = Seq.fill(600)(("g" + rnd.nextInt(2), rnd.nextInt(20).toLong + 1,
      rnd.nextInt(3) > 0))
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      var atRisk = rs.size.toLong
      var surv = 1000000L
      rs.groupBy(_._2).toSeq.sortBy(_._1).map { case (t, ts) =>
        val d = ts.count(_._3).toLong
        val c = ts.size - d
        if (d > 0) surv = surv * (atRisk - d) / atRisk
        val row = (g, t) -> ((atRisk, d, c, surv))
        atRisk -= d + c
        row
      }
    }
    def run(parts: Int) =
      Stats.kaplanMeier(rows.toDF("g", "t", "ev").repartition(parts),
        Seq("g"), "t", col("ev"))
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    run(1) shouldBe expected
    run(13) shouldBe expected
  }

  test("giniConcentration: equality 0, near-monopoly (n-1)/n, exact HHI") {
    val df = Seq(("eq", 1L, 1L), ("eq", 2L, 1L), ("eq", 3L, 1L), ("eq", 4L, 1L),
      ("mono", 1L, 0L), ("mono", 2L, 0L), ("mono", 3L, 0L), ("mono", 4L, 10L),
      ("pair", 1L, 5L), ("pair", 2L, 5L)).toDF("g", "id", "v")
    val out = Stats.giniConcentration(df, Seq("g"), "v", "id")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    out("eq") shouldBe ((4L, 4L, Some(0L), Some(250000L)))
    out("mono") shouldBe ((4L, 10L, Some(750000L), Some(1000000L)))
    out("pair") shouldBe ((2L, 10L, Some(0L), Some(500000L)))
  }

  test("giniConcentration: zero mass nulls both axes; partition-pure") {
    val zero = Seq(("z", 1L, 0L), ("z", 2L, 0L)).toDF("g", "id", "v")
    Stats.giniConcentration(zero, Seq("g"), "v", "id")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().head shouldBe (("z", 2L, 0L, None, None))
    val rnd = new scala.util.Random(43)
    val rows = (1L to 500L).map(i => ("g" + (i % 3), i, rnd.nextInt(1000).toLong))
    def run(parts: Int) =
      Stats.giniConcentration(rows.toDF("g", "id", "v").repartition(parts),
        Seq("g"), "v", "id").collect().map(_.toSeq).toSet
    run(1) shouldBe run(13)
  }

  test("prSweep matches the naive per-threshold filter on random data") {
    val rnd = new scala.util.Random(41)
    val data = Seq.fill(300)((rnd.nextInt(25).toLong, rnd.nextInt(3) == 0))
    val got = Stats.prSweep(data.toDF("s", "pos").withColumn("g", lit("g"))
        .repartition(9), Seq("g"), "s", col("pos"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._2 -> ((r._5, r._6, r._7))).toMap
    val pTot = data.count(_._2)
    data.map(_._1).distinct.foreach { t =>
      val tp = data.count(d => d._1 >= t && d._2)
      val fp = data.count(d => d._1 >= t && !d._2)
      got(t) shouldBe ((tp.toLong, fp.toLong, (pTot - tp).toLong))
    }
  }

  private def alpha(rows: Seq[(String, Long, String)]) =
    Stats.krippendorffAlpha(rows.toDF("g", "u", "c"), Seq("g"), "u", "c")
      .as[(String, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("krippendorffAlpha: perfect agreement is 1e6, maximal disagreement -5e5") {
    val out = alpha(Seq(
      ("perf", 1L, "a"), ("perf", 1L, "a"), ("perf", 2L, "b"), ("perf", 2L, "b"),
      ("anti", 1L, "a"), ("anti", 1L, "b"), ("anti", 2L, "a"), ("anti", 2L, "b")))
    out("perf") shouldBe ((2L, 0L, 4L, Some(1000000L)))
    // Do = 1, De = 2/3 -> alpha = -1/2 exactly
    out("anti") shouldBe ((2L, 0L, 4L, Some(-500000L)))
  }

  test("krippendorffAlpha: unbalanced panel, hand-computed staged digits") {
    // u1 (a,a), u2 (a,b,b), u3 (b) single -> excluded
    // n=5, Do terms: 0 and (9-5)/2 = 2 -> sum_ppm 2e6; c_a=3 c_b=2,
    // De_num = 25-13 = 12; alpha = 1e6 - (4*2e6) DIV 12 = 333334
    // (exact alpha = 1/3; the subtracted term floors, so alpha rounds UP <= 1)
    val out = alpha(Seq(
      ("g", 1L, "a"), ("g", 1L, "a"),
      ("g", 2L, "a"), ("g", 2L, "b"), ("g", 2L, "b"),
      ("g", 3L, "b")))
    out("g") shouldBe ((2L, 1L, 5L, Some(333334L)))
  }

  test("krippendorffAlpha: one category or no 2+-rated units yields null") {
    val out = alpha(Seq(
      ("one", 1L, "a"), ("one", 1L, "a"), ("one", 2L, "a"), ("one", 2L, "a"),
      ("none", 1L, "a"), ("none", 2L, "b")))
    out("one") shouldBe ((2L, 0L, 4L, None))
    out("none") shouldBe ((0L, 2L, 0L, None))
  }

  test("krippendorffAlpha: null categories are a real category") {
    val rows = Seq(
      ("g", 1L, Some("a")), ("g", 1L, None),
      ("g", 2L, Some("a")), ("g", 2L, None)).toDF("g", "u", "c")
    val out = Stats.krippendorffAlpha(rows, Seq("g"), "u", "c")
      .as[(String, Long, Long, Long, Option[Long])].collect().head
    // both units split a/null identically: Do = 1, De = 2/3 -> -500000
    out shouldBe (("g", 2L, 0L, 4L, Some(-500000L)))
  }

  private def bh(ps: Seq[Long], alphaPpm: Long) =
    Stats.benjaminiHochberg(
      ps.zipWithIndex.map { case (p, i) => ("g", i.toLong, p) }.toDF("g", "id", "p_ppm"),
      Seq("g"), "p_ppm", "id", alphaPpm)
      .as[(String, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._3 -> ((r._4, r._5, r._6))).toMap

  test("benjaminiHochberg: hand-computed cutoff at rank 4 of 10") {
    // thresholds alpha*i/m = 5000*i: p4=20000 <= 20000 holds, p5=30000 > 25000
    val out = bh(Seq(1000L, 8000L, 12000L, 20000L, 30000L,
      200000L, 300000L, 400000L, 500000L, 600000L), alphaPpm = 50000L)
    out(20000L) shouldBe ((4L, 10L, true))
    out(30000L) shouldBe ((5L, 10L, false))
    out(600000L) shouldBe ((10L, 10L, false))
  }

  test("benjaminiHochberg: step-up rescues a rank that individually fails") {
    // i=2 fails (39000*3 > 50000*2) but i=3 passes (40000*3 <= 50000*3),
    // so the cutoff is 3 and EVERYTHING below it is significant
    val out = bh(Seq(10000L, 40000L, 39000L), alphaPpm = 50000L)
    out.values.map(_._3).toSeq.distinct shouldBe Seq(true)
  }

  test("quantileTreatmentEffects: hand-computed per-quantile shifts; one-armed groups drop") {
    val rows = (1L to 10L).map(v => ("g", v, true)) ++
      (11L to 20L).map(v => ("g", v, false)) ++
      (1L to 5L).map(v => ("lone", v, true)) // no control arm
    val out = Stats.quantileTreatmentEffects(
      rows.toDF("g", "v", "t"), "g", "v", col("t"), Seq(50, 90))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    out.keySet shouldBe Set(("g", 50L), ("g", 90L))
    out(("g", 50L)) shouldBe ((5L, 15L, -10L)) // nearest-rank p50 of 1..10 vs 11..20
    out(("g", 90L)) shouldBe ((9L, 19L, -10L))
  }

  test("poissonBootstrapCI: deterministic, partition-pure, CI brackets the point mean") {
    val df = (1L to 200L).map(v => ("g", v, v * 100))
    def go(parts: Int) =
      Stats.poissonBootstrapCI(df.toDF("g", "id", "cents").repartition(parts),
        "g", "id", "cents", b = 32)
        .as[(String, Long, Long, Long, Long)].collect().head
    val one = go(1)
    one shouldBe go(16) // pure function of the data, not the layout
    val (_, n, mean, lo, hi) = one
    n shouldBe 200L
    mean shouldBe 10050000000L // exact micro mean of 100..20000 cents
    lo should be <= hi
    // resampled means of a 1..200 uniform sample stay inside the range
    lo should be > 100L * 1000000L / 100L
    hi should be < 20000L * 1000000L
    // and the 5-95 band brackets the point estimate on this sample
    lo should be <= mean
    hi should be >= mean
  }

  test("PoissonCdf16 equals floor(Poisson(1) CDF * 2^16) computed from the pmf") {
    // pmf(k) = e^-1 / k!; the table holds the first 7 CDF thresholds floored
    // to the 16-bit bucket domain — the law the scaladoc promises, checked
    // here so a transcription slip can never silently bias every CI again
    val pmf = Iterator.iterate((0, math.exp(-1.0))) { case (k, p) =>
      (k + 1, p / (k + 1)) }.map(_._2)
    val cdf = pmf.scanLeft(0.0)(_ + _).drop(1)
    val expected = cdf.map(c => math.floor(c * 65536.0).toLong).take(7).toSeq
    Stats.PoissonCdf16.map(_.toLong) shouldBe expected
  }

  test("poissonWeightArray: native kernel element-identical to the composed conv form") {
    // ids exercise multi-digit, negative-looking and non-numeric strings;
    // b = 13 crosses a block boundary mid-block, b = 32 is the battery law
    val ids = ((1L to 300L).map(_.toString) ++ Seq("x:y", "-7", "", "éß"))
      .toDF("id")
    for ((b, salt) <- Seq((32, "boot"), (13, "s2.t-3"))) {
      val native = ids.select($"id",
        Stats.poissonWeightArray($"id", b, salt).as("w"))
        .as[(String, Seq[Long])].collect().toMap
      val composed = ids.select($"id",
        Stats.poissonWeightArrayComposed($"id", b, salt).as("w"))
        .as[(String, Seq[Long])].collect().toMap
      native shouldBe composed
      native.values.flatten.foreach { w => w should be >= 0L; w should be <= 7L }
    }
  }

  test("poissonBootstrapCI: a fresh salt draws a different replicate set") {
    val df = (1L to 100L).map(v => ("g", v, v)).toDF("g", "id", "v")
    val a = Stats.poissonBootstrapCI(df, "g", "id", "v", b = 16)
      .select($"ci_lo_micro", $"ci_hi_micro").as[(Long, Long)].head()
    val c = Stats.poissonBootstrapCI(df, "g", "id", "v", b = 16, salt = "boot2")
      .select($"ci_lo_micro", $"ci_hi_micro").as[(Long, Long)].head()
    a should not be c
  }

  test("featureBins: hand-computed quintiles, monotone target rate, edge ties left") {
    val df = (1L to 10L).map(v => ("g", v, v > 6)).toDF("g", "f", "t")
    val out = Stats.featureBins(df, "g", "f", col("t"), nBins = 5)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    // edges = p20/40/60/80 of 1..10 -> 2,4,6,8; two values per bin
    out.keySet shouldBe Set(0L, 1L, 2L, 3L, 4L)
    out(0L) shouldBe ((2L, 0L, 0L))
    out(2L) shouldBe ((2L, 0L, 0L))
    out(3L) shouldBe ((2L, 2L, 1000000L))
    out(4L) shouldBe ((2L, 2L, 1000000L))
    // a constant feature degenerates to one bin holding everything
    val const = Seq.fill(8)(("g", 5L, true)).toDF("g", "f", "t")
    val one = Stats.featureBins(const, "g", "f", col("t"), nBins = 4)
      .as[(String, Long, Long, Long, Long)].collect()
    one.toSeq shouldBe Seq(("g", 0L, 8L, 8L, 1000000L))
  }

  test("benjaminiHochberg: nothing passes -> all false; null p-values drop from m") {
    val out = bh(Seq(900000L, 950000L), alphaPpm = 50000L)
    out.values.map(_._3).toSet shouldBe Set(false)
    val withNull = Seq(("g", 0L, Some(10000L)), ("g", 1L, None))
      .toDF("g", "id", "p_ppm")
    val res = Stats.benjaminiHochberg(withNull, Seq("g"), "p_ppm", "id", 50000L)
      .as[(String, Long, Option[Long], Long, Long, Boolean)].collect()
    res.length shouldBe 1
    res.head._5 shouldBe 1L // m counts only non-null p-values
  }
}
