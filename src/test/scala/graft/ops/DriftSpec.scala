package graft.ops

import graft.testkit.SparkTestBase

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("vocabDrift: exact integer ppm; additions and deletions surface") {
    val old = Seq((1L, "a a b gone")).toDF("id", "text") // totals: a=2 b=1 gone=1 of 4
    val cur = Seq((1L, "a b b b new")).toDF("id", "text") // totals: a=1 b=3 new=1 of 5
    val rows = Drift.vocabDrift(old, cur, "text", k = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows("a") shouldBe ((500000L, 200000L, -300000L))
    rows("b") shouldBe ((250000L, 600000L, 350000L))
    rows("gone") shouldBe ((250000L, 0L, -250000L)) // vanished term: ppm_cur = 0
    rows("new") shouldBe ((0L, 200000L, 200000L)) // new term: ppm_old = 0
  }

  test("vocabDrift with an empty side yields defined ppm rows, never nulls") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val cur = Seq((1L, "a a b")).toDF("id", "text")
    // brand-new corpus vs nothing: everything is an addition with ppm_old = 0
    val rows = Drift.vocabDrift(empty, cur, "text", k = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows("a") shouldBe ((0L, 666666L, 666666L))
    rows("b") shouldBe ((0L, 333333L, 333333L))
    // and the mirror: a corpus diffed against a now-empty snapshot
    val gone = Drift.vocabDrift(cur, empty, "text", k = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    gone("a") shouldBe ((666666L, 0L, -666666L))
  }

  test("vocabDrift top-k is a total order: |delta| desc, then term asc") {
    val old = Seq((1L, "x y")).toDF("id", "text")
    val cur = Seq((1L, "x z")).toDF("id", "text")
    // y (-500000) and z (+500000) tie on |delta|; 'y' < 'z' wins the k=1 cut
    Drift.vocabDrift(old, cur, "text", k = 1)
      .select("term").as[String].collect() shouldBe Array("y")
  }

  test("volumeAnomalies: exact trailing-window spike detection") {
    // key a: 9 days at 10 rows, then a 16-row day
    //   day 10 window = days 3..9 (7 days, 70 rows): 16*7*100 > 70*115 -> flag
    //   steady days never flag: 10*pd*100 <= 10*pd*115
    // key b: spikes on its 2nd day -> prev_days < 3 -> unscored, no flag
    val rows =
      (1 to 9).flatMap(d => Seq.fill(10)(("a", f"2026-01-$d%02d"))) ++
        Seq.fill(16)(("a", "2026-01-10")) ++
        Seq.fill(1)(("b", "2026-01-01")) ++ Seq.fill(100)(("b", "2026-01-02"))
    val df = rows.toDF("k", "d")
    val flagged = Drift.volumeAnomalies(df, "k", df("d"),
      trailing = 7, factorPct = 115, minPrevDays = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    flagged shouldBe Array(("a", "2026-01-10", 16L, 70L, 7L))
  }

  test("embeddingDrift: exact centroid cosine and norm ratio from e6 means") {
    import org.apache.spark.sql.Row
    def snap(vecs: Seq[Array[Float]]) =
      Drift.meanVector(vecs.map(Tuple1(_)).toDF("e"), "e")
    // old centroid (2, 0); cur centroid (0, 3): orthogonal, 1.5x the norm
    val old = snap(Seq(Array(1f, 0f), Array(3f, 0f)))
    val cur = snap(Seq(Array(0f, 2f), Array(0f, 4f)))
    Drift.embeddingDriftFromMeans(old, cur).collect().head shouldBe
      Row(2L, 2L, 0.0, 15000L)
    // identical snapshots: cosine exactly 1, ratio exactly 10000
    Drift.embeddingDriftFromMeans(old, old).collect().head shouldBe
      Row(2L, 2L, 1.0, 10000L)
    // a zero old centroid: cosine 0 by the zero-norm rule, ratio null
    val zero = snap(Seq(Array(0f, 0f)))
    val r = Drift.embeddingDriftFromMeans(zero, cur).collect().head
    r.getDouble(2) shouldBe 0.0
    r.isNullAt(3) shouldBe true
    // meanVector snapshots are exact integers: floor((1+3)/2)*1e6 etc.
    old.orderBy($"dim").select($"mean_e6").as[Long].collect() shouldBe
      Array(2000000L, 0L)
  }

  test("volumeAnomalies is invariant to input partitioning") {
    val rows = (1 to 8).flatMap(d => Seq.fill(d * d)(("a", f"2026-02-$d%02d")))
    val df = rows.toDF("k", "d")
    val one = Drift.volumeAnomalies(df.coalesce(1), "k", df("d"), factorPct = 115)
      .collect().toSet
    val many = Drift.volumeAnomalies(df.repartition(7), "k", df("d"), factorPct = 115)
      .collect().toSet
    one shouldBe many
    one should not be empty // quadratic growth trips the 115% bar
  }

  test("robustValueProfile: hand-computed median/MAD, outliers flagged, mean-immunity") {
    // g: values 10,12,14,16,1000 -> median 14 (rank ceil(2.5)=3), devs
    // 4,2,0,2,986 sorted 0,2,2,4,986 -> mad 2 (rank 3); only 1000 deviates
    // past 3*mad — the huge outlier does NOT drag the center (mean would be 210)
    val df = Seq(("g", 10L), ("g", 12L), ("g", 14L), ("g", 16L), ("g", 1000L))
      .toDF("k", "v")
    val out = Drift.robustValueProfile(df, "k", "v", kX100 = 300L)
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    out shouldBe (("g", 5L, 14L, 2L, 1L, 200000L))
  }

  test("robustValueProfile: a constant feed with one bad row alarms (mad = 0)") {
    val df = (Seq.fill(9)(50L) :+ 51L).map(("c", _)).toDF("k", "v")
    val out = Drift.robustValueProfile(df, "k", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    out._4 shouldBe 0L // degenerate MAD
    out._5 shouldBe 1L // ...and the single deviating row still flags
  }

  test("robustValueProfile ignores nulls and is partitioning-independent") {
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)),
      ("a", Option.empty[Long]), ("b", Some(7L))).toDF("k", "v")
    val one = Drift.robustValueProfile(df.coalesce(1), "k", "v").collect().map(_.toSeq).toSet
    val many = Drift.robustValueProfile(df.repartition(5), "k", "v").collect().map(_.toSeq).toSet
    one shouldBe many
    one.map(r => (r.head, r(1))) shouldBe Set(("a", 3L), ("b", 1L)) // null dropped
  }

  import org.apache.spark.sql.functions.col

  test("ksTest: hand-computed D, degenerate and disjoint samples") {
    // A = [1,2,3], B = [2,3,4]: D = 1/3 at every value below 4
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 3L, true),
      ("g", 2L, false), ("g", 3L, false), ("g", 4L, false)).toDF("g", "v", "a")
    Drift.ksTest(df, Seq("g"), "v", col("a"))
      .as[(String, Long, Long, Long)].collect().head shouldBe (("g", 3L, 3L, 333333L))
    // identical samples: D = 0
    val same = Seq(("g", 1L, true), ("g", 2L, true), ("g", 1L, false), ("g", 2L, false))
      .toDF("g", "v", "a")
    Drift.ksTest(same, Seq("g"), "v", col("a"))
      .as[(String, Long, Long, Long)].collect().head._4 shouldBe 0L
    // disjoint supports: D = 1
    val disj = Seq(("g", 1L, true), ("g", 2L, true), ("g", 8L, false), ("g", 9L, false))
      .toDF("g", "v", "a")
    Drift.ksTest(disj, Seq("g"), "v", col("a"))
      .as[(String, Long, Long, Long)].collect().head._4 shouldBe 1000000L
  }

  test("ksTest: null on an empty sample; nulls dropped; matches naive ECDF on random data") {
    val oneSided = Seq(("g", 1L, true), ("g", 2L, true)).toDF("g", "v", "a")
    val r = Drift.ksTest(oneSided, Seq("g"), "v", col("a")).collect().head
    r.getLong(2) shouldBe 0L
    r.isNullAt(3) shouldBe true

    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(400)(("g", rnd.nextInt(30).toLong + (if (rnd.nextBoolean()) 3 else 0),
      rnd.nextBoolean()))
    val got = Drift.ksTest(rows.toDF("g", "v", "a").repartition(7), Seq("g"), "v", col("a"))
      .as[(String, Long, Long, Long)].collect().head
    // naive reference: max over pooled values of |F_A - F_B| in exact integers
    val as = rows.filter(_._3).map(_._2)
    val bs = rows.filterNot(_._3).map(_._2)
    val naive = rows.map(_._2).distinct.map { v =>
      math.abs(as.count(_ <= v).toLong * bs.size - bs.count(_ <= v).toLong * as.size)
    }.max * 1000000L / (as.size.toLong * bs.size)
    got shouldBe (("g", as.size.toLong, bs.size.toLong, naive))
  }

  test("mannWhitney: hand-computed doubled-midrank U with ties") {
    // A = [1,2,2], B = [2,3]: U_A = 1.0 (two half-ties), u2 = 2
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 2L, true),
      ("g", 2L, false), ("g", 3L, false)).toDF("g", "v", "a")
    Drift.mannWhitney(df, Seq("g"), "v", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("g", 3L, 2L, 2L, 166666L))
    // identical samples: AUC exactly 1/2
    val same = Seq(("g", 1L, true), ("g", 3L, true), ("g", 1L, false), ("g", 3L, false))
      .toDF("g", "v", "a")
    Drift.mannWhitney(same, Seq("g"), "v", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head._5 shouldBe 500000L
  }

  test("mannWhitney matches the naive all-pairs count on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)(("g", rnd.nextInt(12).toLong, rnd.nextBoolean()))
    val got = Drift.mannWhitney(rows.toDF("g", "v", "a").repartition(5),
      Seq("g"), "v", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head
    val as = rows.filter(_._3).map(_._2)
    val bs = rows.filterNot(_._3).map(_._2)
    val u2 = as.map(a => 2L * bs.count(a > _) + bs.count(a == _)).sum
    got._4 shouldBe u2
    got._5 shouldBe u2 * 1000000L / (2L * as.size * bs.size)
  }

  test("chiSquareKx2: zero under homogeneity, hand-computed shift, merge parity") {
    // identical mixes -> every cross-product cancels
    val same = (Seq.fill(10)(("g", "x", true)) ++ Seq.fill(20)(("g", "y", true)) ++
      Seq.fill(10)(("g", "x", false)) ++ Seq.fill(20)(("g", "y", false)))
      .toDF("g", "c", "a")
    Drift.chiSquareKx2(same, Seq("g"), "c", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("g", 30L, 30L, 2L, 0L))
    // x: a=3,b=1; y: a=1,b=3 -> chi2 = 2.0 exactly
    val shifted = (Seq.fill(3)(("g", "x", true)) ++ Seq(("g", "y", true)) ++
      Seq(("g", "x", false)) ++ Seq.fill(3)(("g", "y", false))).toDF("g", "c", "a")
    Drift.chiSquareKx2(shifted, Seq("g"), "c", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("g", 4L, 4L, 2L, 2000000L))
    // mergeable: per-slice cells ADD, then finish == whole-data statistic
    val slice1 = shifted.where(col("c") === "x")
    val slice2 = shifted.where(col("c") =!= "x")
    val cells = Drift.kx2Cells(slice1, Seq("g"), "c", col("a"))
      .unionByName(Drift.kx2Cells(slice2, Seq("g"), "c", col("a")))
    Drift.chi2FromKx2Cells(cells, Seq("g"), "c").collect().map(_.toSeq).toSet shouldBe
      Drift.chiSquareKx2(shifted, Seq("g"), "c", col("a")).collect().map(_.toSeq).toSet
  }

  test("chiSquareKx2: empty side nulls, within-k-micro of the double reference") {
    val oneSided = Seq(("g", "x", true), ("g", "y", true)).toDF("g", "c", "a")
    val r = Drift.chiSquareKx2(oneSided, Seq("g"), "c", col("a")).collect().head
    r.isNullAt(4) shouldBe true

    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)(("g", "c" + rnd.nextInt(6), rnd.nextInt(3) > 0))
    val got = Drift.chiSquareKx2(rows.toDF("g", "c", "a").repartition(9),
      Seq("g"), "c", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head
    val cats = rows.map(_._2).distinct
    val na = rows.count(_._3).toDouble
    val nb = rows.size - na
    val ref = cats.map { c =>
      val a = rows.count(r => r._2 == c && r._3).toDouble
      val b = rows.count(r => r._2 == c && !r._3).toDouble
      val d = a * nb - b * na
      d * d / (na * nb * (a + b))
    }.sum
    got._4 shouldBe cats.size.toLong
    // staged truncation: each category floors within 1e3/t + 1 micro
    math.abs(got._5 - math.round(ref * 1e6)) should be <= (cats.size * 1001L)
  }

  test("ksTest and chiSquareKx2 are partitioning-independent") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((("g" + rnd.nextInt(3)), rnd.nextInt(9).toLong, rnd.nextBoolean()))
    val df = rows.toDF("g", "v", "a")
    Drift.ksTest(df.coalesce(1), Seq("g"), "v", col("a")).collect().map(_.toSeq).toSet shouldBe
      Drift.ksTest(df.repartition(13), Seq("g"), "v", col("a")).collect().map(_.toSeq).toSet
    val cdf = rows.map(r => (r._1, "c" + r._2, r._3)).toDF("g", "c", "a")
    Drift.chiSquareKx2(cdf.coalesce(1), Seq("g"), "c", col("a"))
      .collect().map(_.toSeq).toSet shouldBe
      Drift.chiSquareKx2(cdf.repartition(13), Seq("g"), "c", col("a"))
        .collect().map(_.toSeq).toSet
  }

  test("tvDrift: zero under homogeneity, hand-computed shift, empty side nulls") {
    // identical mixes -> no mass moved
    val same = (Seq.fill(10)(("g", "x", true)) ++ Seq.fill(20)(("g", "y", true)) ++
      Seq.fill(10)(("g", "x", false)) ++ Seq.fill(20)(("g", "y", false)))
      .toDF("g", "c", "a")
    Drift.tvDrift(same, Seq("g"), "c", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("g", 30L, 30L, 2L, 0L))
    // x: a=3/4, b=1/4; y: a=1/4, b=3/4 -> TV = ½(|3/4-1/4| + |1/4-3/4|) = 1/2
    val shifted = (Seq.fill(3)(("g", "x", true)) ++ Seq(("g", "y", true)) ++
      Seq(("g", "x", false)) ++ Seq.fill(3)(("g", "y", false))).toDF("g", "c", "a")
    Drift.tvDrift(shifted, Seq("g"), "c", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("g", 4L, 4L, 2L, 500000L))
    // disjoint supports -> ALL mass moved (the [0, 1e6] ceiling)
    val disjoint = Seq(("g", "x", true), ("g", "y", false)).toDF("g", "c", "a")
    Drift.tvDrift(disjoint, Seq("g"), "c", col("a"))
      .as[(String, Long, Long, Long, Long)].collect().head shouldBe
      (("g", 1L, 1L, 2L, 1000000L))
    // one-sided sample -> null statistic, same law as chi2
    val oneSided = Seq(("g", "x", true), ("g", "y", true)).toDF("g", "c", "a")
    Drift.tvDrift(oneSided, Seq("g"), "c", col("a")).collect().head
      .isNullAt(4) shouldBe true
  }

  test("tvDrift cells merge: sliced kx2Cells finish to the whole-data TV") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(400)(("g" + rnd.nextInt(2), "c" + rnd.nextInt(5),
      rnd.nextInt(3) > 0))
    val df = rows.toDF("g", "c", "a").repartition(7)
    val slice1 = df.where(col("c").isin("c0", "c1"))
    val slice2 = df.where(!col("c").isin("c0", "c1"))
    val cells = Drift.kx2Cells(slice1, Seq("g"), "c", col("a"))
      .unionByName(Drift.kx2Cells(slice2, Seq("g"), "c", col("a")))
    Drift.tvFromKx2Cells(cells, Seq("g"), "c").collect().map(_.toSeq).toSet shouldBe
      Drift.tvDrift(df, Seq("g"), "c", col("a")).collect().map(_.toSeq).toSet
    // and the truncated ppm sits within 1 of the double reference
    val got = Drift.tvDrift(df, Seq("g"), "c", col("a"))
      .as[(String, Long, Long, Long, Long)].collect()
    got.foreach { case (g, na, nb, _, tv) =>
      val in = rows.filter(_._1 == g)
      val ref = in.map(_._2).distinct.map { c =>
        val a = in.count(r => r._2 == c && r._3).toDouble / na
        val b = in.count(r => r._2 == c && !r._3).toDouble / nb
        math.abs(a - b)
      }.sum / 2
      math.abs(tv - ref * 1e6) should be <= 1.0
    }
  }
}
