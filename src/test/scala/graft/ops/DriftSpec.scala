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
}
