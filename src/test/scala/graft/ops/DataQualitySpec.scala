package graft.ops

import org.apache.spark.sql.functions.{col, sum}

import graft.testkit.SparkTestBase

class DataQualitySpec extends SparkTestBase {
  import spark.implicits._
  import DataQuality._

  private def checksMap(df: org.apache.spark.sql.DataFrame, cs: Seq[Constraint]) =
    DataQuality.check(df, cs)
      .as[(String, Long, String)].collect()
      .map { case (n, v, s) => n -> ((v, s)) }.toMap

  test("row-level constraints count violations and nulls fail gates") {
    val df = Seq(
      (Option(1L), Option("a"), 10.0),
      (Option(2L), Option.empty[String], -5.0),
      (Option.empty[Long], Option("z"), 50.0))
      .toDF("id", "status", "amount")
    val out = checksMap(df, Seq(
      NotNull("id"),
      Accepted("status", Seq("a", "b")),
      inRange("amount", 0, 100),
      Satisfies("amount_not_null_positive", col("amount") > 0)))
    out("not_null(id)") shouldBe ((1L, "fail"))
    // null status AND the unlisted "z" both violate
    out("accepted(status)") shouldBe ((2L, "fail"))
    out("in_range(amount)") shouldBe ((1L, "fail"))
    out("amount_not_null_positive") shouldBe ((1L, "fail"))
  }

  test("satisfies counts an un-evaluable (null) predicate as a violation") {
    val df = Seq(Option(5.0), Option.empty[Double]).toDF("x")
    val out = checksMap(df, Seq(Satisfies("x_pos", col("x") > 0)))
    out("x_pos") shouldBe ((1L, "fail"))
  }

  test("unique counts extra rows per duplicated key tuple") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"), (2L, "c"), (2L, "c"))
      .toDF("k", "v")
    val out = checksMap(df, Seq(Unique(Seq("k")), Unique(Seq("k", "v"))))
    out("unique(k)") shouldBe ((4L, "fail"))     // k=1: 3 rows (2 extra); k=2: 3 rows (2 extra)
    out("unique(k,v)") shouldBe ((3L, "fail"))   // (1,a) x2: 1 extra; (2,c) x3: 2 extra
  }

  test("foreign key counts rows whose key misses the dimension; nulls exempt") {
    val facts = Seq(Option(1L), Option(2L), Option(9L), Option.empty[Long]).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val out = checksMap(facts, Seq(ForeignKey("k", dim, "id")))
    out("foreign_key(k)") shouldBe ((1L, "fail"))
  }

  test("an all-pass suite reports pass everywhere") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dim = Seq(1L, 2L).toDF("id")
    val out = checksMap(df, Seq(
      NotNull("k"), Unique(Seq("k")), Accepted("v", Seq("a", "b")),
      ForeignKey("k", dim, "id")))
    out.values.foreach { case (v, s) => v shouldBe 0L; s shouldBe "pass" }
  }

  test("profile reports rows, non-null, exact distincts and completeness ppm") {
    val df = Seq(
      (Option(1L), Option("a")), (Option(1L), Option("b")),
      (Option(2L), Option.empty[String]), (Option.empty[Long], Option("b")))
      .toDF("id", "tag")
    val out = DataQuality.profile(df, Seq("id", "tag"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    out("id") shouldBe ((4L, 3L, 2L, 750000L))
    out("tag") shouldBe ((4L, 3L, 2L, 750000L))
  }

  test("profile of an empty frame is fully complete with zero distincts") {
    val df = Seq.empty[(Option[Long], Option[String])].toDF("id", "tag")
    val out = DataQuality.profile(df, Seq("id"))
      .as[(String, Long, Long, Long, Long)].collect()
    out.toSeq shouldBe Seq(("id", 0L, 0L, 0L, 1000000L))
  }

  test("benfordProfile: canonical leading digits, positive-total shares, junk under '-'") {
    val df = Seq(Some(123L), Some(19L), Some(1L), Some(950L),
      Some(0L), Some(-42L), None).toDF("v")
    val out = DataQuality.benfordProfile(df, "v")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // shares normalize by the 4 POSITIVE rows, not all 7
    out("1") shouldBe ((3L, Some(750000L)))
    out("9") shouldBe ((1L, Some(250000L)))
    out("-") shouldBe ((3L, None))               // zero, negative, null
    out.values.map(_._1).sum shouldBe 7L
  }

  test("benfordProfile: fractional values round to an integer before the digit") {
    val df = Seq(7.9, 81.4).toDF("v") // decimal(38,0) cast rounds half-up: 8, 81
    val out = DataQuality.benfordProfile(df, "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    out shouldBe Map("8" -> 2L)
  }

  test("giniDiversity: hand-computed ppm, single-category 0, even split high") {
    val df = Seq(
      ("u1", "a"), ("u1", "a"), ("u1", "a"),              // all one type -> 0
      ("u2", "a"), ("u2", "b"),                           // 1 - 2/4 = 500000
      ("u3", "a"), ("u3", "a"), ("u3", "b"), ("u3", "c")) // 1 - 6/16 = 625000
      .toDF("u", "t")
    val out = DataQuality.giniDiversity(df, Seq("u"), "t")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out("u1") shouldBe ((3L, 0L))
    out("u2") shouldBe ((2L, 500000L))
    out("u3") shouldBe ((4L, 625000L))
  }

  test("giniDiversity: nulls are a real category, not dropped") {
    val df = Seq(("u", Option("a")), ("u", Option.empty[String]))
      .toDF("u", "t")
    val out = DataQuality.giniDiversity(df, Seq("u"), "t")
      .as[(String, Long, Long)].collect()
    out.toSeq shouldBe Seq(("u", 2L, 500000L))
  }

  test("histogram: exact integer edges, every row binned, nulls excluded") {
    // values 0..99 in 10 bins: width (99 - 0 + 10) DIV 10 = 10, bins 0..9
    val df = ((0L to 99L).map(Option(_)) :+ Option.empty[Long]).toDF("v")
    val out = DataQuality.histogram(df, "v", bins = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    out.length shouldBe 10
    out.map(_._4).sum shouldBe 100L
    out.head shouldBe ((0L, 0L, 9L, 10L))
    out.last shouldBe ((9L, 90L, 99L, 10L))
  }

  test("histogram: constant column lands in one width-1 bin; empty input empty") {
    val one = DataQuality.histogram(Seq(5L, 5L, 5L).toDF("v"), "v", bins = 4)
      .as[(Long, Long, Long, Long)].collect()
    one.toSeq shouldBe Seq((0L, 5L, 5L, 3L))
    DataQuality.histogram(Seq.empty[Long].toDF("v"), "v", bins = 4)
      .count() shouldBe 0L
  }

  test("histogram handles negative ranges with exact edges") {
    val out = DataQuality.histogram(Seq(-10L, -1L, 0L, 9L).toDF("v"), "v", bins = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // width = (9 - -10 + 2) DIV 2 = 10; bins [-10,-1] and [0,9]
    out.toSeq shouldBe Seq((0L, -10L, -1L, 2L), (1L, 0L, 9L, 2L))
  }

  test("giniFromCounts: sliced cells merge to the exact whole-data diversity") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map(_ => ("g", "cat" + rnd.nextInt(6)))
    val whole = DataQuality.giniDiversity(rows.toDF("g", "t"), Seq("g"), "t")
      .as[(String, Long, Long)].collect().toSeq
    // slice into 3 disjoint days, count per slice, merge through the finisher
    val sliced = rows.zipWithIndex.map { case ((g, t), i) => (i % 3, g, t) }
      .toDF("day", "g", "t")
      .groupBy($"day", $"g", $"t").count()
      .withColumnRenamed("count", "cnt")
    val merged = DataQuality.giniFromCounts(sliced, Seq("g"), "t")
      .as[(String, Long, Long)].collect().toSeq
    merged shouldBe whole
  }

  test("kAnonymity: hand-computed classes, violations and ppm") {
    val df = Seq(
      ("90210", 30), ("90210", 30), ("90210", 30), // class of 3
      ("10001", 40), ("10001", 40),                // class of 2 — violates k=3
      ("60601", 50)                                // class of 1 — violates
    ).toDF("zip", "age")
    val out = DataQuality.kAnonymity(df, Seq("zip", "age"), k = 3)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    // 6 rows, 3 classes, min class 1, 2 violating classes, 3 violating rows
    out shouldBe ((6L, 3L, 1L, 2L, 3L, Some(500000L)))
  }

  test("kAnonymity: null quasi-identifiers form real classes; k=1 never violates") {
    val df = Seq((Some("a"), 1), (None, 1), (None, 1)).toDF("zip", "age")
    val out = DataQuality.kAnonymity(df, Seq("zip", "age"), k = 2)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    out shouldBe ((3L, 2L, 1L, 1L, 1L, Some(333333L)))
    DataQuality.kAnonymity(df, Seq("zip", "age"), k = 1)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
      .head._4 shouldBe 0L
  }

  test("lDiversity: per-class distinct sensitive values, nulls count") {
    val df = Seq(
      ("a", Some("flu")), ("a", Some("flu")), ("a", Some("cold")),
      ("b", Some("flu")), ("b", Some("flu")),
      ("c", None), ("c", Some("flu"))).toDF("zip", "diag")
    val out = DataQuality.lDiversity(df, Seq("zip"), "diag", l = 2)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    out("a") shouldBe ((3L, 2L, true))
    out("b") shouldBe ((2L, 1L, false)) // uniform class: size 2 but l = 1
    out("c") shouldBe ((2L, 2L, true)) // null is a distinct sensitive value
  }

  test("fdViolations: clean FD is all zeros; g3 counts the minority rows") {
    val df = Seq(
      ("90210", "CA"), ("90210", "CA"), ("90210", "NV"), // 1 violation
      ("10001", "NY"), ("10001", "NY"),                  // clean
      ("60601", "IL")).toDF("zip", "state")
    val out = DataQuality.fdViolations(df, "zip", "state")
      .as[(String, Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    out("90210") shouldBe ((3L, 2L, "CA", 1L, 333333L))
    out("10001") shouldBe ((2L, 1L, "NY", 0L, 0L))
    out("60601") shouldBe ((1L, 1L, "IL", 0L, 0L))
  }

  test("fdViolations: modal ties break null-first then smallest value") {
    val df = Seq(
      ("t", Some("b")), ("t", Some("a")),       // tie a/b -> a
      ("u", None), ("u", Some("a"))).toDF("x", "y") // tie null/a -> null
    val out = DataQuality.fdViolations(df, "x", "y")
      .as[(String, Long, Long, Option[String], Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    out("t") shouldBe Some("a")
    out("u") shouldBe None
  }

  test("privacy + FD audits are pure functions of the data, not partitioning") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 400).map(_ =>
      ("z" + rnd.nextInt(20), rnd.nextInt(4), "s" + rnd.nextInt(5)))
    def all(parts: Int) = {
      val df = rows.toDF("zip", "age", "diag").repartition(parts)
      (DataQuality.kAnonymity(df, Seq("zip", "age"), 5).collect().map(_.toSeq).toSeq,
        DataQuality.lDiversity(df, Seq("zip", "age"), "diag", 3)
          .collect().map(_.toSeq).toSet,
        DataQuality.fdViolations(df, "zip", "diag").collect().map(_.toSeq).toSet)
    }
    all(1) shouldBe all(13)
  }

  test("log2Histogram: bit-length bins, inclusive bounds, bin -1 holds v <= 0") {
    val df = Seq(("g", Some(1L)), ("g", Some(2L)), ("g", Some(3L)),
      ("g", Some(4L)), ("g", Some(7L)), ("g", Some(8L)),
      ("g", Some(0L)), ("g", Some(-5L)), ("g", None))
      .toDF("g", "v")
    val out = DataQuality.log2Histogram(df, Seq("g"), "v")
      .as[(String, Long, Option[Long], Option[Long], Long)]
      .collect().map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    out(-1L) shouldBe ((None, None, 2L))              // 0 and -5
    out(0L) shouldBe ((Some(1L), Some(1L), 1L))       // [1, 1]
    out(1L) shouldBe ((Some(2L), Some(3L), 2L))       // [2, 3]
    out(2L) shouldBe ((Some(4L), Some(7L), 2L))       // [4, 7]
    out(3L) shouldBe ((Some(8L), Some(15L), 1L))      // [8, 15]
    out.size shouldBe 5 // the null row vanished
  }

  test("log2Histogram: slices ADD bin-for-bin; Long.MaxValue lands in bin 62") {
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(500)(("g" + rnd.nextInt(2),
      math.abs(rnd.nextLong()) % 1000000 + 1))
    val df = rows.toDF("g", "v")
    val whole = DataQuality.log2Histogram(df, Seq("g"), "v")
      .collect().map(_.toSeq).toSet
    val sliced = DataQuality.log2Histogram(df.where($"v" % 2 === 0), Seq("g"), "v")
      .unionByName(DataQuality.log2Histogram(df.where($"v" % 2 =!= 0), Seq("g"), "v"))
      .groupBy($"g", $"bin", $"bin_lo", $"bin_hi").agg(sum($"n").as("n"))
      .select($"g", $"bin", $"bin_lo", $"bin_hi", $"n")
      .collect().map(_.toSeq).toSet
    sliced shouldBe whole
    val top = DataQuality.log2Histogram(
      Seq(("g", Long.MaxValue)).toDF("g", "v"), Seq("g"), "v")
      .as[(String, Long, Option[Long], Option[Long], Long)].collect().head
    top._2 shouldBe 62L
    top._3 shouldBe Some(1L << 62)
  }
}
