package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("asOf picks the latest right row at or before each left timestamp") {
    val trades = Seq(
      ("A", 10L, 1L), ("A", 25L, 2L), ("A", 30L, 3L), // 30 ties a quote ts
      ("B", 5L, 4L), // before any B quote
      ("B", 50L, 5L)
    ).toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      ("A", 8L, 100.0), ("A", 20L, 101.0), ("A", 30L, 102.0),
      ("B", 10L, 200.0)
    ).toDF("sym", "ts", "px")

    val joined = Joins.asOf(trades, quotes, Seq("sym"), "ts")
      .select($"trade_id", $"asof_px").as[(Long, Option[Double])].collect().toMap
    joined shouldBe Map(
      1L -> Some(100.0), // 8 <= 10 < 20
      2L -> Some(101.0), // 20 <= 25 < 30
      3L -> Some(102.0), // equal ts is inclusive
      4L -> None, // no quote yet -> left-outer null
      5L -> Some(200.0))
  }

  test("asOf allowExactMatches=false demands a strictly earlier/later match") {
    val trades = Seq(("A", 10L, 1L), ("A", 30L, 2L), ("A", 31L, 3L)).toDF("sym", "ts", "trade_id")
    val quotes = Seq(("A", 10L, 100.0), ("A", 30L, 102.0)).toDF("sym", "ts", "px")
    Joins.asOf(trades, quotes, Seq("sym"), "ts", allowExactMatches = false)
      .select($"trade_id", $"asof_px").as[(Long, Option[Double])].collect().toMap shouldBe
      Map(1L -> None,          // the 10-quote is simultaneous, not earlier
        2L -> Some(100.0),     // the 30-quote is excluded; falls back to 10
        3L -> Some(102.0))     // strictly-after-30 trade sees the 30 quote
    // dense naive parity for the strict backward walk
    val left = (0L until 200L).map(i => (i % 5, i, i)).toDF("k", "ts", "lid")
    val right = (0L until 60L).map(j => (j % 5, j * 3, j * 1.5)).toDF("k", "ts", "v")
    val r = right.as[(Long, Long, Double)].collect()
    val expected = left.as[(Long, Long, Long)].collect().map { case (k, ts, lid) =>
      lid -> r.filter(q => q._1 == k && q._2 < ts).sortBy(_._2).lastOption.map(_._3)
    }.toMap
    Joins.asOf(left, right, Seq("k"), "ts", allowExactMatches = false)
      .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap shouldBe expected
  }

  test("asOf matches a naive per-row lookup on a dense case") {
    val left = (0L until 200L).map(i => (i % 5, i, i)).toDF("k", "ts", "lid")
    val right = (0L until 60L).map(j => (j % 5, j * 3, j * 1.5)).toDF("k", "ts", "v")
    val expected = {
      val r = right.as[(Long, Long, Double)].collect()
      left.as[(Long, Long, Long)].collect().map { case (k, ts, lid) =>
        val m = r.filter(q => q._1 == k && q._2 <= ts).sortBy(_._2).lastOption.map(_._3)
        lid -> m
      }.toMap
    }
    val actual = Joins.asOf(left, right, Seq("k"), "ts")
      .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap
    actual shouldBe expected
  }

  test("asOf forward matches a naive next-at-or-after lookup, tolerance nulls stale matches") {
    val left = (0L until 200L).map(i => (i % 5, i, i)).toDF("k", "ts", "lid")
    val right = (0L until 60L).map(j => (j % 5, j * 3, j * 1.5)).toDF("k", "ts", "v")
    val r = right.as[(Long, Long, Double)].collect()
    val expected = left.as[(Long, Long, Long)].collect().map { case (k, ts, lid) =>
      val m = r.filter(q => q._1 == k && q._2 >= ts).sortBy(_._2).headOption.map(_._3)
      lid -> m
    }.toMap
    val actual = Joins.asOf(left, right, Seq("k"), "ts", direction = "forward")
      .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap
    actual shouldBe expected
    // with tolerance: a match further than `tol` away nulls out
    val tol = 4L
    val expectedTol = left.as[(Long, Long, Long)].collect().map { case (k, ts, lid) =>
      val m = r.filter(q => q._1 == k && q._2 >= ts).sortBy(_._2).headOption
        .filter(q => q._2 - ts <= tol).map(_._3)
      lid -> m
    }.toMap
    val actualTol = Joins.asOf(left, right, Seq("k"), "ts", "forward", tol)
      .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap
    actualTol shouldBe expectedTol
    actualTol.values.flatten.size should be < actual.values.flatten.size
  }

  test("asOf matches by ROW: a nearest match with null payload stays null") {
    val left = Seq((1L, 0L, 10L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 5L, Option.empty[Double]), (1L, 100L, Option(7.0)))
      .toDF("k", "ts", "v")
    // forward, tolerance 10: nearest at-or-after is ts=5 whose v is null —
    // the farther ts=100 row must NOT leak through the null
    Joins.asOf(left, right, Seq("k"), "ts", "forward", 10L)
      .select($"asof_v").as[Option[Double]].head() shouldBe None
    // unbounded: still the ts=5 ROW, so still null (ASOF semantics)
    Joins.asOf(left, right, Seq("k"), "ts", "forward")
      .select($"asof_v").as[Option[Double]].head() shouldBe None
    // backward from ts=200: nearest is ts=100 with a real value
    val left2 = Seq((1L, 200L, 11L)).toDF("k", "ts", "lid")
    Joins.asOf(left2, right, Seq("k"), "ts")
      .select($"asof_v").as[Option[Double]].head() shouldBe Some(7.0)
  }

  test("asOf nearest matches the naive min-abs-distance lookup, ties backward") {
    val left = (0L until 200L).map(i => (i % 5, i, i)).toDF("k", "ts", "lid")
    val right = (0L until 60L).map(j => (j % 5, j * 3, j * 1.5)).toDF("k", "ts", "v")
    val r = right.as[(Long, Long, Double)].collect()
    val expected = left.as[(Long, Long, Long)].collect().map { case (k, ts, lid) =>
      // naive: minimize |ts - qts|; at equal distance take the EARLIER row
      val m = r.filter(_._1 == k)
        .sortBy(q => (math.abs(q._2 - ts), q._2)).headOption.map(_._3)
      lid -> m
    }.toMap
    val actual = Joins.asOf(left, right, Seq("k"), "ts", direction = "nearest")
      .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap
    actual shouldBe expected
  }

  test("asOf nearest: explicit tie goes backward, tolerance and strict matching apply") {
    // left at 20, right at 10 and 30: both distance 10 -> backward (10) wins
    val left = Seq(("A", 20L, 1L)).toDF("k", "ts", "lid")
    val right = Seq(("A", 10L, 1.0), ("A", 30L, 3.0)).toDF("k", "ts", "v")
    Joins.asOf(left, right, Seq("k"), "ts", "nearest")
      .select($"asof_v").as[Option[Double]].head() shouldBe Some(1.0)
    // tolerance 5: both candidates are 10 away -> null payload
    Joins.asOf(left, right, Seq("k"), "ts", "nearest", tolerance = 5L)
      .select($"asof_v").as[Option[Double]].head() shouldBe None
    // exact match preferred when allowed, skipped when strict
    val right2 = Seq(("A", 20L, 2.0), ("A", 19L, 1.9)).toDF("k", "ts", "v")
    Joins.asOf(left, right2, Seq("k"), "ts", "nearest")
      .select($"asof_v").as[Option[Double]].head() shouldBe Some(2.0)
    Joins.asOf(left, right2, Seq("k"), "ts", "nearest", allowExactMatches = false)
      .select($"asof_v").as[Option[Double]].head() shouldBe Some(1.9)
  }

  test("asOf null timestamps match nothing on either side") {
    val left = Seq((1L, Option(50L), 1L), (1L, Option.empty[Long], 2L)).toDF("k", "ts", "lid")
    val right = Seq((1L, Option(10L), 1.0), (1L, Option.empty[Long], 99.0)).toDF("k", "ts", "v")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = Joins.asOf(left, right, Seq("k"), "ts", dir)
        .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap
      withClue(dir) {
        out(2L) shouldBe None // null-ts left row matches nothing
        out(1L) should not be Some(99.0) // null-ts right row is never a match
      }
    }
  }

  test("rangeJoin equals the naive inequality join for any bucket width") {
    val points = (0L until 300L).map(p => (p, p * 7 % 100)).toDF("pid", "x")
    val intervals = (0L until 40L).map { i =>
      val s = i * 13 % 90
      (i, s, s + 1 + (i % 20))
    }.toDF("iid", "lo", "hi")
    val naive = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    for (width <- Seq(1L, 4L, 16L, 128L)) {
      val bucketed = Joins.rangeJoin(points, intervals, "x", "lo", "hi", width)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      withClue(s"bucketWidth=$width") { bucketed shouldBe naive }
    }
  }

  test("rangeJoin drops empty and inverted intervals") {
    val points = Seq(Tuple1(5L)).toDF("x")
    val intervals = Seq((1L, 5L, 5L), (2L, 9L, 3L)).toDF("iid", "lo", "hi")
    Joins.rangeJoin(points, intervals, "x", "lo", "hi", 10L).count() shouldBe 0
  }

  test("intervalOverlapJoin equals the naive overlap join, each pair exactly once") {
    val a = (0L until 60L).map { i =>
      val s = i * 17 % 200
      (i, s, s + 1 + (i % 25))
    }.toDF("aid", "alo", "ahi")
    val b = (0L until 50L).map { i =>
      val s = i * 23 % 200
      (i, s, s + 1 + (i % 15))
    }.toDF("bid", "blo", "bhi")
    val naive = a.join(b, $"alo" < $"bhi" && $"blo" < $"ahi")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSeq.sorted
    for (width <- Seq(1L, 8L, 32L, 256L)) {
      val bucketed = Joins.intervalOverlapJoin(a, b, "alo", "ahi", "blo", "bhi", width)
        .select($"aid", $"bid").as[(Long, Long)].collect().toSeq.sorted
      // Seq compare (not Set): a pair emitted in two buckets would fail here
      withClue(s"bucketWidth=$width") { bucketed shouldBe naive }
    }
  }

  test("intervalOverlapJoin drops empty intervals and honors half-open bounds") {
    val a = Seq((1L, 0L, 5L), (2L, 7L, 7L)).toDF("aid", "alo", "ahi")
    val b = Seq((10L, 5L, 9L), (11L, 3L, 4L)).toDF("bid", "blo", "bhi")
    val out = Joins.intervalOverlapJoin(a, b, "alo", "ahi", "blo", "bhi", 4L)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    // [0,5) does not overlap [5,9) (half-open); [7,7) is empty
    out shouldBe Set(1L -> 11L)
  }

  /** Insert/delete/substitute mutations of a word list — the shapes the
    * segment blocking must survive (shifted positions, changed lengths). */
  private def fuzzyCorpus: Seq[(Long, String)] = {
    val words = Seq("spark", "shark", "sparks", "park", "sprk", "query",
      "queery", "quarry", "table", "cable", "tale", "stable", "",
      "a", "ab", "scan", "scans", "plan", "xyzzy", "window", "windows",
      "widow", "shuffle", "shuffel", "shuffles")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
  }

  test("editDistanceJoin equals the naive levenshtein join at every threshold") {
    val df = fuzzyCorpus.toDF("id", "s")
    val naive = df.as("a").crossJoin(df.as("b"))
      .where($"a.id" < $"b.id")
      .select($"a.id", $"b.id",
        org.apache.spark.sql.functions.levenshtein($"a.s", $"b.s").cast("long"))
      .as[(Long, Long, Long)].collect()
    for (d <- 0 to 3; r <- 1 to 2) {
      val expected = naive.filter(_._3 <= d).toSet
      val blocked = Joins.editDistanceJoin(df, "id", "s", df, "id", "s", d,
        redundancy = r)
        .where($"id_a" < $"id_b")
        .as[(Long, Long, Long)].collect().toSet
      withClue(s"maxDist=$d redundancy=$r") { blocked shouldBe expected }
    }
  }

  test("editDistanceJoin bigram prefilter is lossless on repeated-gram and " +
    "collision-heavy strings") {
    // adversarial shapes for the count prefilter's popcount bound:
    // repeated-gram strings collapse to ONE bitmap bit (a naive fixed
    // threshold like `shared >= grams - 2d` would false-reject the
    // aaaa...-vs-aabaa pair, since they share only that one bit), plus
    // true pairs whose edits sit gram-adjacent (maximal gram damage) and
    // long strings dense enough for hash collisions to merge types
    val df = Seq(
      1L -> "aaaaaaaaaa", 2L -> "aaaabaaaaa", 3L -> "aaaaaaaaab",
      4L -> "abababababab", 5L -> "babababababa",
      6L -> "xxyyxxyyxxyy", 7L -> "xxyyxyyyxxyy",
      8L -> "qwertyuiopasdfghjklzxcvbnm0123456789", // 35 grams in 64 bits
      9L -> "qwertyuiopasdfghjklzxcvbnm0123456798", // tail transposed: d=2
      10L -> "zz", 11L -> "z").toDF("id", "s")
    val naive = df.as("a").crossJoin(df.as("b"))
      .where($"a.id" < $"b.id")
      .select($"a.id", $"b.id",
        org.apache.spark.sql.functions.levenshtein($"a.s", $"b.s").cast("long"))
      .as[(Long, Long, Long)].collect()
    for (d <- 1 to 2; r <- 1 to 2) {
      val expected = naive.filter(_._3 <= d).toSet
      val blocked = Joins.editDistanceJoin(df, "id", "s", df, "id", "s", d,
        redundancy = r)
        .where($"id_a" < $"id_b")
        .as[(Long, Long, Long)].collect().toSet
      withClue(s"maxDist=$d redundancy=$r") { blocked shouldBe expected }
    }
  }

  test("editDistanceJoin: short and empty strings take the shared short block") {
    val left = Seq((1L, ""), (2L, "a"), (3L, "ab")).toDF("id", "s")
    val right = Seq((10L, ""), (11L, "b"), (12L, "abcd")).toDF("id", "s")
    for (r <- 1 to 2) {
      val out = Joins.editDistanceJoin(left, "id", "s", right, "id", "s", 2,
        redundancy = r)
        .as[(Long, Long, Long)].collect().toSet
      // naive truth: ED("", "")=0, ("","b")=1, ("a","")=1, ("a","b")=1,
      // ("ab","")=2, ("ab","b")=1, ("ab","abcd")=2
      withClue(s"redundancy=$r") {
        out shouldBe Set((1L, 10L, 0L), (1L, 11L, 1L), (2L, 10L, 1L),
          (2L, 11L, 1L), (3L, 10L, 2L), (3L, 11L, 1L), (3L, 12L, 2L))
      }
    }
  }

  test("editDistanceJoin: null strings never match; maxDist=0 is exact equality") {
    val df = Seq((1L, Option("dup")), (2L, Option("dup")), (3L, Option.empty[String]))
      .toDF("id", "s")
    val out = Joins.editDistanceJoin(df, "id", "s", df, "id", "s", 0)
      .where($"id_a" < $"id_b").as[(Long, Long, Long)].collect().toSet
    out shouldBe Set((1L, 2L, 0L))
  }

  test("editDistanceJoin result is partitioning-independent") {
    val df = fuzzyCorpus.toDF("id", "s")
    val a = Joins.editDistanceJoin(df, "id", "s", df, "id", "s", 2)
      .as[(Long, Long, Long)].collect().toSet
    val b = Joins.editDistanceJoin(df.repartition(13), "id", "s",
      df.repartition(3), "id", "s", 2)
      .as[(Long, Long, Long)].collect().toSet
    a shouldBe b
  }

  /** A block-DENSE corpus: 40 families of 2 strings at distance exactly 2
    * (z-substitutions at positions 5 and 9, so the pair's only unedited
    * segment is i=0), with 30 families sharing the constant hot prefix
    * `aaa` — one i=0 block holding 60 of 80 build rows. */
  private def denseCorpus: Seq[(Long, String)] = {
    val hex = "0123456789abcdef"
    def base(f: Int): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"blk:$f".getBytes("UTF-8"))
      (0 until 10).map(i => hex((h(i) & 0xff) % 16)).mkString
    }
    (0 until 40).flatMap { f =>
      val b0 = base(f)
      val b = if (f % 4 != 3) "aaa" + b0.substring(3) else b0
      val v = b.substring(0, 4) + "z" + b.substring(5, 8) + "z" + b.substring(9)
      Seq((2L * f, b), (2L * f + 1, v))
    }
  }

  test("editDistanceJoin: maxBlock drops hot blocks (measured recall loss); " +
    "saltHotBlocks keeps them losslessly") {
    val df = denseCorpus.toDF("id", "s")
    def run(maxBlock: Int, salt: Boolean) =
      Joins.editDistanceJoin(df, "id", "s", df, "id", "s", 2,
        maxBlock = maxBlock, saltHotBlocks = salt)
        .where($"id_a" < $"id_b").as[(Long, Long, Long)].collect().toSet
    val full = run(Int.MaxValue, salt = false)
    val capped = run(8, salt = false)
    val salted = run(8, salt = true)
    // the salted variant is EXACTLY the uncapped join — zero recall loss,
    // the hot block just pairs through the salted join
    salted shouldBe full
    // the drop variant never invents pairs and measurably loses recall
    capped.subsetOf(full) shouldBe true
    val lost = full -- capped
    lost should not be empty
    val recall = capped.size.toDouble / full.size
    recall should be < 1.0
    // every lost pair is between two hot-prefix strings: its only unedited
    // segment is the dropped `aaa` block — exactly the documented loss mode
    val strOf = denseCorpus.toMap
    lost.foreach { case (a, b, _) =>
      withClue(s"lost pair ($a, $b): ") {
        strOf(a).take(3) shouldBe "aaa"
        strOf(b).take(3) shouldBe "aaa"
      }
    }
    // and the cold families' pairs all survive the cap
    denseCorpus.collect { case (id, s) if !s.startsWith("aaa") => id / 2 }
      .distinct.foreach { f =>
        withClue(s"cold family $f: ") {
          capped.exists { case (a, b, _) => a / 2 == f && b / 2 == f } shouldBe true
        }
      }
  }

  test("editDistanceJoin salted path is partitioning-independent and " +
    "composes with the verify") {
    val df = denseCorpus.toDF("id", "s")
    val a = Joins.editDistanceJoin(df, "id", "s", df, "id", "s", 2,
      maxBlock = 8, saltHotBlocks = true)
      .as[(Long, Long, Long)].collect().toSet
    val b = Joins.editDistanceJoin(df.repartition(13), "id", "s",
      df.repartition(3), "id", "s", 2, maxBlock = 8, saltHotBlocks = true)
      .as[(Long, Long, Long)].collect().toSet
    a shouldBe b
    // distances on surviving pairs are exact (the verify is untouched)
    a.foreach { case (_, _, d) => d should be <= 2L }
  }

  test("mutualBest keeps only reciprocal argmax pairs; hubs absorb nothing extra") {
    val pairs = Seq(
      ("a1", "b1", 90L), ("a1", "b2", 80L), // a1's best is b1
      ("a2", "b1", 95L),                    // b1's best is a2 -> a1-b1 dies
      ("a2", "b3", 99L),                    // but a2's best is b3 -> a2-b3 lives
      ("a3", "b2", 70L),                    // b2's best is a1 (80) -> a3-b2 dies
      ("a3", "b4", 75L)                     // best for a3 AND for b4 -> lives
    ).toDF("a", "b", "s")
    Joins.mutualBest(pairs, "a", "b", "s")
      .as[(String, String, Long)].collect().toSet shouldBe Set(
      ("a2", "b3", 99L), ("a3", "b4", 75L))
  }

  test("mutualBest ties break by smallest partner on BOTH sides") {
    val pairs = Seq(
      ("a1", "b1", 50L), ("a1", "b2", 50L), // a1 picks b1 (smallest)
      ("a2", "b1", 50L)                     // b1 picks a1 (smallest) -> a1-b1
    ).toDF("a", "b", "s")
    Joins.mutualBest(pairs, "a", "b", "s")
      .as[(String, String, Long)].collect().toSet shouldBe Set(("a1", "b1", 50L))
  }

  test("mutualBest ignores null keys/scores and tolerates duplicate pair rows") {
    val pairs = Seq(
      (Some("a1"), Some("b1"), Some(10L)),
      (Some("a1"), Some("b1"), Some(10L)), // duplicate row, same score
      (None, Some("b9"), Some(99L)),
      (Some("a9"), None, Some(99L)),
      (Some("a1"), Some("b2"), None)).toDF("a", "b", "s")
    Joins.mutualBest(pairs, "a", "b", "s")
      .as[(String, String, Long)].collect().toSet shouldBe Set(("a1", "b1", 10L))
  }

  test("mutualBest is a pure function of the pairs, not their partitioning") {
    val rnd = new scala.util.Random(59)
    val pairs = (1 to 600).map(_ =>
      ("a" + rnd.nextInt(40), "b" + rnd.nextInt(40), rnd.nextInt(100).toLong))
    def run(parts: Int) =
      Joins.mutualBest(pairs.toDF("a", "b", "s").repartition(parts), "a", "b", "s")
        .collect().map(_.toSeq).toSet
    run(1) shouldBe run(17)
  }
}
