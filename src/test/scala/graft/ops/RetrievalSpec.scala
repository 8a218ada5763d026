package graft.ops

import graft.testkit.SparkTestBase
import org.apache.spark.sql.functions.sum

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def q(s: String) = Seq(("q", s)).toDF("qid", "qtext")

  test("one-term, uniform-length corpus matches the hand-computed recipe") {
    // 4 docs of 4 tokens each: N=4, T=16, dl=4, so dl*N = T and the length
    // normalizer is exactly 1. "cat" appears once in doc 1, twice in doc 2.
    val docs = Seq(
      (1L, "cat aa bb cc"), (2L, "cat cat dd ee"),
      (3L, "ff gg hh ii"), (4L, "jj kk ll mm")).toDF("id", "text")
    val out = Retrieval.bm25TopK(docs, "id", "text", q("cat"), "qid", "qtext")
      .select("doc_id", "score_fp", "rank").as[(Long, Long, Long)].collect().toSet
    // idf_x1e6 = ((4-2)*2+1)*1e6 DIV (2*2+1) = 1_000_000
    // tf=1: 1e6*1*2200*16 DIV (1000*1*16 + 12*(25*16 + 75*4*4)) = 1_169_097
    // tf=2: 1e6*2*2200*16 DIV (1000*2*16 + 12*(25*16 + 75*4*4)) = 1_679_537
    val idf = ((4L - 2) * 2 + 1) * 1000000L / (2 * 2 + 1)
    def s(tf: Long) = idf * tf * 2200 * 16 / (1000 * tf * 16 + 12 * (25 * 16 + 75 * 4 * 4))
    out shouldBe Set((2L, s(2), 1L), (1L, s(1), 2L))
  }

  test("tf saturates: 10 repeats score less than 10x one occurrence") {
    val docs = Seq(
      (1L, ("cat " * 10).trim + " " + ("pad " * 10).trim),
      (2L, "cat " + ("pad " * 19).trim),
      (3L, ("pad " * 20).trim)).toDF("id", "text")
    val scores = Retrieval.bm25TopK(docs, "id", "text", q("cat"), "qid", "qtext")
      .select("doc_id", "score_fp").as[(Long, Long)].collect().toMap
    scores(1L) should be > scores(2L)
    scores(1L).toDouble should be < 10.0 * scores(2L)
  }

  test("length normalization: same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "cat " + ("pad " * 4).trim),
      (2L, "cat " + ("pad " * 40).trim)).toDF("id", "text")
    val scores = Retrieval.bm25TopK(docs, "id", "text", q("cat"), "qid", "qtext")
      .select("doc_id", "score_fp").as[(Long, Long)].collect().toMap
    scores(1L) should be > scores(2L)
    // b=0 disables length normalization entirely: scores tie
    val flat = Retrieval.bm25TopK(docs, "id", "text", q("cat"), "qid", "qtext", bX100 = 0)
      .select("doc_id", "score_fp").as[(Long, Long)].collect().toMap
    flat(1L) shouldBe flat(2L)
  }

  test("rare terms outweigh common ones in multi-term queries") {
    val docs = (1L to 10L).map { i =>
      (i, if (i == 1) "rare common filler words here" else "common filler words here pad")
    }.toDF("id", "text")
    val top = Retrieval.bm25TopK(docs, "id", "text", q("rare common"), "qid", "qtext")
      .filter($"rank" === 1).select("doc_id").as[Long].head()
    top shouldBe 1L
  }

  test("k caps per query, ties break by doc id, unmatched queries vanish") {
    val docs = (1L to 6L).map(i => (i, "cat pad pad pad")).toDF("id", "text")
    val qs = Seq(("hit", "cat"), ("miss", "zebra")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(docs, "id", "text", qs, "qid", "qtext", k = 3)
      .as[(String, Long, Long, Long)].collect()
    out.map(_._1).toSet shouldBe Set("hit") // no rows for the unmatched query
    out.sortBy(_._4).map(_._2).toSeq shouldBe Seq(1L, 2L, 3L) // id ties ascending
  }

  test("ranking is partitioning-independent") {
    val docs = (1L to 40L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} pad pad")).toDF("id", "text")
    val a = Retrieval.bm25TopK(docs.coalesce(1), "id", "text", q("w1 w2"), "qid", "qtext")
      .collect().map(_.toSeq).toSet
    val b = Retrieval.bm25TopK(docs.repartition(11), "id", "text", q("w1 w2"), "qid", "qtext")
      .collect().map(_.toSeq).toSet
    a shouldBe b
  }

  test("invertedIndex: exact df, smallest-id postings cap, repeated tokens count once") {
    val docs = Seq(
      (5L, "cat cat dog"), (1L, "cat fish"), (9L, "cat dog"), (3L, "cat"))
      .toDF("id", "text")
    val out = Retrieval.invertedIndex(docs, "id", "text", maxPostings = 3)
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out("cat") shouldBe ((4L, Seq(1L, 3L, 5L)))  // df exact, 3 smallest ids asc
    out("dog") shouldBe ((2L, Seq(5L, 9L)))
    out("fish") shouldBe ((1L, Seq(1L)))
  }

  test("percolate: AND at 100%, minimum-should-match relaxation, no phantom matches") {
    val docs = Seq(
      (1L, "spark shuffle join plan"),
      (2L, "spark shuffle only here"),
      (3L, "nothing relevant at all")).toDF("id", "text")
    val qs = Seq(("q_all", "spark shuffle join"), ("q_none", "zebra unicorn"))
      .toDF("qid", "qtext")
    val strict = Retrieval.percolate(docs, "id", "text", qs, "qid", "qtext", 100)
      .select("doc_id", "query_id").as[(Long, String)].collect().toSet
    strict shouldBe Set((1L, "q_all")) // doc 2 misses "join"
    val relaxed = Retrieval.percolate(docs, "id", "text", qs, "qid", "qtext", 60)
      .select("doc_id", "query_id", "n_matched").as[(Long, String, Long)].collect().toSet
    relaxed shouldBe Set((1L, "q_all", 3L), (2L, "q_all", 2L)) // 2/3 = 66% >= 60
  }

  test("percolate counts distinct terms once and a token-free query never matches") {
    val docs = Seq((1L, "spark spark spark plan")).toDF("id", "text")
    val qs = Seq(("q", "spark spark plan"), ("empty", "!!!")).toDF("qid", "qtext")
    val out = Retrieval.percolate(docs, "id", "text", qs, "qid", "qtext", 100)
      .as[(Long, String, Long, Long)].collect().toSet
    out shouldBe Set((1L, "q", 2L, 2L)) // repeated terms collapse both sides
  }

  test("matchCountsFromBase is row-identical to percolate (the shared-base law)") {
    // mixed shapes: full matches, partial matches, repeated terms both
    // sides, a no-match doc, a token-free query, two queries sharing a term
    val docs = Seq(
      (1L, "spark shuffle join plan"),
      (2L, "spark shuffle only here spark"),
      (3L, "nothing relevant at all"),
      (4L, "join join join")).toDF("id", "text")
    val qs = Seq(("q_all", "spark shuffle join"), ("q2", "spark plan"),
      ("q_none", "zebra unicorn"), ("empty", "!!!")).toDF("qid", "qtext")
    val base = Retrieval.queryTermBase(docs, "id", "text", qs, "qid", "qtext")
    for (pct <- Seq(1, 50, 100)) {
      val viaBase = Retrieval.matchCountsFromBase(base, pct)
        .as[(Long, String, Long, Long)].collect().toSet
      val direct = Retrieval.percolate(docs, "id", "text", qs, "qid", "qtext", pct)
        .as[(Long, String, Long, Long)].collect().toSet
      viaBase shouldBe direct
    }
  }

  test("bm25TopKFromBase on a shared base matches the one-shot bm25TopK") {
    val docs = Seq(
      (1L, "cat aa bb cc"), (2L, "cat cat dd ee"),
      (3L, "ff gg hh ii"), (4L, "jj kk ll mm")).toDF("id", "text")
    val base = Retrieval.queryTermBase(docs, "id", "text", q("cat"), "qid", "qtext")
    val viaBase = Retrieval.bm25TopKFromBase(base, k = 10)
      .collect().map(_.toSeq).toSet
    val direct = Retrieval.bm25TopK(docs, "id", "text", q("cat"), "qid", "qtext")
      .collect().map(_.toSeq).toSet
    viaBase shouldBe direct
  }

  test("invertedIndex is partitioning-independent (the cap rule is deterministic)") {
    val docs = (1L to 50L).map(i => (i, s"t${i % 4} shared")).toDF("id", "text")
    val a = Retrieval.invertedIndex(docs.coalesce(1), "id", "text", maxPostings = 5)
      .collect().map(_.toSeq).toSet
    val b = Retrieval.invertedIndex(docs.repartition(13), "id", "text", maxPostings = 5)
      .collect().map(_.toSeq).toSet
    a shouldBe b
  }

  test("toRanking ranks by (score desc, doc) with a hard k cap") {
    val scored = Seq(("q", 10L, 5L), ("q", 20L, 9L), ("q", 30L, 9L), ("q", 40L, 1L))
      .toDF("query_id", "doc_id", "s")
    val out = Retrieval.toRanking(scored, "s", k = 3)
      .as[(String, Long, Long)].collect().toSet
    // score 9 tie broken by doc_id; doc 40 (score 1) cut by k=3
    out shouldBe Set(("q", 20L, 1L), ("q", 30L, 2L), ("q", 10L, 3L))
  }

  test("rrfFuse matches the hand-computed fixed-point fusion") {
    val r1 = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq(("q", 2L, 1L), ("q", 3L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(r1, r2), k0 = 60, k = 10)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    val c1 = 1000000000000L / 61  // rank 1
    val c2 = 1000000000000L / 62  // rank 2
    out(2L) shouldBe ((c1 + c2, 2L, 1L)) // in both rankings -> fused top
    out(1L) shouldBe ((c1, 1L, 2L))      // rank-1 single beats rank-2 single
    out(3L) shouldBe ((c2, 1L, 3L))
  }

  test("rrfFuse breaks exact score ties by doc_id and respects k") {
    val r1 = Seq(("q", 5L, 1L), ("q", 7L, 2L)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq(("q", 7L, 1L), ("q", 5L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(r1, r2), k0 = 60, k = 1)
      .as[(String, Long, Long, Long, Long)].collect()
    out.length shouldBe 1
    out.head._2 shouldBe 5L // identical fused scores: smaller doc_id wins
  }

  test("rankingMetrics: hand-computed MRR/P@k/R@k, empty-qrel and miss laws") {
    val run = Seq(
      ("q1", 10L, 1L), ("q1", 11L, 2L), ("q1", 12L, 3L), ("q1", 13L, 4L), ("q1", 14L, 5L),
      ("q2", 20L, 1L), ("q2", 21L, 2L),
      ("q3", 30L, 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      ("q1", 11L), ("q1", 13L), ("q1", 99L), ("q1", 11L), // dup tolerated
      ("q2", 77L)                                          // never retrieved
    ).toDF("query_id", "doc_id")
    val out = Retrieval.rankingMetrics(run, qrels, k = 5)
      .as[(String, Long, Long, Long, Option[Long], Option[Long], Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // q1: hits {11@2, 13@4}; rr = 1e6 DIV 2; p = 2e6 DIV 5; r = 2e6 DIV 3
    out("q1") shouldBe (("q1", 5L, 3L, 2L, Some(2L), Some(500000L), 400000L, Some(666666L)))
    // q2: qrels exist but nothing relevant retrieved
    out("q2") shouldBe (("q2", 2L, 1L, 0L, None, None, 0L, Some(0L)))
    // q3: no qrels at all -> recall null, precision 0
    out("q3") shouldBe (("q3", 1L, 0L, 0L, None, None, 0L, None))
  }

  test("rankingMetrics is a pure function of the frames, not their partitioning") {
    val rnd = new scala.util.Random(7)
    val run = (for (q <- 1 to 20; r <- 1 to 10)
      yield (s"q$q", rnd.nextInt(200).toLong, r.toLong)).toDF("query_id", "doc_id", "rank")
    val qrels = (1 to 150).map(_ => (s"q${rnd.nextInt(20) + 1}", rnd.nextInt(200).toLong))
      .toDF("query_id", "doc_id")
    def go(p: Int) = Retrieval.rankingMetrics(run.repartition(p), qrels.repartition(p), 10)
      .collect().map(_.toSeq).toSet
    go(1) shouldBe go(13)
  }

  test("negativeSamples: k draws per anchor, never self, pure function of the ids") {
    val ids = (0L until 200L).toDF("id")
    def go(p: Int) = Retrieval.negativeSamples(ids.repartition(p), "id",
      k = 3, buckets = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = go(1)
    out shouldBe go(16) // partition purity
    // every (anchor, j) draw lands (16 buckets over 200 ids: none starve)
    out.size shouldBe 600
    out.foreach { case (a, _, n) => n should not be a }
    // j-indexed draws are independent: some anchor gets distinct negatives
    out.groupBy(_._1).values.exists(_.map(_._3).size > 1) shouldBe true
  }

  test("negativeSamples: known positives can never be drawn as negatives") {
    val ids = (0L until 120L).toDF("id")
    val first = Retrieval.negativeSamples(ids, "id", k = 2, buckets = 8)
    val positives = first.select($"anchor", $"negative")
    val second = Retrieval.negativeSamples(ids, "id", k = 2, buckets = 8,
      positives = Some(positives))
    // re-running with the first round's picks excluded yields a DISJOINT
    // pair set (draws whose bucket offers no alternative simply starve)
    second.select("anchor", "negative")
      .join(positives, Seq("anchor", "negative"), "left_semi")
      .count() shouldBe 0L
  }

  test("copelandRank: hand-computed doubled scores over three items") {
    // A beats B 2-1; C beats B 1-0 (one tie judgment); A-C is an exact tie
    val prefs = Seq(
      ("A", "B", Some("A")), ("A", "B", Some("A")), ("A", "B", Some("B")),
      ("B", "C", Some("C")), ("B", "C", None),
      ("A", "C", Some("A")), ("A", "C", Some("C"))).toDF("ia", "ib", "w")
    val out = Retrieval.copelandRank(prefs, Nil, "ia", "ib", "w")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    out("A") shouldBe ((2L, 1L, 1L, 0L, 3L)) // beat B, tied C
    out("B") shouldBe ((2L, 0L, 0L, 2L, 0L))
    out("C") shouldBe ((2L, 1L, 1L, 0L, 3L)) // beat B, tied A
  }

  test("preferenceCells: reversed rows merge into one canonical cell") {
    val prefs = Seq(
      ("B", "A", Some("A")), ("A", "B", Some("A")), ("A", "B", Some("B")),
      ("A", "B", Some("Z")), // winner matching neither item = tie
      ("A", "A", Some("A")), // self-pair dropped
      (null.asInstanceOf[String], "B", Some("B"))) // null item dropped
      .toDF("ia", "ib", "w")
    val cells = Retrieval.preferenceCells(prefs, Nil, "ia", "ib", "w")
      .as[(String, String, Long, Long, Long)].collect()
    cells.toSeq shouldBe Seq(("A", "B", 2L, 1L, 1L))
  }

  test("copelandFromCells re-rolls: daily cells sum to the all-time ranking") {
    val day1 = Seq(("d1", "A", "B", Some("A")), ("d1", "A", "B", Some("B"))).toDF("d", "ia", "ib", "w")
    val day2 = Seq(("d2", "A", "B", Some("A")), ("d2", "B", "C", Some("B"))).toDF("d", "ia", "ib", "w")
    val daily = Retrieval.preferenceCells(day1.union(day2), Seq("d"), "ia", "ib", "w")
    // merge daily cells by summing, then finish — must equal the direct build
    val merged = daily.groupBy($"lo", $"hi")
      .agg(sum($"wins_lo").as("wins_lo"), sum($"wins_hi").as("wins_hi"),
        sum($"ties").as("ties"))
    val reRolled = Retrieval.copelandFromCells(merged, Nil)
      .orderBy($"item").collect().toSeq
    val direct = Retrieval.copelandRank(day1.union(day2), Nil, "ia", "ib", "w")
      .orderBy($"item").collect().toSeq
    reRolled shouldBe direct
  }
}
