package graft.ops

import graft.testkit.SparkTestBase

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private val eval = "which planet in our solar system has the most moons and " +
    "why does its gravity capture so many passing objects over time"

  private def corpus = Seq(
    (1L, eval), // verbatim leak
    (2L, eval.replace("gravity", "gravitation")), // near-paraphrase leak
    (3L, "the solar system has the most fascinating structure overall today"), // one shared phrase
    (4L, "completely unrelated text about parquet footers and shuffle plans")
  ).toDF("doc_id", "text")

  private def bench = Seq((100L, eval)).toDF("eval_id", "text")

  test("contaminationHits counts distinct shared n-grams per (doc, bench) pair") {
    val hits = Decontaminate.contaminationHits(
      corpus, "doc_id", "text", bench, "eval_id", "text", n = 5, minHits = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    hits.keySet shouldBe Set(1L, 2L)
    // the verbatim leak shares every gram: 22 tokens -> 18 distinct 5-grams
    hits(1L) shouldBe 18L
    // one word changed kills exactly the 5 grams that span it
    hits(2L) shouldBe 13L
  }

  test("precomputed benchGramRows reproduce the direct forms exactly") {
    // the incremental release hands ONE materialized gram frame to every
    // day's curation (round 20) — this pins the OnGrams twins to the
    // bench-DataFrame forms row for row
    val grams = Decontaminate.benchGramRows(bench, "eval_id", "text", n = 5)
      .localCheckpoint(true)
    val hitsDirect = Decontaminate.contaminationHits(
      corpus, "doc_id", "text", bench, "eval_id", "text", n = 5, minHits = 3)
      .as[(Long, Long, Long)].collect().toSet
    val hitsPre = Decontaminate.contaminationHitsOnGrams(
      corpus, "doc_id", "text", grams, n = 5, minHits = 3, broadcastBench = true)
      .as[(Long, Long, Long)].collect().toSet
    hitsPre shouldBe hitsDirect
    val cleanDirect = Decontaminate.removeContaminated(
      corpus, "doc_id", "text", bench, "eval_id", "text", n = 5, minHits = 3)
      .select("doc_id").as[Long].collect().sorted
    val cleanPre = Decontaminate.removeContaminatedOnGrams(
      corpus, "doc_id", "text", grams, n = 5, minHits = 3, broadcastBench = true)
      .select("doc_id").as[Long].collect().sorted
    cleanPre shouldBe cleanDirect
  }

  test("one shared phrase stays below the threshold; removal keeps clean docs") {
    // doc 3 shares "the solar system has the" (single 5-gram) -> not flagged
    val clean = Decontaminate.removeContaminated(
      corpus, "doc_id", "text", bench, "eval_id", "text", n = 5, minHits = 3)
      .select("doc_id").as[Long].collect().sorted
    clean shouldBe Array(3L, 4L)
  }

  test("redactContaminatedSentences removes only the leaked sentences, in order") {
    val doc = "a perfectly clean opening sentence about cooking pasta at home. " +
      eval + ". a clean closing thought about gardens and quiet rain"
    val docs = Seq(
      (1L, doc),                                   // middle sentence leaked
      (2L, "totally clean text with no overlap."), // untouched
      (3L, eval)                                   // single-sentence doc, fully leaked
    ).toDF("doc_id", "text")
    val out = Decontaminate
      .redactContaminatedSentences(docs, "doc_id", "text", bench, "text", n = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sentences"), r.getAs[Long]("n_redacted"),
          r.getAs[String]("clean_text")))).toMap
    out(1L)._1 shouldBe 3L
    out(1L)._2 shouldBe 1L // the eval sentence alone is redacted
    out(1L)._3 shouldBe "a perfectly clean opening sentence about cooking pasta at home." +
      " a clean closing thought about gardens and quiet rain"
    out(2L) shouldBe ((1L, 0L, "totally clean text with no overlap."))
    out(3L) shouldBe ((1L, 1L, "")) // nothing survives a fully-leaked doc
  }

  test("the benchmark side broadcasts; nothing cartesians") {
    val plan = Decontaminate.contaminationHits(
      corpus, "doc_id", "text", bench, "eval_id", "text")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    val unbroadcast = Decontaminate.contaminationHits(
      corpus, "doc_id", "text", bench, "eval_id", "text", broadcastBench = false)
      .queryExecution.executedPlan.toString
    unbroadcast should not include "CartesianProduct"
  }
}
