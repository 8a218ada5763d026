package graft.etl.examples

import org.apache.spark.sql.DataFrame

import graft.io.{HdfsUrl, WarehouseTable}
import graft.testkit.SparkJobSuiteBase
import graft.time.{Day, DateInterval}

class CurationPipelineJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
    "through fields of golden wheat while the evening sun sets slowly behind distant hills " +
    "casting long warm shadows across the quiet valley where a small river bends gently " +
    "between mossy stones and ancient willows lean low over the clear slow water humming " +
    "with dragonflies while swallows wheel high above the old wooden bridge at dusk"

  private def sourceFor(date: DateInterval): DataFrame = Seq(
    (1L, base),
    (2L, base.replace("golden", "silver")), // near-dup of 1: only the keeper survives
    (3L, "!!! ###"), // fails the quality gate (no words)
    (4L, "please reach our support team at help.desk@example.com for assistance " +
      "with any of the many issues you may encounter while using the product"),
    (5L, "ｆｕｌｌｗｉｄｔｈ encoded content about completely different topics like " +
      "catalyst optimizer rules and distributed shuffle joins across many executor nodes")
  ).toDF("doc_id", "text")

  test("curation pipeline: normalize, gate, scrub, dedup, split, write") {
    val root = HdfsUrl(tmpDir("curation"))
    val clean = WarehouseTable(root, "clean")
    val job = new CurationPipelineJob(sourceFor, clean)
    val date = Day(2026, 8, 12)
    runJob(job, date).isSuccess shouldBe true

    val out = clean.load(spark, date)
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("text"), r.getAs[String]("split")))).toMap

    byId.keySet should contain(1L) // cluster keeper
    byId.keySet should not contain 2L // near-dup removed
    byId.keySet should not contain 3L // junk gated out
    byId.keySet should contain(4L)
    byId.keySet should contain(5L)
    // PII scrubbed before landing
    byId(4L)._1 should include("<EMAIL>")
    byId(4L)._1 should not include "example.com"
    // fullwidth text NFKC-folded to plain ascii
    byId(5L)._1 should startWith("fullwidth")
    // every survivor drew exactly one split value
    all(byId.values.map(_._2)) should (be("train") or be("valid") or be("test"))
    // gate: idempotent reruns
    job.shouldRunForDate(spark, date) shouldBe false
  }

  test("curation pipeline with a benchmark drops contaminated survivors") {
    val root = HdfsUrl(tmpDir("curation_bench"))
    val clean = WarehouseTable(root, "clean")
    // doc 5's normalized text plays the leaked eval document
    val evalText = "fullwidth encoded content about completely different topics like " +
      "catalyst optimizer rules and distributed shuffle joins across many executor nodes"
    val bench = Seq((900L, evalText)).toDF("bench_id", "text")
    val job = new CurationPipelineJob(sourceFor, clean, benchmark = Some(bench))
    val date = Day(2026, 8, 12)
    runJob(job, date).isSuccess shouldBe true

    val ids = clean.load(spark, date).select("doc_id").as[Long].collect().toSet
    ids should not contain 5L // contaminated against the benchmark
    ids should contain(1L) // the rest of the pipeline is unchanged
    ids should contain(4L)
  }

  test("curation pipeline decontaminates across PII-scrubbed spans") {
    // the leaked eval doc is PII-dense: most of its 5-gram windows cross an
    // email or phone number, so comparing the scrubbed corpus against RAW
    // benchmark text would leave under minHits aligned grams and the gate
    // would miss the leak — the pipeline must scrub the bench side too
    val leaked = "contact agent.one@example.com or agent.two@example.com by " +
      "phone 555-123-4567 or 555-987-6543 to claim the prize money today"
    val src = (_: DateInterval) => Seq((1L, base), (6L, leaked)).toDF("doc_id", "text")
    val clean = WarehouseTable(HdfsUrl(tmpDir("curation_pii_bench")), "clean")
    val bench = Seq((901L, leaked)).toDF("bench_id", "text")
    val job = new CurationPipelineJob(src, clean, benchmark = Some(bench))
    val date = Day(2026, 8, 12)
    runJob(job, date).isSuccess shouldBe true

    val ids = clean.load(spark, date).select("doc_id").as[Long].collect().toSet
    ids should not contain 6L // caught even though its PII was scrubbed away
    ids should contain(1L)
  }

  test("curation pipeline with htmlSource extracts text before every other gate") {
    // doc 7 is a crawled page: markup-wrapped good text. Without the html
    // gate its tag soup would flunk the symbol-ratio quality gate; with it
    // the extracted text flows through normalize/gate/scrub/dedup as text
    val page = "<html><head><style>p { x > 1 }</style><script>if (a < b) go();</script>" +
      "</head><body><h1>Field notes</h1><p>" + base + "</p></body></html>"
    val src = (_: DateInterval) => Seq((7L, page), (3L, "!!! ###")).toDF("doc_id", "text")
    val clean = WarehouseTable(HdfsUrl(tmpDir("curation_html")), "clean")
    val job = new CurationPipelineJob(src, clean, htmlSource = true)
    val date = Day(2026, 8, 12)
    runJob(job, date).isSuccess shouldBe true

    val byId = clean.load(spark, date).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    byId.keySet should contain(7L)
    byId.keySet should not contain 3L // quality gate still active downstream
    byId(7L) should startWith("Field notes ")
    byId(7L) should include("quick brown fox")
    byId(7L) should not include "<" // no markup survives
  }

  test("curation pipeline mainContentOnly keeps the article, drops nav/footer boilerplate") {
    // the same crawled page wrapped in a nav menu and a linky footer: plain
    // htmlToText would keep "Home About us ... Terms of service" glued to the
    // article; the main-content gate must drop those blocks per row
    val page = "<html><body><nav><ul><li><a href=\"/\">Home</a></li>" +
      "<li><a href=\"/about\">About us</a></li></ul></nav>" +
      "<article><p>" + base + "</p></article>" +
      "<footer><a href=\"/tos\">Terms of service</a> | <a href=\"/p\">Privacy policy</a></footer>" +
      "</body></html>"
    val src = (_: DateInterval) => Seq((8L, page)).toDF("doc_id", "text")
    val clean = WarehouseTable(HdfsUrl(tmpDir("curation_main")), "clean")
    val job = new CurationPipelineJob(src, clean, htmlSource = true, mainContentOnly = true)
    val date = Day(2026, 8, 12)
    runJob(job, date).isSuccess shouldBe true

    val text = clean.load(spark, date).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap.apply(8L)
    text shouldBe base // exactly the article — no nav, no footer, no markup
  }

  test("curation pipeline caps hot domains and rebalances to a target mix") {
    // per-doc disjoint vocabularies: every doc passes the quality gate and
    // nothing near-dedups, so cap + mix see exactly the authored supply
    def doc(i: Long): String =
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i"
    val rows =
      (0L until 30L).map(i => (i, doc(i), "site-a", "en")) ++
        (100L until 110L).map(i => (i, doc(i), "site-b", "de")) ++
        (200L until 203L).map(i => (i, doc(i), "site-c", "de"))
    val src = (_: DateInterval) => rows.toDF("doc_id", "text", "site", "lang")
    val date = Day(2026, 8, 12)

    // hot domains capped at 5, under-cap domain untouched; helper col dropped
    val cleanCap = WarehouseTable(HdfsUrl(tmpDir("curation_cap")), "clean")
    runJob(new CurationPipelineJob(src, cleanCap,
      domainCol = Some("site"), maxPerDomain = 5), date).isSuccess shouldBe true
    val capped = cleanCap.load(spark, date)
    capped.columns should not contain "cap_rank"
    val bySite = capped.groupBy("site").count().as[(String, Long)].collect().toMap
    bySite("site-a") shouldBe 5
    bySite("site-b") shouldBe 5
    bySite("site-c") shouldBe 3

    // blocklist: site-b vanishes entirely, the rest untouched
    val cleanBlock = WarehouseTable(HdfsUrl(tmpDir("curation_block")), "clean")
    runJob(new CurationPipelineJob(src, cleanBlock,
      domainCol = Some("site"), blockedDomains = Set("site-b")), date).isSuccess shouldBe true
    val sites = cleanBlock.load(spark, date).select("site").distinct()
      .as[String].collect().toSet
    sites shouldBe Set("site-a", "site-c")

    // target mix: de (13 docs at 50% share) binds -> kept whole; en
    // downsamples toward the same share instead of keeping all 30
    val cleanMix = WarehouseTable(HdfsUrl(tmpDir("curation_mix")), "clean")
    runJob(new CurationPipelineJob(src, cleanMix,
      targetMix = Map("en" -> 500000, "de" -> 500000)), date).isSuccess shouldBe true
    val byLang = cleanMix.load(spark, date).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    byLang("de") shouldBe 13
    byLang("en") should (be > 0L and be < 30L)

    // both stages skipped when unset: every authored doc survives
    val cleanOff = WarehouseTable(HdfsUrl(tmpDir("curation_nocapmix")), "clean")
    runJob(new CurationPipelineJob(src, cleanOff), date).isSuccess shouldBe true
    cleanOff.load(spark, date).count() shouldBe 43
  }

  test("curation pipeline with urlCol collapses recrawls by canonical URL first") {
    // docs 1-3 are the SAME page crawled three ways (default port + case,
    // tracking params, schemeless) with different bodies — URL dedup keeps
    // the smallest doc_id before any text stage sees the others; doc 4 is
    // a different page; doc 5 has no URL and passes through
    def doc(i: Long): String =
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i"
    val rows = Seq(
      (1L, doc(1), "HTTP://X.com:80/page?utm_source=a"),
      (2L, doc(2), "http://x.com/page"),
      (3L, doc(3), "x.com/page#frag"),
      (4L, doc(4), "http://x.com/other"),
      (5L, doc(5), null.asInstanceOf[String]))
    val src = (_: DateInterval) => rows.toDF("doc_id", "text", "url")
    val date = Day(2026, 8, 12)

    val clean = WarehouseTable(HdfsUrl(tmpDir("curation_url")), "clean")
    runJob(new CurationPipelineJob(src, clean, urlCol = Some("url")), date)
      .isSuccess shouldBe true
    val ids = clean.load(spark, date).select("doc_id").as[Long].collect().toSet
    ids shouldBe Set(1L, 4L, 5L)

    // stage skipped when unset: all five distinct bodies survive
    val cleanOff = WarehouseTable(HdfsUrl(tmpDir("curation_url_off")), "clean")
    runJob(new CurationPipelineJob(src, cleanOff), date).isSuccess shouldBe true
    cleanOff.load(spark, date).count() shouldBe 5
  }

  test("curation pipeline urlQualityGate drops asset/spam URLs before any text stage") {
    def doc(i: Long): String =
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i"
    val rows = Seq(
      (1L, doc(1), "http://x.com/articles/good-page"),
      (2L, doc(2), "http://x.com/images/photo.jpg"),   // asset extension
      (3L, doc(3), "http://x.com/casino/free-bonus"),  // blocked word
      (4L, doc(4), "http://x.com/other"),
      (5L, doc(5), null.asInstanceOf[String]))          // no URL: passes through
    val src = (_: DateInterval) => rows.toDF("doc_id", "text", "url")
    val date = Day(2026, 8, 12)
    val clean = WarehouseTable(HdfsUrl(tmpDir("curation_urlgate")), "clean")
    runJob(new CurationPipelineJob(src, clean,
      urlCol = Some("url"), urlQualityGate = true), date).isSuccess shouldBe true
    clean.load(spark, date).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 4L, 5L)
    // gate off (the default): only URL dedup applies, nothing else dropped
    val cleanOff = WarehouseTable(HdfsUrl(tmpDir("curation_urlgate_off")), "clean")
    runJob(new CurationPipelineJob(src, cleanOff, urlCol = Some("url")), date)
      .isSuccess shouldBe true
    cleanOff.load(spark, date).count() shouldBe 5
  }

  test("curation pipeline typicalityN=2 gates on word order, not word bags") {
    // the reversed doc has base's exact unigram bag (same unigram score)
    // but almost none of its bigrams — only the bigram gate catches it
    val reversed = base.split(" ").reverse.mkString(" ")
    val src = (_: DateInterval) => Seq((1L, base), (2L, reversed)).toDF("doc_id", "text")
    val date = Day(2026, 8, 12)
    val uniModel = graft.ops.TextAnalysis.typicalityModel(Seq(base).toDF("text"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val biModel = graft.ops.TextAnalysis.typicalityModelN(Seq(base).toDF("text"), "text", n = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val cleanUni = WarehouseTable(HdfsUrl(tmpDir("curation_typ_uni")), "clean")
    runJob(new CurationPipelineJob(src, cleanUni,
      typicalityModel = Some(uniModel), minTypicalityPpm = 15000L), date)
      .isSuccess shouldBe true
    cleanUni.load(spark, date).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 2L) // unigram model cannot tell them apart

    val cleanBi = WarehouseTable(HdfsUrl(tmpDir("curation_typ_bi")), "clean")
    // bigrams are mostly distinct, so the self-score sits near 1e6/n_grams
    // (~15k) — a 5k floor keeps the original and still gates the reversed
    // doc, whose bigram score is near zero
    runJob(new CurationPipelineJob(src, cleanBi,
      typicalityModel = Some(biModel), minTypicalityPpm = 5000L, typicalityN = 2), date)
      .isSuccess shouldBe true
    cleanBi.load(spark, date).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L) // word order now scores: the reversed doc is gated

    // stupid backoff: the reversed doc's words are all in the unigram
    // model, so unseen pairs earn 40% unigram credit (~5.8k ppm) and it
    // clears a 4k floor the pure bigram gate (score ~0) would fail
    val cleanBo = WarehouseTable(HdfsUrl(tmpDir("curation_typ_bo")), "clean")
    runJob(new CurationPipelineJob(src, cleanBo,
      typicalityModel = Some(biModel), minTypicalityPpm = 4000L,
      backoffUniModel = Some(uniModel)), date).isSuccess shouldBe true
    cleanBo.load(spark, date).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 2L)
  }

  test("curation pipeline with a trained quality model drops low scorers") {
    // digit soup passes every Gopher flag (10 distinct clean tokens) but a
    // prose-shaped linear model scores it deeply negative
    val src = (_: DateInterval) => Seq(
      (1L, base),
      (2L, "1111 2222 3333 4444 5555 6666 7777 8888 9999 0000"))
      .toDF("doc_id", "text")
    val date = Day(2026, 8, 12)
    val w = Map("stopword_ppm" -> 3L, "distinct_ppm" -> 1L, "digit_ppm" -> -200L)

    val clean = WarehouseTable(HdfsUrl(tmpDir("curation_model")), "clean")
    runJob(new CurationPipelineJob(src, clean,
      qualityWeights = Some(w), minQualityScore = 100000L), date)
      .isSuccess shouldBe true
    clean.load(spark, date).select("doc_id").as[Long].collect().toSet shouldBe Set(1L)

    // gate off when unset: the digit doc survives the Gopher flags alone
    val cleanOff = WarehouseTable(HdfsUrl(tmpDir("curation_model_off")), "clean")
    runJob(new CurationPipelineJob(src, cleanOff), date).isSuccess shouldBe true
    cleanOff.load(spark, date).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 2L)
  }

  test("curation pipeline with a typicality model drops atypical survivors") {
    val root = HdfsUrl(tmpDir("curation_typ"))
    val clean = WarehouseTable(root, "clean")
    // model built from doc 1's own register: docs 1/2 self-score ~22k ppm;
    // doc 4 (support-speak, ~9.9k) and doc 5 (off-register tech text,
    // ~2.4k) fall under a 15k floor
    val model = graft.ops.TextAnalysis.typicalityModel(Seq(base).toDF("text"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val job = new CurationPipelineJob(sourceFor, clean,
      typicalityModel = Some(model), minTypicalityPpm = 15000L)
    val date = Day(2026, 8, 12)
    runJob(job, date).isSuccess shouldBe true

    val ids = clean.load(spark, date).select("doc_id").as[Long].collect().toSet
    ids should contain(1L) // in-register keeper survives
    ids should not contain 4L // off-register support boilerplate gated
    ids should not contain 5L // off-register tech text gated
  }

  test("scriptAware pipeline curates a CJK day the ASCII pipeline would reject wholesale") {
    val zhA = "深度学习模型在大规模语料库上训练需要高质量的数据和强大的算力支持"
    val zhB = zhA.dropRight(2) + "保障" // recrawl of A with an edited tail
    val zhC = "今天天气晴朗适合在公园里散步并且观察各种花草树木的生长情况"
    val junk = "的的的的的的的的的的的的的的的的的的的的" // degenerate repetition
    val src = (_: DateInterval) =>
      Seq((1L, zhA), (2L, zhB), (3L, zhC), (4L, junk)).toDF("doc_id", "text")
    val date = Day(2026, 8, 12)

    // ASCII pipeline: the quality gate sees zero tokens everywhere — the
    // whole day is rejected (the failure mode the flag exists to fix)
    val asciiClean = WarehouseTable(HdfsUrl(tmpDir("curation_cjk_ascii")), "clean")
    runJob(new CurationPipelineJob(src, asciiClean), date).isSuccess shouldBe true
    asciiClean.load(spark, date).count() shouldBe 0L

    // script-aware pipeline: real pages pass the gate, the recrawl
    // collapses onto its keeper, degenerate repetition still fails
    val clean = WarehouseTable(HdfsUrl(tmpDir("curation_cjk")), "clean")
    runJob(new CurationPipelineJob(src, clean, scriptAware = true), date)
      .isSuccess shouldBe true
    val ids = clean.load(spark, date).select("doc_id").as[Long].collect().toSet
    ids shouldBe Set(1L, 3L)
  }

  test("curation pipeline scrubCards masks Luhn-valid runs, leaves order ids alone") {
    val src = (_: DateInterval) => Seq(
      (1L, base + " paid with card 4111 1111 1111 1111 yesterday"),
      (2L, base + " order number 4111 1111 1111 1112 shipped today"))
      .toDF("doc_id", "text")
    val clean = WarehouseTable(HdfsUrl(tmpDir("curation_cards")), "clean")
    runJob(new CurationPipelineJob(src, clean, threshold = 0.95, scrubCards = true),
      Day(2026, 8, 12)).isSuccess shouldBe true
    val byId = clean.load(spark, Day(2026, 8, 12)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    byId(1L) should include("<CARD>")
    byId(1L) should not include "4111 1111 1111 1111"
    // checksum-failing run: NOT a card; the generic phone pattern must not
    // have eaten it either (it requires a leading +)
    byId(2L) should include("4111 1111 1111 1112")
  }
}
