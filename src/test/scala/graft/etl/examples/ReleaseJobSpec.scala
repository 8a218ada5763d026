package graft.etl.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.{HdfsUrl, WarehouseTable}
import graft.testkit.SparkJobSuiteBase
import graft.time.{DateInterval, Day}

/**
 * The capstone release chain: a corpus planted with one offender per
 * stage, so every manifest row is load-bearing — plus the conservation
 * laws (kept + rejected = previous kept, for rows AND tokens) that make
 * the manifest an audit rather than a printout.
 */
class ReleaseJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 12)

  /** ~45 distinct words of clean prose, seeded so texts differ. */
  private def prose(seed: Int, words: Int = 45): String =
    (0 until words).map(i => s"word${(seed * 131 + i * 7) % 9973}x$i").mkString(" ")

  /**
   * The planted corpus:
   *  - ids 0-19: clean en docs (distinct prose),
   *  - ids 20-25: clean de docs; 26-28: clean fr docs,
   *  - ids 30/31: same page modulo a tracking param (URL dup — 31 dies),
   *  - ids 32/33: same text modulo whitespace (exact dup — 33 dies),
   *  - ids 34/35: 200-word prose differing in ONE final word (near dup —
   *    35 dies; ~0.96 shingle Jaccard, well over the 0.8 threshold),
   *  - id 36: symbol soup (fails the quality gate),
   *  - id 37: carries an 8-word span of the benchmark doc (contaminated),
   *  - ids 40-44: es docs (no es target — all die at the mix stage).
   */
  private def corpus: DataFrame = {
    val near = prose(900, 200)
    val nearDup = near.split(' ').dropRight(1).mkString(" ") + " changedtail"
    val benchSpan = "alpha bravo charlie delta echo foxtrot golf hotel"
    val rows =
      (0 until 20).map(i => (i.toLong, s"https://site.com/en/$i", "en", "s_en", prose(i))) ++
      (20 until 26).map(i => (i.toLong, s"https://site.com/de/$i", "de", "s_de", prose(i))) ++
      (26 until 29).map(i => (i.toLong, s"https://site.com/fr/$i", "fr", "s_fr", prose(i))) ++
      Seq(
        (30L, "https://site.com/page?x=1", "en", "s_en", prose(300)),
        (31L, "https://site.com/page?x=1&utm_source=feed", "en", "s_en", prose(301)),
        (32L, "https://site.com/a32", "en", "s_en", "the same exact text lives here in this document body"),
        (33L, "https://site.com/a33", "en", "s_en", "the  same   exact text lives here in this document body"),
        (34L, "https://site.com/a34", "en", "s_en", near),
        (35L, "https://site.com/a35", "en", "s_en", nearDup),
        (36L, "https://site.com/a36", "en", "s_en", "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        (37L, "https://site.com/a37", "en", "s_en", s"this clean document quotes $benchSpan straight from the benchmark set")) ++
      (40 until 45).map(i => (i.toLong, s"https://site.com/es/$i", "es", "s_es", prose(i)))
    rows.toDF("doc_id", "url", "lang", "source", "text")
  }

  private def bench: DataFrame = Seq(
    (1000L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"))
    .toDF("bench_id", "text")

  private val targets = Map("en" -> 500000, "de" -> 250000)

  private def manifestMap(m: DataFrame): Map[(Long, String, String), (Long, Long, Option[Long])] =
    m.as[(Long, String, String, Long, Long, Option[Long])].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap

  test("manifest: every planted offender dies at its stage; counts and tokens conserve") {
    val (export, manifest) = Release.build(corpus, bench, targets)
    val m = manifestMap(manifest)

    m((0L, "raw", "kept"))._1 shouldBe 42L
    m((1L, "url_dedup", "rejected:dup_url"))._1 shouldBe 1L
    m((2L, "exact_dedup", "rejected:dup_text"))._1 shouldBe 1L
    m((3L, "near_dedup", "rejected:near_dup"))._1 shouldBe 1L
    m((4L, "quality_gate", "rejected:low_quality"))._1 shouldBe 1L
    m((5L, "decontaminate", "rejected:contaminated"))._1 shouldBe 1L
    // all five es docs die at the mix (no es target); hash-rate
    // downsampling may drop more from the targeted groups
    m((6L, "target_mix", "rejected:mix_downsample"))._1 should be >= 5L

    // conservation at every stage (rows AND tokens), shares summing to
    // the mix stage, pack/shuffle consistency — the generic audit laws
    checkConservation(m)
    m.collect { case ((7L, "mix_share", g), _) => g }.toSet should not contain "es"
    m((9L, "shuffle", "kept"))._3 should not be None

    // the export IS the shuffled chunk frame the manifest summarized
    export.count() shouldBe m((9L, "shuffle", "kept"))._1
    export.agg(sum($"n_tokens")).as[Long].head() shouldBe m((9L, "shuffle", "kept"))._2
  }

  /** The generic audit laws every manifest must satisfy, whatever the
    * corpus: kept+rejected conservation (rows AND tokens) at every stage,
    * shares that sum to the mix stage, pack/shuffle/export consistency. */
  private def checkConservation(
      m: Map[(Long, String, String), (Long, Long, Option[Long])]): Unit = {
    val keptByOrd = (0L to 6L).map { o =>
      o -> m.collectFirst { case ((`o`, _, "kept"), v) => v }.get
    }.toMap
    (1L to 6L).foreach { o =>
      val rej = m.collectFirst { case ((`o`, _, d), v) if d.startsWith("rejected:") => v }.get
      withClue(s"stage $o rows: ") {
        keptByOrd(o)._1 + rej._1 shouldBe keptByOrd(o - 1)._1
      }
      withClue(s"stage $o tokens: ") {
        keptByOrd(o)._2 + rej._2 shouldBe keptByOrd(o - 1)._2
      }
      rej._1 should be >= 0L
    }
    val shares = m.collect { case ((7L, "mix_share", g), v) => g -> v }
    shares.values.map(_._1).sum shouldBe keptByOrd(6L)._1
    shares.values.map(_._2).sum shouldBe keptByOrd(6L)._2
    m((8L, "pack", "kept"))._2 shouldBe keptByOrd(6L)._2
    m((9L, "shuffle", "kept"))._1 shouldBe m((8L, "pack", "kept"))._1
    m((9L, "shuffle", "kept"))._2 shouldBe m((8L, "pack", "kept"))._2
  }

  test("conservation holds on random corpora (seeded trials, not just the planted one)") {
    for (seed <- Seq(7, 23, 94)) {
      val rnd = new scala.util.Random(seed)
      val langs = Seq("en", "en", "en", "de", "fr", "es") // en-heavy like a crawl
      val rows = (0 until 60).map { i =>
        val lang = langs(rnd.nextInt(langs.length))
        // URLs collide ~1/8 of the time; ~1/10 null; texts duplicate
        // ~1/6 of the time (exact) and occasionally quote the bench span
        val url = if (rnd.nextInt(10) == 0) null
          else s"https://h${rnd.nextInt(3)}.com/p${rnd.nextInt(45)}"
        val text =
          if (rnd.nextInt(6) == 0) prose(777) // exact-dup family
          else if (rnd.nextInt(12) == 0)
            s"quoting alpha bravo charlie delta echo foxtrot golf hotel here ${prose(seed * 100 + i, 10)}"
          else if (rnd.nextInt(15) == 0) "!!! @@@ ###" // gate fodder
          else prose(seed * 1000 + i, 20 + rnd.nextInt(40))
        (i.toLong, url, lang, s"s${rnd.nextInt(4)}", text)
      }
      val df = rows.toDF("doc_id", "url", "lang", "source", "text")
      // random corpora can lose a whole target group to the gates; keep
      // only groups that survive to stage 5 in the targets (the op's
      // documented fail-fast contract is separately spec'd)
      val m = manifestMap(Release.build(df, bench, Map("en" -> 500000))._2)
      withClue(s"seed $seed: ") { checkConservation(m) }
    }
  }

  test("manifest is a pure function of the data (repartition-stable, checksum included)") {
    val a = manifestMap(Release.build(corpus, bench, targets)._2)
    val b = manifestMap(Release.build(corpus.repartition(7), bench, targets)._2)
    a shouldBe b
  }

  test("warehouse round-trip: the job's stored manifest equals the direct build") {
    val root = HdfsUrl(tmpDir("release_job"))
    val releaseT = WarehouseTable(root, "release")
    val manifestT = WarehouseTable(root, "manifest")
    def src(date: DateInterval): DataFrame = corpus
    val job = new ReleaseJob(src, _ => bench, releaseT, manifestT, targets)

    runJob(job, day1).isSuccess shouldBe true
    job.shouldRunForDate(spark, day1) shouldBe false // gated on the manifest

    val stored = manifestMap(manifestT.load(spark, day1)
      .select($"ord", $"stage", $"detail", $"n", $"tokens", $"checksum"))
    val direct = manifestMap(Release.build(corpus, bench, targets)._2)
    stored shouldBe direct

    val storedExport = releaseT.load(spark, day1)
      .select($"chunk_key", $"shuffle_rank").as[(String, Long)].collect().toMap
    val directExport = Release.build(corpus, bench, targets)._1
      .select($"chunk_key", $"shuffle_rank").as[(String, Long)].collect().toMap
    storedExport shouldBe directExport
  }
}
