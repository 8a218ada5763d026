package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.testkit.SparkTestBase

/** Pure-JVM tests of the Aho–Corasick automaton (no Spark session). */
class MultiMatchKernelSpec extends AnyFunSuite with Matchers {

  private def find(text: String, pats: String*): Seq[String] = {
    val arr = new AhoCorasick(pats.toArray)
      .findDistinctSorted(UTF8String.fromString(text))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** Honest reference: per-pattern contains, distinct, binary-sorted. */
  private def naive(text: String, pats: Seq[String]): Seq[String] =
    pats.distinct.filter(text.contains)
      .sortBy(UTF8String.fromString)(Ordering.ordered[UTF8String])

  test("the classic overlapping set: he/she/his/hers over 'ushers'") {
    find("ushers", "he", "she", "his", "hers") shouldBe Seq("he", "hers", "she")
  }

  test("nested prefixes and suffixes all fire at the same position") {
    find("xabcy", "ab", "b", "abc") shouldBe Seq("ab", "abc", "b")
    // a pattern that is a proper suffix of another, met only via fail links
    find("zzabcabd", "abc", "bcab", "cab") shouldBe Seq("abc", "bcab", "cab")
  }

  test("repeated hits dedupe; disjoint patterns; no-match is empty") {
    find("abab", "ab") shouldBe Seq("ab")
    find("hello world", "wor", "xyz") shouldBe Seq("wor")
    find("clean text", "bad", "worse") shouldBe Seq.empty
  }

  test("multi-byte UTF-8 patterns match byte-exactly, never mid-codepoint") {
    find("say héllo théré", "héllo", "llo", "é") shouldBe Seq("héllo", "llo", "é")
    // 'é' is 0xC3 0xA9; a pattern that equals a continuation byte sequence
    // of another char must not fire spuriously
    find("日本語のテキスト", "本語", "テキ") shouldBe Seq("テキ", "本語")
    find("日本語", "语") shouldBe Seq.empty // different codepoint, shared bytes prefix
  }

  test("duplicate patterns collapse; empty pattern list rejected") {
    find("aa", "a", "a") shouldBe Seq("a")
    intercept[IllegalArgumentException](new AhoCorasick(Array.empty[String]))
    intercept[IllegalArgumentException](new AhoCorasick(Array("ok", "")))
  }

  test("randomized parity with the naive per-pattern scan") {
    val rnd = new scala.util.Random(97)
    val alphabet = "abcd"
    def randStr(n: Int): String =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 200) {
      val pats = Seq.fill(1 + rnd.nextInt(12))(randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(rnd.nextInt(40))
      find(text, pats: _*) shouldBe naive(text, pats)
    }
  }

  test("the automaton is serializable (ships to executors inside the plan)") {
    val ac = new AhoCorasick(Array("he", "she"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(ac)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[AhoCorasick]
    val arr = back.findDistinctSorted(UTF8String.fromString("ushers"))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString) shouldBe
      Seq("he", "she")
  }
}

/** Spark-level tests: codegen path, null law, op-layer gate. */
class MultiMatchSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("multi_match kernel equals the composed per-pattern form on random docs") {
    val rnd = new scala.util.Random(13)
    val words = Seq("alpha", "beta", "gamma", "delta", "spark", "query", "scan")
    val docs = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" ")))
      .toDF("id", "text")
    val pats = Seq("alpha", "beta gamma", "spark query", "scan", "eta")
    val both = docs.select(
      graft.functions.functions.multi_match(col("text"), pats).as("kernel"),
      graft.ops.TextAnalysis.blocklistHitsComposed(col("text"), pats).as("composed"))
    both.where(col("kernel") =!= col("composed")).count() shouldBe 0L
  }

  test("null text null-propagates; clean text yields an empty array") {
    val df = Seq((1L, Some("all clear")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val out = df.select(col("id"),
      graft.functions.functions.multi_match(col("text"), Seq("bad")).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    out(1L) shouldBe Seq.empty
    out(2L) shouldBe null
  }

  test("blocklistHits: case-insensitive gate with matched-term audit") {
    val df = Seq(
      (1L, "Totally Fine article text"),
      (2L, "contains one BANNED phrase"),
      (3L, "worse: banned phrase and forbidden term")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .blocklistHits(df, "text", Seq("banned phrase", "forbidden term"))
    out.where(col("n_matched") === 0).select("doc_id").as[Long].collect() shouldBe Array(1L)
    out.where(col("doc_id") === 3L).select("matched_terms").as[Seq[String]]
      .collect().head shouldBe Seq("banned phrase", "forbidden term")
    // uppercase phrases are a silent-miss hazard -> rejected loudly
    intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.blocklistHits(df, "text", Seq("Banned"))
    }
  }
}
