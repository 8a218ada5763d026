package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure-JVM tests of the Damerau-Levenshtein kernel (no Spark session). */
class StringDistanceSpec extends AnyFunSuite with Matchers {

  private def dl(a: String, b: String): Int =
    StringDistanceOps.damerau(UTF8String.fromString(a), UTF8String.fromString(b))

  /**
   * Honest reference: breadth-first search over actual edit sequences
   * (insert / delete / substitute / transpose-adjacent) — the DEFINITION
   * of the unrestricted distance, feasible for tiny strings. Inserted
   * characters are drawn from chars(a) U chars(b): a minimal path never
   * needs any other.
   */
  private def bfs(a: String, b: String): Int = {
    if (a == b) return 0
    val alphabet = (a + b).toSet.toSeq
    var frontier = Set(a)
    var seen = Set(a)
    var depth = 0
    while (depth < 8) {
      depth += 1
      val next = scala.collection.mutable.Set.empty[String]
      for (s <- frontier) {
        val edits = scala.collection.mutable.Buffer.empty[String]
        for (i <- 0 to s.length; c <- alphabet) edits += s.substring(0, i) + c + s.substring(i)
        for (i <- 0 until s.length) edits += s.substring(0, i) + s.substring(i + 1)
        for (i <- 0 until s.length; c <- alphabet if c != s(i))
          edits += s.substring(0, i) + c + s.substring(i + 1)
        for (i <- 0 until s.length - 1)
          edits += s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
        for (e <- edits if !seen(e)) {
          if (e == b) return depth
          // prune growth only: minimal paths never need strings longer
          // than the longer endpoint plus one
          if (e.length <= math.max(a.length, b.length) + 1) { seen += e; next += e }
        }
      }
      frontier = next.toSet
    }
    fail(s"bfs gave up on '$a' -> '$b'")
  }

  test("known vectors, including the case that separates unrestricted DL from OSA") {
    dl("", "") shouldBe 0
    dl("abc", "abc") shouldBe 0
    dl("abc", "") shouldBe 3
    dl("", "abc") shouldBe 3
    dl("ab", "ba") shouldBe 1        // one transposition
    dl("kitten", "sitting") shouldBe 3
    dl("from", "form") shouldBe 1    // typo metric: swap costs 1
    // OSA gives 3 here; unrestricted DL edits between the transposed pair
    dl("CA", "ABC") shouldBe 2
  }

  test("code points, not bytes: transposed CJK pair costs 1") {
    dl("日本", "本日") shouldBe 1
    dl("héllo", "hello") shouldBe 1  // one substitution, not two byte edits
  }

  test("matches the edit-sequence BFS definition on random tiny strings") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val a = (1 to rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val b = (1 to rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      withClue(s"'$a' vs '$b'") { dl(a, b) shouldBe bfs(a, b) }
    }
  }

  test("metric properties: symmetry, identity, triangle inequality") {
    val rnd = new scala.util.Random(7)
    val strs = (1 to 30).map(_ =>
      (1 to rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    for (a <- strs; b <- strs) {
      dl(a, b) shouldBe dl(b, a)
      (dl(a, b) == 0) shouldBe (a == b)
    }
    for (a <- strs.take(10); b <- strs.take(10); c <- strs.take(10))
      dl(a, c) should be <= dl(a, b) + dl(b, c)
  }

  test("never exceeds Levenshtein and both bound by max length") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val a = (1 to rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      val b = (1 to rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      val d = dl(a, b)
      d should be <= lev(a, b)
      d should be <= math.max(a.length, b.length)
      d should be >= math.abs(a.length - b.length)
    }
  }
}
