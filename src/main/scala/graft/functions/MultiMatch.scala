package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern substring search, built once and shipped to
 * executors as a plan reference object — the scan-speed kernel behind
 * blocklist/safety screens, where a document must be tested against
 * THOUSANDS of phrases at once. The composed form
 * (`filter(array(lits), p -> contains(text, p))`) walks the text once per
 * pattern — O(patterns x text); the automaton walks it ONCE regardless of
 * pattern count, the difference between a scan-speed gate and an
 * unrunnable one at 10k+ phrases.
 *
 * Matching is over raw UTF-8 bytes, which is sound for substring search:
 * a valid UTF-8 pattern can never match starting mid-codepoint (every
 * UTF-8 sequence's first byte is structurally distinct from continuation
 * bytes). Output is the DISTINCT matched patterns in binary (UTF-8
 * lexicographic) order — deterministic, and exactly what
 * `list_sort(list_filter(...))` replays in an oracle engine. Case
 * sensitivity is the caller's contract: lower both sides for a
 * case-insensitive screen (see [[graft.ops.TextAnalysis.blocklistHits]]).
 *
 * Cite: the classic Aho–Corasick (1975) construction — goto/fail/output
 * with an output-suffix shortcut link so per-byte work is transitions
 * plus ACTUAL matches, never a full fail-chain walk.
 */
class AhoCorasick(rawPatterns: Array[String]) extends Serializable {
  require(rawPatterns.nonEmpty, "multi_match needs at least one pattern")
  require(rawPatterns.forall(_.nonEmpty), "multi_match patterns must be non-empty")

  /** Patterns deduped and presorted by UTF-8 binary order, so match output
    * can be emitted in sorted order by index without a per-row sort. */
  private val patterns: Array[UTF8String] =
    rawPatterns.map(UTF8String.fromString).distinct.sorted
  private val nPatterns = patterns.length

  // trie arrays (built eagerly; a few ints per pattern byte)
  private var childBytes: Array[Array[Byte]] = _
  private var childIds: Array[Array[Int]] = _
  private var fail: Array[Int] = _
  private var outPat: Array[Int] = _ // pattern index ending exactly here, else -1
  private var outLink: Array[Int] = _ // nearest proper-suffix state with output, else 0/-marked

  build()

  private def build(): Unit = {
    import scala.collection.mutable.ArrayBuffer
    // boxed value type: a primitive-Int map would unbox absent keys to 0
    // (the root) instead of signalling absence
    val kids = ArrayBuffer(new java.util.TreeMap[java.lang.Byte, Integer]())
    val out = ArrayBuffer(-1)
    var p = 0
    while (p < nPatterns) {
      val bytes = patterns(p).getBytes
      var s = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i)
        val nxt = kids(s).get(b)
        if (nxt eq null) {
          kids += new java.util.TreeMap[java.lang.Byte, Integer]()
          out += -1
          kids(s).put(b, kids.size - 1)
          s = kids.size - 1
        } else s = nxt.intValue()
        i += 1
      }
      out(s) = p
      p += 1
    }
    val n = kids.size
    childBytes = new Array(n)
    childIds = new Array(n)
    fail = new Array(n)
    outPat = out.toArray
    outLink = new Array(n)
    var s = 0
    while (s < n) {
      val m = kids(s)
      val cb = new Array[Byte](m.size)
      val ci = new Array[Int](m.size)
      var j = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); cb(j) = e.getKey.byteValue(); ci(j) = e.getValue.intValue(); j += 1
      }
      childBytes(s) = cb
      childIds(s) = ci
      s += 1
    }
    // BFS fail links + output-suffix shortcuts
    val queue = new java.util.ArrayDeque[Int]()
    var j = 0
    while (j < childIds(0).length) { queue.add(childIds(0)(j)); j += 1 }
    while (!queue.isEmpty) {
      val u = queue.poll()
      outLink(u) = if (outPat(fail(u)) >= 0) fail(u) else outLink(fail(u))
      var k = 0
      while (k < childIds(u).length) {
        val b = childBytes(u)(k)
        val v = childIds(u)(k)
        var f = fail(u)
        var resolved = -1
        while (resolved < 0) {
          val t = lookup(f, b)
          if (t >= 0 && t != v) resolved = t
          else if (f == 0) resolved = 0
          else f = fail(f)
        }
        fail(v) = resolved
        queue.add(v)
        k += 1
      }
    }
  }

  /** Binary search the sorted child-byte array of `state`. */
  private def lookup(state: Int, b: Byte): Int = {
    val cb = childBytes(state)
    var lo = 0
    var hi = cb.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cb(mid) == b) return childIds(state)(mid)
      else if (cb(mid) < b) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Distinct matched patterns in binary-sorted order, one text pass. */
  def findDistinctSorted(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var hits: java.util.BitSet = null
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      var t = lookup(state, b)
      while (t < 0 && state != 0) { state = fail(state); t = lookup(state, b) }
      state = if (t >= 0) t else 0
      // every state on this chain has output; the root (no output — patterns
      // are non-empty) terminates it
      var o = if (outPat(state) >= 0) state else outLink(state)
      while (o != 0) {
        if (hits == null) hits = new java.util.BitSet(nPatterns)
        hits.set(outPat(o))
        o = outLink(o)
      }
      i += 1
    }
    if (hits == null) new GenericArrayData(Array.empty[Any])
    else {
      val res = new Array[Any](hits.cardinality())
      var j = 0
      var p = hits.nextSetBit(0)
      while (p >= 0) { res(j) = patterns(p); j += 1; p = hits.nextSetBit(p + 1) }
      new GenericArrayData(res)
    }
  }
}

/**
 * `multi_match(text)` over a FIXED pattern set: the distinct matched
 * patterns in binary-sorted order (empty array when nothing matches; null
 * text null-propagates). The automaton is built once on the driver and
 * shipped to executors inside the plan (codegen reference object /
 * transient-lazy on the interpreted path) — never rebuilt per row.
 */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "multi_match needs at least one pattern")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_match"

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override protected def nullSafeEval(input: Any): Any =
    ac.findDistinctSorted(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftMultiMatchAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.findDistinctSorted($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

object MultiMatch {
  /** Column builder (the `functions.multi_match` entry point). */
  def column(text: Column, patterns: Seq[String]): Column =
    GraftExpressionBridge.column(
      MultiMatch(GraftExpressionBridge.expression(text), patterns))
}
