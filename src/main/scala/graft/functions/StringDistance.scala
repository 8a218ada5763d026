package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unrestricted Damerau-Levenshtein distance (insert / delete / substitute
 * / transpose, transposed blocks may be edited between — the
 * alphabet-indexed DP of Lowrance & Wagner 1975), the edit metric under
 * which a swapped word pair ("from"/"form") costs 1 where plain
 * Levenshtein (Spark's built-in, [[graft.ops.Joins.editDistanceJoin]])
 * charges 2 — the right metric for typo-shaped fuzzy matching.
 *
 * Operates on Unicode CODE POINTS: a transposed CJK pair costs 1 edit.
 * (DuckDB's `damerau_levenshtein` counts BYTES — 4 for that pair — so
 * oracle comparisons pin ASCII inputs, where the definitions coincide;
 * the codepoint semantics are the documented, deliberate choice.)
 *
 * O(|a| x |b|) time, O(|a| x |b|) ints of scratch per call — fine for the
 * name/title-length strings fuzzy joins run on; block candidates first
 * ([[graft.ops.Joins.editDistanceJoin]]'s segment blocking) so only
 * near-pairs ever pay the DP.
 */
object StringDistanceOps {

  /** Unrestricted DL distance over code points. */
  def damerau(aStr: UTF8String, bStr: UTF8String): Int = {
    val a = aStr.toString.codePoints().toArray
    val b = bStr.toString.codePoints().toArray
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val maxd = n + m
    // (n+2) x (m+2) DP grid, flattened; row i maps to codepoints a[i-2]
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = maxd
    var j = 0
    while (j <= m) { d(j + 1) = maxd; d(w + j + 1) = j; j += 1 }
    var i = 0
    while (i <= n) { d((i + 1) * w) = maxd; d((i + 1) * w + 1) = i; i += 1 }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k: Int = { val v = da.get(b(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d((n + 1) * w + m + 1)
  }
}

/** Damerau-Levenshtein distance expression (codegen'd static call); null
  * inputs null-propagate. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected (string, string), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceOps.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistanceOps$$.MODULE$$.damerau($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}
