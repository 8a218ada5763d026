package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native kernel for the deterministic Poisson(1) bootstrap weight draw
 * behind `graft.ops.Stats.poissonBootstrapCI` (and its S31 streaming
 * twin). Bit-identical to the composed-expression form (the spec in
 * StatsSpec cross-checks them element-for-element, and the DuckDB oracle
 * mirrors the same law): replicate `r` of row `id` reads the 16-bit
 * bucket at hex offset `(r % 8) * 4` of `md5(salt:id:⌊r/8⌋)` and maps it
 * through the fixed λ=1 inverse-CDF table [[PoissonDraw.Cdf16]]
 * (`weight = |{t : bucket >= t}|`, the Poisson(1) pmf to within 2⁻¹⁶ per
 * cell, capped at 7).
 *
 * The composed form pays the battery's single heaviest per-row cost:
 * each md5 block decodes through THREE `conv(hex, 16, 10)` calls — conv's
 * string machinery measured as the hot loop of `bootstrap_ci` (5.9 s,
 * the most expensive battery query). This kernel digests each block once
 * and reads buckets straight from the digest bytes — no hex string, no
 * conv — the same 5-30× single-pass win as the MinHashSignature
 * precedent.
 */
object PoissonDraw {
  /**
   * λ = 1 Poisson CDF thresholds scaled by 2^16 (floor of
   * `cdf(k)·65536`, k = 0..6) — FIXED integer constants so the draw is a
   * pure function of the md5 bucket and replays digit-for-digit in any
   * engine. The table law is spec-pinned against the pmf (StatsSpec).
   */
  val Cdf16: Array[Int] = Array(24109, 48218, 60273, 64291, 65296, 65497, 65530)

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Weight of one 16-bit bucket: thresholds are ascending, so the count
    * of `t <= bucket` early-exits. */
  private def weightOf(bucket: Int): Long = {
    var w = 0L
    var i = 0
    while (i < 7 && bucket >= Cdf16(i)) { w += 1; i += 1 }
    w
  }

  /**
   * The `b` per-replicate weights of row `id` as an `array<long>` —
   * `ceil(b/8)` digests per row (eight 16-bit buckets per 128-bit md5),
   * buckets read as big-endian byte pairs of the raw digest (identical
   * to the hex-substring law: hex chars `[4k, 4k+4)` ARE digest bytes
   * `2k, 2k+1`).
   */
  def poissonWeights(id: UTF8String, b: Int, salt: String): ArrayData = {
    val md = digests.get()
    val s = id.toString
    val nBlocks = (b + 7) / 8
    val out = new Array[Long](b)
    var blk = 0
    var r = 0
    while (blk < nBlocks) {
      md.reset()
      val bytes = md.digest(
        (salt + ":" + s + ":" + blk).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var off = 0
      while (off < 8 && r < b) {
        val bucket = ((bytes(2 * off) & 0xff) << 8) | (bytes(2 * off + 1) & 0xff)
        out(r) = weightOf(bucket)
        r += 1
        off += 1
      }
      blk += 1
    }
    new GenericArrayData(out)
  }
}

case class PoissonWeights(child: Expression, b: Int, salt: String)
    extends TextHashExpression {
  require(b >= 1 && b <= 256, s"replicates must be in [1,256], got $b")
  // the salt is spliced into generated Java source as a string literal
  require(salt.matches("[A-Za-z0-9_.-]*"), s"salt must be [A-Za-z0-9_.-]*, got '$salt'")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poisson_weights"
  override protected def nullSafeEval(input: Any): Any =
    PoissonDraw.poissonWeights(input.asInstanceOf[UTF8String], b, salt)
  override protected def staticCall(c: String): String =
    s"""graft.functions.PoissonDraw$$.MODULE$$.poissonWeights($c, $b, "$salt")"""
  override protected def withNewChildInternal(newChild: Expression): PoissonWeights =
    copy(child = newChild)
}

object PoissonWeights {
  /** Column-API constructor; `id` must already be a string column. */
  def column(id: Column, b: Int, salt: String): Column =
    GraftExpressionBridge.column(
      PoissonWeights(GraftExpressionBridge.expression(id), b, salt))
}
