package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native vector kernels for the similarity operators. The composed
 * `aggregate(zip_with(...))` formulation allocates a zipped array and boxes
 * every element; these loop once over the raw ArrayData. Arithmetic order is
 * identical to the sequential fold (and to the DuckDB oracle): accumulate
 * left-to-right in doubles, so results are bit-identical.
 */
object VectorMath {

  private def value(a: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case org.apache.spark.sql.types.IntegerType => a.getInt(i).toDouble
    case org.apache.spark.sql.types.LongType => a.getLong(i).toDouble
    case dt: org.apache.spark.sql.types.DecimalType =>
      a.getDecimal(i, dt.precision, dt.scale).toDouble
    case org.apache.spark.sql.types.ShortType => a.getShort(i).toDouble
    case other => throw new IllegalArgumentException(s"non-numeric vector element type: $other")
  }

  def dot(a: ArrayData, ta: DataType, b: ArrayData, tb: DataType): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += value(a, ta, i) * value(b, tb, i); i += 1 }
    acc
  }

  /**
   * Random-hyperplane LSH bucket: bit `i` of the result is the sign of the
   * projection onto deterministic integer hyperplane `i` with weights
   * `((i*31 + d*17) % 7) - 3` (see [[graft.ops.Similarity]]). One pass over
   * the vector, all `nbits` accumulators at once; per-accumulator addition
   * order matches the composed per-bit fold, so buckets are bit-identical.
   */
  def lshBucket(a: ArrayData, ta: DataType, nbits: Int): Long = {
    val acc = new Array[Double](nbits)
    val n = a.numElements()
    var d = 0
    while (d < n) {
      val x = value(a, ta, d)
      var i = 0
      while (i < nbits) { acc(i) += x * (((i * 31 + d * 17) % 7) - 3); i += 1 }
      d += 1
    }
    var bucket = 0L
    var i = 0
    while (i < nbits) { if (acc(i) >= 0) bucket |= 1L << i; i += 1 }
    bucket
  }

  /**
   * Sign sketch for Hamming-distance ANN: like [[lshBucket]] but with the
   * double-modulus weight family `(((i*37 + d*11) % 101) % 7) - 3`. The
   * single-modulus family is linear mod 7, so it yields only 7 distinct
   * hyperplanes — fine for 8-bit bucketing, useless for a wide sketch whose
   * bits must be independent. The mod-101 step breaks the linearity: all
   * `nbits <= 63` rows are distinct, still plain integer arithmetic any
   * engine reproduces exactly.
   */
  def signSketch(a: ArrayData, ta: DataType, nbits: Int): Long = {
    val acc = new Array[Double](nbits)
    val n = a.numElements()
    if (n == 0) return 0L // all-signs-positive for a vacuous projection would be noise
    var d = 0
    while (d < n) {
      val x = value(a, ta, d)
      var i = 0
      while (i < nbits) { acc(i) += x * (((i * 37 + d * 11) % 101) % 7 - 3); i += 1 }
      d += 1
    }
    var sketch = 0L
    var i = 0
    while (i < nbits) { if (acc(i) >= 0) sketch |= 1L << i; i += 1 }
    sketch
  }

  /**
   * Deterministic sparse random projection to `k` dims: `out[i]` is the dot
   * of the vector with integer hyperplane `i` of the [[signSketch]] weight
   * family `(((i*37 + d*11) % 101) % 7) - 3` (the mod-101 step makes rows
   * independent; see signSketch's doc). Achlioptas-style sparse projections
   * preserve pairwise angles up to scale for `k >> log n`, so this is the
   * pre-ANN compaction step: project wide embeddings down, bucket/shortlist
   * on the projection, rerank survivors on the full vector. One pass over
   * the vector, all `k` accumulators at once; per-accumulator addition
   * order matches the composed per-dim fold, so results are bit-identical
   * to the spec twin and the DuckDB oracle.
   */
  def randomProject(a: ArrayData, ta: DataType, k: Int): ArrayData = {
    val acc = new Array[Double](k)
    val n = a.numElements()
    var d = 0
    while (d < n) {
      val x = value(a, ta, d)
      var i = 0
      while (i < k) { acc(i) += x * (((i * 37 + d * 11) % 101) % 7 - 3); i += 1 }
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }

  /**
   * Int8 quantize→dequantize round trip in ONE pass: `scale = max|v| / 127`
   * (null elements skipped, NaN wins every comparison — Spark's `greatest`
   * law), `out_i = floor(v_i / scale + 0.5).toInt * scale` (half-up; the
   * `.toInt` clamps exactly like Spark's non-ANSI double→int cast), zero
   * scale → all-zero codes. Bit-identical to the composed
   * `dequantizeInt8(quantizeInt8(v))` chain (SimilaritySpec parity), whose
   * two `transform` + one `aggregate` higher-order lambdas are
   * CodegenFallback — interpreted per ELEMENT, with a boxed struct per row.
   */
  def int8Roundtrip(a: ArrayData, ta: DataType): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = math.abs(value(a, ta, i))
        // Spark's greatest(): NaN compares greater than any double
        if (java.lang.Double.isNaN(x) || x > mx) mx = x
      }
      i += 1
    }
    val scale = mx / 127.0
    val out = new Array[Any](n)
    i = 0
    if (scale == 0.0) {
      // the composed spec twin's `when(s === 0.0, lit(0))` branch never
      // inspects the element, so a NULL slot in a max-abs-0 vector codes to
      // 0 and dequantizes to 0.0 — reproduce that (round 20; the non-zero
      // branch below keeps null, matching the composed null-propagating
      // arithmetic)
      while (i < n) { out(i) = 0.0; i += 1 }
    } else {
      while (i < n) {
        if (!a.isNullAt(i)) {
          out(i) = math.floor(value(a, ta, i) / scale + 0.5).toInt * scale
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def cosine(a: ArrayData, ta: DataType, b: ArrayData, tb: DataType): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = value(a, ta, i)
      val y = value(b, tb, i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    // a zero-norm side (empty doc, all-zero vector) defines cosine as 0,
    // not NaN: NaN orders differently across engines (Spark sorts it last
    // in a struct min, DuckDB's ORDER BY DESC sorts it first), so a NaN
    // here would silently diverge ranked top-k results from the oracle
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else d / den
  }
}

sealed abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** codegen helper: `(leftCode, rightCode) => java call` */
  protected def call: String

  override protected def nullSafeEval(a: Any, b: Any): Any = compute(
    a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected def compute(a: ArrayData, b: ArrayData): Double

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val (lt, rt) = (elementType(left), elementType(right))
    val ltRef = ctx.addReferenceObj("ltype", lt)
    val rtRef = ctx.addReferenceObj("rtype", rt)
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath$$.MODULE$$.$call($a, $ltRef, $b, $rtRef)")
  }
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def call: String = "dot"
  override protected def compute(a: ArrayData, b: ArrayData): Double =
    VectorMath.dot(a, elementType(left), b, elementType(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def call: String = "cosine"
  override protected def compute(a: ArrayData, b: ArrayData): Double =
    VectorMath.cosine(a, elementType(left), b, elementType(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

case class LshBucket(child: Expression, nbits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "lsh_bucket"
  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  override protected def nullSafeEval(input: Any): Any =
    VectorMath.lshBucket(input.asInstanceOf[ArrayData], elemType, nbits)
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val tRef = ctx.addReferenceObj("etype", elemType)
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorMath$$.MODULE$$.lshBucket($c, $tRef, $nbits)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

case class SignSketch(child: Expression, nbits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sign_sketch"
  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  override protected def nullSafeEval(input: Any): Any =
    VectorMath.signSketch(input.asInstanceOf[ArrayData], elemType, nbits)
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val tRef = ctx.addReferenceObj("etype", elemType)
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorMath$$.MODULE$$.signSketch($c, $tRef, $nbits)")
  }
  override protected def withNewChildInternal(newChild: Expression): SignSketch =
    copy(child = newChild)
}

case class Int8Roundtrip(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "int8_roundtrip"
  override protected def nullSafeEval(input: Any): Any =
    VectorMath.int8Roundtrip(input.asInstanceOf[ArrayData], elemType)
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val tRef = ctx.addReferenceObj("etype", elemType)
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorMath$$.MODULE$$.int8Roundtrip($c, $tRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Int8Roundtrip =
    copy(child = newChild)
}

case class RandomProject(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // plan-time guard: k = 0 would yield empty projections whose cosine is
  // NaN (and NaN sorts ABOVE every real value in ranking), k < 0 a
  // NegativeArraySizeException from inside generated code mid-query
  require(k >= 1, s"random_project k must be at least 1, got $k")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "random_project"
  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  override protected def nullSafeEval(input: Any): Any =
    VectorMath.randomProject(input.asInstanceOf[ArrayData], elemType, k)
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val tRef = ctx.addReferenceObj("etype", elemType)
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorMath$$.MODULE$$.randomProject($c, $tRef, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
}

object vectors {
  def random_project(vec: Column, k: Int): Column =
    GraftExpressionBridge.column(RandomProject(GraftExpressionBridge.expression(vec), k))

  def lsh_bucket(vec: Column, nbits: Int = 8): Column =
    GraftExpressionBridge.column(LshBucket(GraftExpressionBridge.expression(vec), nbits))

  def sign_sketch(vec: Column, nbits: Int = 48): Column =
    GraftExpressionBridge.column(SignSketch(GraftExpressionBridge.expression(vec), nbits))

  def int8_roundtrip(vec: Column): Column =
    GraftExpressionBridge.column(Int8Roundtrip(GraftExpressionBridge.expression(vec)))

  def dot_product(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      DotProduct(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def cosine_similarity(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      CosineSimilarity(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
