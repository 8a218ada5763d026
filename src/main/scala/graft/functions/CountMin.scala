package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005) — the POINT-FREQUENCY
 * member of the mergeable-sketch family ([[graft.ops.Sketches]]): HLL
 * answers "how many distinct", KMV "what quantile", Misra-Gries "which keys
 * dominate"; CMS answers "how often did THIS key occur" for any key, in a
 * fixed `depth x width` grid of counters. Unlike Misra-Gries it never
 * forgets a key — every estimate obeys
 * `true <= est <= true + 2n/width` with probability `1 - (1/2)^depth` —
 * and unlike Misra-Gries its merge is EXACT (element-wise addition), so
 * daily sketches re-rolled to all-time equal the sketch built directly
 * from the union, bit for bit.
 *
 * Hash rows use Scala's pure MurmurHash3 over UTF-8 bytes, seeded by the
 * row index — deterministic across JVMs and partitionings, so sketches are
 * a pure function of the multiset of keys.
 *
 * State is the dense `depth * width` long grid (width 1024 x depth 4 =
 * 32 KB); partials combine map-side in an ObjectHashAggregate, so one
 * shuffle moves only per-group grids, never raw keys. Size the width to
 * the tolerable overestimate (`2n/width`), not to the key cardinality —
 * that independence from cardinality is the whole point at 100 TB.
 */
object CountMinOps {

  def grid(width: Int, depth: Int): Array[Long] = new Array[Long](width * depth)

  /** Row-`d` cell index of `key` (non-negative, < width). */
  def cell(keyBytes: Array[Byte], d: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(keyBytes, d)
    java.lang.Math.floorMod(h, width)
  }

  def addOne(buf: Array[Long], key: UTF8String, width: Int, depth: Int): Unit = {
    val bytes = key.getBytes
    var d = 0
    while (d < depth) {
      buf(d * width + cell(bytes, d, width)) += 1L
      d += 1
    }
  }

  def mergeInto(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length,
      s"sketch shape mismatch: ${into.length} vs ${from.length} cells")
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  /** Point estimate: min over rows of the key's cell. */
  def estimate(sketch: ArrayData, key: UTF8String, width: Int, depth: Int): Long = {
    val bytes = key.getBytes
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = sketch.getLong(d * width + cell(bytes, d, width))
      if (v < min) min = v
      d += 1
    }
    min
  }

  def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }
}

/** CMS build aggregate over a STRING key column (see [[CountMinOps]]);
  * null keys are ignored; output is the `depth * width` grid row-major as
  * `array<long>`. */
case class CountMinSketch(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(width >= 2, s"width must be at least 2, got $width")
  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = CountMinOps.grid(width, depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMinOps.addOne(buf, v.asInstanceOf[UTF8String], width, depth)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    CountMinOps.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = CountMinOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CountMinOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(child = newChildren.head)
}

/** Merge aggregate over already-built CMS grids (`array<long>` rows from
  * [[CountMinSketch]]): element-wise addition — the EXACT re-rollup path
  * (daily to weekly to all-time), no truncation step, no error growth
  * beyond the constituent sketches'. */
case class CountMinMerge(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(width >= 2, s"width must be at least 2, got $width")
  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min_merge"

  override def createAggregationBuffer(): Array[Long] = CountMinOps.grid(width, depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == buf.length,
        s"sketch shape mismatch: ${arr.numElements()} vs ${buf.length} cells")
      var i = 0
      while (i < buf.length) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    CountMinOps.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = CountMinOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CountMinOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinMerge =
    copy(child = newChildren.head)
}

/** Point-frequency estimate of `key` from a [[CountMinSketch]] grid
  * (codegen'd static call — though it only ever runs over summary rows,
  * one per group, not the corpus). Null sketch or key null-propagates. */
case class CmsEstimate(left: Expression, right: Expression, width: Int, depth: Int)
    extends BinaryExpression {
  require(width >= 2 && depth >= 1, s"bad shape width=$width depth=$depth")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected (array<bigint>, string), got $other")
    }
  }

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    CountMinOps.estimate(
      sketch.asInstanceOf[ArrayData], key.asInstanceOf[UTF8String], width, depth)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.CountMinOps$$.MODULE$$.estimate($s, $k, $width, $depth)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
