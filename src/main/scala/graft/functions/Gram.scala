package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * One-pass Gram-matrix / mean-vector sufficient statistics for an
 * embedding column — the mergeable state behind covariance, PCA whitening
 * and IVF/OPQ training at corpus scale: a single scan reduces N vectors to
 * the fixed `1 + d + d*d` summary `[n | Σx_i (micro) | Σx_i*x_j (micro)]`,
 * and summaries ADD element-wise, so per-day (or per-partition, or
 * streamed) grams re-roll to any coarser horizon bit-identically to a
 * gram built from the union. At 100 TB of embeddings nothing but the
 * d²-sized grids ever crosses the wire.
 *
 * Exactness contract (the oracle law): every per-row contribution is
 * truncated to integer micro units FIRST —
 * `floor(x_i * x_j * 1e6)` and `floor(x_i * 1e6)` evaluated in IEEE
 * doubles, which any engine reproduces bit-for-bit — and the truncated
 * longs then accumulate EXACTLY, so the aggregate is a pure function of
 * the vector multiset, independent of row or partition order (a raw
 * double sum would drift with Spark's nondeterministic reduce order).
 * Covariance in micro² units follows as
 * `cov_num_ij = n * gram_ij * 1e6 - s_i * s_j` over denominator
 * `n² * 1e12` (exact integers; see `Similarity.covarianceFromGram`).
 * Long capacity: unit-norm-ish vectors contribute `<= 1e6` micro per cell
 * per row, so cells stay exact past 1e12 rows — beyond any single gram's
 * horizon (re-roll daily grams with [[GramMerge]] rather than building a
 * quarter in one pass).
 */
object GramOps {

  def bufLen(dim: Int): Int = 1 + dim + dim * dim

  def buffer(dim: Int): Array[Long] = new Array[Long](bufLen(dim))

  private def value(a: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case dt: DecimalType => a.getDecimal(i, dt.precision, dt.scale).toDouble
    case other => throw new IllegalArgumentException(s"non-numeric vector element type: $other")
  }

  /** Fold one vector into the summary (micro-truncate, then exact add). */
  def addVec(buf: Array[Long], arr: ArrayData, t: DataType, dim: Int): Unit = {
    require(arr.numElements() == dim,
      s"vector dimension mismatch: got ${arr.numElements()}, gram built for $dim")
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = value(arr, t, i); i += 1 }
    buf(0) += 1L
    i = 0
    while (i < dim) {
      buf(1 + i) += math.floor(v(i) * 1e6).toLong
      var j = 0
      val row = 1 + dim + i * dim
      while (j < dim) {
        buf(row + j) += math.floor(v(i) * v(j) * 1e6).toLong
        j += 1
      }
      i += 1
    }
  }

  def mergeInto(into: Array[Long], from: Array[Long]): Unit = {
    require(into.length == from.length,
      s"gram shape mismatch: ${into.length} vs ${from.length} cells")
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }
}

/** Gram build aggregate over a numeric-array column (see [[GramOps]]);
  * null vectors are skipped, a wrong-length vector fails loudly (a silent
  * skip would bias the statistics); output is the packed
  * `[n | sums_micro | gram_micro]` summary as `array<long>`. */
case class GramMatrix(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(dim >= 1 && dim <= 4096, s"dim must be in [1,4096], got $dim")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_matrix"

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(s"gram_matrix needs an array column, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = GramOps.buffer(dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) GramOps.addVec(buf, v.asInstanceOf[ArrayData], elemType, dim)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    GramOps.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = CountMinOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CountMinOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}

/** Merge aggregate over already-built [[GramMatrix]] summaries
  * (`array<long>` rows): element-wise addition — the EXACT re-rollup path
  * (daily to weekly to all-time), bit-identical to a gram built from the
  * union of the rows. */
case class GramMerge(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(dim >= 1 && dim <= 4096, s"dim must be in [1,4096], got $dim")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_merge"

  override def createAggregationBuffer(): Array[Long] = GramOps.buffer(dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == buf.length,
        s"gram shape mismatch: ${arr.numElements()} vs ${buf.length} cells")
      var i = 0
      while (i < buf.length) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    GramOps.mergeInto(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = CountMinOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CountMinOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMerge =
    copy(child = newChildren.head)
}
