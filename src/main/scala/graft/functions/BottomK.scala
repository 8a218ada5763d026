package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bounded bottom-k DISTINCT aggregate over a string column: the `k`
 * smallest DISTINCT values, as an ascending array — the one-pass engine
 * of the KMV SET sketch ([[graft.ops.Sketches.kmvSetSketch]]). Where
 * `collect_bottom_k` keeps duplicates (right for the quantile sketch,
 * whose md5(id) ranks are distinct by construction), a SET sketch must
 * dedup: the same key seen a billion times contributes ONE hash.
 *
 * Doing the dedup INSIDE the aggregate buffer replaces the
 * distinct-collapse + bottom-k two-step with ONE ObjectHashAggregate
 * pass whose partials are O(k) sorted sets — only k-entry buffers ever
 * cross an exchange, however many rows or duplicates feed in. It is also
 * what makes the sketch possible in a streaming aggregation, where a
 * per-window pre-`distinct` is not expressible ([[
 * graft.streaming.EventStreams]]'s KMV cells rollup).
 *
 * Buffer law: insert if absent and (room left, or smaller than the
 * current k-th); evict the largest past k. Bottom-k-distinct of a union
 * lives inside the union of bottom-k-distincts, so partials, shuffles
 * and re-rollups all merge EXACTLY — same mergeability as the quantile
 * sketch, plus the distinct law.
 */
private[functions] object BottomKDistinctOps {

  type Buffer = mutable.TreeSet[String]

  def add(buf: Buffer, v: String, k: Int): Unit =
    if (buf.size < k) { buf += v }
    else if (buf.last > v && buf.add(v)) buf.remove(buf.last)

  def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { v =>
      val b = v.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.TreeSet[String]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += new String(b, "UTF-8")
      i += 1
    }
    buf
  }
}

/** Bottom-k distinct aggregate over a string column (see
  * [[BottomKDistinctOps]]); nulls are skipped. */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKDistinctOps.Buffer] {
  require(k >= 1, s"k must be at least 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bottom_k_distinct"

  override def createAggregationBuffer(): BottomKDistinctOps.Buffer =
    new mutable.TreeSet[String]

  override def update(
      buf: BottomKDistinctOps.Buffer, input: InternalRow): BottomKDistinctOps.Buffer = {
    val v = child.eval(input)
    if (v != null) BottomKDistinctOps.add(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(
      buf: BottomKDistinctOps.Buffer,
      other: BottomKDistinctOps.Buffer): BottomKDistinctOps.Buffer = {
    other.foreach(BottomKDistinctOps.add(buf, _, k))
    buf
  }

  // TreeSet iterates ascending: the output IS the sorted sketch
  override def eval(buf: BottomKDistinctOps.Buffer): Any =
    new GenericArrayData(buf.toArray.map(UTF8String.fromString(_): Any))
  override def serialize(buf: BottomKDistinctOps.Buffer): Array[Byte] =
    BottomKDistinctOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BottomKDistinctOps.Buffer =
    BottomKDistinctOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(child = newChildren.head)
}
