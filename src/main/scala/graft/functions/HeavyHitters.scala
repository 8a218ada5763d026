package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable heavy-hitters (top-k frequency) summaries — Misra-Gries, the
 * third leg of the sketch family beside HLL distinct counts and KMV
 * quantiles ([[graft.ops.Sketches]]): a bounded map of at most `capacity`
 * counters that answers "which keys dominate and roughly how often" over
 * any amount of data, and MERGES — daily summaries re-roll to weekly /
 * all-time without re-reading events, exactly like the HLL union path.
 *
 * Guarantees (Misra-Gries 1982; merge per Agarwal et al., "Mergeable
 * Summaries", PODS 2012): with total processed weight `n`, every reported
 * count satisfies `est <= true <= est + n/(capacity+1)`, and every key
 * with true count `> n/(capacity+1)` is PRESENT in the summary — the
 * deficit only ever comes from the shared decrements. With
 * `capacity >= distinct keys` nothing ever decrements and counts are
 * EXACT (the regime the oracle-checked query runs in; the error bound is
 * spec-tested in the approximate regime).
 *
 * Both aggregates are `TypedImperativeAggregate`s (ObjectHashAggregate
 * partials, map-side combining): per-group state is the O(capacity)
 * counter map, serialized compactly between phases; the output is the
 * summary as an array of `(key, cnt)` structs sorted by `(cnt DESC, key)`
 * — a deterministic, engine-comparable spelling (a map column would hash
 * by insertion order).
 */
private[functions] object MisraGriesOps {

  type Buffer = mutable.HashMap[String, Long]

  /** Classic MG single-item update: present -> +1; room -> insert; full ->
    * every counter pays 1 (the incoming item cancels against them) and
    * zeros drop. */
  def addOne(buf: Buffer, key: String, capacity: Int): Unit =
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < capacity => buf.update(key, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { k =>
          val c = buf(k) - 1
          if (c <= 0) dead += k else buf.update(k, c)
        }
        dead.foreach(buf.remove)
    }

  /** Mergeable-summaries combine: add counts, then if over capacity
    * subtract the (capacity+1)-th largest count from everyone and drop the
    * non-positive — the step that keeps the n/(capacity+1) bound additive
    * across any merge tree. */
  def mergeInto(into: Buffer, from: IterableOnce[(String, Long)], capacity: Int): Unit = {
    from.iterator.foreach { case (k, v) => into.update(k, into.getOrElse(k, 0L) + v) }
    if (into.size > capacity) {
      val counts = into.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      into.keysIterator.foreach { k =>
        val c = into(k) - cut
        if (c <= 0) dead += k else into.update(k, c)
      }
      dead.foreach(into.remove)
    }
  }

  val entryType: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  def evalSorted(buf: Buffer): ArrayData = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c): Any
    })
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.HashMap[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }
}

/** Heavy-hitters aggregate over a string key column (see [[MisraGriesOps]]). */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesOps.Buffer] {
  require(capacity >= 1, s"capacity must be at least 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MisraGriesOps.entryType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MisraGriesOps.Buffer =
    new mutable.HashMap[String, Long]

  override def update(buf: MisraGriesOps.Buffer, input: InternalRow): MisraGriesOps.Buffer = {
    val v = child.eval(input)
    if (v != null) MisraGriesOps.addOne(buf, v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(buf: MisraGriesOps.Buffer, other: MisraGriesOps.Buffer): MisraGriesOps.Buffer = {
    MisraGriesOps.mergeInto(buf, other, capacity)
    buf
  }

  override def eval(buf: MisraGriesOps.Buffer): Any = MisraGriesOps.evalSorted(buf)
  override def serialize(buf: MisraGriesOps.Buffer): Array[Byte] = MisraGriesOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MisraGriesOps.Buffer =
    MisraGriesOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

/**
 * Merge aggregate over already-built summaries (`array<struct<key,cnt>>`
 * rows from [[MisraGries]]): the re-rollup path — weekly from daily,
 * all-time from weekly — with the same mergeable-summaries truncation and
 * the same error-bound accounting (see [[MisraGriesOps]]).
 */
case class MisraGriesMerge(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesOps.Buffer] {
  require(capacity >= 1, s"capacity must be at least 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MisraGriesOps.entryType, containsNull = false)
  override def prettyName: String = "misra_gries_merge"

  override def createAggregationBuffer(): MisraGriesOps.Buffer =
    new mutable.HashMap[String, Long]

  override def update(buf: MisraGriesOps.Buffer, input: InternalRow): MisraGriesOps.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val entries = (0 until arr.numElements()).map { i =>
        val row = arr.getStruct(i, 2)
        row.getUTF8String(0).toString -> row.getLong(1)
      }
      MisraGriesOps.mergeInto(buf, entries, capacity)
    }
    buf
  }

  override def merge(buf: MisraGriesOps.Buffer, other: MisraGriesOps.Buffer): MisraGriesOps.Buffer = {
    MisraGriesOps.mergeInto(buf, other, capacity)
    buf
  }

  override def eval(buf: MisraGriesOps.Buffer): Any = MisraGriesOps.evalSorted(buf)
  override def serialize(buf: MisraGriesOps.Buffer): Array[Byte] = MisraGriesOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MisraGriesOps.Buffer =
    MisraGriesOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesMerge =
    copy(child = newChildren.head)
}
