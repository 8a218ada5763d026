package graft.functions

import scala.collection.mutable

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property tests over the bottom-k-distinct buffer law (pure JVM, no
 * session): whatever the partitioning and merge-tree shape, the sketch
 * must equal `distinct.sorted.take(k)` of the whole input — the identity
 * that makes [[graft.ops.Sketches.kmvSetSketch]] partials, shuffles and
 * re-rollups exact.
 */
object BottomKProps extends Properties("BottomKDistinct") {

  private val genVals: Gen[List[String]] =
    Gen.listOf(Gen.choose(0, 400).map(i => f"v$i%04d")) // heavy duplicate mass
  private val genK: Gen[Int] = Gen.choose(1, 64)

  private def build(vals: Seq[String], k: Int): BottomKDistinctOps.Buffer = {
    val buf = new mutable.TreeSet[String]
    vals.foreach(BottomKDistinctOps.add(buf, _, k))
    buf
  }

  property("single buffer equals distinct.sorted.take(k)") =
    forAll(genVals, genK) { (vals, k) =>
      build(vals, k).toSeq == vals.distinct.sorted.take(k)
    }

  property("any partitioning + merge order equals the whole-data buffer") =
    forAll(genVals, genK, Gen.choose(1, 7)) { (vals, k, parts) =>
      val whole = build(vals, k)
      // round-robin split, then merge right-to-left (a different tree
      // shape than left-to-right accumulation)
      val buffers = vals.zipWithIndex.groupBy(_._2 % parts).values
        .map(slice => build(slice.map(_._1), k)).toList
      val merged = buffers.reverse.foldLeft(new mutable.TreeSet[String]: BottomKDistinctOps.Buffer) {
        (acc, b) => b.foreach(BottomKDistinctOps.add(acc, _, k)); acc
      }
      merged.toSeq == whole.toSeq
    }

  property("serialize/deserialize roundtrips the buffer exactly") =
    forAll(genVals, genK) { (vals, k) =>
      val buf = build(vals, k)
      BottomKDistinctOps.deserialize(BottomKDistinctOps.serialize(buf)).toSeq == buf.toSeq
    }
}
