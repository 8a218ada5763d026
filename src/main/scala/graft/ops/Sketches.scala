package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable distinct-count sketches (Apache DataSketches HLL, via Spark's
 * built-in `hll_sketch_agg` family): pre-aggregate each day/partition into a
 * fixed-size sketch once, then answer ANY coarser rollup — weekly, monthly,
 * all-time, sliced by other dimensions — by unioning sketches, never
 * re-reading events. `approx_count_distinct` can't do this (its result is a
 * number, not a mergeable state); exact distinct can't either without
 * re-shuffling the raw keys every time. At 100 TB/day this is the only
 * affordable shape for "distinct users this quarter".
 *
 * Sketches are a few KB regardless of cardinality (lgK=12 -> ~2.5 KB, ~1.6%
 * relative error) and the batch twin of the streaming HLL rollup
 * ([[graft.streaming.EventStreams]] S9).
 */
object Sketches {

  /** Aggregate `c` into an HLL sketch (binary, mergeable). */
  def hllSketch(c: Column, lgK: Int = 12): Column = hll_sketch_agg(c, lgK)

  /** Distinct estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Merge a column of sketches into one (aggregate). */
  def mergeSketches(sketch: Column): Column = hll_union_agg(sketch)

  /**
   * Per-bucket distinct rollup carrying BOTH the estimate (for direct
   * consumption) and the sketch (for later re-aggregation): one row per
   * `bucketCols` group with `distinct_est` and `key_sketch`.
   */
  def distinctRollup(
      df: DataFrame,
      bucketCols: Seq[String],
      keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(bucketCols.map(col): _*)
      .agg(hllSketch(col(keyCol), lgK).as("key_sketch"))
      .withColumn("distinct_est", estimate(col("key_sketch")).cast("long"))

  /**
   * Re-aggregate a [[distinctRollup]] to coarser buckets by unioning the
   * stored sketches — no return to the raw data. Same output shape, so
   * rollups chain (daily -> weekly -> monthly).
   */
  def reRollup(rollup: DataFrame, bucketCols: Seq[String]): DataFrame =
    rollup.groupBy(bucketCols.map(col): _*)
      .agg(mergeSketches(col("key_sketch")).as("key_sketch"))
      .withColumn("distinct_est", estimate(col("key_sketch")).cast("long"))
}
