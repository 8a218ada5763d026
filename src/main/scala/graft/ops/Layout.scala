package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data LAYOUT keys: Z-order (Morton) interleaving over
 * exact equi-depth ranks, the public recipe behind "OPTIMIZE ZORDER BY"
 * data clustering — sort a table by `zOrderKey(a, b)` before writing and
 * rows close in BOTH dimensions land in the same files, so min/max file
 * statistics prune scans for predicates on EITHER column. At 100 TB this
 * is the difference between a full scan and reading a few percent of
 * files for a 2-D selective query; the key computation itself is one
 * rank pass per dimension + per-row bit math.
 *
 * Ranks, not raw values: each dimension is first reduced to its exact
 * global rank ([[TextAnalysis.withGlobalRank]] — the range-partition +
 * offset recipe, no one-reducer window), then bucketed equi-DEPTH into
 * `2^bits` cells. Rank-based cells give every cell the same row count
 * whatever the value distribution — a skewed column cannot collapse the
 * curve the way raw-value bucketing would — and make the key a pure
 * integer function of the data, replayable in any engine.
 */
object Layout {

  /**
   * Add `keyCol`: the Z-order key interleaving the equi-depth bucket
   * bits of each column in `cols` (each ranked by `(column, tie*)` —
   * pass a unique tiebreaker for determinism). Bucket of a row in
   * dimension `j` is `(rank_j - 1) * 2^bits DIV n` (exact equi-depth in
   * `[0, 2^bits)`); the key places bucket bit `i` of dimension `j` at
   * position `i * m + (m - 1 - j)` (bit levels interleave from the LSB
   * up, earlier columns more significant within a level — the standard
   * Morton layout). Requires `bits * m <= 62` so the key fits a long.
   *
   * Plan: `m` range exchanges (one rank pass per dimension), a
   * broadcast 1-row count, then pure per-row bit arithmetic — nothing
   * downstream of the ranks shuffles.
   */
  def zOrderKey(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      keyCol: String = "z_key",
      tie: Seq[Column] = Seq.empty): DataFrame = {
    val m = cols.size
    require(m >= 1, "zOrderKey needs at least one column")
    require(bits >= 1 && bits * m <= 62,
      s"bits * cols must be in [1, 62] to fit a long key, got $bits * $m")
    val ranked = cols.zipWithIndex.foldLeft(df) { case (acc, (c, j)) =>
      TextAnalysis.withGlobalRank(acc, s"__r$j", (col(c) +: tie): _*)
    }
    val n = ranked.select(count(lit(1)).as("__n"))
    val withBuckets = cols.indices.foldLeft(ranked.crossJoin(broadcast(n))) {
      (acc, j) =>
        acc.withColumn(s"__b$j",
          expr(s"(__r$j - 1L) * ${1L << bits}L DIV __n"))
    }
    val key = (0 until bits).flatMap { i =>
      cols.indices.map { j =>
        shiftleft(shiftright(col(s"__b$j"), i).bitwiseAND(lit(1L)),
          i * m + (m - 1 - j))
      }
    }.reduce(_ + _)
    withBuckets
      .withColumn(keyCol, key.cast("long"))
      .drop((cols.indices.flatMap(j => Seq(s"__r$j", s"__b$j")) :+ "__n"): _*)
  }

  /**
   * Range-repartition by the Z-order key (plus `tie*` so equal keys
   * split deterministically): the write-side half of the recipe — each
   * output partition covers a compact segment of the space-filling
   * curve, so per-file min/max statistics are tight in EVERY interleaved
   * dimension. Follow with a plain parquet write.
   */
  def repartitionByZOrder(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      numPartitions: Int,
      tie: Seq[Column] = Seq.empty): DataFrame = {
    val keyed = zOrderKey(df, cols, bits, "z_key", tie)
    keyed.repartitionByRange(numPartitions, (col("z_key") +: tie): _*)
  }
}
