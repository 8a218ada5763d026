package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interval / sweep-line analytics: "how many sessions were live at once",
 * "peak concurrent crawls", capacity planning over validity windows
 * ([[Snapshots.scd2FromChangeLog]] output is exactly an interval table).
 *
 * The primitive is an EXACT GLOBAL running sum with no one-reducer window
 * — the same range-repartition + per-partition-offset recipe as the
 * global-order operators (`TextAnalysis.withGlobalRank`): Spark's
 * `sum(...).over(Window.orderBy(...))` with no partition key collapses
 * the corpus onto one reducer; here only the partition-count offset frame
 * ever meets a single-partition window.
 */
object Intervals {

  /**
   * Exact global running total of `valueCol` in the total order given by
   * `order` (pass a unique tiebreaker): each row gets `totalCol` = sum of
   * `valueCol` over all rows at-or-before it. Range-repartition by the
   * order, eagerly localCheckpoint (frozen partition boundaries for every
   * derived branch), per-partition prefix sums, per-partition totals
   * broadcast back as offsets.
   */
  def withRunningTotal(
      df: DataFrame,
      totalCol: String,
      valueCol: String,
      order: Column*): DataFrame = {
    require(order.nonEmpty, "withRunningTotal needs at least one order column")
    val ranged = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(totalCol,
        (col("__offset") + sum(col(valueCol)).over(
          Window.partitionBy(col("__pid")).orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))).cast("long"))
      .drop("__pid", "__offset")
  }

  /**
   * Sweep-line concurrency profile of `[startCol, endCol)` intervals: one
   * row per interval BOUNDARY with `delta` (+1 open, -1 close) and
   * `active`, the number of intervals live immediately after it. Ends are
   * EXCLUSIVE: at a shared timestamp the close sorts before the open
   * (`delta` ascending inside the order), so back-to-back intervals never
   * double-count. `idCol` breaks remaining ties — the profile is a total
   * order, deterministic under any partitioning.
   *
   * `max(active)` is peak concurrency; joining the profile back to a
   * timeline gives load-over-time. Cost: one range exchange + local
   * sorts, whatever the interval count.
   */
  def concurrency(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      idCol: String): DataFrame = {
    val opens = intervals.select(col(startCol).as("ts"), lit(1L).as("delta"),
      col(idCol).as("id"))
    val closes = intervals.select(col(endCol).as("ts"), lit(-1L).as("delta"),
      col(idCol).as("id"))
    withRunningTotal(opens.unionByName(closes), "active", "delta",
      col("ts"), col("delta"), col("id"))
  }
}
