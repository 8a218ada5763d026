package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed-table helpers for co-located joins: two tables bucketed by the
 * same keys into the same bucket count join WITHOUT a shuffle — at 100 TB
 * this turns every recurring fact-to-fact join on the bucket key into a
 * local merge per bucket, paying the shuffle once at write time instead of
 * on every query.
 *
 * Uses the session catalog (`saveAsTable`); works with the default
 * in-memory catalog and any Hive metastore.
 */
object Bucketing {

  /** Persist as a bucketed + sorted parquet table in the session catalog. */
  def saveBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      keys: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /**
   * Join two tables bucketed on `keys` with matching bucket counts. The
   * physical plan contains no Exchange on either side (verified in
   * BucketingSpec) — the join is bucket-local.
   */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, keys: Seq[String]): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), keys)

  /**
   * Range layout: redistribute into `numFiles` partitions by contiguous
   * ranges of `cols` and sort rows inside each — so each written file
   * covers a DISJOINT slice of the key space and its parquet footer
   * min/max lets any engine skip whole files on a range or point
   * predicate. The single-dimension cousin of Z-ordering, and the layout
   * pass a warehouse runs after ingest: at 100 TB the difference between
   * "scan every file for one day's keys" and "open three".
   *
   * One range-exchange (sampled boundaries) + local sort; wrap the result
   * in a plain write — e.g. `rangeLayout(df, Seq("ts")).write.parquet(p)`
   * — or hand it to [[WarehouseTable.save]].
   */
  def rangeLayout(df: DataFrame, cols: Seq[String], numFiles: Int = 0): DataFrame = {
    require(cols.nonEmpty, "rangeLayout needs at least one column")
    val sortCols = cols.map(df.col)
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, sortCols: _*)
      else df.repartitionByRange(sortCols: _*)
    ranged.sortWithinPartitions(sortCols: _*)
  }
}
