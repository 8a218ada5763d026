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
}
