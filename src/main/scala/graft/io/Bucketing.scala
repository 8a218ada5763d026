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

  /**
   * Bit-interleaved (Morton / Z-curve) key of two non-negative values:
   * bit `i` of `a` lands at position `2i`, bit `i` of `b` at `2i+1`, so
   * points close in BOTH dimensions are close on the key. Pure shift/mask
   * arithmetic (the classic bit-spread), codegen-friendly, no UDF.
   * Inputs must fit in an unsigned 32-bit range — rank- or scale-normalize
   * wider domains upstream (z-ordering is about locality, not identity, so
   * any order-preserving compression works). Out-of-range inputs FAIL the
   * query (`raise_error`) rather than silently wrapping: a negative value
   * would alias to the top of the unsigned range and a >32-bit value to
   * its low bits, destroying locality — and footer prunability — with no
   * symptom. Nulls pass through as null keys (range-partitioned first).
   */
  def mortonKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{concat, lit, raise_error, shiftleft, when}
    def checked(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c < 0L || c > 0xFFFFFFFFL,
        raise_error(concat(lit("mortonKey: input out of [0, 2^32): "), c.cast("string"))))
        .otherwise(c)
    def spread(in: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val c = checked(in)
      val s0 = c.bitwiseAND(lit(0xFFFFFFFFL))
      val s1 = s0.bitwiseOR(shiftleft(s0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x3333333333333333L))
      s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /**
   * Z-order layout: redistribute into `numFiles` contiguous ranges of the
   * [[mortonKey]] and sort inside each, so every written file covers a
   * COMPACT 2-D block of `(colA, colB)` space — parquet footer min/max
   * then prunes files for predicates on EITHER column, where
   * [[rangeLayout]] on one column leaves the other unprunable (every file
   * spans its full domain). A point slice on one dimension touches
   * ~sqrt(numFiles) files instead of all of them — at 100 TB this is the
   * layout pass for tables queried by two independent keys (user x day,
   * domain x fetch-time).
   *
   * Same cost shape as [[rangeLayout]]: one sampled range exchange + local
   * sort, paid once at write time.
   */
  def zOrderLayout(df: DataFrame, colA: String, colB: String, numFiles: Int): DataFrame = {
    require(numFiles > 0, "zOrderLayout needs an explicit file count")
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", mortonKey(col(colA).cast("long"), col(colB).cast("long")))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
