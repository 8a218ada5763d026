package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot comparison for incremental corpora: the everyday question of an
 * ingestion pipeline — between yesterday's crawl and today's, which
 * documents were added, which disappeared, and which changed in place —
 * answered relationally, so downstream stages (re-embed only `changed`,
 * tombstone `removed`, dedup-check only `added`) consume a plain keyed
 * DataFrame instead of re-reading both corpora.
 */
object Snapshots {

  /**
   * Per-key diff of two snapshots: `added` (key only in `cur`), `removed`
   * (key only in `old`), `changed` (both sides, fingerprint differs) or
   * `unchanged`. Returns `(key, status)` rows.
   *
   * One full-outer equi-join on the key; only fingerprints (32-byte md5,
   * not payloads) travel through the shuffle, so diffing a 100 TB corpus
   * shuffles ~40 bytes a row. Co-locate both stores by bucketing on the
   * key ([[graft.io.Bucketing]]) and even that shuffle disappears.
   */
  def diff(old: DataFrame, cur: DataFrame, keyCol: String, fpCol: String): DataFrame =
    // explicit presence flags, not fingerprint nullness: a key present on one
    // side with a NULL fingerprint is a real row (changed/unchanged), not an
    // absent one
    old.select(col(keyCol), col(fpCol).as("__old_fp"), lit(true).as("__in_old"))
      .join(cur.select(col(keyCol), col(fpCol).as("__new_fp"), lit(true).as("__in_new")),
        Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(not(col("__old_fp") <=> col("__new_fp")), lit("changed"))
          .otherwise(lit("unchanged")))
      .select(col(keyCol), col("status"))

  /** The diff rolled up to per-status counts (the monitoring number). */
  def diffCounts(old: DataFrame, cur: DataFrame, keyCol: String, fpCol: String): DataFrame =
    diff(old, cur, keyCol, fpCol).groupBy(col("status")).agg(count(lit(1)).as("n"))
}
