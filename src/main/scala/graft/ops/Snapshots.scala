package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  // ---- slowly-changing dimensions (SCD Type 2) -------------------------

  /**
   * SCD Type-2 history from a change log: collapse a per-key stream of
   * attribute observations into versioned validity intervals — one row per
   * (key, consecutive run of identical attributes) with `valid_from`
   * (run start), `valid_to` (next run's start, null while current),
   * `version` (1-based per key) and `is_current`. The classic
   * gaps-and-islands compaction every warehouse dimension build needs.
   *
   * Total order within a key is `(tsCol, tieCols...)` — pass a unique
   * tiebreaker (an event id) so reruns are deterministic when timestamps
   * collide. Attribute equality is null-safe per column.
   *
   * Scale shape: ONE shuffle on the key. The island filter preserves both
   * the hash partitioning and the sort, so the second window (lead/
   * row_number over the surviving run starts) reuses the first exchange
   * and sort instead of re-shuffling — the whole history build costs the
   * same as a single window function at any scale.
   */
  def scd2FromChangeLog(
      changes: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    val starts = changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      // island start: first observation of the key, or any attribute changed
      // (null-safe: <=> treats null = null as equal, so a null-valued
      // attribute does not open a new version every row)
      .where(col("__prev").isNull || not(col("__prev") <=> attrs))
      .drop("__prev")
    starts
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(keyCol) +: attrCols.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("version"), col("is_current")): _*)
  }

  /**
   * Apply one day's full snapshot to an existing SCD Type-2 dimension:
   * rows whose attributes changed are CLOSED (`valid_to` = `asOf`) and a
   * new current version opened; unseen keys are inserted as version 1;
   * keys missing from the snapshot are closed as deleted when
   * `closeMissing` (otherwise carried forward). Historical (already
   * closed) rows pass through untouched. The incremental twin of
   * [[scd2FromChangeLog]] — yesterday's dimension plus today's snapshot,
   * no return to the full change log.
   *
   * `dim` must carry `keyCol`, `attrCols`, `valid_from`, `valid_to`,
   * `version`, `is_current` (the [[scd2FromChangeLog]] shape, with
   * `valid_from`/`valid_to` comparable to `asOf`).
   *
   * Scale shape: one full-outer equi-join of the CURRENT slice against
   * the snapshot on the key (bucket both stores on the key and it's
   * shuffle-free); history rows never enter the join.
   */
  def scd2Apply(
      dim: DataFrame,
      snapshot: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      asOf: Column,
      closeMissing: Boolean = false): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val history = dim.where(not(col("is_current")))
    val current = dim.where(col("is_current"))
    val dimAttrs = struct(attrCols.map(c => col(s"__d_$c")): _*)
    val snapAttrs = struct(attrCols.map(c => col(s"__s_$c")): _*)
    val joined = current
      .select((col(keyCol) +: attrCols.map(c => col(c).as(s"__d_$c"))) ++
        Seq(col("valid_from"), col("valid_to"), col("version"),
          lit(true).as("__in_dim")): _*)
      .join(
        snapshot.select(col(keyCol) +:
          attrCols.map(c => col(c).as(s"__s_$c")) :+ lit(true).as("__in_snap"): _*),
        Seq(keyCol), "full_outer")
    val changed = col("__in_dim").isNotNull && col("__in_snap").isNotNull &&
      not(dimAttrs <=> snapAttrs)
    val outCols = (col(keyCol) +: attrCols.map(col)) ++
      Seq(col("valid_from"), col("valid_to"), col("version"), col("is_current"))

    // surviving current rows: unchanged, or changed/missing ones closed out
    val keptRows = joined.where(col("__in_dim").isNotNull)
      .withColumn("__close",
        changed || (if (closeMissing) col("__in_snap").isNull else lit(false)))
      .withColumn("valid_to", when(col("__close"), asOf).otherwise(col("valid_to")))
      .withColumn("is_current", not(col("__close")))
      .select((col(keyCol) +: attrCols.map(c => col(s"__d_$c").as(c))) ++
        Seq(col("valid_from"), col("valid_to"), col("version"), col("is_current")): _*)

    // new versions: brand-new keys (version 1) and re-opened changed keys
    val opened = joined.where(col("__in_snap").isNotNull &&
        (col("__in_dim").isNull || changed))
      .select((col(keyCol) +: attrCols.map(c => col(s"__s_$c").as(c))) ++
        Seq(asOf.as("valid_from"), lit(null).cast(joined.schema("valid_to").dataType).as("valid_to"),
          (coalesce(col("version"), lit(0L)) + 1).as("version"),
          lit(true).as("is_current")): _*)

    history.select(outCols: _*).unionByName(keptRows).unionByName(opened)
  }
}
