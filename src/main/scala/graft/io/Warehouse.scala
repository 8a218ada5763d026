package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

import graft.time.DateInterval
import graft.util.Logging

/**
 * Date-partitioned warehouse tables over columnar files — the
 * public-knowledge, partition-parallel equivalent of the reference's
 * BigQuery table IO (reference bigquery/package.scala:24-199,
 * BigQueryTable.scala). Where the reference stages whole tables through a
 * single cloud-storage export path, graft writes each date partition
 * directly with Spark's parallel writers, so a 1000-executor cluster never
 * funnels through one path.
 *
 * Dispositions mirror the warehouse API users know:
 *  - `WRITE_TRUNCATE` replaces the partition, `WRITE_APPEND` appends,
 *    `WRITE_EMPTY` fails if the partition already has data;
 *  - `CREATE_IF_NEEDED` creates the table root, `CREATE_NEVER` requires it.
 */
object Warehouse {
  sealed trait WriteDisposition
  case object WriteTruncate extends WriteDisposition
  case object WriteAppend extends WriteDisposition
  case object WriteEmpty extends WriteDisposition

  sealed trait CreateDisposition
  case object CreateIfNeeded extends CreateDisposition
  case object CreateNever extends CreateDisposition

  sealed abstract class PartitionStrategy(val pattern: String)
  case object PartitionByDay extends PartitionStrategy("'date='yyyy-MM-dd")
  case object PartitionByMonth extends PartitionStrategy("'date='yyyy-MM")

  case class TableExistsException(table: String, date: DateInterval)
      extends Exception(s"partition $date of $table is not empty (WRITE_EMPTY)")
  case class TableNotFoundException(table: String)
      extends Exception(s"table root $table does not exist (CREATE_NEVER)")

  /**
   * What an APPEND may do when its schema differs from what the partition
   * already holds — the policy a long-lived table needs the first time a
   * producer adds or drops a column (the reference's BigQuery load-job
   * path tolerated this via warehouse-side schema union; a plain-file
   * warehouse must define it explicitly or the behavior is whatever the
   * reader's footer-sampling happens to pick):
   *
   *  - [[SchemaEvolve]] (default): additive evolution — appends may ADD
   *    or OMIT columns (readers reconcile via parquet `mergeSchema`;
   *    missing columns read as null), but a column PRESENT ON BOTH SIDES
   *    must keep its exact type — a silent `int`→`string` flip would
   *    poison every future ranged read.
   *  - [[SchemaStrict]]: appends must match the existing partition
   *    schema exactly (names and types, order-insensitive) — the
   *    fail-fast contract for tables whose consumers pin a schema.
   *
   * Either way a violation throws [[SchemaMismatchException]] BEFORE any
   * file lands, so a misconfigured producer cannot corrupt a partition.
   */
  sealed trait SchemaPolicy
  case object SchemaEvolve extends SchemaPolicy
  case object SchemaStrict extends SchemaPolicy

  case class SchemaMismatchException(table: String, detail: String)
      extends Exception(s"schema mismatch appending to $table: $detail")

  /**
   * Per-JVM cache of append schemas already validated against a
   * partition (key = partition url | policy | incoming-schema
   * fingerprint): a streaming sink appends every micro-batch with the
   * SAME schema, and without this the policy check re-reads the
   * partition's merged footer union each time — an O(existing files)
   * Spark job per micro-batch, quadratic footer reads over a day. Sound
   * under the documented single-writer-per-partition contract: a cached
   * fingerprint was valid against a schema this writer can only have
   * grown additively since (SchemaEvolve) or not at all (SchemaStrict).
   * TRUNCATE/compact/merge rewrites drop the partition's entries, since
   * a rewrite may redefine the schema the cache validated against.
   */
  private[io] val validatedAppendSchemas =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}

case class WarehouseTable(
    root: HdfsUrl,
    name: String,
    partitioning: Warehouse.PartitionStrategy = Warehouse.PartitionByDay,
    format: String = "parquet",
    maxRecordsPerFile: Option[Long] = None,
    schemaPolicy: Warehouse.SchemaPolicy = Warehouse.SchemaEvolve)
    extends Logging {
  import Warehouse._

  def tableUrl: HdfsUrl = root / name
  def partitionUrl(date: DateInterval): HdfsUrl =
    tableUrl / date.format(partitioning.pattern)

  /** Write one date partition with the requested dispositions. */
  def save[T](
      ds: Dataset[T],
      date: DateInterval,
      writeDisposition: WriteDisposition = WriteTruncate,
      createDisposition: CreateDisposition = CreateIfNeeded): Unit = {
    val spark = ds.sparkSession
    if (createDisposition == CreateNever && !tableUrl.exists(spark))
      throw TableNotFoundException(tableUrl.toString)

    val target = partitionUrl(date)
    val mode = writeDisposition match {
      case WriteTruncate =>
        invalidateSchemaCache(date) // the rewrite may redefine the schema
        SaveMode.Overwrite
      case WriteAppend =>
        checkAppendSchema(spark, date, ds.toDF().schema)
        SaveMode.Append
      case WriteEmpty =>
        if (target.exists(spark)) throw TableExistsException(tableUrl.toString, date)
        SaveMode.ErrorIfExists
    }
    logger.info(s"saving $name partition $date to $target ($writeDisposition)")
    val writer = ds.write.mode(mode).format(format)
    // caps file size from wide tasks; small-file merging is compact()'s job
    maxRecordsPerFile.fold(writer)(n => writer.option("maxRecordsPerFile", n))
      .save(target.toString)
  }

  /**
   * EXACTLY-ONCE micro-batch append for streaming sinks: the
   * `foreachBatch` contract is at-least-once (a crash between a partial
   * write and the checkpoint commit replays the batch), so a plain
   * `WriteAppend` double-appends on retry. This write is keyed on
   * `batchId` — Structured Streaming's replay identity — and commits with
   * a marker protocol that makes any replay a no-op:
   *
   *  1. marker `_graft_batch-<id>` present → the batch fully committed on
   *     a previous attempt; return without writing (the retry path).
   *  2. Delete any `b<id>-*` files in the partition (partials from an
   *     attempt that crashed mid-promote).
   *  3. Write the batch to a tmp sibling directory (task-level retries
   *     are contained there by Spark's own output committer).
   *  4. Promote each data file into the partition under the
   *     batch-identifying name `b<id>-<file>` (HDFS renames — metadata
   *     ops, no data copy).
   *  5. Create the marker (readers ignore `_`-prefixed files), drop tmp.
   *
   * A crash at any point either leaves the marker absent (replay scrubs
   * and rewrites — no duplicates) or present after a complete promote
   * (replay skips — no loss). Mid-promote readers can observe a PREFIX of
   * the batch's files — micro-batch visibility is not atomic for
   * concurrent readers, only the retry semantics are exact; batch jobs
   * reading completed dates are unaffected.
   *
   * The caller's `date` must be STABLE across a batch's retries: derive
   * it from the job's run date or event time, not a wall clock mid-roll —
   * a retry that lands on a new day would commit under a different
   * partition's marker and the crashed partial in yesterday's partition
   * would survive (degrading to at-least-once for exactly the
   * midnight-crash batch).
   *
   * `runId` namespaces the marker and file prefix per QUERY (pass the
   * streaming query's stable name, as [[graft.streaming.EventStreams
   * .warehouseSink]] does): batchIds are only unique within one
   * checkpoint lineage, so without it a second query writing the same
   * partition — or the same query after a CHECKPOINT RESET (batchIds
   * restart at 0) — finds a stale `_graft_batch-<id>` marker from the
   * other lineage and silently no-ops a new, different batch (data
   * loss). With distinct runIds the lineages commit independently. A
   * reset that REUSES the same runId must clear that runId's markers
   * (`_graft_batch-<runId>-*`) from unfinished partitions first.
   */
  def saveStreamBatch(
      batch: DataFrame,
      date: DateInterval,
      batchId: Long,
      runId: String = ""): Unit = {
    val spark = batch.sparkSession
    val runTag = runId.replaceAll("[^A-Za-z0-9_-]", "_") match {
      case "" => s"$batchId"
      case r => s"$r-$batchId"
    }
    val hTarget = new org.apache.hadoop.fs.Path(partitionUrl(date).toString)
    val fs = hTarget.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(hTarget, s"_graft_batch-$runTag")
    if (fs.exists(marker)) {
      logger.info(s"$name/$date batch $runTag already committed; skipping replay")
      return
    }
    if (fs.exists(hTarget))
      fs.listStatus(hTarget).toSeq
        .filter(_.getPath.getName.startsWith(s"b$runTag-"))
        .foreach { st =>
          logger.warn(s"scrubbing partial ${st.getPath} from interrupted batch $runTag")
          fs.delete(st.getPath, false)
        }
    checkAppendSchema(spark, date, batch.schema)
    val tmp = new org.apache.hadoop.fs.Path(
      (tableUrl / s".stream-tmp-${partitionValue(date)}-$runTag").toString)
    fs.delete(tmp, true)
    val writer = batch.write.mode(SaveMode.Overwrite).format(format)
    maxRecordsPerFile.fold(writer)(n => writer.option("maxRecordsPerFile", n))
      .save(tmp.toString)
    fs.mkdirs(hTarget)
    fs.listStatus(tmp).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .foreach { st =>
        val dest = new org.apache.hadoop.fs.Path(hTarget, s"b$runTag-${st.getPath.getName}")
        if (!fs.rename(st.getPath, dest))
          throw new java.io.IOException(s"stream batch promote ${st.getPath} -> $dest failed")
      }
    fs.create(marker, true).close()
    fs.delete(tmp, true)
  }

  /**
   * Rewrite one date partition into `targetFiles` files — the compaction
   * pass every long-lived warehouse needs: a day written by a 1000-task
   * job leaves 1000 files per partition, and scans pay per-file open cost
   * forever after. Contents are unchanged.
   *
   * The rewrite lands in a temporary sibling directory first and swaps in
   * only after it fully succeeds, so the source files survive any mid-write
   * failure (a truncate-overwrite of the same path would delete them before
   * the new files exist). The delete+rename swap itself is a small
   * non-atomic window; rerunning compact() heals an interrupted swap.
   *
   * Single writer per partition assumed — the standard warehouse contract
   * for a maintenance pass. During the swap window a concurrent reader can
   * observe a missing partition path, and two concurrent compact() calls on
   * the same partition share one tmp directory and can corrupt each other's
   * swap (the heal logic covers crashes, not races). Schedule compaction
   * when the partition is quiescent, e.g. after the date's job completes.
   */
  def compact(spark: SparkSession, date: DateInterval, targetFiles: Int = 1): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    logger.info(s"compacting $name partition $date to $targetFiles files")
    // cap-free writer: targetFiles is the explicit file count, the per-file
    // record cap would immediately re-split what compaction merged
    rewritePartition(spark, date) { (df, tmpPath) =>
      df.repartition(targetFiles).write.mode(SaveMode.Overwrite).format(format).save(tmpPath)
    }
  }

  /**
   * Keyed merge (upsert) into one date partition: rows of `updates` replace
   * existing rows sharing their `keys`; all other existing rows are kept —
   * the MERGE disposition for a plain-file warehouse with no transaction
   * log. An empty/absent partition degrades to a TRUNCATE save.
   *
   * One anti-join on the keys + the partition rewrite; the read side is
   * swap-protected exactly like [[compact]] (a lazy self-overwrite would
   * delete the source mid-scan), and the same single-writer-per-partition
   * assumption applies. At scale this rewrites ONE partition, never the
   * table — pair with [[loadBefore]]-style pruning so a daily upsert flow
   * touches only the day it lands on.
   */
  def merge[T](updates: Dataset[T], date: DateInterval, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val spark = updates.sparkSession
    // heal BEFORE the exists() probe: after an interrupted swap the target
    // path is absent (the only copy lives in tmp), and an unhealed exists()
    // here would degrade to a TRUNCATE save of just `updates`, silently
    // dropping every pre-existing row
    healSwap(spark, date)
    if (!exists(spark, date)) { save(updates, date, WriteTruncate); return }
    logger.info(s"merging ${keys.mkString(",")}-keyed updates into $name partition $date")
    val newRows = updates.toDF()
    rewritePartition(spark, date) { (existing, tmpPath) =>
      val merged = existing
        // no distinct on the build side: left_anti ignores right duplicates
        .join(newRows.select(keys.head, keys.tail: _*), keys, "left_anti")
        .unionByName(newRows)
        .write.mode(SaveMode.Overwrite).format(format)
      // merge is a data write, so the table's file-size cap applies
      // (compact() alone stays cap-free — it exists to merge files)
      maxRecordsPerFile.fold(merged)(n => merged.option("maxRecordsPerFile", n))
        .save(tmpPath)
    }
  }

  /**
   * Rewrite-and-swap scaffold shared by [[compact]] and [[merge]]: heals an
   * interrupted previous swap, hands the CURRENT partition contents and a
   * temp path to `write`, then promotes the temp directory over the
   * partition. The temp-then-swap keeps the source files intact through
   * any mid-write failure; rerunning heals an interrupted swap. Single
   * writer per partition assumed (see [[compact]]'s scaladoc).
   */
  private def rewritePartition(spark: SparkSession, date: DateInterval)(
      write: (DataFrame, String) => Unit): Unit = {
    val target = partitionUrl(date)
    val tmp = tableUrl / s".compact-tmp-${partitionValue(date)}"
    val hPath = new org.apache.hadoop.fs.Path(target.toString)
    val hTmp = new org.apache.hadoop.fs.Path(tmp.toString)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    healSwap(spark, date)
    invalidateSchemaCache(date) // the rewrite may redefine the schema
    write(load(spark, date), tmp.toString)
    fs.delete(hPath, true)
    if (!fs.rename(hTmp, hPath))
      throw new java.io.IOException(s"rewrite: rename $tmp -> $target failed")
  }

  /**
   * Heal an interrupted swap: a crash between [[rewritePartition]]'s delete
   * and rename leaves the partition path absent with the only copy stranded
   * in the tmp sibling — finish the rename before anything reads or probes
   * the partition. No-op when the partition path exists.
   */
  private def healSwap(spark: SparkSession, date: DateInterval): Unit = {
    val target = partitionUrl(date)
    val tmp = tableUrl / s".compact-tmp-${partitionValue(date)}"
    val hPath = new org.apache.hadoop.fs.Path(target.toString)
    val hTmp = new org.apache.hadoop.fs.Path(tmp.toString)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath) && fs.exists(hTmp)) {
      logger.warn(s"healing interrupted swap of $name/$date from $tmp")
      if (!fs.rename(hTmp, hPath))
        throw new java.io.IOException(s"heal rename $tmp -> $target failed")
    }
  }

  /**
   * Enforce [[Warehouse.SchemaPolicy]] before an append lands (no-op on a
   * partition with no data yet — the first write defines the schema).
   * Against the partition's CURRENT merged read schema, so evolved
   * partitions validate against their union, not one sampled footer.
   */
  private def checkAppendSchema(
      spark: SparkSession,
      date: DateInterval,
      incoming: org.apache.spark.sql.types.StructType): Unit = {
    // fingerprint skip FIRST (before even the hasDataForDate listing):
    // the steady state of a streaming sink is "same schema as the last
    // micro-batch", which must not cost a partition read per batch
    val cacheKey = s"${partitionUrl(date)}|$schemaPolicy|" +
      incoming.fields.map(f => s"${f.name}:${f.dataType.sql}").sorted.mkString(",")
    if (Warehouse.validatedAppendSchemas.contains(cacheKey)) return
    if (!hasDataForDate(spark, date)) return
    val existing = load(spark, date).schema
    def typesOf(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => f.name -> f.dataType).toMap
    val (ex, in) = (typesOf(existing), typesOf(incoming))
    val flipped = ex.keySet.intersect(in.keySet)
      .filter(c => ex(c) != in(c))
    if (flipped.nonEmpty)
      throw SchemaMismatchException(s"$name/$date", flipped.toSeq.sorted.map(c =>
        s"$c: ${ex(c).simpleString} -> ${in(c).simpleString}").mkString(
        "type change on shared column(s) ", ", ", ""))
    schemaPolicy match {
      case SchemaEvolve => // additive add/omit allowed; readers mergeSchema
      case SchemaStrict =>
        val only = (ex.keySet -- in.keySet).map("-" + _) ++
          (in.keySet -- ex.keySet).map("+" + _)
        if (only.nonEmpty)
          throw SchemaMismatchException(s"$name/$date",
            only.toSeq.sorted.mkString("column set differs (SchemaStrict): ", ", ", ""))
    }
    Warehouse.validatedAppendSchemas.add(cacheKey)
  }

  /** Drop the partition's validated-append-schema cache entries — a
    * rewrite (truncate, compact, merge) may redefine the schema they
    * validated against. */
  private def invalidateSchemaCache(date: DateInterval): Unit = {
    val prefix = s"${partitionUrl(date)}|"
    Warehouse.validatedAppendSchemas.removeIf(_.startsWith(prefix))
  }

  /**
   * Read one date partition. `mergeSchema` unions the footers, so a
   * partition whose appends EVOLVED (column added mid-day under
   * [[Warehouse.SchemaEvolve]]) reads with the full column set, missing
   * values null — Spark's default footer sampling would silently drop the
   * new column whenever an old file is sampled first. Footer-union cost
   * is bounded and policy-checked appends guarantee it succeeds.
   */
  def load(spark: SparkSession, date: DateInterval): DataFrame =
    spark.read.format(format).option("mergeSchema", "true")
      .load(partitionUrl(date).toString)

  /**
   * Read the whole table; `date` comes back as a partition column via the
   * path layout. `mergeSchema` makes ranged reads schema-evolution-safe:
   * a column added on day N reads as null for days < N instead of
   * vanishing or failing depending on which partition's footer Spark
   * sampled (the plain-file analogue of the reference warehouse's
   * load-job schema tolerance, ref bigquery/package.scala:24-199).
   */
  def loadAll(spark: SparkSession): DataFrame =
    spark.read
      .format(format)
      .option("mergeSchema", "true")
      .option("basePath", tableUrl.toString)
      .load(tableUrl.toString + "/date=*")

  /** Partition value string for `date` under this table's layout (e.g. "2026-08-12"). */
  def partitionValue(date: DateInterval): String =
    date.format(partitioning.pattern).stripPrefix("date=")

  /**
   * Read every partition strictly before `date` (partition-pruned — the
   * predicate is on the partition column, so later/current files are never
   * listed into the scan). Incremental jobs MUST read their own store this
   * way: a rerun after a mid-job failure would otherwise anti-join the day's
   * input against fingerprints/bands it already wrote for that same day and
   * silently produce an empty output partition.
   */
  def loadBefore(spark: SparkSession, date: DateInterval): DataFrame = {
    import org.apache.spark.sql.functions.col
    loadAll(spark).filter(col("date").cast("string") < partitionValue(date))
  }

  /**
   * Read partitions in the half-open range `[from, until)` — partition-
   * pruned like [[loadBefore]] (the predicate is on the partition column,
   * so files outside the range are never listed into the scan). The
   * backfill/report shape: "this week's partitions" without touching the
   * table's full history.
   */
  def loadBetween(spark: SparkSession, from: DateInterval, until: DateInterval): DataFrame = {
    import org.apache.spark.sql.functions.col
    loadAll(spark).filter(
      col("date").cast("string") >= partitionValue(from) &&
        col("date").cast("string") < partitionValue(until))
  }

  def exists(spark: SparkSession, date: DateInterval): Boolean = partitionUrl(date).exists(spark)

  /**
   * Row-presence probe: true only when the `date` partition holds at least
   * one ROW (reference bigquery/package.scala:56 checks the partition
   * decorator's row count, not path existence). [[exists]] answers "was a
   * write attempted" — an empty-result write leaves a partition directory
   * with a zero-row file, which `shouldRunForDate`-style gates must treat
   * as "no data" when downstream consumers need actual rows. Cost: footer
   * metadata + at most one row (`limit(1)` — parquet answers from row-group
   * counts without materializing data).
   */
  def hasDataForDate(spark: SparkSession, date: DateInterval): Boolean =
    exists(spark, date) &&
      scala.util.Try(!load(spark, date).isEmpty).getOrElse(false)

  /** The `date=` values of existing partition directories, sorted ascending. */
  def partitionDates(spark: SparkSession): Seq[String] = {
    val hRoot = new org.apache.hadoop.fs.Path(tableUrl.toString)
    val fs = hRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hRoot)) Seq.empty
    else fs.listStatus(hRoot).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("date="))
      .map(_.getPath.getName.stripPrefix("date="))
      .sorted
  }

  /**
   * Retention thinning for an append-forever daily store: partitions within
   * `keepDays` of `asOf` are untouched; beyond that, ONE partition per ISO
   * week survives (the latest day present in each week — the one a
   * baseline-walking reader like a drift monitor would pick first) and the
   * rest are deleted. Returns the deleted partition values.
   *
   * This is the policy a vocab-snapshot or metrics store needs to stop
   * growing a partition per day forever while keeping enough history for
   * week-over-week comparisons: recent days stay exact; older history
   * keeps weekly resolution. Idempotent — a rerun deletes nothing new; and
   * monotone in `asOf`, so a daily job can call it unconditionally.
   * Day-partitioned tables only. Deletion is per-partition-directory and
   * assumes the quiescence contract of [[compact]] (run it from the single
   * writer, after the day's writes); pair survivors with [[compact]] if
   * they were written by many tasks.
   */
  def thinToWeekly(spark: SparkSession, asOf: DateInterval, keepDays: Int): Seq[String] = {
    require(partitioning == PartitionByDay, "thinToWeekly assumes day partitions")
    require(keepDays >= 1, s"keepDays ($keepDays) must be >= 1")
    val cutoff = graft.time.Day(asOf) - keepDays
    val old = partitionDates(spark)
      .flatMap(v => graft.time.Day.parse(v).map(v -> _))
      .filter { case (_, d) => d < cutoff }
    val keepers = old.groupBy { case (_, d) => graft.time.Week(d) }
      .map { case (_, inWeek) => inWeek.maxBy { case (_, d) => d }._1 }
      .toSet
    val doomed = old.map(_._1).filterNot(keepers)
    val fs = new org.apache.hadoop.fs.Path(tableUrl.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach { v =>
      logger.info(s"retention: deleting $name partition date=$v (thinned to weekly)")
      fs.delete(new org.apache.hadoop.fs.Path((tableUrl / s"date=$v").toString), true)
    }
    doomed
  }

  /**
   * True when at least one date partition holds a visible data file. The
   * guard incremental jobs need before `loadAll`/`loadBefore`: a crashed
   * first run can leave the table root with only a `_temporary` skeleton,
   * and a `date=*` scan over that fails schema inference on every rerun.
   */
  def hasAnyPartition(spark: SparkSession): Boolean = {
    val hRoot = new org.apache.hadoop.fs.Path(tableUrl.toString)
    val fs = hRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hRoot) && {
      val matches = fs.globStatus(new org.apache.hadoop.fs.Path(hRoot, "date=*/*"))
      matches != null && matches.exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }
  }
}
