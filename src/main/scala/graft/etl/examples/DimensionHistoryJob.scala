package graft.etl.examples

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.etl.{SparkJob, Stage}
import graft.io.{Warehouse, WarehouseTable}
import graft.ops.Snapshots
import graft.time.DateInterval

/**
 * Incremental SCD Type-2 dimension maintenance as a daily job — the
 * warehouse round-trip of [[Snapshots.scd2Apply]]. Per date:
 *
 *  1. read the day's full dimension snapshot (the upstream extract),
 *  2. load the most recent EARLIER history partition that holds rows
 *     ([[WarehouseTable.hasDataForDate]], walking back `lookbackDays` —
 *     calendar gaps are fine, an empty-write partition is never a base),
 *     or start from the empty seed on the first day,
 *  3. fold the snapshot in: changed keys close their current row at this
 *     date and open a new version, brand-new keys open version 1,
 *     vanished keys close (`closeMissing`) or stay open,
 *  4. write the ENTIRE updated history as this date's partition.
 *
 * The store holds one full history per day, which is what makes reruns
 * trivially safe: a partition is a pure function of (previous partition,
 * day's snapshot), so a crashed run leaves yesterday's partition
 * untouched and a rerun rebuilds today's from it — the same
 * strictly-earlier-read law as the other incremental jobs. History size
 * is keys x versions (dimension-sized, not fact-sized); with
 * `retentionDays` set, old dailies thin to one partition per ISO week
 * ([[WarehouseTable.thinToWeekly]] — the horizon must cover
 * `lookbackDays`, enforced, or retention would starve its own base
 * search).
 *
 * Consumers do point-in-time joins against any day's partition with the
 * half-open `valid_from <= d < coalesce(valid_to, 'inf')` predicate, or
 * take `is_current` rows as the live dimension.
 */
class DimensionHistoryJob(
    source: DateInterval => DataFrame,
    history: WarehouseTable,
    keyCol: String,
    attrCols: Seq[String],
    closeMissing: Boolean = true,
    lookbackDays: Int = 30,
    retentionDays: Option[Int] = None)
    extends SparkJob {

  require(attrCols.nonEmpty, "need at least one tracked attribute")
  retentionDays.foreach(n => require(n >= lookbackDays,
    s"retentionDays ($n) must cover lookbackDays ($lookbackDays): " +
      "thinning inside the base-search window would orphan the history chain"))

  override def shouldRunForDate(spark: SparkSession, date: DateInterval): Boolean =
    !history.exists(spark, date)

  /** Most recent strictly-earlier history partition holding rows. */
  private def previousHistoryDate(spark: SparkSession, date: DateInterval): Option[DateInterval] =
    Iterator.iterate(date.prev)(_.prev)
      .take(lookbackDays)
      .find(d => history.hasDataForDate(spark, d))

  /** Empty history seed with the snapshot's key/attr schema. */
  private def seed(snapshot: DataFrame): DataFrame =
    snapshot.select(col(keyCol) +: attrCols.map(col): _*).limit(0)
      .withColumn("valid_from", lit(null).cast("string"))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("version", lit(null).cast("long"))
      .withColumn("is_current", lit(null).cast("boolean"))

  override def stages: Stage[SparkSession, _] = for {
    snap <- "read_snapshot".source(ctx => source(ctx.date))
    _ <- "apply_and_write".sink[Row] { ctx =>
      val snapshot = ctx.value.toDF()
      val base = previousHistoryDate(ctx.spark, ctx.date) match {
        case Some(prev) => history.load(ctx.spark, prev)
        case None => seed(snapshot)
      }
      val updated = Snapshots.scd2Apply(base, snapshot, keyCol, attrCols,
        asOf = lit(ctx.date.toString), closeMissing = closeMissing)
      history.save(updated, ctx.date, Warehouse.WriteTruncate)
    }
    _ <- "thin_history".sink[Row] { ctx =>
      retentionDays.foreach(n => history.thinToWeekly(ctx.spark, ctx.date, n))
    }
  } yield snap
}
