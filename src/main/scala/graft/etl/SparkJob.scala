package graft.etl

import org.apache.spark.sql.SparkSession

import graft.time.DateInterval
import graft.util.Logging

object SparkJob {
  /** Maximum number of dates considered from a schedule per run. */
  val MaxScheduledDates = 60
}

/**
 * A Spark ETL job: a stage pipeline plus the logic deciding whether a
 * scheduled date still needs processing (reference core SparkJob.scala:42-45).
 *
 * The runner walks the schedule newest-first, keeps dates while
 * `shouldRunForDate` is true (i.e. not yet processed), then executes them in
 * chronological order.
 */
trait SparkJob extends Logging {
  def shouldRunForDate(spark: SparkSession, date: DateInterval): Boolean
  def stages: Stage[SparkSession, _]
}
