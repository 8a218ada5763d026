package graft.testkit

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Try

import graft.etl.{SparkJob, Stage}
import graft.time.DateInterval

object SparkTestBase {
  /** One session for the whole forked test JVM. */
  lazy val sharedSpark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Base for all graft specs: shared local SparkSession + matchers. */
trait SparkTestBase extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkTestBase.sharedSpark

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

/**
 * Testkit for [[SparkJob]] suites (reference testkit SparkJobSuiteBase.scala):
 * run a job's stage pipeline for one date against the shared session.
 */
trait SparkJobSuiteBase extends SparkTestBase {
  def runJob(job: SparkJob, date: DateInterval): Try[Any] =
    job.stages.run(Stage.Context(spark, date))
}
