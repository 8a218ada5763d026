package graft.io

import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.time.DateInterval

/**
 * Composable path for any Hadoop-compatible filesystem (HDFS, S3A, GCS, file),
 * with date-partition formatting built in (same API surface as the reference's
 * core HdfsUrl.scala:31-59).
 *
 * `/` appends either a literal segment or a [[DateInterval]]; the interval
 * renders through `dateFormat` when one is set, so a single table value can
 * own its partition layout:
 *
 * {{{
 * val table = HdfsUrl("s3a://lake/events", dateFormat = Some("'dt='yyyy-MM-dd"))
 * (table / Day(2026, 8, 12)).toString   // "s3a://lake/events/dt=2026-08-12"
 * (table / "_SUCCESS").exists(spark)    // filesystem probe via the spark conf
 * }}}
 */
case class HdfsUrl(url: String, dateFormat: Option[String] = None) {
  def path: Path = new Path(url)

  def /(subPath: String): HdfsUrl = copy(url = new Path(path, subPath).toString)

  def /(date: DateInterval): HdfsUrl =
    this / dateFormat.fold(date.toString)(date.format)

  def exists(spark: SparkSession): Boolean = fileSystem(spark).exists(path)

  /** Create the file and hand the stream to `f`, always closing it. */
  def open[T](spark: SparkSession)(f: FSDataOutputStream => T): T = {
    val stream = fileSystem(spark).create(path)
    try f(stream)
    finally stream.close()
  }

  def fileSystem(spark: SparkSession): FileSystem =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def toString: String = path.toString
}
