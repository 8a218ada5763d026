package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.time.DateInterval

/**
 * Composable path for any Hadoop-compatible filesystem (HDFS, S3A, GCS,
 * file), with date-partition formatting built in. The API surface matches
 * the reference's core HdfsUrl.scala:31-59; the implementation is graft's
 * own (segment joins via Hadoop `Path` resolution, filesystem access
 * through one shared hook).
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

  /** Append a literal path segment. */
  def /(segment: String): HdfsUrl =
    copy(url = new Path(path, segment).toString)

  /** Append a date partition segment, rendered through `dateFormat`. */
  def /(date: DateInterval): HdfsUrl = this / render(date)

  def exists(spark: SparkSession): Boolean =
    withFileSystem(spark)(_.exists(path))

  /** Create the file and hand the stream to `f`, always closing it. */
  def open[T](spark: SparkSession)(f: FSDataOutputStream => T): T =
    withFileSystem(spark) { fs =>
      val out = fs.create(path)
      try f(out)
      finally out.close()
    }

  def fileSystem(spark: SparkSession): FileSystem =
    fileSystemIn(spark.sparkContext.hadoopConfiguration)

  override def toString: String = path.toString

  private def render(date: DateInterval): String = dateFormat match {
    case Some(pattern) => date.format(pattern)
    case None => date.toString
  }

  private def withFileSystem[T](spark: SparkSession)(f: FileSystem => T): T =
    f(fileSystem(spark))

  private def fileSystemIn(conf: Configuration): FileSystem =
    path.getFileSystem(conf)
}
