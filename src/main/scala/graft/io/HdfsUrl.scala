package graft.io

import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.time.DateInterval

/**
 * Composable path for any Hadoop-compatible filesystem (HDFS, S3A, GCS, file),
 * with date-partition formatting built in (reference core HdfsUrl.scala:31-59).
 *
 * {{{
 * scala> HdfsUrl("some/path") / "somewhere" / Day(2016, 8, 28)
 * res1: HdfsUrl = some/path/somewhere/2016-08-28
 * scala> HdfsUrl("root", dateFormat = Some("'year='yyyy/'month='MM")) / Day(2016, 8, 28)
 * res2: HdfsUrl = root/year=2016/month=08
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
