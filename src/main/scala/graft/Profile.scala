package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Dev-only measurement harness (guide §1: measure first): runs named battery
 * queries with the Bench session config, prints a per-JOB wall breakdown
 * (job id, seconds, description) for the timed pass, and dumps
 * `explain("formatted")` to `plans/r19/<name>_<tag>.txt`.
 *
 * Usage: runMain graft.Profile <sfDir> <tag> <name>[,<name>...]
 * Never invoked by the driver; the bench contract lives in [[Bench]].
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tag = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = new ConcurrentHashMap[Int, (Long, String)]()
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        if (record) jobStart.put(s.jobId,
          (System.nanoTime(), Option(s.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (record) Option(jobStart.get(e.jobId)).foreach { case (t0, desc) =>
          jobLines.add(f"    job ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%8.3f s  $desc")
        }
    })

    val byName = Queries.all.map { case (n, f, _) => n -> f }.toMap
    Files.createDirectories(Paths.get("plans/r19"))
    names.foreach { name =>
      val fn = byName.getOrElse(name, sys.error(s"unknown query: $name"))
      // plan dump
      val df = fn(spark, sfDir)
      Files.writeString(Paths.get(s"plans/r19/${name}_$tag.txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      // warm-up (codegen + FS caches), then timed pass with job breakdown
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      jobLines.clear(); jobStart.clear(); record = true
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      record = false
      spark.sparkContext.setJobDescription(null)
      println(f"[profile] $name%-28s $sec%8.3f s  (${jobLines.size} jobs)")
      jobLines.toArray(Array.empty[String]).sorted.foreach(println)
    }
    spark.stop()
  }
}
