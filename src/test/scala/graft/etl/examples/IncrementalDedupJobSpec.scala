package graft.etl.examples

import org.apache.spark.sql.DataFrame

import graft.io.{HdfsUrl, WarehouseTable}
import graft.testkit.SparkJobSuiteBase
import graft.time.{Day, DateInterval}

class IncrementalDedupJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)

  private def sourceFor(date: DateInterval): DataFrame = date match {
    case `day1` => Seq(
      (1L, "alpha document about rivers"),
      (2L, "beta document about mountains"),
      (3L, "ALPHA  document about rivers") // within-day dup of 1 (normalized)
    ).toDF("doc_id", "text")
    case _ => Seq(
      (10L, "beta document about mountains"), // cross-day dup of 2
      (11L, "gamma document about oceans"),
      (12L, "gamma document about oceans") // within-day dup of 11
    ).toDF("doc_id", "text")
  }

  test("dedups within each day and across days via the fingerprint store") {
    val root = HdfsUrl(tmpDir("incr_dedup"))
    val job = new IncrementalDedupJob(sourceFor, WarehouseTable(root, "clean"), WarehouseTable(root, "fps"))

    runJob(job, day1).isSuccess shouldBe true
    val clean1 = WarehouseTable(root, "clean").load(spark, day1)
    clean1.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L)

    runJob(job, day2).isSuccess shouldBe true
    val clean2 = WarehouseTable(root, "clean").load(spark, day2)
    clean2.select("doc_id").as[Long].collect().sorted shouldBe Array(11L) // 10 seen on day1, 12 dup of 11

    // the store accumulates per-date fingerprint partitions
    WarehouseTable(root, "fps").loadAll(spark).select("fp").distinct().count() shouldBe 3

    // idempotence: day2 is gated out on rerun
    job.shouldRunForDate(spark, day2) shouldBe false
  }

  test("a rerun after a crash between the two sinks rewrites the same clean partition") {
    val root = HdfsUrl(tmpDir("incr_dedup_rerun"))
    val clean = WarehouseTable(root, "clean")
    val job = new IncrementalDedupJob(sourceFor, clean, WarehouseTable(root, "fps"))
    runJob(job, day1).isSuccess shouldBe true

    // simulate: day2's run wrote its fingerprints, then crashed before
    // write_clean. The rerun must NOT anti-join day2's docs against their
    // own stored fingerprints and write an empty partition.
    runJob(job, day2).isSuccess shouldBe true
    val part = clean.partitionUrl(day2)
    part.fileSystem(spark).delete(part.path, true)
    job.shouldRunForDate(spark, day2) shouldBe true // gate re-opens

    runJob(job, day2).isSuccess shouldBe true
    clean.load(spark, day2).select("doc_id").as[Long].collect().sorted shouldBe Array(11L)
  }
}
