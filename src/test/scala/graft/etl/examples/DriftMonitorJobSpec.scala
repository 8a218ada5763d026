package graft.etl.examples

import org.apache.spark.sql.DataFrame

import graft.io.{HdfsUrl, WarehouseTable}
import graft.testkit.SparkJobSuiteBase
import graft.time.{Day, DateInterval}

class DriftMonitorJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)
  private val day4 = Day(2026, 8, 13) // day3 never runs: calendar gap

  private def sourceFor(date: DateInterval): DataFrame = date match {
    case `day1` => Seq(
      (1L, "rivers rivers mountains"),
      (2L, "rivers oceans")
    ).toDF("doc_id", "text") // 5 tokens: rivers 3, mountains 1, oceans 1
    case `day2` => Seq(
      (3L, "surge surge surge rivers"),
      (4L, "mountains oceans")
    ).toDF("doc_id", "text")
    case _ => Seq(
      (5L, "rivers mountains oceans")
    ).toDF("doc_id", "text")
  }

  test("snapshots vocab, reports drift vs the latest non-empty earlier snapshot") {
    val root = HdfsUrl(tmpDir("drift_monitor"))
    val snapshots = WarehouseTable(root, "snapshots")
    val reports = WarehouseTable(root, "reports")
    val job = new DriftMonitorJob(sourceFor, snapshots, reports, k = 10)

    // day 1: snapshot written, report exists but holds no rows
    runJob(job, day1).isSuccess shouldBe true
    snapshots.hasDataForDate(spark, day1) shouldBe true
    reports.exists(spark, day1) shouldBe true // gates the rerun...
    reports.hasDataForDate(spark, day1) shouldBe false // ...but has no data
    job.shouldRunForDate(spark, day1) shouldBe false

    // day 2: drift vs day 1 — "surge" is a pure addition (ppm_old = 0)
    runJob(job, day2).isSuccess shouldBe true
    val drift2 = reports.load(spark, day2)
      .select("term", "ppm_old", "ppm_cur", "delta_ppm")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    drift2("surge")._2 shouldBe 0L
    drift2("surge")._4 should be > 0L
    drift2("rivers")._4 should be < 0L // rivers share fell day over day

    // day 4 (gap on day 3): the baseline search walks back to day 2
    runJob(job, day4).isSuccess shouldBe true
    val drift4 = reports.load(spark, day4)
      .select("term", "ppm_old").as[(String, Long)].collect().toMap
    // day2's snapshot is the baseline: surge had 3 of 6 tokens = 500000 ppm
    drift4("surge") shouldBe 500000L
  }
}
