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

  test("snapshot retention thins old dailies to weekly, never inside the lookback") {
    val root = HdfsUrl(tmpDir("drift_retention"))
    val snapshots = WarehouseTable(root, "snapshots")
    val reports = WarehouseTable(root, "reports")
    // seed 21 daily snapshots: Mon 2026-07-20 .. Sun 2026-08-09
    val first = Day(2026, 7, 20)
    (0 until 21).foreach { i =>
      snapshots.save(Seq(("tok", 1L + i)).toDF("term", "cnt"), first + i)
    }

    val job = new DriftMonitorJob(sourceFor, snapshots, reports, k = 10,
      lookbackDays = 5, snapshotRetentionDays = Some(7))
    runJob(job, Day(2026, 8, 10)).isSuccess shouldBe true

    // cutoff = Aug 3: Jul 20..Aug 2 (ISO weeks 30, 31) thin to their latest
    // day — Sun Jul 26 and Sun Aug 2; Aug 3..9 stay daily; Aug 10 is the
    // day's own fresh snapshot
    snapshots.partitionDates(spark) shouldBe Seq(
      "2026-07-26", "2026-08-02",
      "2026-08-03", "2026-08-04", "2026-08-05", "2026-08-06", "2026-08-07",
      "2026-08-08", "2026-08-09", "2026-08-10")

    // the report still found its daily baseline (Aug 9, inside the lookback)
    reports.hasDataForDate(spark, Day(2026, 8, 10)) shouldBe true

    // idempotent: a second pass at the same asOf deletes nothing more
    snapshots.thinToWeekly(spark, Day(2026, 8, 10), 7) shouldBe Seq.empty

    // retention may never starve the baseline search
    an[IllegalArgumentException] should be thrownBy
      new DriftMonitorJob(sourceFor, snapshots, reports,
        lookbackDays = 30, snapshotRetentionDays = Some(7))
  }
}
