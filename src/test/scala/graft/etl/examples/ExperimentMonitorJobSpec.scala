package graft.etl.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.{HdfsUrl, WarehouseTable}
import graft.ops.Stats
import graft.testkit.SparkJobSuiteBase
import graft.time.{DateInterval, Day}

class ExperimentMonitorJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)

  /** Deterministic two-day assignment/outcome log: balanced arms, a real
    * conversion lift (arm 0 converts 3×), and a y correlated with x so
    * CUPED has a covariate to regress out. Unit ids overlap across days —
    * the merge law (per-unit sums ADD) is the thing under test. */
  private def logFor(date: DateInterval): DataFrame = {
    val dayOffset = if (date == day1) 0L else 1L
    val rows = (0L until 40L).map { u =>
      val arm = u % 2
      val converted = if (arm == 0) u % 4 != 0 else u % 4 == 0
      val x = 100L + (u % 7) * 10L
      val y = x + (if (arm == 0) 25L else 5L) + dayOffset * 3L + (u % 3)
      ("exp1", u, arm, converted, x, y)
    }
    rows.toDF("group", "unit", "arm", "converted", "x", "y")
  }

  /** A day whose randomizer is broken: 37 vs 3 unit-rows per arm. */
  private def skewedLog(date: DateInterval): DataFrame =
    (0L until 40L).map { u =>
      val arm = if (u < 37) 0L else 1L
      ("exp1", u, arm, u % 2 == 0, 100L, 110L)
    }.toDF("group", "unit", "arm", "converted", "x", "y")

  test("warehouse round-trip readout equals the direct single-batch computation") {
    val root = HdfsUrl(tmpDir("experiment_monitor"))
    val cells = WarehouseTable(root, "cells")
    val unitSums = WarehouseTable(root, "unit_sums")
    val readouts = WarehouseTable(root, "readouts")
    val job = new ExperimentMonitorJob(logFor, day1, cells, unitSums, readouts)

    runJob(job, day1).isSuccess shouldBe true
    job.shouldRunForDate(spark, day1) shouldBe false // gated on the readout
    runJob(job, day2).isSuccess shouldBe true

    val got = readouts.load(spark, day2)
      .select("group", "n", "srm_chi2_micro", "srm_alarm",
        "lift_ppm", "ab_chi2_micro", "adj_lift_micro")
      .as[(String, Long, Long, Boolean, Long, Long, Long)].collect()
    got.length shouldBe 1
    val r = got.head
    r._4 shouldBe false // balanced arms: no SRM alarm

    // direct batch over the union of both days' raw logs
    val full = logFor(day1).union(logFor(day2))
    val srm = Stats.srmCheck(full, Seq("group"), "arm")
      .select($"n", $"chi2_micro").as[(Long, Long)].head()
    r._2 shouldBe srm._1
    r._3 shouldBe srm._2
    val ab = Stats.chiSquare2x2(
      full.withColumn("e", $"arm" === 0), Seq("group"), "e", "converted")
      .select($"lift_ppm", $"chi2_micro").as[(Long, Long)].head()
    r._5 shouldBe ab._1
    r._6 shouldBe ab._2
    val perUnit = full.groupBy($"group", $"unit", $"arm")
      .agg(sum($"x").as("x"), sum($"y").as("y"))
    val adj = Stats.cupedAdjust(perUnit, Seq("group"), "arm", "y", "x")
      .groupBy($"group")
      .agg((max(when($"arm" === 0, $"adj_mean_y_micro"))
        - max(when($"arm" === 1, $"adj_mean_y_micro"))).as("adj"))
      .select($"adj").as[Long].head()
    r._7 shouldBe adj
    r._7 should be > 0L // arm 0's planted +20 y-shift survives adjustment
  }

  test("SRM alarm gates the lift columns to null") {
    val root = HdfsUrl(tmpDir("experiment_srm"))
    val job = new ExperimentMonitorJob(skewedLog, day1,
      WarehouseTable(root, "cells"), WarehouseTable(root, "unit_sums"),
      WarehouseTable(root, "readouts"))
    runJob(job, day1).isSuccess shouldBe true
    val r = WarehouseTable(root, "readouts").load(spark, day1)
    r.select($"srm_alarm").as[Boolean].head() shouldBe true
    r.where($"lift_ppm".isNull && $"ab_chi2_micro".isNull &&
      $"adj_lift_micro".isNull).count() shouldBe 1L
  }
}
