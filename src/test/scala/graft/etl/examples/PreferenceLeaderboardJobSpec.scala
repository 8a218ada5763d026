package graft.etl.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.{HdfsUrl, WarehouseTable}
import graft.ops.Retrieval
import graft.testkit.SparkJobSuiteBase
import graft.time.{DateInterval, Day}

class PreferenceLeaderboardJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)

  /** Deterministic two-day judgment log over three models: A beats B on
    * day 1, C beats B on day 2, A-C splits — the merge law (pair cells ADD
    * across days) is the thing under test. 20 judgments per pair per day
    * so every pair clears the default thin-pair gate. */
  private def logFor(date: DateInterval): DataFrame = {
    val d = if (date == day1) 0 else 1
    val rows = (0 until 20).flatMap { i =>
      Seq(
        ("A", "B", Some(if (i % 4 == d) "B" else "A")),
        ("B", "C", Some(if (i % 3 == 0) "B" else "C")),
        ("A", "C", if (i % 2 == 0) Some("A") else Some("C")))
    }
    rows.toDF("item_a", "item_b", "winner")
  }

  test("warehouse round-trip leaderboard equals the direct single-batch ranking") {
    val root = HdfsUrl(tmpDir("pref_board"))
    val cells = WarehouseTable(root, "cells")
    val board = WarehouseTable(root, "board")
    val job = new PreferenceLeaderboardJob(logFor, day1, cells, board)

    runJob(job, day1).isSuccess shouldBe true
    job.shouldRunForDate(spark, day1) shouldBe false // gated on the board
    runJob(job, day2).isSuccess shouldBe true

    val got = board.load(spark, day2)
      .select("item", "n_opponents", "beats", "pair_ties", "losses",
        "copeland2", "board_rank")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._7)

    // direct batch over the union of both days' raw judgments
    val direct = Retrieval.copelandRank(
      logFor(day1).union(logFor(day2)), Seq.empty, "item_a", "item_b", "winner")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (-t._6, -t._3, t._1))
    got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)).toSeq shouldBe direct.toSeq
    got.map(_._7).toSeq shouldBe (1L to direct.length)

    // A beats both B and C or ties: the board rank order is deterministic
    got.head._1 should not be "B" // B loses to both on merged data
  }

  test("thin pairs accumulate in the store but stay off the board until they clear the bar") {
    val root = HdfsUrl(tmpDir("pref_board_thin"))
    val cells = WarehouseTable(root, "cells")
    val board = WarehouseTable(root, "board")
    // 18 judgments per day on one pair: below the 30-judgment bar on day 1,
    // above it once day 2's cells merge in
    def thinLog(date: DateInterval): DataFrame =
      (0 until 18).map(i => ("X", "Y", Some(if (i % 3 == 0) "Y" else "X")))
        .toDF("item_a", "item_b", "winner")
    val job = new PreferenceLeaderboardJob(thinLog, day1, cells, board)
    runJob(job, day1).isSuccess shouldBe true
    board.load(spark, day1).count() shouldBe 0L // gated: 18 < 30
    runJob(job, day2).isSuccess shouldBe true
    val d2 = board.load(spark, day2)
      .select("item", "copeland2").as[(String, Long)].collect().toMap
    d2("X") shouldBe 2L // 24-12 on 36 merged judgments: X beats Y
    d2("Y") shouldBe 0L
  }
}
