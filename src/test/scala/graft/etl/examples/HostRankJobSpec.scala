package graft.etl.examples

import org.apache.spark.sql.DataFrame

import graft.io.{HdfsUrl, WarehouseTable}
import graft.ops.Graphs
import graft.testkit.SparkJobSuiteBase
import graft.time.{Day, DateInterval}

class HostRankJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)

  private def linksFor(date: DateInterval): DataFrame = date match {
    case `day1` => Seq(
      ("a.com", "hub.com"), ("b.com", "hub.com"), ("hub.com", "a.com"),
      ("a.com", "hub.com") // duplicate observation, must not double-store
    ).toDF("src", "dst")
    case _ => Seq(
      ("a.com", "hub.com"),   // already known: must NOT re-append
      ("c.com", "riser.com"), // new edges: riser.com enters the graph
      ("b.com", "riser.com"),
      ("hub.com", "riser.com")
    ).toDF("src", "dst")
  }

  private def mk(name: String) = {
    val root = HdfsUrl(tmpDir(name))
    (WarehouseTable(root, "edges"), WarehouseTable(root, "ranks"),
      WarehouseTable(root, "reports"))
  }

  test("accumulates distinct edges, snapshots ranks, reports movers") {
    val (edges, ranks, reports) = mk("hostrank")
    val job = new HostRankJob(linksFor, edges, ranks, reports, k = 5)

    runJob(job, day1).isSuccess shouldBe true
    edges.load(spark, day1).count() shouldBe 3L // dup observation collapsed
    ranks.hasDataForDate(spark, day1) shouldBe true
    reports.exists(spark, day1) shouldBe true
    reports.hasDataForDate(spark, day1) shouldBe false // first day: empty report

    runJob(job, day2).isSuccess shouldBe true
    // only the three never-seen edges append
    edges.load(spark, day2).as[(String, String)].collect().toSet shouldBe Set(
      ("c.com", "riser.com"), ("b.com", "riser.com"), ("hub.com", "riser.com"))

    // day-2 ranks equal a direct pageRank over the full accumulated graph
    val expected = Graphs.pageRank(
      linksFor(day1).union(linksFor(day2)).distinct())
      .as[(String, Long)].collect().toSet
    ranks.load(spark, day2).as[(String, Long)].collect().toSet shouldBe expected

    // movers: riser.com arrives (rank_prev 0, big positive delta)
    val report = reports.load(spark, day2)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    report("riser.com")._2 shouldBe 0L
    report("riser.com")._4 should be > 0L
    // every graph member appears (5 hosts <= k)
    report.keySet shouldBe Set("a.com", "b.com", "c.com", "hub.com", "riser.com")
  }

  test("reruns are gated and crash reruns rebuild the same partitions") {
    val (edges, ranks, reports) = mk("hostrank_rerun")
    val job = new HostRankJob(linksFor, edges, ranks, reports)
    runJob(job, day1).isSuccess shouldBe true
    job.shouldRunForDate(spark, day1) shouldBe false

    // simulate a crash after the edge write but before the report: drop
    // the report partition and rerun — the edge anti-join reads strictly
    // EARLIER partitions, so the rerun rewrites day1 identically
    val u = reports.partitionUrl(day1)
    u.fileSystem(spark).delete(u.path, true)
    job.shouldRunForDate(spark, day1) shouldBe true
    runJob(job, day1).isSuccess shouldBe true
    edges.load(spark, day1).count() shouldBe 3L // not emptied by self-anti-join
    ranks.hasDataForDate(spark, day1) shouldBe true
  }
}
