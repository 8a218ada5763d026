package graft.etl.examples

import org.apache.spark.sql.DataFrame

import graft.io.{HdfsUrl, WarehouseTable}
import graft.ops.Snapshots
import graft.testkit.SparkJobSuiteBase
import graft.time.{DateInterval, Day}

class DimensionHistoryJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)
  private val day3 = Day(2026, 8, 13) // calendar gap: the 12th never ran

  private def snapFor(date: DateInterval): DataFrame = date match {
    case `day1` => Seq((1L, "alice", "fr"), (2L, "bob", "de")).toDF("id", "name", "country")
    case `day2` => Seq((1L, "alice", "ch"), (2L, "bob", "de"), (3L, "carol", "us"))
      .toDF("id", "name", "country") // alice moves, carol arrives
    case _ => Seq((1L, "alice", "ch"), (3L, "carol", "us"))
      .toDF("id", "name", "country") // bob vanishes
  }

  private def mk(name: String) =
    WarehouseTable(HdfsUrl(tmpDir(name)), "dim_history")

  private def rows(df: DataFrame) =
    df.select("id", "name", "country", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, String, String, Option[String], Long, Boolean)]
      .collect().toSet

  test("first day opens version 1 for every key from the empty seed") {
    val store = mk("dimhist1")
    val job = new DimensionHistoryJob(snapFor, store, "id", Seq("name", "country"))
    runJob(job, day1).isSuccess shouldBe true
    rows(store.load(spark, day1)) shouldBe Set(
      (1L, "alice", "fr", day1.toString, None, 1L, true),
      (2L, "bob", "de", day1.toString, None, 1L, true))
  }

  test("changes version, arrivals open, vanished keys close; gaps walk back") {
    val store = mk("dimhist2")
    val job = new DimensionHistoryJob(snapFor, store, "id", Seq("name", "country"))
    runJob(job, day1).isSuccess shouldBe true
    runJob(job, day2).isSuccess shouldBe true
    rows(store.load(spark, day2)) shouldBe Set(
      (1L, "alice", "fr", day1.toString, Some(day2.toString), 1L, false),
      (1L, "alice", "ch", day2.toString, None, 2L, true),
      (2L, "bob", "de", day1.toString, None, 1L, true),
      (3L, "carol", "us", day2.toString, None, 1L, true))

    // day3 reads day2's partition across the calendar gap; bob closes
    runJob(job, day3).isSuccess shouldBe true
    val d3 = rows(store.load(spark, day3))
    d3 should contain((2L, "bob", "de", day1.toString, Some(day3.toString), 1L, false))
    d3.count(_._7) shouldBe 2 // alice v2 + carol stay current
    d3.size shouldBe 4
  }

  test("rerun is a no-op gate; a crashed partition rebuilds from the previous day") {
    val store = mk("dimhist3")
    val job = new DimensionHistoryJob(snapFor, store, "id", Seq("name", "country"))
    runJob(job, day1).isSuccess shouldBe true
    runJob(job, day2).isSuccess shouldBe true
    val before = rows(store.load(spark, day2))

    job.shouldRunForDate(spark, day2) shouldBe false // exists-gate

    // simulate a crash that lost day2's partition: rerun rebuilds it
    // bit-identically from day1's untouched partition
    val part = store.partitionUrl(day2)
    part.fileSystem(spark).delete(part.path, true)
    job.shouldRunForDate(spark, day2) shouldBe true
    runJob(job, day2).isSuccess shouldBe true
    rows(store.load(spark, day2)) shouldBe before
  }

  test("job history matches a direct scd2Apply fold of the same snapshots") {
    val store = mk("dimhist4")
    val job = new DimensionHistoryJob(snapFor, store, "id", Seq("name", "country"))
    Seq(day1, day2, day3).foreach(d => runJob(job, d).isSuccess shouldBe true)
    val direct = Seq(day1, day2, day3).foldLeft(
      snapFor(day1).select($"id", $"name", $"country").limit(0)
        .withColumn("valid_from", org.apache.spark.sql.functions.lit(null).cast("string"))
        .withColumn("valid_to", org.apache.spark.sql.functions.lit(null).cast("string"))
        .withColumn("version", org.apache.spark.sql.functions.lit(null).cast("long"))
        .withColumn("is_current", org.apache.spark.sql.functions.lit(null).cast("boolean"))) {
      (dim, d) =>
        Snapshots.scd2Apply(dim, snapFor(d), "id", Seq("name", "country"),
          asOf = org.apache.spark.sql.functions.lit(d.toString), closeMissing = true)
    }
    rows(store.load(spark, day3)) shouldBe rows(direct)
  }
}
