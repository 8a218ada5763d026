package graft.etl.examples

import org.apache.spark.sql.DataFrame

import graft.io.{HdfsUrl, WarehouseTable}
import graft.testkit.SparkJobSuiteBase
import graft.time.{Day, DateInterval}

class IncrementalNearDedupJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)

  private val story = "the quick brown fox jumps over the lazy dog and runs far away through " +
    "fields of golden wheat while the evening sun sets slowly behind the distant western hills " +
    "casting long warm shadows across the quiet valley where a small river bends gently between " +
    "mossy stones and ancient willows lean low over the clear slow water humming with dragonflies " +
    "while swallows wheel high above the old wooden bridge at dusk and the last light fades"
  private val other = "completely different content describing spark catalyst optimizer rules " +
    "and distributed shuffle joins across many executor nodes in a very large compute cluster"

  private def sourceFor(date: DateInterval): DataFrame = date match {
    case `day1` => Seq(
      (1L, story),
      (2L, story.replace("golden", "silver")), // within-day near-dup of 1
      (3L, other)
    ).toDF("doc_id", "text")
    case _ => Seq(
      (10L, story.replace("quick", "speedy")), // near-dup of day1 doc 1 -> dropped via band store
      (11L, "a brand new poem about oceans tides moons and the slow silver waves of night " +
        "rolling endlessly toward a shore that nobody has ever walked upon before")
    ).toDF("doc_id", "text")
  }

  test("near-duplicates are dropped within and across days via the band store") {
    val root = HdfsUrl(tmpDir("incr_near"))
    val job = new IncrementalNearDedupJob(sourceFor,
      WarehouseTable(root, "clean"), WarehouseTable(root, "bands"))

    runJob(job, day1).isSuccess shouldBe true
    val day1Kept = WarehouseTable(root, "clean").load(spark, day1)
      .select("doc_id").as[Long].collect().sorted
    day1Kept shouldBe Array(1L, 3L) // 2 is a within-day near-dup of 1

    runJob(job, day2).isSuccess shouldBe true
    val day2Kept = WarehouseTable(root, "clean").load(spark, day2)
      .select("doc_id").as[Long].collect().sorted
    day2Kept shouldBe Array(11L) // 10 collides with day1's bands

    job.shouldRunForDate(spark, day2) shouldBe false // idempotent
  }

  test("a rerun after a crash between append_bands and write_clean rewrites the same partition") {
    val root = HdfsUrl(tmpDir("incr_near_rerun"))
    val clean = WarehouseTable(root, "clean")
    val job = new IncrementalNearDedupJob(sourceFor, clean, WarehouseTable(root, "bands"))
    runJob(job, day1).isSuccess shouldBe true

    // simulate: day2 appended its bands, then crashed before write_clean.
    // The rerun must not drop day2's survivors as 'seen' against their own bands.
    runJob(job, day2).isSuccess shouldBe true
    val part = clean.partitionUrl(day2)
    part.fileSystem(spark).delete(part.path, true)
    job.shouldRunForDate(spark, day2) shouldBe true

    runJob(job, day2).isSuccess shouldBe true
    clean.load(spark, day2).select("doc_id").as[Long].collect().sorted shouldBe Array(11L)
  }
}
