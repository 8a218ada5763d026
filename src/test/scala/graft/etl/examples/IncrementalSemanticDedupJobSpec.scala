package graft.etl.examples

import org.apache.spark.sql.DataFrame

import graft.io.{HdfsUrl, WarehouseTable}
import graft.testkit.SparkJobSuiteBase
import graft.time.{Day, DateInterval}

class IncrementalSemanticDedupJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)

  // dim-4 embeddings; k=2 centroids seed from day1's two smallest ids
  private def sourceFor(date: DateInterval): DataFrame = date match {
    case `day1` => Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),        // seed centroid 0
      (2L, Seq(0f, 1f, 0f, 0f)),        // seed centroid 1
      (3L, Seq(0.99f, 0.14f, 0f, 0f))   // within-day semantic dup of 1 (cos ~0.99)
    ).toDF("vec_id", "embedding")
    case _ => Seq(
      (10L, Seq(0.98f, 0.2f, 0f, 0f)),  // dup of day1 keeper 1 (cos ~0.98) -> store drop
      (11L, Seq(0f, 0f, 1f, 0f)),       // genuinely new direction -> kept
      (12L, Seq(0f, 0f, 0.99f, 0.1f))   // within-day dup of 11 (cos ~0.995, same cell)
    ).toDF("vec_id", "embedding")
  }

  private def job(root: HdfsUrl) = new IncrementalSemanticDedupJob(sourceFor,
    WarehouseTable(root, "clean"), WarehouseTable(root, "keepers"),
    WarehouseTable(root, "centroids"), k = 2, threshold = 0.95)

  test("semantic dups drop within and across days via the keeper store") {
    val root = HdfsUrl(tmpDir("incr_sem"))
    val j = job(root)

    runJob(j, day1).isSuccess shouldBe true
    WarehouseTable(root, "clean").load(spark, day1)
      .select("vec_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // keepers carry (centroid_id, vec_id, embedding) for exactly the kept rows
    WarehouseTable(root, "keepers").load(spark, day1)
      .select("vec_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    // centroids pinned once, from the day1 seeds
    WarehouseTable(root, "centroids").loadAll(spark).count() shouldBe 2

    runJob(j, day2).isSuccess shouldBe true
    WarehouseTable(root, "clean").load(spark, day2)
      .select("vec_id").as[Long].collect().sorted shouldBe Array(11L)
    // day2's keeper append holds only the survivor
    WarehouseTable(root, "keepers").load(spark, day2)
      .select("vec_id").as[Long].collect().sorted shouldBe Array(11L)

    j.shouldRunForDate(spark, day2) shouldBe false // idempotent
  }

  test("a rerun after a crash between append_keepers and write_clean heals identically") {
    val root = HdfsUrl(tmpDir("incr_sem_rerun"))
    val j = job(root)
    runJob(j, day1).isSuccess shouldBe true
    runJob(j, day2).isSuccess shouldBe true

    // simulate the crash: day2's keepers exist but its clean partition vanished
    val clean = WarehouseTable(root, "clean")
    clean.partitionUrl(day2).fileSystem(spark)
      .delete(clean.partitionUrl(day2).path, true)
    j.shouldRunForDate(spark, day2) shouldBe true

    // rerun must NOT treat day2's docs as 'seen' against their own keepers
    runJob(j, day2).isSuccess shouldBe true
    clean.load(spark, day2).select("vec_id").as[Long].collect().sorted shouldBe Array(11L)
  }
}
