package graft.etl.examples

import org.apache.spark.sql.DataFrame

import graft.io.{HdfsUrl, WarehouseTable}
import graft.testkit.SparkJobSuiteBase
import graft.time.{Day, DateInterval}

class IncrementalUrlDedupJobSpec extends SparkJobSuiteBase {
  import spark.implicits._

  private val day1 = Day(2026, 8, 10)
  private val day2 = Day(2026, 8, 11)

  private def sourceFor(date: DateInterval): DataFrame = date match {
    case `day1` => Seq(
      (1L, "http://x.com/a", "first crawl of a"),
      (2L, "HTTP://X.com:80/a?utm_source=s", "recrawl of a, same day"), // within-day dup of 1
      (3L, "http://y.org/b", "page b"),
      (4L, null.asInstanceOf[String], "no url, day 1")
    ).toDF("doc_id", "url", "text")
    case _ => Seq(
      (10L, "x.com/a#frag", "recrawl of a, next day"), // cross-day dup of 1
      (11L, "http://z.net/c", "page c"),
      (12L, "http://z.net/c?utm_id=9", "recrawl of c, same day"), // within-day dup of 11
      (13L, null.asInstanceOf[String], "no url, day 2")
    ).toDF("doc_id", "url", "text")
  }

  test("dedups by canonical URL within each day and across days via the store") {
    val root = HdfsUrl(tmpDir("incr_url_dedup"))
    val job = new IncrementalUrlDedupJob(sourceFor,
      WarehouseTable(root, "clean"), WarehouseTable(root, "urls"))

    runJob(job, day1).isSuccess shouldBe true
    WarehouseTable(root, "clean").load(spark, day1)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L, 4L)

    runJob(job, day2).isSuccess shouldBe true
    // 10 seen on day1, 12 within-day dup of 11, null-URL 13 passes
    WarehouseTable(root, "clean").load(spark, day2)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(11L, 13L)

    // the store accumulates canonical forms only, never nulls
    val stored = WarehouseTable(root, "urls").loadAll(spark)
      .select("canon_url").as[String].collect().toSet
    stored shouldBe Set("http://x.com/a", "http://y.org/b", "http://z.net/c")

    // idempotence gate
    job.shouldRunForDate(spark, day2) shouldBe false
  }

  test("a rerun after a crash between the two sinks rewrites the same partition") {
    val root = HdfsUrl(tmpDir("incr_url_rerun"))
    val clean = WarehouseTable(root, "clean")
    val job = new IncrementalUrlDedupJob(sourceFor, clean, WarehouseTable(root, "urls"))
    runJob(job, day1).isSuccess shouldBe true

    // simulate: day2 wrote its URLs, then crashed before write_clean — the
    // rerun must not anti-join day2's pages against their own stored URLs
    WarehouseTable(root, "urls").save(
      Seq("http://z.net/c").toDF("canon_url"), day2, graft.io.Warehouse.WriteTruncate)
    runJob(job, day2).isSuccess shouldBe true
    clean.load(spark, day2).select("doc_id").as[Long].collect().sorted shouldBe
      Array(11L, 13L)
  }
}
