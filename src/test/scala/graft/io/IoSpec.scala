package graft.io

import org.apache.spark.sql.functions.col

import graft._
import graft.testkit.SparkTestBase
import graft.time.Day

/** HdfsUrl composition + reader/writer/column implicits (reference ImplicitsSpec). */
class IoSpec extends SparkTestBase {
  import spark.implicits._

  test("HdfsUrl composes paths and dates") {
    (HdfsUrl("some/path") / "somewhere" / Day(2016, 8, 28)).toString shouldBe
      "some/path/somewhere/2016-08-28"
    (HdfsUrl("root", dateFormat = Some("'year='yyyy/'month='MM")) / Day(2016, 8, 28)).toString shouldBe
      "root/year=2016/month=08"
  }

  test("HdfsUrl exists + open against the local filesystem") {
    val dir = HdfsUrl(tmpDir("hdfsurl"))
    val file = dir / "marker.txt"
    file.exists(spark) shouldBe false
    file.open(spark)(_.writeBytes("hello"))
    file.exists(spark) shouldBe true
  }

  test("reader and writer implicits round trip parquet through HdfsUrl") {
    val url = HdfsUrl(tmpDir("implicits")) / "nums"
    spark.range(10).toDF("n").write.mode("overwrite").parquet(url)
    spark.read.parquet(url).as[Long].collect().sorted shouldBe (0L until 10L).toArray
  }

  test("Schema.encoder derives product encoders without spark.implicits") {
    val ds = spark.createDataset(Seq(IoSpec.Point(1, "a"), IoSpec.Point(2, "b")))(
      graft.Schema.encoder[IoSpec.Point])
    ds.collect().map(_.x).sorted shouldBe Array(1L, 2L)
  }

  test("column ops: nullify and isDefined") {
    val df = Seq(Some("a"), Some(""), Some("null"), None).toDF("v")
    df.select(col("v").nullify).as[Option[String]].collect().toSet shouldBe
      Set(Some("a"), Some(""), None)
    df.select(col("v").isDefined).as[Option[Boolean]].collect().count(_.contains(true)) shouldBe 1
  }

  test("warehouse dispositions: truncate replaces, append adds, empty refuses") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh")), "t")
    val date = Day(2026, 8, 12)
    table.exists(spark, date) shouldBe false
    table.save(spark.range(5).toDF("n"), date, Warehouse.WriteTruncate)
    table.load(spark, date).count() shouldBe 5
    table.save(spark.range(3).toDF("n"), date, Warehouse.WriteTruncate)
    table.load(spark, date).count() shouldBe 3 // replaced
    table.save(spark.range(2).toDF("n"), date, Warehouse.WriteAppend)
    table.load(spark, date).count() shouldBe 5 // appended
    a[Warehouse.TableExistsException] should be thrownBy
      table.save(spark.range(1).toDF("n"), date, Warehouse.WriteEmpty)
  }

  test("schema evolution: a column added between date partitions survives ranged loads") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_evolve")), "t")
    table.save(Seq((1L, "a")).toDF("id", "v"), Day(2026, 8, 10))
    // day 11 adds `score`; day 12 drops `v`
    table.save(Seq((2L, "b", 9L)).toDF("id", "v", "score"), Day(2026, 8, 11))
    table.save(Seq((3L, 7L)).toDF("id", "score"), Day(2026, 8, 12))
    val all = table.loadBetween(spark, Day(2026, 8, 10), Day(2026, 8, 13))
    all.columns.toSet shouldBe Set("id", "v", "score", "date")
    all.select($"id", $"v", $"score").as[(Long, Option[String], Option[Long])]
      .collect().sortBy(_._1) shouldBe
      Array((1L, Some("a"), None), (2L, Some("b"), Some(9L)), (3L, None, Some(7L)))
  }

  test("schema evolution: mid-partition additive append reads as the union") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_evolve_mid")), "t")
    val date = Day(2026, 8, 12)
    table.save(Seq((1L, "a")).toDF("id", "v"), date)
    table.save(Seq((2L, "b", 5L)).toDF("id", "v", "extra"), date, Warehouse.WriteAppend)
    val out = table.load(spark, date)
    out.columns.toSet shouldBe Set("id", "v", "extra")
    out.select($"id", $"extra").as[(Long, Option[Long])].collect().sortBy(_._1) shouldBe
      Array((1L, None), (2L, Some(5L)))
  }

  test("schema policy: type change on a shared column is rejected under BOTH policies") {
    for (policy <- Seq(Warehouse.SchemaEvolve, Warehouse.SchemaStrict)) {
      val table = WarehouseTable(HdfsUrl(tmpDir(s"wh_flip_$policy")), "t",
        schemaPolicy = policy)
      val date = Day(2026, 8, 12)
      table.save(Seq((1L, 10L)).toDF("id", "v"), date)
      a[Warehouse.SchemaMismatchException] should be thrownBy
        table.save(Seq((2L, "oops")).toDF("id", "v"), date, Warehouse.WriteAppend)
      table.load(spark, date).count() shouldBe 1 // nothing landed
    }
  }

  test("schema policy: SchemaStrict rejects added/omitted columns, SchemaEvolve allows") {
    val date = Day(2026, 8, 12)
    val strict = WarehouseTable(HdfsUrl(tmpDir("wh_strict")), "t",
      schemaPolicy = Warehouse.SchemaStrict)
    strict.save(Seq((1L, "a")).toDF("id", "v"), date)
    a[Warehouse.SchemaMismatchException] should be thrownBy
      strict.save(Seq((2L, "b", 5L)).toDF("id", "v", "extra"), date, Warehouse.WriteAppend)
    a[Warehouse.SchemaMismatchException] should be thrownBy
      strict.save(Seq(Tuple1(2L)).toDF("id"), date, Warehouse.WriteAppend)
    // same-column append is fine, order-insensitive
    strict.save(Seq(("c", 3L)).toDF("v", "id"), date, Warehouse.WriteAppend)
    strict.load(spark, date).count() shouldBe 2
    // the streaming path enforces the same policy
    a[Warehouse.SchemaMismatchException] should be thrownBy
      strict.saveStreamBatch(Seq((9L, "z", 1L)).toDF("id", "v", "extra"), date, 0L)
  }

  test("saveStreamBatch: a replayed batch commits exactly once") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_stream")), "t")
    val date = Day(2026, 8, 12)
    table.saveStreamBatch(spark.range(5).toDF("n"), date, batchId = 0L)
    table.saveStreamBatch(spark.range(3).toDF("n"), date, batchId = 1L)
    table.load(spark, date).count() shouldBe 8 // distinct batches append
    // the at-least-once replay: same batchId again must be a no-op
    table.saveStreamBatch(spark.range(5).toDF("n"), date, batchId = 0L)
    table.saveStreamBatch(spark.range(3).toDF("n"), date, batchId = 1L)
    table.load(spark, date).count() shouldBe 8
  }

  test("saveStreamBatch: runId separates lineages sharing a batchId; replays stay per-lineage") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_stream_runid")), "t")
    val date = Day(2026, 8, 12)
    // two queries (or pre/post checkpoint-reset lineages) both at batch 0:
    // without the namespace the second would no-op on the first's marker
    table.saveStreamBatch(spark.range(5).toDF("n"), date, batchId = 0L, runId = "qa")
    table.saveStreamBatch(spark.range(3).toDF("n"), date, batchId = 0L, runId = "qb")
    table.load(spark, date).count() shouldBe 8
    // replays are still exactly-once WITHIN each lineage
    table.saveStreamBatch(spark.range(5).toDF("n"), date, batchId = 0L, runId = "qa")
    table.saveStreamBatch(spark.range(3).toDF("n"), date, batchId = 0L, runId = "qb")
    table.load(spark, date).count() shouldBe 8
  }

  test("append schema cache: a truncate redefining the schema still fails the next append") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_schema_cache")), "t",
      schemaPolicy = Warehouse.SchemaStrict)
    val date = Day(2026, 8, 12)
    table.save(Seq((1L, "a")).toDF("id", "v"), date)
    // validates and caches the (id long, v string) fingerprint
    table.save(Seq((2L, "b")).toDF("id", "v"), date, Warehouse.WriteAppend)
    // truncate flips v's type — the cached fingerprint must not leak through
    table.save(Seq((1L, 10L)).toDF("id", "v"), date)
    a[Warehouse.SchemaMismatchException] should be thrownBy
      table.save(Seq((2L, "b")).toDF("id", "v"), date, Warehouse.WriteAppend)
    table.load(spark, date).count() shouldBe 1
  }

  test("saveStreamBatch: replay after a partial (uncommitted) write scrubs, no dupes") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_stream_partial")), "t")
    val date = Day(2026, 8, 12)
    table.saveStreamBatch(spark.range(4).toDF("n"), date, batchId = 7L)
    // forge the crash-mid-promote state: strip the marker, leaving the
    // batch's data files behind as uncommitted partials
    val part = new org.apache.hadoop.fs.Path(table.partitionUrl(date).toString)
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(part, "_graft_batch-7"), false) shouldBe true
    // the replay must scrub the stale b7-* files and land the batch once
    table.saveStreamBatch(spark.range(4).toDF("n"), date, batchId = 7L)
    table.load(spark, date).count() shouldBe 4
    table.load(spark, date).as[Long].collect().sorted shouldBe (0L until 4L).toArray
  }

  test("warehouse maxRecordsPerFile caps files; compact merges them back") {
    def dataFiles(table: WarehouseTable, date: graft.time.DateInterval): Int =
      new java.io.File(table.partitionUrl(date).toString)
        .listFiles().count(_.getName.endsWith(".parquet"))
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_files")), "t",
      maxRecordsPerFile = Some(10L))
    val date = Day(2026, 8, 12)
    table.save(spark.range(100).toDF("n").coalesce(1), date)
    dataFiles(table, date) should be >= 10 // 100 rows / 10-row cap
    table.compact(spark, date, targetFiles = 1)
    dataFiles(table, date) shouldBe 1
    table.load(spark, date).agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0) shouldBe 4950L // contents unchanged
  }

  test("hasAnyPartition ignores a _temporary-only skeleton from a crashed first write") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_partial")), "t")
    table.hasAnyPartition(spark) shouldBe false // no root at all
    // simulate a crashed first write: partition dir with only committer scratch
    val scratch = new java.io.File(
      table.partitionUrl(Day(2026, 8, 12)).toString + "/_temporary")
    scratch.mkdirs() shouldBe true
    table.hasAnyPartition(spark) shouldBe false
    table.save(spark.range(3).toDF("n"), Day(2026, 8, 13))
    table.hasAnyPartition(spark) shouldBe true
  }

  test("hasDataForDate probes rows, not paths: an empty-write partition has no data") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_rows")), "t")
    val date = Day(2026, 8, 12)
    table.hasDataForDate(spark, date) shouldBe false // nothing written at all
    // an empty-RESULT write: the partition directory and a zero-row parquet
    // file exist, but downstream consumers would read nothing
    table.save(spark.range(5).toDF("n").filter(col("n") < 0), date)
    table.exists(spark, date) shouldBe true // a write WAS attempted
    table.hasDataForDate(spark, date) shouldBe false // ...but it holds no rows
    table.save(spark.range(2).toDF("n"), date, Warehouse.WriteTruncate)
    table.hasDataForDate(spark, date) shouldBe true
  }

  test("merge upserts by key: updates replace, inserts land, rest survives") {
    import spark.implicits._
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_merge")), "t")
    val date = Day(2026, 8, 12)
    // absent partition: merge degrades to a plain save
    table.merge(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), date, Seq("k"))
    table.load(spark, date).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "a"), (2L, "b"))
    // update k=2, insert k=3; k=1 untouched
    table.merge(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), date, Seq("k"))
    table.load(spark, date).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "a"), (2L, "B"), (3L, "c"))
    // idempotent rerun of the same updates
    table.merge(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), date, Seq("k"))
    table.load(spark, date).count() shouldBe 3
  }

  test("merge heals per-date: one date's interrupted swap survives merges on another") {
    import spark.implicits._
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_merge2")), "t")
    val (dA, dB) = (Day(2026, 8, 11), Day(2026, 8, 12))
    table.merge(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dA, Seq("k"))
    table.merge(Seq((1L, "x")).toDF("k", "v"), dB, Seq("k"))
    // crash window on date A: partition deleted, contents stranded in tmp
    val partA = new java.io.File(table.partitionUrl(dA).toString)
    val tmpA = new java.io.File(
      (table.tableUrl / s".compact-tmp-${table.partitionValue(dA)}").toString)
    partA.renameTo(tmpA) shouldBe true
    // an interleaved merge on date B neither trips over nor "heals" date
    // A's stranded swap (healing is per-partition)
    table.merge(Seq((2L, "y")).toDF("k", "v"), dB, Seq("k"))
    tmpA.exists() shouldBe true
    table.load(spark, dB).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "x"), (2L, "y"))
    // date A's rerun heals FIRST, so the day's updates merge against the
    // pre-crash rows instead of degrading to a truncate of just `updates`
    table.merge(Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), dA, Seq("k"))
    table.load(spark, dA).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "a"), (2L, "B2"), (3L, "c"))
    tmpA.exists() shouldBe false
    // and the rerun of the rerun is a no-op (idempotent)
    table.merge(Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), dA, Seq("k"))
    table.load(spark, dA).count() shouldBe 3
  }

  test("compact heals an interrupted delete-before-rename swap") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_heal")), "t")
    val date = Day(2026, 8, 12)
    table.save(spark.range(20).toDF("n"), date)
    // simulate the crash window: partition deleted, rewrite stranded in tmp
    val part = new java.io.File(table.partitionUrl(date).toString)
    val tmp = new java.io.File((table.tableUrl / s".compact-tmp-${table.partitionValue(date)}").toString)
    part.renameTo(tmp) shouldBe true
    table.compact(spark, date, targetFiles = 1)
    table.load(spark, date).agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0) shouldBe 190L
    tmp.exists() shouldBe false
  }

  test("warehouse CREATE_NEVER requires the table root") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_missing")), "absent")
    a[Warehouse.TableNotFoundException] should be thrownBy
      table.save(spark.range(1).toDF("n"), Day(2026, 8, 12),
        Warehouse.WriteTruncate, Warehouse.CreateNever)
  }

  test("loadAll exposes the date partition column") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_all")), "t")
    table.save(spark.range(2).toDF("n"), Day(2026, 8, 11))
    table.save(spark.range(3).toDF("n"), Day(2026, 8, 12))
    val all = table.loadAll(spark)
    all.count() shouldBe 5
    all.select("date").distinct().as[java.sql.Date].collect().map(_.toString).sorted shouldBe
      Array("2026-08-11", "2026-08-12")
  }

  test("loadBefore reads only partitions strictly before the date") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_before")), "t")
    table.save(spark.range(2).toDF("n"), Day(2026, 8, 11))
    table.save(spark.range(3).toDF("n"), Day(2026, 8, 12))
    table.loadBefore(spark, Day(2026, 8, 12)).count() shouldBe 2
    table.loadBefore(spark, Day(2026, 8, 11)).count() shouldBe 0
    table.loadBefore(spark, Day(2026, 8, 13)).count() shouldBe 5
  }

  test("loadBetween reads the half-open partition range") {
    val table = WarehouseTable(HdfsUrl(tmpDir("wh_between")), "t")
    table.save(spark.range(1).toDF("n"), Day(2026, 8, 10))
    table.save(spark.range(2).toDF("n"), Day(2026, 8, 11))
    table.save(spark.range(4).toDF("n"), Day(2026, 8, 12))
    table.loadBetween(spark, Day(2026, 8, 11), Day(2026, 8, 12)).count() shouldBe 2
    table.loadBetween(spark, Day(2026, 8, 10), Day(2026, 8, 13)).count() shouldBe 7
    table.loadBetween(spark, Day(2026, 8, 12), Day(2026, 8, 12)).count() shouldBe 0
  }
}

object IoSpec {
  case class Point(x: Long, label: String)
}
