package graft.ops

import org.apache.spark.sql.functions.lit

import graft.testkit.SparkTestBase

class SnapshotsSpec extends SparkTestBase {
  import spark.implicits._

  test("diff classifies added, removed, changed and unchanged keys") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "fp")
    val cur = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "fp")
    val out = Snapshots.diff(old, cur, "id", "fp")
      .as[(Long, String)].collect().toSet
    out shouldBe Set(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added"))
  }

  test("diffCounts rolls the diff up per status") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("id", "fp")
    val cur = Seq((2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "fp")
    val out = Snapshots.diffCounts(old, cur, "id", "fp")
      .as[(String, Long)].collect().toMap
    out shouldBe Map("removed" -> 1L, "unchanged" -> 1L, "added" -> 2L)
  }

  test("null fingerprints mean changed/unchanged, never phantom added/removed") {
    val old = Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("id", "fp")
    val cur = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("id", "fp")
    Snapshots.diff(old, cur, "id", "fp").as[(Long, String)].collect().toSet shouldBe Set(
      (1L, "changed"),   // fp -> null is a content change, not a removal
      (2L, "unchanged"), // null on both sides
      (3L, "changed"))
  }

  test("identical snapshots are all unchanged; disjoint ones all added/removed") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "fp")
    Snapshots.diff(a, a, "id", "fp").as[(Long, String)].collect()
      .map(_._2).toSet shouldBe Set("unchanged")
    val b = Seq((3L, "z")).toDF("id", "fp")
    Snapshots.diffCounts(a, b, "id", "fp").as[(String, Long)].collect().toMap shouldBe
      Map("removed" -> 2L, "added" -> 1L)
  }

  // ---- SCD Type-2 ------------------------------------------------------

  private def history(rows: (Long, String, Long, Long)*) =
    rows.toDF("key", "attr", "ts", "tie")

  test("scd2FromChangeLog collapses runs into versioned intervals") {
    val log = history(
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, "b", 40L, 4L), (1L, "a", 50L, 5L),
      (2L, "x", 15L, 6L))
    val out = Snapshots.scd2FromChangeLog(log, "key", Seq("attr"), "ts", Seq("tie"))
      .select("key", "attr", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSet
    out shouldBe Set(
      (1L, "a", 10L, Some(30L), 1L, false),
      (1L, "b", 30L, Some(50L), 2L, false),
      (1L, "a", 50L, None, 3L, true),
      (2L, "x", 15L, None, 1L, true))
  }

  test("scd2FromChangeLog breaks timestamp ties deterministically by the tiebreaker") {
    val log = history((1L, "a", 10L, 2L), (1L, "b", 10L, 1L))
    val out = Snapshots.scd2FromChangeLog(log, "key", Seq("attr"), "ts", Seq("tie"))
      .select("attr", "version").as[(String, Long)].collect().toSet
    // tie=1 ("b") sorts first, so "b" is version 1 regardless of input order
    out shouldBe Set(("b", 1L), ("a", 2L))
  }

  test("scd2FromChangeLog treats null attributes as equal runs, not new versions") {
    val log = Seq((1L, Option.empty[String], 10L), (1L, Option.empty[String], 20L),
      (1L, Option("a"), 30L)).toDF("key", "attr", "ts")
    val out = Snapshots.scd2FromChangeLog(log, "key", Seq("attr"), "ts")
      .select("version").as[Long].collect().sorted
    out shouldBe Array(1L, 2L)
  }

  test("scd2Apply closes changed keys, inserts new ones, leaves history untouched") {
    val dim = Seq(
      (1L, "a", 10L, Option(30L), 1L, false),  // closed history
      (1L, "b", 30L, Option.empty[Long], 2L, true),
      (2L, "x", 15L, Option.empty[Long], 1L, true),
      (3L, "z", 12L, Option.empty[Long], 1L, true))
      .toDF("key", "attr", "valid_from", "valid_to", "version", "is_current")
    val snapshot = Seq(
      (1L, "c"),  // changed: close v2, open v3
      (2L, "x"),  // unchanged
      (4L, "w"))  // new key
      .toDF("key", "attr")
    val out = Snapshots.scd2Apply(dim, snapshot, "key", Seq("attr"), lit(100L))
      .select("key", "attr", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSet
    out shouldBe Set(
      (1L, "a", 10L, Some(30L), 1L, false),
      (1L, "b", 30L, Some(100L), 2L, false),
      (1L, "c", 100L, None, 3L, true),
      (2L, "x", 15L, None, 1L, true),
      (3L, "z", 12L, None, 1L, true),   // missing but closeMissing=false
      (4L, "w", 100L, None, 1L, true))
  }

  test("scd2Apply with closeMissing tombstones keys absent from the snapshot") {
    val dim = Seq((3L, "z", 12L, Option.empty[Long], 1L, true))
      .toDF("key", "attr", "valid_from", "valid_to", "version", "is_current")
    val snapshot = Seq.empty[(Long, String)].toDF("key", "attr")
    val out = Snapshots.scd2Apply(dim, snapshot, "key", Seq("attr"), lit(100L),
        closeMissing = true)
      .select("key", "attr", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSet
    out shouldBe Set((3L, "z", 12L, Some(100L), 1L, false))
  }

  test("scd2Apply is idempotent: re-applying the same snapshot changes nothing") {
    val dim = Seq((1L, "b", 30L, Option.empty[Long], 2L, true))
      .toDF("key", "attr", "valid_from", "valid_to", "version", "is_current")
    val snapshot = Seq((1L, "b")).toDF("key", "attr")
    val once = Snapshots.scd2Apply(dim, snapshot, "key", Seq("attr"), lit(100L))
    val twice = Snapshots.scd2Apply(once, snapshot, "key", Seq("attr"), lit(100L))
      .select("key", "attr", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSet
    twice shouldBe Set((1L, "b", 30L, None, 2L, true))
  }
}
