package graft.ops

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
}
