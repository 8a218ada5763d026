package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private def left = (1L to 200L).map(i => (i, s"key_$i")).toDF("id", "k")
  private def right = (1L to 200L by 3).map(i => s"key_$i").toDF("k")

  test("mightContain has no false negatives") {
    val bf = Bloom.bloomFilterOf(right, "k")
    val missed = right.filter(!Bloom.mightContain(bf, $"k")).count()
    missed shouldBe 0L
  }

  test("bloom anti join equals the plain anti join") {
    val plain = left.join(right, Seq("k"), "left_anti").select("id").as[Long].collect().sorted
    val bloomed = Bloom.antiJoinWithBloom(left, right, "k").select("id").as[Long].collect().sorted
    bloomed shouldBe plain
    plain.length shouldBe 133 // 200 - 67 store keys
  }

  test("empty store passes everything through") {
    val empty = right.filter(lit(false))
    Bloom.antiJoinWithBloom(left, empty, "k").count() shouldBe 200L
  }

  test("bloom anti join equals plain anti join on seeded random key sets") {
    for (seed <- Seq(3, 17, 81)) {
      val rnd = new scala.util.Random(seed)
      val l = Seq.fill(300)(rnd.nextInt(500)).distinct.map(i => (i.toLong, s"k$i"))
        .toDF("id", "k")
      val r = Seq.fill(150)(rnd.nextInt(500)).distinct.map(i => s"k$i").toDF("k")
      val plain = l.join(r, Seq("k"), "left_anti").select("id").as[Long].collect().sorted
      val bloomed = Bloom.antiJoinWithBloom(l, r, "k").select("id").as[Long].collect().sorted
      withClue(s"seed=$seed") { bloomed shouldBe plain }
    }
  }

  test("the definitely-new path skips the join: most rows avoid the shuffle") {
    // with a disjoint store, every left row short-circuits on the bitmap
    val disjoint = (1000L to 1100L).map(i => s"key_$i").toDF("k")
    val out = Bloom.antiJoinWithBloom(left, disjoint, "k")
    out.count() shouldBe 200L
  }

  test("a caller's own __graft_maybe column survives into the result") {
    val l = Seq(("a", 1), ("b", 2)).toDF("k", "__graft_maybe0")
    val r = Seq("b").toDF("k")
    val out = Bloom.antiJoinWithBloom(l, r, "k")
    out.columns.toSet shouldBe Set("k", "__graft_maybe0")
    out.select("k", "__graft_maybe0").as[(String, Int)].collect().toSet shouldBe
      Set(("a", 1))
  }
}
