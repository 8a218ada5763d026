package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  test("withRunningTotal equals the one-window definition under any partitioning") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map(i => (i.toLong, rnd.nextInt(11).toLong - 5))
    val naive = {
      var acc = 0L
      rows.sortBy(_._1).map { case (id, v) => acc += v; (id, acc) }.toMap
    }
    for (parts <- Seq(1, 4, 17)) {
      val df = rows.toDF("id", "v").repartition(parts)
      val out = Intervals.withRunningTotal(df, "total", "v", col("id"))
        .select($"id", $"total").as[(Long, Long)].collect().toMap
      withClue(s"parts=$parts") { out shouldBe naive }
    }
  }

  test("concurrency: overlapping intervals count, exclusive ends hand over cleanly") {
    // [0,10) [5,15): overlap 5..10 -> active 2; [15,20) starts exactly when
    // the second ends -> never 2 concurrent with it
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 15L), (3L, 15L, 20L))
      .toDF("id", "s", "e")
    val out = Intervals.concurrency(iv, "s", "e", "id")
      .select($"ts", $"delta", $"active").as[(Long, Long, Long)].collect().toSet
    out shouldBe Set(
      (0L, 1L, 1L), (5L, 1L, 2L), (10L, -1L, 1L),
      (15L, -1L, 0L), (15L, 1L, 1L), (20L, -1L, 0L))
    out.map(_._3).max shouldBe 2L
  }

  test("concurrency profile starts and ends at zero and never dips negative") {
    val rnd = new scala.util.Random(9)
    val iv = (1 to 200).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(100))
    }.toDF("id", "s", "e")
    val prof = Intervals.concurrency(iv, "s", "e", "id")
      .orderBy($"ts", $"delta", $"id").select($"active").as[Long].collect()
    prof.last shouldBe 0L
    prof.min should be >= 0L
    // cross-check the peak against a brute-force point census
    val rows = iv.as[(Long, Long, Long)].collect()
    val brute = (0L to 1101L).map(t => rows.count(r => r._2 <= t && t < r._3)).max
    prof.max shouldBe brute.toLong
  }
}
