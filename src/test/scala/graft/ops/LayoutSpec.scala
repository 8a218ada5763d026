package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Morton interleave of two already-bucketed values. */
  private def morton(b0: Long, b1: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((b0 >> i) & 1L) << (2 * i + 1)) | (((b1 >> i) & 1L) << (2 * i))
    }

  test("zOrderKey equals the naive rank/bucket/interleave definition") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "a", "b").repartition(7)
    val out = Layout.zOrderKey(df, Seq("a", "b"), bits = 4, tie = Seq(col("id")))
      .select($"id", $"z_key").as[(Long, Long)].collect().toMap

    val n = rows.size
    val r0 = rows.sortBy(r => (r._2, r._1)).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val r1 = rows.sortBy(r => (r._3, r._1)).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val expected = rows.map { case (id, _, _) =>
      id -> morton((r0(id) - 1) * 16 / n, (r1(id) - 1) * 16 / n, 4)
    }.toMap
    out shouldBe expected
  }

  test("zOrderKey buckets are equi-depth regardless of value skew") {
    // heavily skewed column: 90% zeros — rank-based cells still split evenly
    val rows = (1L to 400L).map(i => (i, if (i <= 360) 0L else i, i))
    val df = rows.toDF("id", "a", "b")
    val keyed = Layout.zOrderKey(df, Seq("a"), bits = 2, tie = Seq(col("id")))
    // one dimension, 4 cells: the key IS the bucket; each holds n/4 rows
    val sizes = keyed.groupBy($"z_key").count().as[(Long, Long)].collect().toMap
    sizes shouldBe Map(0L -> 100L, 1L -> 100L, 2L -> 100L, 3L -> 100L)
  }

  test("zOrderKey is deterministic under any input partitioning") {
    val rows = (1L to 200L).map(i => (i, i % 13, i % 7))
    val expected = Layout.zOrderKey(rows.toDF("id", "a", "b").repartition(1),
      Seq("a", "b"), bits = 5, tie = Seq(col("id")))
      .select($"id", $"z_key").as[(Long, Long)].collect().toMap
    for (parts <- Seq(3, 17)) {
      val got = Layout.zOrderKey(rows.toDF("id", "a", "b").repartition(parts),
        Seq("a", "b"), bits = 5, tie = Seq(col("id")))
        .select($"id", $"z_key").as[(Long, Long)].collect().toMap
      withClue(s"parts=$parts") { got shouldBe expected }
    }
  }

  test("repartitionByZOrder keeps every row exactly once") {
    val rows = (1L to 500L).map(i => (i, i % 23, i % 31))
    val out = Layout.repartitionByZOrder(rows.toDF("id", "a", "b"),
      Seq("a", "b"), bits = 6, numPartitions = 8, tie = Seq(col("id")))
    out.select($"id").as[Long].collect().sorted shouldBe (1L to 500L).toArray
    out.rdd.getNumPartitions shouldBe 8
  }

  test("zOrderKey rejects keys that cannot fit a long") {
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(Seq((1L, 2L)).toDF("a", "b"), Seq("a", "b"), bits = 32)
    }
  }
}
