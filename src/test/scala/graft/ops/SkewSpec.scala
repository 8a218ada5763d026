package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  /** 10k rows on one hot key, a handful elsewhere. */
  private def skewed = spark.range(10100)
    .select(when($"id" < 10000, "hot").otherwise(concat(lit("k"), $"id" % 10)).as("k"),
      lit(1.0).as("v"))

  test("saltedAgg matches the plain aggregation") {
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Skew.saltedAgg(skewed, Seq("k"), n = 8)(
      "n" -> (count(lit(1)), cs => sum(cs)),
      "total" -> (sum($"v"), cs => sum(cs)))
      .as[(String, Long, Double)].collect().toSet
    salted shouldBe plain
  }

  test("skewProfile surfaces the hot key with exact count and ppm share") {
    val top = Skew.skewProfile(skewed, "k", k = 3)
      .as[(String, Long, Long)].collect()
    top.head shouldBe (("hot", 10000L, 990099L)) // 10000 * 1e6 DIV 10100
    top should have size 3
    // the cold keys tie at 10 rows each: (n desc, key asc) breaks the tie
    top(1)._1 shouldBe "k0"
    top(2)._1 shouldBe "k1"
    // partitioning-invariant (pure function of the data)
    Skew.skewProfile(skewed.repartition(13), "k", k = 3)
      .as[(String, Long, Long)].collect() shouldBe top
  }

  test("saltedJoin matches the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k5", "B")).toDF("k", "label")
    val plain = skewed.join(dim, "k").groupBy("k", "label").count()
      .as[(String, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", n = 4).groupBy("k", "label").count()
      .as[(String, String, Long)].collect().toSet
    salted shouldBe plain
  }

  test("salt spreads a hot key across buckets") {
    val buckets = skewed.filter($"k" === "hot")
      .withColumn("s", Skew.salt(8)).select("s").distinct().count()
    buckets should be > 4L
  }
}
