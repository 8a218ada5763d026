package graft.io

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    val facts = spark.range(10000).select($"id".as("k"), (rand(42) * 100).as("x"))
    val dims = spark.range(10000).select($"id".as("k"), concat(lit("v"), $"id").as("label"))
    Bucketing.saveBucketed(facts, "b_facts", 4, Seq("k"))
    Bucketing.saveBucketed(dims, "b_dims", 4, Seq("k"))

    val joined = Bucketing.coLocatedJoin(spark, "b_facts", "b_dims", Seq("k"))
    joined.count() shouldBe 10000

    val plan = joined.queryExecution.executedPlan.toString
    withClue(plan.take(2000)) {
      plan should not include "Exchange hashpartitioning" // bucket-local, no shuffle
      plan should include("SortMergeJoin")
      plan should include("SelectedBucketsCount")
    }
  }

  test("rangeLayout writes files covering disjoint key ranges (footer-prunable)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val df = spark.range(20000).select(
      (($"id" * 7919) % 20000).as("k"), $"id".as("payload")) // scrambled input order
    Bucketing.rangeLayout(df, Seq("k"), numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles().map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    files.length shouldBe 8
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min($"k"), max($"k"))
        .as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    // pairwise disjoint [min, max] spans: every range predicate can skip
    // whole files on footer stats alone
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA < loB, s"overlap in ${ranges.toSeq}")
      case _ =>
    }
    // nothing lost and a point lookup's rows sit in exactly one file
    spark.read.parquet(dir).count() shouldBe 20000
    ranges.count { case (lo, hi) => lo <= 12345 && 12345 <= hi } shouldBe 1
  }

  test("a non-bucketed join of the same data does shuffle (control)") {
    val facts = spark.range(1000).select($"id".as("k"), lit(1.0).as("x"))
    val dims = spark.range(1000).select($"id".as("k"), lit("v").as("label"))
    // defeat the broadcast path so the control case shows the exchange
    val joined = facts.hint("merge").join(dims, Seq("k"))
    joined.queryExecution.executedPlan.toString should include("Exchange hashpartitioning")
  }
}
