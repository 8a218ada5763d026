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

  test("a non-bucketed join of the same data does shuffle (control)") {
    val facts = spark.range(1000).select($"id".as("k"), lit(1.0).as("x"))
    val dims = spark.range(1000).select($"id".as("k"), lit("v").as("label"))
    // defeat the broadcast path so the control case shows the exchange
    val joined = facts.hint("merge").join(dims, Seq("k"))
    joined.queryExecution.executedPlan.toString should include("Exchange hashpartitioning")
  }
}
