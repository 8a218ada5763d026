package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev tool behind PLANS.md: prints the executed-plan shape of each battery
 * query — join strategies, exchange count, nested-loop occurrences, pushed
 * filters — so shuffle/pushdown regressions are visible per round.
 *
 * Usage: runMain graft.PlanAudit [sfDir] [queryName...]
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.all.filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn, _) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan)
          .filterNot(_ == "PushedFilters: []").toSeq.distinct
        println(s"== $name: bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
          s"shj=${n("ShuffledHashJoin")} bnlj=${n("BroadcastNestedLoopJoin")} " +
          s"cartesian=${n("CartesianProduct")} exchange=${n("Exchange hashpartitioning")} " +
          s"rangeExchange=${n("Exchange rangepartitioning")} " +
          s"singleExchange=${n("Exchange SinglePartition")} " +
          s"reused=${n("ReusedExchange")} codegenSpans=${n("WholeStageCodegen")}")
        pushed.foreach(p => println(s"   $p"))
      } catch {
        case e: Throwable => println(s"== $name: PLAN FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
