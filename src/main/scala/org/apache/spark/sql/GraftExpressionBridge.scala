package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge between graft's custom Catalyst expressions and the public Column
 * API. Spark 4 moved Column construction behind `private[sql]`
 * (`classic.ExpressionUtils`), so extension libraries provide this shim in
 * the `org.apache.spark.sql` package — the standard pattern for libraries
 * that ship native expressions.
 */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame — for embedding one as a scalar subquery. */
  def analyzedPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
