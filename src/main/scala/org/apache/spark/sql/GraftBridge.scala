package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 removed the public `new Column(expr)` path (Connect refactor);
  * extension libraries adding native Catalyst expressions use a same-package
  * object to reach `classic.ExpressionUtils`. This is the only internal API
  * the library touches.
  */
object GraftBridge {
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def analyzedPlan(df: Dataset[Row]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution.analyzed

  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
