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
}
