package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` helpers so graft's custom Catalyst
  * expressions can surface as `Column`s (Spark 4 removed the public
  * `new Column(expr)` constructor in favor of ColumnNode). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
