package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` helpers so graft's custom Catalyst
  * expressions can surface as `Column`s (Spark 4 removed the public
  * `new Column(expr)` constructor in favor of ColumnNode). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame straight from an RDD of InternalRows (UnsafeRow-compatible),
    * bypassing the Scala-object encoder entirely — `internalCreateDataFrame`
    * is `private[sql]`. Caller guarantees rows match `schema`. */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
