package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` helpers so graft's custom Catalyst
  * expressions can surface as `Column`s (Spark 4 removed the public
  * `new Column(expr)` constructor in favor of ColumnNode). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply an extensions object's injected functions to a LIVE session's
    * registry — the same `registerFunctions` call Spark makes when it
    * instantiates `spark.sql.extensions` at session build
    * (`BaseSessionStateBuilder.functionRegistry`), exposed so specs can
    * exercise the extension end-to-end without tearing down the shared
    * test session. */
  def applyExtensionFunctions(
      ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)

  /** DataFrame straight from an RDD of InternalRows (UnsafeRow-compatible),
    * bypassing the Scala-object encoder entirely — `internalCreateDataFrame`
    * is `private[sql]`. Caller guarantees rows match `schema`. */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
