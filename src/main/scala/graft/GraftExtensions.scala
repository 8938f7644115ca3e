package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.VecDot

/** Cluster deployment entry point: `--conf spark.sql.extensions=
  * graft.GraftExtensions` makes graft's native SQL functions available in
  * every session of the application — no driver-side `register(spark)`
  * call, works from pure-SQL clients (thrift server, SQL notebooks).
  * Spark instantiates this class reflectively by name (the standard
  * `SparkSessionExtensions` contract), so it must stay a public no-arg
  * class, not an object. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[VecDot].getName,
        null,
        "vec_dot",
        "vec_dot(a, b) - dot product of two array<double> vectors (codegen'd primitive loop)",
        ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
        VecDot(exprs.head, exprs(1))
      }))
  }
}
