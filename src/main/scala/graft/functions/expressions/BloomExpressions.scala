package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership test of a long key against a driver-built
  * `org.apache.spark.util.sketch.BloomFilter` (public Spark sketch API),
  * as a codegen'd scalar expression.
  *
  * This is the pre-join pruning primitive for the regime BETWEEN broadcast
  * join and full shuffle join: when the build side is too large to
  * broadcast-hash-join but its KEY SET fits a few MB of bloom bits, the
  * probe side filters map-side BEFORE its shuffle, so only rows that can
  * possibly match ever hit the exchange. False positives survive the
  * filter but die in the exact join that follows — output equality with
  * the unpruned join is guaranteed by construction (and oracle-checked in
  * q95). The filter rides the generated class as a reference object
  * ([[CentroidTopK]]'s pattern), so bit-array size never grows the
  * expression tree.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got ${t.sql}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bf = ctx.addReferenceObj("bloom", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExpressions {
  /** Codegen'd bloom membership test of a key column (cast to long). */
  def mightContain(key: Column, filter: BloomFilter): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(key.cast("long")), filter))
}
