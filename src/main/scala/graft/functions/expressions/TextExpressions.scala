package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression — the canonicalization every text pipeline runs before
  * hashing, deduplication or tokenization (the same page arrives with
  * `é` as one precomposed codepoint from one crawler and as
  * `e` + COMBINING ACUTE from another; unnormalized, exact dedup and
  * every downstream fingerprint treat them as different documents).
  *
  * Spark has no built-in for this, and a Scala UDF would box every row
  * out of Tungsten. (Custom-operator ladder step (b): a scalar
  * `Expression` with `doGenCode`, SURVEY §4.2 — the VecDot pattern.)
  * Codegen and interpreted eval share one static body, so the paths
  * cannot drift (spec pins bit-equality anyway).
  *
  * 100 TB shape: a pure per-row map with an ASCII fast path — all four
  * normalization forms are the identity on pure-ASCII text, which is
  * most bytes of a web corpus, and [[UTF8String.isFullAscii]] answers
  * that with one vectorizable scan of the raw buffer, no String
  * allocation. Non-ASCII rows take a second cheap exit through
  * [[Normalizer.isNormalized]] (already-NFC text — most real-world
  * non-ASCII — allocates one String but never a normalized copy).
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {
  require(UnicodeNormalize.FORMS.contains(formName),
    s"unknown Unicode normalization form: $formName")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val form = Normalizer.Form.valueOf(formName)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // formName is validated against FORMS above, so the interpolation
      // can only name a real enum constant
      s"""${ev.value} = graft.functions.expressions.UnicodeNormalize.normalize(
         |  $c, java.text.Normalizer.Form.$formName);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val FORMS: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Shared eval/codegen body. Returns the INPUT object (no copy, no
    * String round-trip) whenever normalization would be the identity:
    * pure-ASCII buffers (one raw-byte scan), then already-normalized
    * text (Normalizer's quick-check). Only text that actually changes
    * pays for the normalized copy. */
  def normalize(u: UTF8String, form: Normalizer.Form): UTF8String = {
    if (u.isFullAscii) u
    else {
      val s = u.toString
      if (Normalizer.isNormalized(s, form)) u
      else UTF8String.fromString(Normalizer.normalize(s, form))
    }
  }
}
