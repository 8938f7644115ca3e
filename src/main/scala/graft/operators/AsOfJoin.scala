package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (SURVEY.md §2.2 "As-of join": absent from both the
  * reference and Spark's built-ins; composed from existing operators,
  * preference (a) of the custom-operator ladder).
  *
  * For every left row, attaches the right row with the greatest
  * `ts <= left.ts` for the same key (inclusive, like DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`). Unmatched left rows keep nulls
  * (left-outer semantics).
  *
  * Implementation: tag and union both sides, then one running
  * `last(..., ignoreNulls)` window per payload column. This costs a single
  * shuffle on `key` and streams each partition once — it never materializes
  * the O(left x right) pair space an inequality join would, so it survives
  * arbitrarily long per-key histories. At equal timestamps the right row
  * sorts first (`_side` 0 < 1), giving the inclusive match.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry; appear as `matched_<name>`.
    * @param tiebreak extra right-side ordering columns for determinism when
    *                 several right rows share (key, ts) — the greatest wins.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      tiebreak: Seq[String] = Nil): DataFrame = {
    val rightSchema = right.schema
    def rtype(c: String) = rightSchema(c).dataType

    val matched = payload.map(c => s"matched_$c")
    val leftCols = left.columns.toSeq

    // All payload columns travel in ONE struct that is non-null exactly for
    // right rows: a single last(ignoreNulls) then picks the whole matched
    // row atomically. Per-column last() would skip legitimately-null payload
    // values and could mix columns from different right rows.
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(p, rtype(p))))

    val leftU = left
      .select(
        leftCols.map(col) ++
          Seq(lit(null).cast(payloadStructType).as("_m")) ++
          tiebreak.map(c => lit(null).cast(rtype(c)).as(s"_tb_$c")) :+
          lit(1).as("_side"): _*)
    val rightU = right
      .select(
        leftCols.map {
          case c if c == key || c == ts => col(c)
          case c => lit(null).cast(left.schema(c).dataType).as(c)
        } ++
          Seq(struct(payload.map(col): _*).cast(payloadStructType).as("_m")) ++
          tiebreak.map(c => col(c).as(s"_tb_$c")) :+
          lit(0).as("_side"): _*)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts).asc +: col("_side").asc +: tiebreak.map(c => col(s"_tb_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftU.unionByName(rightU)
      .select(
        leftCols.map(col) ++
          Seq(last(col("_m"), ignoreNulls = true).over(w).as("_m")) :+
          col("_side"): _*)
      .filter(col("_side") === 1)
      .select(
        leftCols.map(col) ++
          payload.zip(matched).map { case (p, m) => col("_m").getField(p).as(m) }: _*)
  }
}
