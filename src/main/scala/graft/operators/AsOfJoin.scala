package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of joins (SURVEY.md §2.2 "As-of join": absent from both the
  * reference and Spark's built-ins; composed from existing operators,
  * preference (a) of the custom-operator ladder).
  *
  * Three directions over the same single-shuffle shape:
  *   - [[backward]]: greatest right `ts <= left.ts` (inclusive — DuckDB's
  *     `ASOF JOIN ... ON l.ts >= r.ts`, q23's oracle);
  *   - [[forward]]: smallest right `ts >= left.ts` (inclusive);
  *   - [[nearest]]: whichever of the two is closer, ties to backward.
  *
  * Implementation: tag and union both sides, then running
  * `last/first(..., ignoreNulls)` windows per direction. This costs ONE
  * shuffle on `key` and streams each partition once — it never
  * materializes the O(left x right) pair space an inequality join would,
  * so it survives arbitrarily long per-key histories. All payload columns
  * travel in one struct that is non-null exactly for right rows, so a
  * single window picks the whole matched row atomically (per-column
  * windows could mix columns from different right rows when payload
  * values are legitimately null).
  */
object AsOfJoin {

  /** The tagged union both directions run over: left columns + `_m`
    * (right payload struct, ts included for gap math) + tiebreak echoes +
    * `_side`. Right rows carry `_side = 0`. */
  private def tagged(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tiebreak: Seq[String]): (DataFrame, StructType) = {
    val rightSchema = right.schema
    def rtype(c: String) = rightSchema(c).dataType
    val leftCols = left.columns.toSeq
    val structCols = (payload :+ ts).distinct
    val payloadStructType = StructType(
      structCols.map(p => StructField(p, rtype(p))))
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
          Seq(struct(structCols.map(col): _*).cast(payloadStructType).as("_m")) ++
          tiebreak.map(c => col(c).as(s"_tb_$c")) :+
          lit(0).as("_side"): _*)
    (leftU.unionByName(rightU), payloadStructType)
  }

  private def extract(leftCols: Seq[String], payload: Seq[String],
      m: Column): Seq[Column] =
    leftCols.map(col) ++ payload.map(p => m.getField(p).as(s"matched_$p"))

  /** Greatest right `ts <= left.ts` per key (inclusive). Unmatched left
    * rows keep nulls (left-outer semantics).
    *
    * @param payload right-side columns to carry; appear as `matched_<name>`.
    * @param tiebreak extra right-side ordering columns for determinism when
    *                 several right rows share (key, ts) — the greatest wins.
    */
  def backward(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tiebreak: Seq[String] = Nil): DataFrame = {
    val (u, _) = tagged(left, right, key, ts, payload, tiebreak)
    // right rows sort before left at equal ts (_side 0 < 1) => inclusive
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc +: col("_side").asc +:
        tiebreak.map(c => col(s"_tb_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.toSeq
    u.select(leftCols.map(col) ++
        Seq(last(col("_m"), ignoreNulls = true).over(w).as("_m")) :+
        col("_side"): _*)
      .filter(col("_side") === 1)
      .select(extract(leftCols, payload, col("_m")): _*)
  }

  /** Smallest right `ts >= left.ts` per key (inclusive) — the mirror of
    * [[backward]]: left rows sort before right at equal ts (_side desc)
    * so the following-window sees the equal-ts match; among right rows
    * sharing (key, ts) the SMALLEST tiebreak wins (mirror-symmetric of
    * backward's greatest). */
  def forward(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tiebreak: Seq[String] = Nil): DataFrame = {
    val (u, _) = tagged(left, right, key, ts, payload, tiebreak)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc +: col("_side").desc +:
        tiebreak.map(c => col(s"_tb_$c").asc): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val leftCols = left.columns.toSeq
    u.select(leftCols.map(col) ++
        Seq(first(col("_m"), ignoreNulls = true).over(w).as("_m")) :+
        col("_side"): _*)
      .filter(col("_side") === 1)
      .select(extract(leftCols, payload, col("_m")): _*)
  }

  /** The closer of backward/forward per left row; equal gaps (including
    * an exact-ts match, gap 0 backward) resolve to backward. Both
    * directions run as two windows over ONE sorted union — still a single
    * shuffle. The equal-ts right row is credited to the backward side
    * (side asc ordering keeps it out of the strictly-following window),
    * which is exactly the tie rule. Adds a `matched_dir` column
    * ('backward' | 'forward' | null). */
  def nearest(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tiebreak: Seq[String] = Nil): DataFrame = {
    val (u, mType) = tagged(left, right, key, ts, payload, tiebreak)
    val ord = col(ts).asc +: col("_side").asc +:
      tiebreak.map(c => col(s"_tb_$c").asc)
    val wB = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val leftCols = left.columns.toSeq
    val both = u.select(leftCols.map(col) ++ Seq(
        last(col("_m"), ignoreNulls = true).over(wB).as("_mb"),
        first(col("_m"), ignoreNulls = true).over(wF).as("_mf")) :+
        col("_side"): _*)
      .filter(col("_side") === 1)
    // gap math must not lose precision: cast("long") truncates timestamps
    // to whole seconds, so sub-second gaps would compare equal (or
    // inverted) and the farther side could win. Every type converts to a
    // microsecond scale so gaps stay commensurate even when the union
    // coerced one side (e.g. left DATE vs right TIMESTAMP). Dispatch is
    // PER COLUMN: the unified ts column and the right-side struct field
    // can carry different types, so each uses its own conversion
    // (a DATE->BIGINT cast is illegal in Spark — dates go through
    // unix_date instead).
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    def gapUnits(dt: org.apache.spark.sql.types.DataType)(c: Column): Column =
      dt match {
        case TimestampType => unix_micros(c)
        case TimestampNTZType => unix_micros(c.cast("timestamp"))
        case DateType => unix_date(c).cast("long") * lit(86400000000L)
        case _ => c.cast("long")
      }
    val leftGap = gapUnits(u.schema(ts).dataType) _
    val rightGap = gapUnits(mType(ts).dataType) _
    val gapB = leftGap(col(ts)) - rightGap(col("_mb").getField(ts))
    val gapF = rightGap(col("_mf").getField(ts)) - leftGap(col(ts))
    val pickB = col("_mf").isNull || (col("_mb").isNotNull && gapB <= gapF)
    both.select(leftCols.map(col) ++
        Seq(when(pickB, col("_mb")).otherwise(col("_mf")).as("_m"),
          when(col("_mb").isNull && col("_mf").isNull, lit(null))
            .otherwise(when(pickB, lit("backward")).otherwise(lit("forward")))
            .as("matched_dir")): _*)
      .select(extract(leftCols, payload, col("_m")) :+ col("matched_dir"): _*)
  }
}
