package graft.functions

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Inference/training batch shaping: length-bucketed padding efficiency.
  * Fixed-shape batch execution pads every sequence in a batch to the
  * batch's bucket length, so the bucket GRID decides how much compute
  * is wasted on pad tokens; the standard mitigation is power-of-two
  * length bucketing (16..4096 here). This operator reports, per
  * (source, bucket): doc count, real token mass, padded mass and the
  * padding efficiency in exact integer micros — the report a serving/
  * training stack reads before choosing its bucket grid.
  *
  * The bucket is resolved as `array_min(filter(grid, b >= length))`
  * over a 9-element literal grid — a pure MAP expression, not float
  * log2: `2^ceil(log2 n)` at exact powers of two is an fp-rounding
  * coin-flip between engines (the q116 integer-exact-sizing lesson).
  * Docs past the top bucket clip to it (they truncate in training; the
  * report counts their surviving tokens).
  *
  * 100 TB shape: map-side bucket resolution + ONE partial-agg groupBy
  * on (source, bucket) — bounded output, no row-domain windows, no
  * joins at all.
  */
object Batching {
  import Tables._

  /** Power-of-two bucket grid. */
  private val BUCKETS: Seq[Long] = (4 to 12).map(1L << _) // 16..4096

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q163_length_buckets",
      (s, d) => {
        val gridLit = array(BUCKETS.map(lit): _*)
        val lens = documents(s, d)
          .select(col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("ntok"))
          .filter(col("ntok") > 0)
          .select(col("source"),
            least(col("ntok"), lit(BUCKETS.max)).as("clipped"))
          .withColumn("bucket",
            array_min(filter(gridLit, b => b >= col("clipped"))))
        lens
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("clipped")).as("tok_real"),
            (count(lit(1)) * col("bucket")).as("tok_padded"))
          .select(col("source"), col("bucket"), col("n_docs"),
            col("tok_real"), col("tok_padded"),
            expr("tok_real * 1000000 div tok_padded").as("eff_micro"))
      },
      Some("""
        WITH lens AS (
          SELECT source, least(len(w)::BIGINT, 4096) AS clipped
          FROM (SELECT source,
                       list_filter(string_split(text, ' '), t -> t <> '') AS w
                FROM documents)
          WHERE len(w) > 0),
        bucketed AS (
          SELECT source, clipped,
                 list_min(list_filter(
                   [16,32,64,128,256,512,1024,2048,4096],
                   b -> b >= clipped))::BIGINT AS bucket
          FROM lens)
        SELECT source, bucket,
               count(*) AS n_docs,
               cast(sum(clipped) as bigint) AS tok_real,
               cast(count(*) * bucket as bigint) AS tok_padded,
               cast(sum(clipped) as bigint) * 1000000
                 // cast(count(*) * bucket as bigint) AS eff_micro
        FROM bucketed
        GROUP BY source, bucket"""),
      "length-bucketed padding-efficiency report: integer-exact power-of-two bucket resolution via a broadcast grid min-join (no float log2), bounded (source, bucket) output"))
}
