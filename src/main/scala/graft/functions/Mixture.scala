package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Temperature-based mixture resampling (the multilingual-pretraining
  * source-weighting step: sample source s with probability proportional
  * to n_s^alpha, alpha < 1 — Conneau & Lample, "Cross-lingual Language
  * Model Pretraining", NeurIPS 2019 §3.1; Raffel et al., "Exploring the
  * Limits of Transfer Learning" (T5), JMLR 2020 §3.4.3 use exactly this
  * to keep head sources from drowning tail sources without flattening
  * to uniform). q81 is the alpha=0 endpoint of this family (uniform per
  * lang); this is the production middle: alpha=1/2 across sources.
  *
  * All-integer cross-engine arithmetic: the alpha=1/2 weight is the
  * EXACT integer sqrt w_s = isqrt(n_s * 2^20) (floor(sqrt(double))
  * corrected +/-1, so no fp-rounding disagreement at perfect-square
  * corners), the per-source 16-bit coin threshold is
  * k_s = (B * w_s * 65536) div (sum_w * n_s) with B = N div 2, computed
  * in DECIMAL(38,0)/HUGEINT (at 100 TB the numerator is ~1e32 — past
  * int64, nowhere near 128-bit), and the keep decision is q81's
  * lexicographic md5-hex compare under a "temp:"-prefixed draw
  * (decorrelated from the q70/q81/q102 coins).
  *
  * 100 TB shape: one partial-aggregated groupBy for per-source counts
  * (the only corpus-volume exchange), a single-row stat frame joined
  * back by broadcast, then a pure map keep-decision + the final
  * per-source partial+final agg. Nothing driver-side, nothing
  * corpus-quadratic, no skew surface (the coin is per-doc uniform).
  */
object Mixture {
  import Tables._

  /** weight resolution: w_s = isqrt(n_s * 2^20) keeps ~10 bits of
    * sub-integer sqrt precision at small n without overflowing int64
    * until n_s ~ 8.7e12 docs per source. */
  val SQRT_SCALE = 1L << 20

  /** Exact integer sqrt: floor(sqrt(x)) for 0 <= x < 2^52. The double
    * sqrt is correctly rounded so its floor is within +/-1 of the true
    * isqrt; two integer comparisons repair both directions. */
  private[graft] def isqrt(x: Column): Column = {
    val r0 = floor(sqrt(x.cast("double"))).cast("long")
    val up = when((r0 + 1) * (r0 + 1) <= x, r0 + 1).otherwise(r0)
    when(up * up > x, up - 1).otherwise(up)
  }

  /** The q151 keep decision — 16-bit md5 coin under the decorrelated
    * "temp:" draw against a per-source threshold k. ONE definition,
    * shared by the batch query and the streaming admission twin
    * ([[graft.streaming.StreamingOps.temperatureAdmission]]), so replay
    * parity is bit-exact by construction. */
  def keptUnder(docId: Column, k: Column): Column =
    k >= lit(65536L) ||
      substring(md5(concat(lit("temp:"), docId.cast("string"))), 1, 4) <
        lower(lpad(hex(k), 4, "0"))

  /** Per-source admission thresholds (source, n_docs, w, k) for the
    * population in `docs` — the reusable half of q151, consumed by the
    * streaming twin and the q161 funnel too. */
  private[graft] def admissionThresholds(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", isqrt(col("n_docs") * SQRT_SCALE))
    val tot = counts.agg(
      sum(col("n_docs")).as("n_total"), sum(col("w")).as("sum_w"))
    // broadcast-singleton stat row (the q69/q83 discipline) — the only
    // crossJoin shape the repo allows
    counts.crossJoin(broadcast(tot))
      .withColumn("k", least(lit(65536L), expr(
        """CAST(n_total div 2 AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))
           * 65536 div (CAST(sum_w AS DECIMAL(38,0)) * CAST(n_docs AS DECIMAL(38,0)))""")))
      .select(col("source"), col("n_docs"), col("w"), col("k"))
  }

  private[graft] def temperatureMixOf(docs: DataFrame): DataFrame = {
    docs
      .join(broadcast(admissionThresholds(docs)), Seq("source"))
      .withColumn("kept", keptUnder(col("doc_id"), col("k")))
      .groupBy(col("source"), col("n_docs"), col("w"), col("k"))
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
  }

  def temperatureMix(s: SparkSession, d: String): DataFrame =
    temperatureMixOf(documents(s, d))

  private val oracle = """
    WITH counts AS (
      SELECT source, count(*)::BIGINT AS n_docs
      FROM documents GROUP BY 1),
    weights AS (
      SELECT source, n_docs,
             CASE WHEN (r0 + CASE WHEN (r0+1)*(r0+1) <= x THEN 1 ELSE 0 END)
                       * (r0 + CASE WHEN (r0+1)*(r0+1) <= x THEN 1 ELSE 0 END) > x
                  THEN r0 + CASE WHEN (r0+1)*(r0+1) <= x THEN 1 ELSE 0 END - 1
                  ELSE r0 + CASE WHEN (r0+1)*(r0+1) <= x THEN 1 ELSE 0 END
             END AS w
      FROM (SELECT source, n_docs, n_docs * 1048576 AS x,
                   CAST(floor(sqrt((n_docs * 1048576)::DOUBLE)) AS BIGINT) AS r0
            FROM counts)),
    tot AS (
      SELECT sum(n_docs)::BIGINT AS n_total, sum(w)::BIGINT AS sum_w
      FROM weights),
    thresholds AS (
      SELECT source, n_docs, w,
             least(65536::BIGINT, CAST(
               ((n_total // 2)::HUGEINT * w::HUGEINT * 65536)
                 // (sum_w::HUGEINT * n_docs::HUGEINT) AS BIGINT)) AS k
      FROM weights, tot)
    SELECT d.source, t.n_docs, t.w, t.k,
           cast(sum(CASE WHEN t.k >= 65536 OR
             substr(md5('temp:' || d.doc_id::VARCHAR), 1, 4) <
               lower(lpad(hex(t.k), 4, '0'))
             THEN 1 ELSE 0 END) as bigint) AS n_kept
    FROM documents d
    JOIN thresholds t USING (source)
    GROUP BY 1, 2, 3, 4"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q151_temperature_mix",
      (s, d) => temperatureMix(s, d),
      Some(oracle),
      "alpha=1/2 temperature mixture resampling: exact-isqrt source weights, decimal-exact coin thresholds, one corpus exchange"))
}
