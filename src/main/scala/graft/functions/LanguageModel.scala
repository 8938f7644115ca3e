package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** N-gram language-model quality filtering — the KenLM-shaped rung above
  * q85's unigram cross-entropy (CCNet, Wenzek et al. 2020): an add-one-
  * smoothed BIGRAM model is fitted on the 90% base corpus and scores the
  * incoming 10% batch (the q96/q153 onboarding convention), so unseen
  * n-grams genuinely occur and the smoothing genuinely bites — the
  * production shape, where the deployed LM scores data it was not fitted
  * on. Per doc: mean negative log-probability of its bigrams under
  * p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V); docs outside mean ± 2σ of
  * their source's scored batch are flagged (high = surprising/garbled,
  * low = stereotyped/repetitive — CCNet trims both tails).
  *
  * Determinism (the q85 discipline): per-bigram ln p rounds to 1e-6 and
  * sums as BIGINT micros per doc; per-doc xent rounds to 1e-4; source
  * mean/variance accumulate those exact ten-thousandths as BIGINTs.
  *
  * 100 TB shape: the model is two partial-agg groupBys on the distinct-
  * bigram / distinct-history domains (corpus-bounded vocab tables, the
  * only stages that see corpus volume) plus one scalar V; scoring is the
  * batch LEFT-joining those tables by (w1,w2) and (w1) — linear in the
  * batch, never a pair space; per-source stats are bounded by the source
  * roster. The fitted tables persist at production scale (bucketed by
  * their join keys) and amortize across batches, like the q98 cell index.
  */
object LanguageModel {
  import Tables._

  /** (doc_id, source, w1, w2) adjacent-bigram stream of docs with >= 2
    * tokens — 1-based element_at matches the oracle's 1-based lists. */
  private def bigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("w")) - 1), i =>
          struct(element_at(col("w"), i).as("w1"),
            element_at(col("w"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("source"), col("b.w1"), col("b.w2"))

  /** Per-doc fixed-point cross-entropy (doc_id, source, n_bigrams, x4) of
    * `batch` under the bigram LM fitted on `base` — the shared trunk of
    * q157 (2-sigma outlier flags) and q167 (CCNet tercile buckets). */
  private[graft] def perDocXent(base: DataFrame, batch: DataFrame): DataFrame = {
    val fit = bigrams(base)
    val c12 = fit.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = fit.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // V = base vocabulary (distinct tokens over fit-eligible docs): the
    // smoothing denominator, one scalar riding a broadcast singleton row
    val v = base
      .select(TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(col("w")).as("t")).agg(countDistinct(col("t")).as("v"))
    val cost = bigrams(batch)
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("source"),
        round(-log((coalesce(col("c12"), lit(0L)) + 1) * lit(1.0) /
          (coalesce(col("c1"), lit(0L)) + col("v"))) * lit(1000000))
          .cast("long").as("c6"))
    cost.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("(sum(c6) div count(*)) div 100").as("x4"))
  }

  /** Score `batch` docs under the bigram LM fitted on `base` docs.
    * The per-doc frame is leased: the stats (broadcast) path and the
    * final join BOTH consume it, and uncached each re-executes the whole
    * LM trunk — fit groupBys, vocab count, scoring joins (8 corpus scans
    * in the audited plan, halved by the cache). It is batch-sized and
    * 4 narrow columns — the cheap side of the trade at any scale. */
  private[graft] def bigramLmScore(base: DataFrame, batch: DataFrame): DataFrame = {
    val perDoc = graft.Caches.lease(perDocXent(base, batch))
    val stats = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("nd"), sum(col("x4")).as("sx"),
        sum(col("x4") * col("x4")).as("sxx"))
      .select(col("source"),
        (col("sx") * lit(1.0) / col("nd")).as("mu4"),
        sqrt(col("sxx") * lit(1.0) / col("nd") -
          (col("sx") * lit(1.0) / col("nd")) * (col("sx") * lit(1.0) / col("nd")))
          .as("sd4"))
    perDoc.join(broadcast(stats), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        (col("x4") / 10000.0).as("xent"),
        (abs(col("x4") - col("mu4")) > lit(2.0) * col("sd4")).as("is_outlier"))
  }

  /** Shared oracle trunk through the per-doc fixed-point xent — q157 and
    * q167 append their own reporting tail. */
  private val PERDOC_CTES = """toks AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), t -> t <> '') AS w
      FROM documents),
    elig AS (SELECT * FROM toks WHERE len(w) >= 2),
    bi AS (
      SELECT doc_id, source, w[i] AS w1, w[i + 1] AS w2
      FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
            FROM elig)),
    fit AS (SELECT * FROM bi WHERE doc_id % 10 <> 0),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM fit GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS c1 FROM fit GROUP BY 1),
    v AS (SELECT count(DISTINCT t) AS v
          FROM (SELECT unnest(w) AS t FROM elig WHERE doc_id % 10 <> 0)),
    cost AS (
      SELECT b.doc_id, b.source,
             CAST(round(-ln((COALESCE(c12.c12, 0) + 1) * 1.0 /
               (COALESCE(c1.c1, 0) + v.v)) * 1000000) AS BIGINT) AS c6
      FROM bi b
      LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      LEFT JOIN c1 ON b.w1 = c1.w1, v
      WHERE b.doc_id % 10 = 0),
    perdoc AS (
      SELECT doc_id, source, count(*) AS n_bigrams,
             (sum(c6) // count(*)) // 100 AS x4
      FROM cost GROUP BY 1, 2)"""

  private val ORACLE = s"""
    WITH $PERDOC_CTES,
    stats AS (
      SELECT source, count(*) AS nd, sum(x4) AS sx, sum(x4 * x4) AS sxx
      FROM perdoc GROUP BY 1)
    SELECT p.doc_id, p.source, p.n_bigrams, p.x4 / 10000.0 AS xent,
           abs(p.x4 - s.sx * 1.0 / s.nd) >
             2.0 * sqrt(s.sxx * 1.0 / s.nd -
               (s.sx * 1.0 / s.nd) * (s.sx * 1.0 / s.nd)) AS is_outlier
    FROM perdoc p JOIN stats s USING (source)"""

  private val BUCKET_ORACLE = s"""
    WITH $PERDOC_CTES,
    hist AS (
      SELECT source, x4, count(*) AS cnt FROM perdoc GROUP BY 1, 2),
    cum AS (
      SELECT source, x4,
             sum(cnt) OVER (PARTITION BY source ORDER BY x4
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY source) AS n
      FROM hist),
    cuts AS (
      SELECT source,
             min(CASE WHEN cum * 3 >= n THEN x4 END) AS t1,
             min(CASE WHEN cum * 3 >= 2 * n THEN x4 END) AS t2
      FROM cum GROUP BY 1)
    SELECT p.source,
           CASE WHEN p.x4 <= c.t1 THEN 'head'
                WHEN p.x4 <= c.t2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           round(sum(p.x4) * 1.0 / count(*) / 10000.0, 4) AS mean_xent
    FROM perdoc p JOIN cuts c USING (source)
    GROUP BY 1, 2"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q157_bigram_lm",
      (s, d) => {
        val docs = documents(s, d)
        bigramLmScore(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0))
      },
      Some(ORACLE),
      "add-one-smoothed bigram-LM scoring of an incoming batch under the base-corpus model (KenLM/CCNet shape); per-source 2-sigma outlier flags in exact fixed-point"),

    QueryDef(
      "q167_ppl_buckets",
      (s, d) => {
        // CCNet's RELEASE operator (Wenzek et al. 2020 §4.3): the scored
        // batch splits into head/middle/tail by per-source perplexity
        // TERCILES — head (lowest xent, most LM-like) is what CC dumps
        // ship for pretraining; q157 flags tail outliers, this assigns
        // every doc its bucket and reports the per-(source, bucket)
        // counts + mean xent a mixture planner consumes.
        //
        // Exactness: tercile cuts come from the q159 rank-cut shape — an
        // exact value histogram on the fixed-point x4 domain (cells
        // bounded by distinct scores per source, never corpus rows), the
        // smallest x4 with cum*3 >= n (and >= 2n) as the cut, ties
        // landing whole in the lower bucket on both engines. Buckets are
        // a broadcast map-side flag; the report is one groupBy on the
        // bounded (source, bucket) roster. Like q157, the LM tables are
        // the only corpus-volume stages and persist at production scale.
        import org.apache.spark.sql.expressions.Window
        val docs = documents(s, d)
        // leased for the same reason as bigramLmScore's perDoc: the
        // histogram->cuts (broadcast) path and the bucket join both
        // consume it; uncached the LM trunk ran twice (plan-audited)
        val pd = graft.Caches.lease(perDocXent(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0)))
        val hist = pd.groupBy(col("source"), col("x4"))
          .agg(count(lit(1)).as("cnt"))
        val wsp = Window.partitionBy(col("source")).orderBy(col("x4"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cuts = hist
          .withColumn("cum", sum(col("cnt")).over(wsp))
          .withColumn("n", sum(col("cnt")).over(
            Window.partitionBy(col("source"))))
          .groupBy(col("source"))
          .agg(min(when(col("cum") * 3 >= col("n"), col("x4"))).as("t1"),
            min(when(col("cum") * 3 >= col("n") * 2, col("x4"))).as("t2"))
        pd.join(broadcast(cuts), Seq("source"))
          .select(col("source"),
            when(col("x4") <= col("t1"), lit("head"))
              .when(col("x4") <= col("t2"), lit("middle"))
              .otherwise(lit("tail")).as("bucket"),
            col("x4"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("x4")) * lit(1.0) / count(lit(1)) / 10000.0, 4)
              .as("mean_xent"))
      },
      Some(BUCKET_ORACLE),
      "CCNet head/middle/tail perplexity buckets: exact per-source tercile cuts on the fixed-point xent histogram, map-side bucket flag, bounded report"))
}
