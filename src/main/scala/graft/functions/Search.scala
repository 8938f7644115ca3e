package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Full-text ranked retrieval over the documents corpus: BM25 (Robertson &
  * Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond",
  * 2009) with the Lucene `ln(1 + ...)` idf form, as a set of relational
  * primitives rather than a search-engine port.
  *
  * 100 TB shape: the corpus side reduces to two partial-aggregated
  * groupBys — tf per (doc, term) restricted to query terms, df per term —
  * plus per-doc lengths; the query set, df table, and corpus stats are all
  * tiny and BROADCAST, so the only shuffle of corpus-sized data is the tf
  * aggregation itself. This is exactly an inverted-index probe expressed
  * as equi joins: at scale, bucket the tf table by term and the probe
  * co-locates without a shuffle.
  *
  * Determinism contract: per-term contributions are rounded to 1e-4 and
  * summed as exact ten-thousandths (BIGINT), so the per-doc score never
  * depends on float summation order — the same trick as [[graft.Money]].
  * The idf/tf-norm expression is written with IDENTICAL literal forms and
  * association in the Spark and DuckDB versions so both engines execute
  * the same IEEE operation sequence (ln being the one libm call).
  */
object Search {
  import Tables._

  val K1 = 1.2
  val B = 0.75
  val TOPK = 5

  /** The benchmark query workload: ids are stable, terms span rare
    * ("dup", df ~5%) to universal ("the") so the idf spread is exercised. */
  val QUERIES: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("dup", "merge"),
    2 -> Seq("spark", "window", "stream"),
    3 -> Seq("vector", "hash", "the"))

  private val SQL_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q78_bm25",
      (s, d) => {
        val allTerms = QUERIES.flatMap(_._2).distinct
        val docs = documents(s, d)
        val dl = docs.select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).as("dl"))
        val stats = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tdl"))
        // tf only over query terms: the filter prunes the explode BEFORE
        // the shuffle, so the aggregated relation is |terms|-bounded per doc
        val tf = docs.select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("term"))
          .filter(col("term").isin(allTerms.map(lit): _*))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        // tf rows are unique per (doc, term), so count(*) == doc frequency
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        import s.implicits._
        val qterms = QUERIES.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
          .toDF("qid", "term")
        // association mirrors the oracle SQL exactly:
        // ((idf * (tf*2.2)) / den) * 10000 — float ops are not associative,
        // and the 1e-4 rounding boundary must see identical IEEE sequences
        val idf = log(lit(1.0) +
          (col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        val den = col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) +
          lit(0.75) * col("dl") * col("nd") / col("tdl"))
        val contrib = tf
          .join(broadcast(dfreq), Seq("term"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .join(broadcast(qterms), Seq("term"))
          .select(col("qid"), col("doc_id"),
            round(idf * (col("tf") * lit(2.2)) / den * lit(10000)).cast("long").as("c4"))
        val scored = contrib.groupBy(col("qid"), col("doc_id"))
          .agg((sum(col("c4")) / 10000.0).as("score"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= TOPK)
          .select(col("qid"), col("rk"), col("doc_id"), col("score"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""
        WITH dl AS (
          SELECT doc_id, len($SQL_TOKENS) AS dl FROM documents),
        stats AS (SELECT count(*) AS nd, cast(sum(dl) as bigint) AS tdl FROM dl),
        tok AS (SELECT doc_id, unnest($SQL_TOKENS) AS term FROM documents),
        tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM tok
          WHERE term IN ('dup','merge','spark','window','stream','vector','hash','the')
          GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        qterms(qid, term) AS (VALUES
          (1,'dup'),(1,'merge'),
          (2,'spark'),(2,'window'),(2,'stream'),
          (3,'vector'),(3,'hash'),(3,'the')),
        contrib AS (
          SELECT q.qid, tf.doc_id,
                 cast(round(
                   ln(1.0 + (nd - df + 0.5) / (df + 0.5)) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl * nd / tdl)) *
                   10000) as bigint) AS c4
          FROM tf
          JOIN dfreq USING (term)
          JOIN dl USING (doc_id)
          CROSS JOIN stats
          JOIN qterms q USING (term)),
        scored AS (
          SELECT qid, doc_id, cast(sum(c4) as bigint) / 10000.0 AS score
          FROM contrib GROUP BY 1, 2),
        ranked AS (
          SELECT qid, doc_id, score,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, doc_id) AS rk
          FROM scored)
        SELECT qid, rk, doc_id, score FROM ranked WHERE rk <= $TOPK
        ORDER BY qid, rk"""),
      "BM25 ranked retrieval: broadcast query probe over partial-agg tf/df (inverted-index shape)")
  )
}
