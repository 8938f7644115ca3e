package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Full-text ranked retrieval over the documents corpus: BM25 (Robertson &
  * Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond",
  * 2009) with the Lucene `ln(1 + ...)` idf form, as a set of relational
  * primitives rather than a search-engine port — plus hybrid
  * lexical+vector retrieval fused by Reciprocal Rank Fusion (Cormack,
  * Clarke & Buettcher, "Reciprocal Rank Fusion outperforms Condorcet and
  * individual Rank Learning Methods", SIGIR 2009).
  *
  * 100 TB shape: the corpus side reduces to two partial-aggregated
  * groupBys — tf per (doc, term) restricted to query terms, df per term —
  * plus per-doc lengths; the query set, df table, and corpus stats are all
  * tiny and BROADCAST, so the only shuffle of corpus-sized data is the tf
  * aggregation itself. This is exactly an inverted-index probe expressed
  * as equi joins: at scale, bucket the tf table by term and the probe
  * co-locates without a shuffle. The vector side of the hybrid query is
  * one broadcast map-side scoring pass over the embedding table (q39's
  * shape); the fusion itself joins two K-bounded ranked lists — driver-
  * trivial at any corpus size.
  *
  * Determinism contract: per-term contributions are rounded to 1e-4 and
  * summed as exact ten-thousandths (BIGINT), so the per-doc score never
  * depends on float summation order — the same trick as [[graft.Money]].
  * The idf/tf-norm expression is written with IDENTICAL literal forms and
  * association in the Spark and DuckDB versions so both engines execute
  * the same IEEE operation sequence (ln being the one libm call). RRF
  * scores are exact integer micro-units (`1e6 div (60 + rank)` summed),
  * so fusion never touches floats at all.
  */
object Search {
  import Tables._

  val K1 = 1.2
  val B = 0.75
  val TOPK = 5

  /** Per-system candidate depth fused by q144 — RRF needs deeper lists
    * than the final cut so cross-system consensus below the individual
    * top-5 can still surface (the standard fuse-top-N practice). */
  val FUSE_DEPTH = 20

  /** The RRF smoothing constant k=60 from Cormack et al. 2009 — scores
    * are `RRF_UNIT div (RRF_K0 + rank)` per list, summed. */
  val RRF_K0 = 60
  val RRF_UNIT = 1000000L

  /** The benchmark query workload: ids are stable, terms span rare
    * ("dup", df ~5%) to universal ("the") so the idf spread is exercised.
    * For the hybrid query each qid doubles as the anchor `vec_id` whose
    * embedding is the query vector — the workload is (terms, vector)
    * pairs, the two sides of a hybrid search request. */
  val QUERIES: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("dup", "merge"),
    2 -> Seq("spark", "window", "stream"),
    3 -> Seq("vector", "hash", "the"))

  private val SQL_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** (qid, doc_id, score) BM25-scored lexical candidates — the shared
    * head of q78 (which cuts it to top-5) and q144 (which fuses its
    * top-[[FUSE_DEPTH]] with the vector ranking). One definition so the
    * scoring contract cannot drift between the pure and hybrid paths. */
  private def bm25Scored(s: SparkSession, d: String): DataFrame = {
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
    contrib.groupBy(col("qid"), col("doc_id"))
      .agg((sum(col("c4")) / 10000.0).as("score"))
  }

  /** The q78 oracle's CTE chain up to the `scored` relation — shared
    * verbatim with the q144 oracle so the lexical scoring the two
    * queries replay in DuckDB is one definition too. */
  private val LEX_SQL = s"""dl AS (
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
          FROM contrib GROUP BY 1, 2)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q78_bm25",
      (s, d) => {
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))
        bm25Scored(s, d).withColumn("rk", row_number().over(w))
          .filter(col("rk") <= TOPK)
          .select(col("qid"), col("rk"), col("doc_id"), col("score"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""
        WITH $LEX_SQL,
        ranked AS (
          SELECT qid, doc_id, score,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, doc_id) AS rk
          FROM scored)
        SELECT qid, rk, doc_id, score FROM ranked WHERE rk <= $TOPK
        ORDER BY qid, rk"""),
      "BM25 ranked retrieval: broadcast query probe over partial-agg tf/df (inverted-index shape)"),

    QueryDef(
      "q144_hybrid_rrf",
      (s, d) => {
        // Hybrid lexical+vector retrieval: BM25 over `documents` and
        // cosine over `embeddings` each rank their own top-FUSE_DEPTH,
        // and Reciprocal Rank Fusion merges the two lists. Each qid's
        // query vector is the embedding of its anchor document
        // (vec_id == qid; doc_id == vec_id links the two tables — at
        // sf0.1 only 2000 of 5000 docs carry embeddings, so the fusion
        // genuinely exercises partial coverage: un-embedded docs can
        // only enter through the lexical list, rank 0 marks "absent
        // from that system"). The anchor itself is a legitimate result.
        //
        // Scale: the two ranking passes are the proven q78/q39 shapes
        // (corpus-bounded tf shuffle; broadcast map-side scoring); the
        // fusion joins two lists of at most |queries| * FUSE_DEPTH rows
        // — nothing corpus-sized crosses a second exchange. RRF is
        // integer-exact, so ranks — not float scores — are the only
        // thing the two systems must agree on.
        val wl = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))
        val ltop = bm25Scored(s, d)
          .withColumn("rk_lex", row_number().over(wl))
          .filter(col("rk_lex") <= FUSE_DEPTH)
          .select(col("qid"), col("doc_id"), col("rk_lex"))
        val e = Similarity.prepared(s, d)
        val qs = e.filter(col("vec_id").isin(QUERIES.map(_._1): _*))
          .select(col("vec_id").cast("int").as("qid"),
            col("v").as("qv"), col("nrm").as("qn"))
        val wv = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("doc_id"))
        val vtop = e.crossJoin(broadcast(qs))
          .select(col("qid"), col("vec_id").as("doc_id"),
            Similarity.roundedCos(col("v"), col("qv"), col("nrm"), col("qn"))
              .as("cos"))
          .withColumn("rk_vec", row_number().over(wv))
          .filter(col("rk_vec") <= FUSE_DEPTH)
          .select(col("qid"), col("doc_id"), col("rk_vec"))
        val wf = Window.partitionBy(col("qid"))
          .orderBy(col("rrf").desc, col("doc_id"))
        ltop.join(vtop, Seq("qid", "doc_id"), "full_outer")
          .select(col("qid"), col("doc_id"),
            coalesce(col("rk_lex"), lit(0)).as("rk_lex"),
            coalesce(col("rk_vec"), lit(0)).as("rk_vec"))
          .withColumn("rrf", expr(
            s"cast(case when rk_lex > 0 then $RRF_UNIT div ($RRF_K0 + rk_lex) else 0 end + " +
              s"case when rk_vec > 0 then $RRF_UNIT div ($RRF_K0 + rk_vec) else 0 end as bigint)"))
          .withColumn("rk", row_number().over(wf))
          .filter(col("rk") <= TOPK)
          .select(col("qid"), col("rk"), col("doc_id"), col("rrf"),
            col("rk_lex"), col("rk_vec"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""
        WITH $LEX_SQL,
        lrank AS (
          SELECT qid, doc_id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, doc_id) AS rk_lex
          FROM scored),
        ltop AS (SELECT qid, doc_id, rk_lex FROM lrank WHERE rk_lex <= $FUSE_DEPTH),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                     sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
        vq AS (SELECT cast(vec_id as int) AS qid, v AS qv, nrm AS qn
               FROM e WHERE vec_id IN (${QUERIES.map(_._1).mkString(", ")})),
        vscore AS (
          SELECT vq.qid, e.vec_id AS doc_id,
                 round(list_dot_product(e.v, vq.qv) / nullif(e.nrm * vq.qn, 0), 6) AS cos
          FROM e CROSS JOIN vq),
        vrank AS (
          SELECT qid, doc_id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, doc_id) AS rk_vec
          FROM vscore),
        vtop AS (SELECT qid, doc_id, rk_vec FROM vrank WHERE rk_vec <= $FUSE_DEPTH),
        fused AS (
          SELECT coalesce(l.qid, v.qid) AS qid,
                 coalesce(l.doc_id, v.doc_id) AS doc_id,
                 coalesce(l.rk_lex, 0) AS rk_lex,
                 coalesce(v.rk_vec, 0) AS rk_vec
          FROM ltop l FULL OUTER JOIN vtop v
            ON l.qid = v.qid AND l.doc_id = v.doc_id),
        frrf AS (
          SELECT qid, doc_id, rk_lex, rk_vec,
                 cast((CASE WHEN rk_lex > 0 THEN $RRF_UNIT // ($RRF_K0 + rk_lex) ELSE 0 END) +
                      (CASE WHEN rk_vec > 0 THEN $RRF_UNIT // ($RRF_K0 + rk_vec) ELSE 0 END)
                   as bigint) AS rrf
          FROM fused),
        frank AS (
          SELECT qid, doc_id, rrf, rk_lex, rk_vec,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY rrf DESC, doc_id) AS rk
          FROM frrf)
        SELECT qid, rk, doc_id, rrf, rk_lex, rk_vec FROM frank WHERE rk <= $TOPK
        ORDER BY qid, rk"""),
      "hybrid retrieval: BM25 + cosine lists fused by integer-exact Reciprocal Rank Fusion")
  )
}
