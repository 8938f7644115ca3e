package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** One document's selection metrics — all integer-exact (ratios as
  * floor(x * 1e4), via SQL `div`) so dominance compares identically in
  * every engine. Higher is better on every axis. */
final case class DocPoint(doc_id: Long, m_len: Long, m_lex: Long, m_wlen: Long)

/** Pareto-frontier (skyline) document selection (Borzsony, Kossmann &
  * Stocker, "The Skyline Operator", ICDE 2001): the documents no other
  * document beats on EVERY quality axis at once — the multi-criteria
  * "keep the frontier" step of a curation pipeline that refuses to
  * collapse length/lexical-diversity/word-length into one weighted
  * score prematurely.
  *
  * 100 TB shape: the textbook distributed skyline. Stage 1 streams each
  * partition through a LOCAL skyline (mapPartitions — genuinely
  * imperative per-partition state: the running non-dominated set, O(s)
  * memory where s is the local frontier size). Dominance is transitive,
  * so every GLOBAL skyline point survives its local pass, and the union
  * of local skylines is a tiny superset of the answer. Stage 2 runs the
  * exact dominance anti-join on that candidate set only — broadcast
  * nested-loop on |candidates|^2, never on corpus^2. The quadratic is
  * confined to the frontier, which grows ~polylog(n) for independent
  * dimensions, not with corpus size.
  */
object Skyline {
  import Tables._

  private def dominatesPt(q: DocPoint, p: DocPoint): Boolean =
    q.m_len >= p.m_len && q.m_lex >= p.m_lex && q.m_wlen >= p.m_wlen &&
      (q.m_len > p.m_len || q.m_lex > p.m_lex || q.m_wlen > p.m_wlen)

  /** Streaming local skyline: kept = skyline of rows seen so far.
    * Incomparable duplicates (equal vectors) are all kept — neither
    * dominates the other, matching the oracle's NOT EXISTS. */
  private def localSkyline(it: Iterator[DocPoint]): Iterator[DocPoint] = {
    var kept = List.empty[DocPoint]
    it.foreach { p =>
      if (!kept.exists(q => dominatesPt(q, p)))
        kept = p :: kept.filterNot(q => dominatesPt(p, q))
    }
    kept.iterator
  }

  /** Integer-exact per-doc metrics; m_lex/m_wlen floor-scaled by 1e4
    * through SQL `div` (a double divide then cast could round the other
    * way in one engine at a .9999 boundary). */
  private[operators] def metrics(docs: DataFrame): DataFrame = {
    val w = graft.functions.TextAnalysis.tokens(col("text"))
    docs
      .select(col("doc_id"), w.as("w"), col("text"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n"),
        size(array_distinct(col("w"))).cast("long").as("nd"),
        length(translate(col("text"), " ", "")).cast("long").as("chars"))
      .select(col("doc_id"),
        col("n").as("m_len"),
        expr("nd * 10000 div n").as("m_lex"),
        expr("chars * 10000 div n").as("m_wlen"))
  }

  /** The exact global skyline of a (doc_id, m_len, m_lex, m_wlen) frame,
    * partitioning-invariant (SkylineSpec pins both properties). */
  def frontierOf(m: DataFrame): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[DocPoint] =
      org.apache.spark.sql.Encoders.product[DocPoint]
    val cand = m.as[DocPoint].mapPartitions(localSkyline).toDF()
    val dom =
      col("y.m_len") >= col("x.m_len") &&
        col("y.m_lex") >= col("x.m_lex") &&
        col("y.m_wlen") >= col("x.m_wlen") &&
        (col("y.m_len") > col("x.m_len") ||
          col("y.m_lex") > col("x.m_lex") ||
          col("y.m_wlen") > col("x.m_wlen"))
    // no trailing orderBy: the gate sorts rows itself, and a global sort
    // here would range-sample (re-execute) the candidate pipeline
    cand.as("x").join(broadcast(cand.as("y")), dom, "left_anti")
      .select(col("doc_id"), col("m_len"), col("m_lex"), col("m_wlen"))
  }

  /** The registered query: frontier of the documents quality metrics. */
  def frontier(s: SparkSession, d: String): DataFrame =
    frontierOf(metrics(documents(s, d)))

  private def skylineOracle: String = {
    val tok = "list_filter(string_split(text, ' '), t -> t <> '')"
    s"""WITH m AS (
      SELECT doc_id,
             len($tok)::BIGINT AS m_len,
             (len(list_distinct($tok)) * 10000 // len($tok))::BIGINT AS m_lex,
             (length(replace(text, ' ', '')) * 10000 // len($tok))::BIGINT AS m_wlen
      FROM documents WHERE len($tok) > 0)
    SELECT doc_id, m_len, m_lex, m_wlen FROM m x
    WHERE NOT EXISTS (
      SELECT 1 FROM m y
      WHERE y.m_len >= x.m_len AND y.m_lex >= x.m_lex AND y.m_wlen >= x.m_wlen
        AND (y.m_len > x.m_len OR y.m_lex > x.m_lex OR y.m_wlen > x.m_wlen))
    ORDER BY doc_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q149_skyline",
      (s, d) => frontier(s, d),
      Some(skylineOracle),
      "pareto-frontier doc selection: streaming local skylines + exact candidate-only dominance anti-join"))
}
