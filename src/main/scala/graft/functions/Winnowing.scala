package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Winnowing local text fingerprinting (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003 — the MOSS algorithm): from every window of W consecutive
  * k-gram hashes, keep the minimum (rightmost on ties), guaranteeing a
  * fingerprint in every W-gram span — so any shared run of >= W+k-1
  * tokens between two documents is CAUGHT by construction, unlike
  * whole-doc fingerprints (q33) or unpositioned gram-df stats (q77).
  *
  * 100 TB shape: gram hashing and window selection are per-document
  * (the window partitions by doc_id — never unpartitioned; frame width
  * W is constant), so fingerprint extraction is embarrassingly
  * parallel. The cross-doc match joins fingerprints on hash AFTER a
  * document-frequency cap (df <= DF_CAP) — the q77 df-aggregation
  * guard: a boilerplate fingerprint shared by a million docs would
  * otherwise pair-bomb (sum of df^2); capped, candidate volume is
  * <= DF_CAP * (fingerprint count), linear in the corpus. Hashes are
  * the md5-hex-prefix BIGINT both engines reproduce bit-for-bit (the
  * q37 SimHash contract).
  */
object Winnowing {
  import Tables._

  /** k-gram width (tokens per gram). */
  val GRAM_K = 4
  /** winnowing window (grams per selection window); guarantee threshold
    * t = W + K - 1 = 7 tokens. */
  val WIN_W = 4
  /** boilerplate guard: fingerprints in more docs than this never match. */
  val DF_CAP = 20
  /** report pairs sharing at least this many fingerprints. */
  val MIN_SHARED = 2
  /** deterministic output cap: top pairs by (n_shared DESC, ids ASC). */
  val TOP_PAIRS = 50

  /** Per-document winnowed fingerprints: (doc_id, h). The rightmost-min
    * rule is encoded in ONE orderable string key — 19 digits of the
    * zero-padded hash then 10 digits of (1e9 - pos) — so a plain window
    * `min` picks (h ASC, pos DESC) lexicographically in both engines;
    * no argmin tie ambiguity anywhere. */
  private[graft] def fingerprints(docs: DataFrame): DataFrame = {
    val w = TextAnalysis.tokens(col("text"))
    val grams = docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= GRAM_K)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - (GRAM_K - 1)),
        i => struct(i.as("pos"),
          conv(substring(md5(concat_ws(" ", slice(col("w"), i, lit(GRAM_K)))), 1, 15), 16, 10)
            .cast("long").as("h")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, WIN_W - 1)
    val key = concat(
      lpad(col("h").cast("string"), 19, "0"),
      lpad((lit(1000000000) - col("pos")).cast("string"), 10, "0"))
    grams
      .select(col("doc_id"),
        min(key).over(win).as("selkey"),
        count(lit(1)).over(win).as("nwin"))
      .filter(col("nwin") === WIN_W)
      .select(col("doc_id"), substring(col("selkey"), 1, 19).cast("long").as("h"))
      .distinct()
  }

  /** Cross-document copy report: pairs sharing >= MIN_SHARED rare
    * fingerprints, strongest first. */
  def copyPairs(s: SparkSession, d: String): DataFrame =
    copyPairsOf(documentsSpread(s, d))

  private[graft] def copyPairsOf(docs: DataFrame): DataFrame = {
    val fp = fingerprints(docs)
    val fdf = fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val rare = fp.join(fdf, Seq("h")).filter(col("df") <= DF_CAP)
      .select(col("doc_id"), col("h"))
    rare.select(col("doc_id").as("doc_a"), col("h"))
      .join(rare.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MIN_SHARED)
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
      .limit(TOP_PAIRS)
  }

  private def winnowOracle: String = {
    val tok = "list_filter(string_split(text, ' '), t -> t <> '')"
    s"""WITH toks AS (
      SELECT doc_id, $tok AS w FROM documents WHERE len($tok) >= $GRAM_K),
    grams AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(w[i:i+${GRAM_K - 1}], ' ')), 1, 15))::BIGINT AS h
      FROM toks, unnest(range(1, len(w) - ${GRAM_K - 2})) t(i)),
    sel AS (
      SELECT doc_id,
             min(lpad(CAST(h AS VARCHAR), 19, '0') ||
                 lpad(CAST(1000000000 - pos AS VARCHAR), 10, '0'))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND ${WIN_W - 1} FOLLOWING) AS selkey,
             count(*) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND ${WIN_W - 1} FOLLOWING) AS nwin
      FROM grams),
    fp AS (
      SELECT DISTINCT doc_id, substr(selkey, 1, 19)::BIGINT AS h
      FROM sel WHERE nwin = $WIN_W),
    fdf AS (SELECT h, count(*) AS df FROM fp GROUP BY 1),
    rare AS (SELECT fp.doc_id, fp.h FROM fp JOIN fdf USING (h) WHERE df <= $DF_CAP)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
    FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= $MIN_SHARED
    ORDER BY n_shared DESC, doc_a, doc_b LIMIT $TOP_PAIRS"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q148_winnowing",
      (s, d) => copyPairs(s, d),
      Some(winnowOracle),
      "winnowing fingerprints (MOSS): per-doc window-min k-gram selection + df-capped cross-doc match"))
}
