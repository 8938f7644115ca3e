package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.expressions.UnicodeNormalize

/** Unicode text normalization — the canonicalization rung that runs
  * before exact dedup (q34), fingerprinting (q33) and tokenization
  * (q30/q147): the same page arrives with `é` as one precomposed
  * codepoint from one crawler and as `e` + COMBINING ACUTE from
  * another, and unnormalized those hash apart everywhere downstream.
  *
  * The operator is [[expressions.UnicodeNormalize]], a native Catalyst
  * expression (Spark has no built-in; a UDF would box every row out of
  * Tungsten): NFC for q174 because that's the WHATWG/W3C interchange
  * form AND DuckDB ships `nfc_normalize`, so the oracle replays the
  * exact transform; NFKC (the compatibility fold tokenizer pipelines
  * prefer — ligatures, fullwidth forms, enclosed/super/sub characters)
  * is oracle-checked since r18 via DUMP-AND-REPLAY (the q67/q86
  * codebook convention): DuckDB has no NFKC, so the engine dumps the
  * per-variant normalization of the planted compatibility sequences as
  * an aux table and the q184 oracle REBUILDS each row's expected
  * output by composition from that dump — pinning that the
  * distributed per-row application equals the independently-dumped
  * per-variant artifact (whose absolute values NormalizeSpec pins
  * against hand-written expectations).
  *
  * 100 TB shape: pure per-row map, zero exchanges, with an ASCII
  * fast path that skips all allocation on the dominant byte class.
  */
object Normalize {
  import Tables._

  /** `form` ∈ NFC | NFD | NFKC | NFKD. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    GraftSqlBridge.column(
      UnicodeNormalize(GraftSqlBridge.expression(c), form))

  /** The q174 fixture: corpus text plus residue-planted decomposed
    * sequences (combining acute / ring / diaeresis / tilde) and one
    * PREcomposed control that NFC must pass through unchanged. The
    * oracle builds the identical string via chr() codepoints. */
  private[graft] def accentedText(text: Column, docId: Column): Column =
    concat(text,
      when(docId % 2 === 0, lit(" cafe\u0301")).otherwise(lit("")),
      when(docId % 3 === 0, lit(" A\u030Angstro\u0308m")).otherwise(lit("")),
      when(docId % 5 === 0, lit(" man\u0303ana")).otherwise(lit("")),
      when(docId % 7 === 0, lit(" \u00e9clair")).otherwise(lit("")))

  /** Accent folding (search/matching normalization): canonical
    * decomposition then combining-mark removal — `é` → `e`, `Å` → `A`,
    * while compatibility characters (ligatures, superscripts) stay
    * untouched. Exactly DuckDB's `strip_accents` (utf8proc STRIPMARK)
    * semantics on canonical text, so the oracle replays the transform;
    * the fuzzy-match family (q108/q123/q152) keys on folded text in
    * production. */
  def foldAccents(c: Column): Column =
    regexp_replace(unicodeNormalize(c, "NFD"), "\\p{M}", "")

  /** The planted NFKC-relevant variants, each space-led so composition
    * cannot interact across boundaries (NFKC of the concatenation ==
    * concatenation of the NFKCs — the property the oracle's replay
    * composition relies on; the one combining-mark variant sits LAST in
    * the fixture so nothing follows it). vid order is the fixture's
    * plant order. */
  private[graft] val NFKC_VARIANTS: Seq[(Int, String)] = Seq(
    0 -> " ﬁnance №",        // fi-ligature, numero sign
    1 -> " Ｆｕｌｌ",  // fullwidth F u l l
    2 -> " x²½",             // superscript two, vulgar half
    3 -> " ℕ①",              // double-struck N, circled one
    4 -> " café")                // combining acute (canonical part)

  /** Oracle-support dump for q184: the ENGINE's NFKC of each planted
    * variant — a five-row codebook the replay composes from. Absolute
    * correctness of the values is NormalizeSpec's hand-pinned job;
    * the registered query pins the distributed application. */
  def auxDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "aux_nfkc_variants" -> ((s, _) => {
      import s.implicits._
      NFKC_VARIANTS.toDF("vid", "raw")
        .select(col("vid"), col("raw"),
          unicodeNormalize(col("raw"), "NFKC").as("nfkc"))
    }))

  /** The q184 fixture: ASCII doc identity (source, doc_id — NFKC
    * identity by construction) + residue-planted compatibility
    * variants. */
  private[graft] def nfkcText(docId: Column, source: Column): Column =
    concat(source, lit(" "), docId.cast("string"),
      lit(NFKC_VARIANTS(0)._2),
      when(docId % 2 === 0, lit(NFKC_VARIANTS(1)._2)).otherwise(lit("")),
      when(docId % 3 === 0, lit(NFKC_VARIANTS(2)._2)).otherwise(lit("")),
      when(docId % 5 === 0, lit(NFKC_VARIANTS(3)._2)).otherwise(lit("")),
      when(docId % 7 === 0, lit(NFKC_VARIANTS(4)._2)).otherwise(lit("")))

  private def nfkcOracleConcat(field: String): String =
    s"""source || ' ' || CAST(doc_id AS VARCHAR) ||
       (SELECT $field FROM v WHERE vid = 0) ||
       (CASE WHEN doc_id % 2 = 0 THEN (SELECT $field FROM v WHERE vid = 1) ELSE '' END) ||
       (CASE WHEN doc_id % 3 = 0 THEN (SELECT $field FROM v WHERE vid = 2) ELSE '' END) ||
       (CASE WHEN doc_id % 5 = 0 THEN (SELECT $field FROM v WHERE vid = 3) ELSE '' END) ||
       (CASE WHEN doc_id % 7 = 0 THEN (SELECT $field FROM v WHERE vid = 4) ELSE '' END)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q184_nfkc_normalize",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"),
            nfkcText(col("doc_id"), col("source")).as("__t"))
          .select(col("doc_id"), col("__t"),
            unicodeNormalize(col("__t"), "NFKC").as("nfkc_text"))
          .select(col("doc_id"), col("nfkc_text"),
            (col("__t") =!= col("nfkc_text")).cast("long").as("changed"),
            length(col("__t")).cast("long").as("len_pre"),
            length(col("nfkc_text")).cast("long").as("len_post")),
      Some(s"""
        WITH v AS (
          SELECT * FROM read_parquet('${Similarity.AUXDIR}/aux_nfkc_variants/*.parquet')),
        e AS (
          SELECT doc_id,
                 ${nfkcOracleConcat("raw")} AS raw_t,
                 ${nfkcOracleConcat("nfkc")} AS want
          FROM documents)
        SELECT doc_id, want AS nfkc_text,
               (CASE WHEN want <> raw_t THEN 1 ELSE 0 END)::BIGINT AS changed,
               length(raw_t)::BIGINT AS len_pre,
               length(want)::BIGINT AS len_post
        FROM e"""),
      "Unicode NFKC compatibility fold, oracle-checked by dump-and-replay: the engine dumps its per-variant normalization codebook and the oracle rebuilds every row's expected output by composition from it — full-text hash compare over ligature/fullwidth/super-sub/enclosed/combining plants"),

    QueryDef(
      "q180_accent_fold",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"),
            accentedText(col("text"), col("doc_id")).as("__t"))
          .select(col("doc_id"), col("__t"),
            foldAccents(col("__t")).as("folded"))
          .select(col("doc_id"), col("folded"),
            (col("__t") =!= col("folded")).cast("long").as("changed"),
            length(col("folded")).cast("long").as("len_post")),
      Some("""
        WITH f AS (
          SELECT doc_id, text ||
            (CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769) ELSE '' END) ||
            (CASE WHEN doc_id % 3 = 0
                  THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
                  ELSE '' END) ||
            (CASE WHEN doc_id % 5 = 0 THEN ' man' || chr(771) || 'ana'
                  ELSE '' END) ||
            (CASE WHEN doc_id % 7 = 0 THEN ' ' || chr(233) || 'clair'
                  ELSE '' END) AS t
          FROM documents)
        SELECT doc_id,
               strip_accents(t) AS folded,
               (CASE WHEN strip_accents(t) <> t THEN 1 ELSE 0 END)::BIGINT
                 AS changed,
               length(strip_accents(t))::BIGINT AS len_post
        FROM f"""),
      "accent folding (NFD + combining-mark strip) through the native normalize expression; full-text hash compare against DuckDB's strip_accents, compatibility chars untouched"),

    QueryDef(
      "q174_nfc_normalize",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"),
            accentedText(col("text"), col("doc_id")).as("__t"))
          .select(col("doc_id"), col("__t"),
            unicodeNormalize(col("__t"), "NFC").as("nfc_text"))
          .select(col("doc_id"), col("nfc_text"),
            (col("__t") =!= col("nfc_text")).cast("long").as("changed"),
            length(col("__t")).cast("long").as("len_pre"),
            length(col("nfc_text")).cast("long").as("len_post")),
      Some("""
        WITH f AS (
          SELECT doc_id, text ||
            (CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769) ELSE '' END) ||
            (CASE WHEN doc_id % 3 = 0
                  THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
                  ELSE '' END) ||
            (CASE WHEN doc_id % 5 = 0 THEN ' man' || chr(771) || 'ana'
                  ELSE '' END) ||
            (CASE WHEN doc_id % 7 = 0 THEN ' ' || chr(233) || 'clair'
                  ELSE '' END) AS t
          FROM documents)
        SELECT doc_id,
               nfc_normalize(t) AS nfc_text,
               (CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END)::BIGINT
                 AS changed,
               length(t)::BIGINT AS len_pre,
               length(nfc_normalize(t))::BIGINT AS len_post
        FROM f"""),
      "Unicode NFC normalization as a native codegen Catalyst expression (ASCII + already-normalized fast paths); full-text hash compare against DuckDB's nfc_normalize over residue-planted combining sequences"))
}
