package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
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
  * Tungsten): NFC for the registered query because that's the
  * WHATWG/W3C interchange form AND DuckDB ships `nfc_normalize`, so
  * the oracle replays the exact transform; NFKC (the compatibility
  * fold tokenizer pipelines prefer — ligatures, fullwidth forms) is
  * spec-pinned since DuckDB has no NFKC.
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

  val defs: Seq[QueryDef] = Seq(
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
