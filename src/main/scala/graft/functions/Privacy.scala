package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Money, QueryDef, Tables}

/** Privacy operators for training-data release: referentially-consistent
  * pseudonymization (stable salted-hash tokens replace identifiers, so
  * joins and group-bys still work on the released data) and k-anonymity
  * reporting over quasi-identifier combinations (groups smaller than k
  * re-identify their members and must be suppressed or generalized
  * before release).
  *
  * Both are map-side/partial-agg shapes: tokenization is a per-row
  * projection, the k-anonymity report is one aggregation over the
  * quasi-identifier key — nothing here shuffles more than a groupBy. */
object Privacy {
  import Tables._

  /** Stable pseudonymous token for an identifier column: 16 hex chars of
    * salted md5. Same input → same token (referential integrity), salt
    * prevents trivial dictionary reversal (rotate per release). */
  def token(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit("|"), id.cast("string"))), 1, 16)

  /** k-anonymity report over a quasi-identifier combination: one row per
    * equivalence class with its size and the suppression verdict. */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], k: Int): DataFrame =
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("suppressed", col("class_size") < k)

  private val SALT = "graft-release-1"

  // ------------------------------------------------------------------
  // In-text PII redaction (the FineWeb/Dolma anonymization rung, Penedo
  // et al. 2024 §3.5 / Soldaini et al. 2024 — public): emails, IPv4
  // addresses and phone numbers scrubbed from free text BEFORE release.
  // Complements q76 (TextAnalysis), the corpus-wide pattern AUDIT whose
  // PII counters are legitimately ZERO on this clean synthetic corpus:
  // here a closed-form fixture PLANTS the PII, so the scrub itself —
  // replacements, placeholders, negative lookalikes — is value-checked
  // end to end, per doc, full redacted text hash-compared.
  // Patterns are deliberately RE2-compatible (DuckDB) AND Java-regex
  // compatible (Spark) so one definition serves both engines; the
  // replace chain applies email -> IP -> phone (documented precedence —
  // the fixture plants no overlapping spans, and an email containing a
  // dotted quad would redact as an email whole).
  //
  // 100 TB shape: a pure map — three regexp_replace passes per row,
  // zero shuffles, composes anywhere in the curation chain.
  // ------------------------------------------------------------------

  private[graft] val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val IP_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val PHONE_RE = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  /** Text with emails/IPv4s/phones replaced by typed placeholder tokens. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"), PHONE_RE, "<PHONE>")

  /** The deterministic PII fixture (same construction in the oracle):
    * per-doc planted email / IPv4 / phone on doc_id residues, plus
    * negative controls every doc carries — a TLD-less mailto
    * (admin@localhost) and a 4-digit final octet (1.2.3.4000), both of
    * which the patterns must NOT match. */
  private[graft] def piiFixture(text: Column, docId: Column): Column =
    concat(text,
      when(docId % 3 === 0, concat(lit(" reach user"),
        docId.cast("string"), lit("@mail"), (docId % 7).cast("string"),
        lit(".com"))).otherwise(lit("")),
      when(docId % 4 === 1, concat(lit(" server 10."),
        (docId % 256).cast("string"), lit("."), (docId % 100).cast("string"),
        lit("."), (docId % 50).cast("string"), lit(" up"))).otherwise(lit("")),
      when(docId % 5 === 2, concat(lit(" call +1-555-"),
        (docId % 9000 + 1000).cast("string"), lit(" now"))).otherwise(lit("")),
      lit(" ping admin@localhost build 1.2.3.4000 ok"))

  private val SQL_PII_FIXTURE = """
        text ||
        (CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id::VARCHAR ||
          '@mail' || (doc_id % 7)::VARCHAR || '.com' ELSE '' END) ||
        (CASE WHEN doc_id % 4 = 1 THEN ' server 10.' ||
          (doc_id % 256)::VARCHAR || '.' || (doc_id % 100)::VARCHAR || '.' ||
          (doc_id % 50)::VARCHAR || ' up' ELSE '' END) ||
        (CASE WHEN doc_id % 5 = 2 THEN ' call +1-555-' ||
          (doc_id % 9000 + 1000)::VARCHAR || ' now' ELSE '' END) ||
        ' ping admin@localhost build 1.2.3.4000 ok'"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q170_pii_scrub",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"),
            piiFixture(col("text"), col("doc_id")).as("t"))
          .select(col("doc_id"),
            regexp_count(col("t"), lit(EMAIL_RE)).cast("long").as("n_email"),
            regexp_count(col("t"), lit(IP_RE)).cast("long").as("n_ip"),
            regexp_count(col("t"), lit(PHONE_RE)).cast("long").as("n_phone"),
            length(col("t")).cast("long").as("n_chars_before"),
            redactPii(col("t")).as("redacted"))
          .withColumn("n_chars_after",
            length(col("redacted")).cast("long")),
      Some(s"""
        WITH t AS (
          SELECT doc_id, $SQL_PII_FIXTURE AS t FROM documents)
        SELECT doc_id,
          len(regexp_extract_all(t, '$EMAIL_RE'))::BIGINT AS n_email,
          len(regexp_extract_all(t, '$IP_RE'))::BIGINT AS n_ip,
          len(regexp_extract_all(t, '$PHONE_RE'))::BIGINT AS n_phone,
          len(t)::BIGINT AS n_chars_before,
          regexp_replace(regexp_replace(regexp_replace(t,
            '$EMAIL_RE', '<EMAIL>', 'g'),
            '$IP_RE', '<IP>', 'g'),
            '$PHONE_RE', '<PHONE>', 'g') AS redacted,
          len(regexp_replace(regexp_replace(regexp_replace(t,
            '$EMAIL_RE', '<EMAIL>', 'g'),
            '$IP_RE', '<IP>', 'g'),
            '$PHONE_RE', '<PHONE>', 'g'))::BIGINT AS n_chars_after
        FROM t"""),
      "in-text PII scrub (FineWeb/Dolma anonymization): email/IPv4/phone regex redaction with typed placeholders + per-doc counts on PLANTED fixtures — completes q76's zero-match audit with value-checked replacements; pure map, zero shuffles"),


    QueryDef(
      "q114_k_anonymity",
      (s, d) => kAnonymity(
        documents(s, d).withColumn("len_bucket", expr("n_chars div 200")),
        Seq(col("lang"), col("source"), col("len_bucket")), 5),
      Some("""
        SELECT lang, source, n_chars // 200 AS len_bucket,
               count(*) AS class_size,
               count(*) < 5 AS suppressed
        FROM documents
        GROUP BY 1, 2, 3"""),
      "k-anonymity report: quasi-identifier equivalence classes + suppression verdicts, one groupBy"),

    QueryDef(
      "q115_pseudonymize",
      (s, d) =>
        events(s, d).select(
          col("event_id"),
          token(col("user_id"), SALT).as("user_token"),
          col("event_type"),
          Money.cents(col("value")).as("value_cents")),
      Some(s"""
        SELECT event_id,
               substr(md5('$SALT' || '|' || user_id::VARCHAR), 1, 16) AS user_token,
               event_type,
               ${Money.sqlCents("value")} AS value_cents
        FROM events"""),
      "referentially-consistent pseudonymization: stable salted-hash tokens, pure projection")
  )
}
