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

  val defs: Seq[QueryDef] = Seq(
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
