package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** URL canonicalization + collapse — the first dedup any web-crawl
  * pipeline runs, BEFORE content hashing: the same page arrives under
  * scheme-case, `www.`, trailing-slash, tracking-parameter, parameter-
  * order and fragment variants, and canonicalizing collapses them
  * without touching document content at all.
  *
  * Rules (each a pure string expression, identical in the oracle):
  * fragment dropped; scheme dropped (case-insensitively); host
  * lowercased and `www.`-stripped; trailing path slashes stripped;
  * tracking params (`utm_*`, `ref=`) dropped; surviving params sorted.
  *
  * 100 TB shape: canonicalization is a MAP — zero shuffles until the
  * final collapse groupBy on the canonical key (one partial-agg
  * exchange); the cluster report is one row per canonical URL, linear
  * in output. The documents table carries no URL column, so the raw URL
  * is derived deterministically from (doc_id, source) — the q108
  * CORRUPT convention: a closed-form fixture both engines synthesize
  * identically, planting every variant class the canonicalizer claims
  * to collapse (groups of doc_id div 5 share a page; scheme case,
  * www/COM casing, trailing slash, tracker-vs-clean query strings and
  * fragments all vary WITHIN a group by doc_id residues).
  */
object Web {
  import Tables._

  /** Canonical form of a URL column: scheme/fragment/trackers dropped,
    * host lowercased minus `www.`, trailing slash trimmed, surviving
    * query params sorted. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^(?i)https?://", "")
    val base = substring_index(noScheme, "?", 1)
    val query = when(instr(noScheme, "?") > 0,
      substr(noScheme, instr(noScheme, "?") + 1)).otherwise(lit(""))
    val host = lower(substring_index(base, "/", 1))
    val host2 = regexp_replace(host, "^www\\.", "")
    val path = substr(base, length(substring_index(base, "/", 1)) + 1)
    val path2 = regexp_replace(path, "/+$", "")
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("ref=")))
    concat(host2, path2,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** The deterministic raw-URL fixture (same expression in the oracle). */
  private def rawUrl(docId: Column, source: Column): Column =
    concat(
      when(docId % 2 === 0, lit("https://")).otherwise(lit("HTTP://")),
      when(docId % 3 === 0, concat(lit("WWW."), upper(source), lit(".COM")))
        .otherwise(concat(source, lit(".com"))),
      lit("/docs/"), (docId.cast("long") / 5).cast("long").cast("string"),
      when(docId % 4 === 0, lit("/")).otherwise(lit("")),
      when(docId % 2 === 0, lit("?utm_source=feed&b=1&a=2"))
        .otherwise(lit("?a=2&b=1&utm_campaign=x")),
      when(docId % 7 === 0, lit("#sec")).otherwise(lit("")))

  private val ORACLE = """
    WITH raw AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
        (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || upper(source) || '.COM'
              ELSE source || '.com' END) ||
        '/docs/' || CAST(doc_id // 5 AS VARCHAR) ||
        (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
        (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=1&a=2'
              ELSE '?a=2&b=1&utm_campaign=x' END) ||
        (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url
      FROM documents),
    parts AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(url, '#.*$', ''),
               '^(?i)https?://', '') AS ns
      FROM raw),
    split AS (
      SELECT doc_id, url,
             split_part(ns, '?', 1) AS base,
             CASE WHEN strpos(ns, '?') > 0
                  THEN substr(ns, strpos(ns, '?') + 1) ELSE '' END AS q
      FROM parts),
    canon AS (
      SELECT doc_id, url,
        regexp_replace(lower(split_part(base, '/', 1)), '^www\.', '') ||
        regexp_replace(substr(base, length(split_part(base, '/', 1)) + 1),
          '/+$', '') ||
        (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
              ELSE '' END) AS canon_url
      FROM (SELECT doc_id, url, base,
              list_sort(list_filter(string_split(q, '&'), p ->
                p <> '' AND NOT starts_with(p, 'utm_')
                       AND NOT starts_with(p, 'ref='))) AS kept
            FROM split))
    SELECT canon_url,
           count(*) AS n_docs,
           count(DISTINCT url) AS n_raw_variants,
           min(doc_id) AS survivor
    FROM canon
    GROUP BY 1"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q158_url_dedup",
      (s, d) => {
        val raw = documents(s, d)
          .select(col("doc_id"), rawUrl(col("doc_id"), col("source")).as("url"))
        raw.select(col("doc_id"), col("url"),
            canonicalUrl(col("url")).as("canon_url"))
          .groupBy(col("canon_url"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("url")).as("n_raw_variants"),
            min(col("doc_id")).as("survivor"))
      },
      Some(ORACLE),
      "URL canonicalization + collapse: map-side scheme/www/slash/tracker/param-order normalization, one groupBy on the canonical key"))
}
