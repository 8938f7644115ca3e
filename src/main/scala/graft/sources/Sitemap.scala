package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.{Robots, Web}

/** Sitemap ingestion + crawl-frontier scheduling — the discovery rungs
  * between the robots gate (q177) and container ingestion (q171/q183)
  * in a real crawl: a crawler fetches each host's sitemap.xml
  * (sitemaps.org protocol, public), extracts candidate URLs, filters
  * them through the host's robots rules, and paces the survivors into
  * a per-host politeness schedule before any fetch happens.
  *
  * Parse design (q185): strip XML comments (a commented-out `<url>`
  * block must NOT surface — planted), walk `<url>` blocks positionally
  * (the ordinal is crawl-frontier provenance), per block extract
  * `<loc>`/`<lastmod>`/`<priority>` with XML named-entity decode on
  * loc (`&amp;` et al. — sitemap locs are XML-escaped URLs, and the
  * fixture's real query strings carry `&`, so the entity round-trip is
  * exercised on every record, specific entities before `&amp;` so
  * escaped escapes cannot cascade). Each loc's PATH re-derives through
  * the same scheme/authority strip the host graph uses, and the
  * per-host robots rules (the q177 group walk + RFC 9309 wildcard
  * verdict, staged ONCE per sitemap row before the entry explode)
  * admit or refuse it. Absent optional tags stay NULL.
  *
  * Scheduling (q186): admitted entries join a per-host politeness
  * config (broadcast — one row per host) and a single per-host window
  * assigns `seq` by (priority DESC NULLS LAST, ord) and
  * `fetch_at_ms = seq * delay_ms` — the earliest-allowed fetch instant
  * under a fixed inter-request delay, from epoch 0 (deterministic).
  *
  * 100 TB shape: q185 is one fixture-build exchange (groupBy source)
  * then a pure map — the rules fold runs once per HOST row, not per
  * entry; q186 adds one broadcast join (tiny config dim) and one
  * window exchange on host. Frontier output is linear in admitted
  * URLs; no joins between entry-scale relations.
  */
object Sitemap {
  import Tables._

  // ------------------------------------------------------------------
  // Parse
  // ------------------------------------------------------------------

  /** Minimal XML named-entity decode for loc values (the five XML
    * predefined entities; specific entities first, `&amp;` LAST so
    * `&amp;lt;` decodes to the literal `&lt;`, never a cascade). */
  private def xmlDecode(c: Column): Column = {
    val step1 = regexp_replace(c, "&lt;", "<")
    val step2 = regexp_replace(step1, "&gt;", ">")
    val step3 = regexp_replace(step2, "&quot;", "\"")
    val step4 = regexp_replace(step3, "&apos;", "'")
    regexp_replace(step4, "&amp;", "&")
  }

  /** URL path of a decoded loc: scheme + authority stripped, cut at
    * `?`/`#`; an empty path is the root `/` (what robots match). */
  private def locPath(loc: Column): Column = {
    val p = regexp_extract(
      regexp_replace(loc, "^(?i)https?://", ""), "^[^/?#]*([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Parsed + robots-admitted sitemap entries of an (xml, robots)
    * relation: one row per `<url>` block in document order —
    * (keys..., ord, loc, lastmod, priority, host, path, allowed,
    * rule). The robots rules are parsed ONCE per input row (staged
    * before the entry explode); `agent` selects the rule group. */
  def sitemapAdmissionRel(sitemaps: DataFrame, xml: Column,
      robots: Column, agent: String, keys: Seq[String]): DataFrame = {
    val kt = keys.map(col)
    val stripped = regexp_replace(xml, "(?s)<!--.*?-->", "")
    sitemaps
      .select(kt
        :+ regexp_extract_all(stripped, lit("(?s)<url>(.*?)</url>"), lit(1))
          .as("__blocks")
        :+ Robots.robotsRules(robots, agent).as("__rules"): _*)
      .select(kt :+ col("__rules")
        :+ posexplode_outer(col("__blocks")).as(Seq("ord", "__b")): _*)
      .select(kt :+ col("ord").cast("long").as("ord") :+ col("__rules")
        :+ xmlDecode(regexp_extract(col("__b"),
          "(?s)<loc>\\s*(.*?)\\s*</loc>", 1)).as("loc")
        :+ when(col("__b").rlike("(?s)<lastmod>"),
          regexp_extract(col("__b"), "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1))
          .as("lastmod")
        :+ when(col("__b").rlike("(?s)<priority>"),
          regexp_extract(col("__b"), "(?s)<priority>\\s*(.*?)\\s*</priority>", 1))
          .as("priority"): _*)
      .select(kt :+ col("ord") :+ col("loc") :+ col("lastmod")
        :+ col("priority") :+ col("__rules")
        :+ Web.pageHost(col("loc")).as("host")
        :+ locPath(col("loc")).as("path"): _*)
      .select(kt :+ col("ord") :+ col("loc") :+ col("lastmod")
        :+ col("priority") :+ col("host") :+ col("path")
        :+ Robots.robotsVerdict(col("path"), col("__rules")).as("__v"): _*)
      .select(kt :+ col("ord") :+ col("loc") :+ col("lastmod")
        :+ col("priority") :+ col("host") :+ col("path")
        :+ col("__v.allowed").as("allowed")
        :+ col("__v.rule").as("rule"): _*)
  }

  // ------------------------------------------------------------------
  // Frontier scheduling
  // ------------------------------------------------------------------

  /** Politeness schedule of admitted frontier candidates: per host,
    * rank by (priority DESC NULLS LAST, ord) and space fetches
    * `delay_ms` apart from epoch 0. `config` is one row per host
    * (host, delay_ms) — broadcast. */
  def frontierSchedule(candidates: DataFrame, config: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc_nulls_last, col("ord").asc)
    candidates
      .join(broadcast(config), Seq("host"))
      .select(col("host"), col("ord"), col("loc"), col("priority"),
        col("delay_ms"),
        (row_number().over(w) - 1).cast("long").as("seq"))
      .select(col("host"), col("seq"), col("loc"), col("delay_ms"),
        (col("seq") * col("delay_ms")).as("fetch_at_ms"))
  }

  // ------------------------------------------------------------------
  // Deterministic fixture (rebuilt arithmetically in the oracles)
  // ------------------------------------------------------------------

  /** One sitemap per HOST (= per distinct source): a comment header, a
    * commented-out decoy `<url>` block (must not surface), then per
    * doc of that host in doc_id order one `<url>` block — loc = the
    * XML-ESCAPED q158 raw URL (real query strings ⇒ `&amp;` on every
    * even/odd class), lastmod on doc_id % 2 == 0, priority on
    * doc_id % 3 == 0. Carries the host's [[Robots.syntheticRobots]]
    * text alongside (hostNum = the numeric tail of source). */
  private[graft] def syntheticSitemaps(docs: DataFrame): DataFrame = {
    val escaped = regexp_replace(
      Web.rawUrl(col("doc_id"), col("source")), "&", "&amp;")
    val entry = concat(
      lit("  <url>\n    <loc>"), escaped, lit("</loc>\n"),
      when(col("doc_id") % 2 === 0, concat(
        lit("    <lastmod>2026-0"),
        ((col("doc_id") % 9) + 1).cast("string"),
        lit("-1"), (col("doc_id") % 10).cast("string"),
        lit("</lastmod>\n"))).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, concat(
        lit("    <priority>0."), (col("doc_id") % 10).cast("string"),
        lit("</priority>\n"))).otherwise(lit("")),
      lit("  </url>\n"))
    docs
      .select(col("source"), col("doc_id"),
        expr("cast(substr(source, 4) as bigint)").as("__h"),
        entry.as("__e"))
      .groupBy(col("source"))
      .agg(
        concat(
          lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<!-- crawl fixture -->\n" +
            "<!--<url><loc>https://decoy.example/x</loc></url>-->\n" +
            "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
          array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("__e")))),
            x => x.getField("__e")), ""),
          lit("</urlset>\n")).as("xml"),
        Robots.syntheticRobots(first(col("__h"))).as("robots"))
  }

  /** Per-host politeness config: delay_ms = 1000 * (1 + hostNum % 7).
    * One row per host, joined broadcast. */
  private[graft] def syntheticConfig(docs: DataFrame): DataFrame =
    docs
      .select(lower(concat(col("source"), lit(".com"))).as("host"),
        expr("cast(substr(source, 4) as bigint)").as("__h"))
      .distinct()
      .select(col("host"), ((col("__h") % 7 + 1) * 1000).as("delay_ms"))

  // ------------------------------------------------------------------
  // Oracles
  // ------------------------------------------------------------------

  /** Shared oracle CTEs: expected entries (loc/lastmod/priority/ord
    * rebuilt generatively per doc, ord by doc order within host) and
    * the planted-robots replay keyed by (host, ord) — `adm` is the
    * full q185 relation. */
  private lazy val ADMISSION_CTES = s"""d AS (
      SELECT doc_id, source, CAST(substr(source, 4) AS BIGINT) AS h
      FROM documents),
    e AS (
      SELECT doc_id, h,
             lower(source) || '.com' AS host,
             (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::BIGINT
               AS ord,
             ${Web.RAW_URL_SQL} AS loc,
             CASE WHEN doc_id % 2 = 0
                  THEN '2026-0' || CAST(doc_id % 9 + 1 AS VARCHAR) ||
                       '-1' || CAST(doc_id % 10 AS VARCHAR) END AS lastmod,
             CASE WHEN doc_id % 3 = 0
                  THEN '0.' || CAST(doc_id % 10 AS VARCHAR) END AS priority,
             '/docs/' || CAST(doc_id // 5 AS VARCHAR) ||
             (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) AS path
      FROM d),
    g AS (SELECT host, ord, h, path, CAST(h % 7 AS VARCHAR) AS gs FROM e),
    ${Robots.rulesReplaySql("host, ord")},
    adm AS (
      SELECT e.host, e.ord, e.loc, e.lastmod, e.priority, e.path,
        CASE WHEN e.h % 11 = 0 THEN true ELSE coalesce(w.allow, true) END
          AS allowed,
        CASE WHEN e.h % 11 = 0 THEN '/' ELSE coalesce(w.pat, '') END AS rule,
        ((e.h % 7 + 1) * 1000)::BIGINT AS delay_ms
      FROM e LEFT JOIN (SELECT * FROM win WHERE rn = 1) w
        USING (host, ord))"""

  private lazy val SITEMAP_ORACLE = s"""
    WITH $ADMISSION_CTES
    SELECT host, ord, loc, lastmod, priority, path, allowed, rule
    FROM adm"""

  private lazy val FRONTIER_ORACLE = s"""
    WITH $ADMISSION_CTES
    SELECT host,
           (row_number() OVER (PARTITION BY host
              ORDER BY priority DESC NULLS LAST, ord) - 1)::BIGINT AS seq,
           loc, delay_ms,
           ((row_number() OVER (PARTITION BY host
              ORDER BY priority DESC NULLS LAST, ord) - 1) * delay_ms)::BIGINT
             AS fetch_at_ms
    FROM adm WHERE allowed"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q185_sitemap_admission",
      (s, d) => sitemapAdmissionRel(
        syntheticSitemaps(documents(s, d)),
        col("xml"), col("robots"), "graftbot", keys = Nil),
      Some(SITEMAP_ORACLE),
      "sitemap.xml ingestion (sitemaps.org): comment-stripped positional <url> walk, XML entity decode on loc, optional-tag nulls, path re-derivation, composed with the q177 robots group walk + RFC 9309 wildcard verdict (rules staged once per host); fixture-build exchange only, the parse a pure map"),

    QueryDef(
      "q186_frontier_schedule",
      (s, d) => {
        val adm = sitemapAdmissionRel(
          syntheticSitemaps(documents(s, d)),
          col("xml"), col("robots"), "graftbot", keys = Nil)
        frontierSchedule(adm.filter(col("allowed")),
          syntheticConfig(documents(s, d)))
      },
      Some(FRONTIER_ORACLE),
      "crawl-frontier politeness scheduling: robots-admitted sitemap URLs join a broadcast per-host config and ONE per-host window assigns (priority DESC, ord) ranks and delay-spaced fetch instants — linear output, one window exchange"))
}
