package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** robots.txt evaluation (RFC 9309, public) — the crawl-permission
  * rung between container ingestion (q171) and extraction (q168):
  * every real crawl pipeline filters fetched URLs through the target
  * host's robots rules before any content lands in the corpus.
  *
  * Scope (documented, spec-pinned): literal path-prefix rules with the
  * RFC's longest-match precedence (Allow wins length ties), group
  * selection per the RFC — a group is consecutive User-agent lines
  * followed by rules; if any group names the crawling agent
  * specifically, ONLY those groups apply, else the `*` groups;
  * comments (`#`) and blank lines per spec; an empty `Disallow:` is
  * no-restriction. The `*`/`$` wildcard extensions are out of scope.
  *
  * 100 TB shape: the parse is one array-domain fold per robots
  * document (zero exchanges); the verdict is a per-URL map against the
  * (tiny) per-host rule array — in production the parsed rules table
  * is one row per host, broadcast against the URL stream, so the whole
  * gate is map-side. The registered query derives both robots text and
  * page paths generatively (the q108/q158 CORRUPT convention) and the
  * oracle replays longest-match on the KNOWN rule set — the Spark
  * side's group walk and prefix argmax are what's under test.
  */
object Robots {
  import Tables._

  /** Parsed rules of one robots.txt for one crawling agent, as an
    * array of structs (allow: boolean, prefix: string), group-selected
    * per the RFC: agent-specific groups if any exist, else `*` groups.
    *
    * One running fold (the q168 runningDecided shape). State:
    *   - mode: 0 = outside any matching group / after a non-matching
    *     UA header run, 1 = inside a `*` group, 2 = inside an
    *     agent-specific group;
    *   - hdr: whether the previous line was a User-agent line (a UA
    *     line after rules STARTS a new group; consecutive UA lines
    *     extend the same header run);
    *   - wild / spec: rules collected from `*` / agent-specific groups.
    */
  def robotsRules(robots: Column, agent: String): Column = {
    val lines = transform(split(robots, "\n"), l =>
      trim(regexp_replace(l, "#.*", "")))
    val st0 = struct(
      lit(0).as("mode"), lit(false).as("hdr"),
      array().cast("array<struct<allow:boolean,prefix:string>>").as("wild"),
      array().cast("array<struct<allow:boolean,prefix:string>>").as("spec"))
    val folded = aggregate(lines, st0, (st, l) => {
      val lower0 = lower(l)
      val isUa = lower0.startsWith("user-agent:")
      val isAllow = lower0.startsWith("allow:")
      val isDis = lower0.startsWith("disallow:")
      val value = trim(substr(l, instr(l, ":") + 1))
      val uaThis = when(lower(value) === agent.toLowerCase, lit(2))
        .when(value === "*", lit(1)).otherwise(lit(0))
      // a UA line: starts a new header run unless the previous line was
      // also a UA line (then the run widens to the strongest match)
      val newMode = when(st.getField("hdr"),
          greatest(st.getField("mode"), uaThis))
        .otherwise(uaThis)
      val rule = struct(isAllow.as("allow"), value.as("prefix"))
      val keep = (isAllow || isDis) && value =!= ""
      when(isUa, struct(newMode.as("mode"), lit(true).as("hdr"),
          st.getField("wild").as("wild"), st.getField("spec").as("spec")))
        .when(keep, struct(st.getField("mode").as("mode"),
          lit(false).as("hdr"),
          when(st.getField("mode") === 1,
            concat(st.getField("wild"), array(rule)))
            .otherwise(st.getField("wild")).as("wild"),
          when(st.getField("mode") === 2,
            concat(st.getField("spec"), array(rule)))
            .otherwise(st.getField("spec")).as("spec")))
        // blank / comment-only / empty-valued directive lines: rules
        // end the header run too, but nothing is collected
        .otherwise(struct(st.getField("mode").as("mode"),
          when(isAllow || isDis, lit(false))
            .otherwise(st.getField("hdr")).as("hdr"),
          st.getField("wild").as("wild"), st.getField("spec").as("spec")))
    },
      st => when(size(st.getField("spec")) > 0, st.getField("spec"))
        .otherwise(st.getField("wild")))
    folded
  }

  /** RFC 9309 longest-match verdict for one path against a parsed rule
    * array: among matching prefixes the longest wins; on a length tie
    * Allow wins; no match = allowed. Returns a struct
    * (allowed: boolean, rule: string — the winning prefix or ''). */
  def robotsVerdict(path: Column, rules: Column): Column = {
    val matched = filter(rules, r =>
      path.startsWith(r.getField("prefix")))
    val best = aggregate(matched,
      struct(lit(true).as("allow"), lit(-1).as("len"), lit("").as("p")),
      (b, r) => {
        val l = length(r.getField("prefix"))
        val wins = l > b.getField("len") ||
          (l === b.getField("len") && r.getField("allow"))
        when(wins, struct(r.getField("allow").as("allow"), l.as("len"),
          r.getField("prefix").as("p"))).otherwise(b)
      })
    struct(best.getField("allow").as("allowed"),
      best.getField("p").as("rule"))
  }

  /** Deterministic per-host robots fixture (hostNum = the numeric tail
    * of `source`): a comment header; a `badbot` group that must be
    * IGNORED; the `*` group with a group-dir Disallow, a tie-breaking
    * Allow on the same prefix (hostNum % 5 == 0 — the RFC tie rule
    * under test), a never-matching `/r/` Disallow, a shorter `/docs/`
    * Allow (hostNum % 3 == 0), a root Disallow (hostNum % 2 == 0) and
    * an EMPTY Disallow (no-restriction parse coverage); and for
    * hostNum % 11 == 0 a trailing agent-specific group that allows
    * everything — which per the RFC then makes the `*` group
    * irrelevant for that host. */
  private[graft] def syntheticRobots(hostNum: Column): Column = {
    val g = (hostNum % 7).cast("string")
    concat(
      lit("# graft crawl policy\nUser-agent: badbot\nDisallow: /\n\n"),
      lit("User-agent: *\nDisallow: /docs/"), g, lit("\n"),
      when(hostNum % 5 === 0, concat(lit("Allow: /docs/"), g, lit("\n")))
        .otherwise(lit("")),
      lit("Disallow: /r/\n"),
      when(hostNum % 3 === 0, lit("Allow: /docs/\n")).otherwise(lit("")),
      when(hostNum % 2 === 0, lit("Disallow: /\n")).otherwise(lit("")),
      lit("Disallow:\n"),
      when(hostNum % 11 === 0,
        lit("\nUser-agent: GraftBot\nAllow: /\n")).otherwise(lit("")))
  }

  /** The oracle replays longest-match on the KNOWN generative rule set
    * (never parsing robots text — the Spark group walk is what's under
    * test). Path = the rawUrl path; rules per host as planted above.
    * Precedence, replayed: the GraftBot group (hostNum % 11 == 0)
    * allows all; else the longest matching prefix among
    * {/docs/<g> dis, /docs/<g> allow tie (%5), /docs/ allow (%3),
    * / dis (%2)} with Allow winning the tie. */
  private val ORACLE = """
    WITH d AS (
      SELECT doc_id,
             CAST(substr(source, 4) AS BIGINT) AS h,
             '/docs/' || CAST(doc_id // 5 AS VARCHAR) ||
             (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) AS path
      FROM documents),
    v AS (
      SELECT doc_id, h, path,
        starts_with(path, '/docs/' || CAST(h % 7 AS VARCHAR)) AS m_g,
        (6 + length(CAST(h % 7 AS VARCHAR)))::INT AS len_g
      FROM d)
    SELECT doc_id, path,
      CASE
        WHEN h % 11 = 0 THEN true            -- GraftBot group: Allow /
        WHEN m_g THEN (h % 5 = 0)            -- group dir: tie => Allow
        WHEN h % 3 = 0 THEN true             -- Allow /docs/
        WHEN h % 2 = 0 THEN false            -- Disallow /
        ELSE true                            -- no match
      END AS allowed,
      CASE
        WHEN h % 11 = 0 THEN '/'
        WHEN m_g THEN '/docs/' || CAST(h % 7 AS VARCHAR)
        WHEN h % 3 = 0 THEN '/docs/'
        WHEN h % 2 = 0 THEN '/'
        ELSE ''
      END AS rule
    FROM v"""

  /** The q177 projection over any (doc_id, source) relation: fixture
    * robots parsed through the group-walk fold, fixture path verdicted
    * by longest match — staged so the parse fold evaluates once per
    * row. Factored so the streaming admission twin runs the IDENTICAL
    * plan (parity by construction; StreamingSpec pins it anyway). */
  def robotsVerdictRows(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"),
        expr("cast(substr(source, 4) as bigint)").as("__h"),
        concat(lit("/docs/"),
          (col("doc_id").cast("long") / 5).cast("long").cast("string"),
          when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")))
          .as("path"))
      .select(col("doc_id"), col("path"),
        robotsRules(syntheticRobots(col("__h")), "graftbot").as("__rules"))
      .select(col("doc_id"), col("path"),
        robotsVerdict(col("path"), col("__rules")).as("__v"))
      .select(col("doc_id"), col("path"),
        col("__v.allowed").as("allowed"),
        col("__v.rule").as("rule"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q177_robots_rules",
      (s, d) => robotsVerdictRows(documents(s, d)),
      Some(ORACLE),
      "robots.txt evaluation (RFC 9309): group walk (agent-specific over wildcard, comments, empty directives) as one array-domain fold + longest-match prefix verdict with the Allow tie rule, zero exchanges"))
}
