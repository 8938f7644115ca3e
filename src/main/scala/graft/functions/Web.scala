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
  private[graft] def rawUrl(docId: Column, source: Column): Column =
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
      "URL canonicalization + collapse: map-side scheme/www/slash/tracker/param-order normalization, one groupBy on the canonical key"),

    QueryDef(
      "q161_curation_funnel",
      (s, d) => {
        // END-TO-END curation funnel composed from this round's stages —
        // the q97 lesson applied to the r14 operators: individually green
        // stages can still drift at their BOUNDARIES (which population
        // each stage computes its statistics on), so the composition gets
        // its own oracle. Pipeline, in production order:
        //   (1) URL-canonical dedup (q158's operator): keep each
        //       canonical URL's min-doc_id survivor;
        //   (2) per-source percentile gate (q159's operator) with the
        //       P25 cut computed ON THE SURVIVORS — dedup first, then
        //       gate, the order real pipelines use (gating before dedup
        //       would let duplicate mass move the threshold);
        //   (3) temperature admission (q151's operator) with thresholds
        //       derived from the GATED population.
        // Output: one funnel row per source — raw, post-dedup, post-gate
        // and admitted doc counts plus admitted whitespace-token mass
        // (the number a mixture planner actually consumes).
        // 100 TB shape: every stage is map-side scoring plus one
        // partial-agg exchange (canon collapse, score histogram,
        // source counts); the funnel rollup is one more groupBy on the
        // bounded source roster. Zero-token docs exit at the gate stage
        // by construction (no score), mirrored in the oracle.
        import org.apache.spark.sql.expressions.Window
        val docs = documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokens(col("text")).as("w"))
        val canon = docs
          .withColumn("canon_url",
            canonicalUrl(rawUrl(col("doc_id"), col("source"))))
        // lease-cache the SMALL frames every downstream stage re-derives:
        // survivor ids (one row per canonical group, no token arrays) and
        // the scored survivors (the population three stages consume) —
        // uncached, the funnel re-executed the documents scan + tokenize
        // subtree 15x (measured in the plan); leased, the corpus subtree
        // runs once per population. Harnesses clearCache per query;
        // library callers release via graft.Caches. The scored cache
        // carries ntok, NOT the token arrays: every downstream consumer
        // reads only size(w), so caching w would hold roughly the whole
        // corpus token mass resident for a funnel that needs one long
        // per doc (the r14 verdict's cache-narrowing directive).
        val survivorIds = graft.Caches.lease(canon.groupBy(col("canon_url"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id")))
        val survivors = docs
          .join(survivorIds, Seq("doc_id"), "left_semi")
        val scored = graft.Caches.lease(survivors
          .filter(size(col("w")) > 0)
          .select(col("doc_id"), col("source"),
            size(col("w")).cast("long").as("ntok"),
            TextAnalysis.lexDiversityScore4("w").as("score4")))
        val hist = scored.groupBy(col("source"), col("score4"))
          .agg(count(lit(1)).as("cnt"))
        val wsp = Window.partitionBy(col("source")).orderBy(col("score4"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val thr = hist
          .withColumn("cum", sum(col("cnt")).over(wsp))
          .withColumn("n", sum(col("cnt")).over(
            Window.partitionBy(col("source"))))
          .filter(col("cum") * 4 >= col("n"))
          .groupBy(col("source")).agg(min(col("score4")).as("thr4"))
        val gated = scored.join(broadcast(thr), Seq("source"))
          .filter(col("score4") >= col("thr4"))
          .select(col("doc_id"), col("source"), col("ntok"))
        val admit = gated
          .join(broadcast(Mixture.admissionThresholds(gated)
            .select(col("source"), col("k"))), Seq("source"))
          .withColumn("kept", Mixture.keptUnder(col("doc_id"), col("k")))
        val raw = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_raw"))
        val surv = survivors.groupBy(col("source"))
          .agg(count(lit(1)).as("n_dedup"))
        val funnel = admit.groupBy(col("source"))
          .agg(count(lit(1)).as("n_gated"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_admitted"),
            sum(when(col("kept"), col("ntok")).otherwise(0L)).as("tok_admitted"))
        raw.join(surv, Seq("source")).join(funnel, Seq("source"))
      },
      Some("""
        WITH docs AS (
          SELECT doc_id, source,
                 list_filter(string_split(text, ' '), t -> t <> '') AS w
          FROM documents),
        raw_url AS (
          SELECT doc_id, source, w,
            (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
            (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || upper(source) || '.COM'
                  ELSE source || '.com' END) ||
            '/docs/' || CAST(doc_id // 5 AS VARCHAR) ||
            (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
            (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=1&a=2'
                  ELSE '?a=2&b=1&utm_campaign=x' END) ||
            (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url
          FROM docs),
        pre AS (
          SELECT doc_id, source, w,
                 regexp_replace(regexp_replace(url, '#.*$', ''),
                   '^(?i)https?://', '') AS ns
          FROM raw_url),
        split AS (
          SELECT doc_id, source, w,
                 split_part(ns, '?', 1) AS base,
                 CASE WHEN strpos(ns, '?') > 0
                      THEN substr(ns, strpos(ns, '?') + 1) ELSE '' END AS q
          FROM pre),
        canon AS (
          SELECT doc_id, source, w,
            regexp_replace(lower(split_part(base, '/', 1)), '^www\.', '') ||
            regexp_replace(substr(base, length(split_part(base, '/', 1)) + 1),
              '/+$', '') ||
            (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
                  ELSE '' END) AS canon_url
          FROM (SELECT doc_id, source, w, base,
                  list_sort(list_filter(string_split(q, '&'), p ->
                    p <> '' AND NOT starts_with(p, 'utm_')
                           AND NOT starts_with(p, 'ref='))) AS kept
                FROM split)),
        survivors AS (
          SELECT doc_id, source, w FROM canon
          WHERE doc_id IN (SELECT min(doc_id) FROM canon GROUP BY canon_url)),
        scored AS (
          SELECT doc_id, source, w,
                 (len(list_distinct(w)) * 10000) // len(w) AS score4
          FROM survivors WHERE len(w) > 0),
        hist AS (
          SELECT source, score4, count(*) AS cnt FROM scored GROUP BY 1, 2),
        cum AS (
          SELECT source, score4,
                 sum(cnt) OVER (PARTITION BY source ORDER BY score4
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 sum(cnt) OVER (PARTITION BY source) AS n
          FROM hist),
        thr AS (
          SELECT source, min(score4) AS thr4
          FROM cum WHERE cum * 4 >= n GROUP BY 1),
        gated AS (
          SELECT s.doc_id, s.source, s.w
          FROM scored s JOIN thr t USING (source)
          WHERE s.score4 >= t.thr4),
        counts AS (
          SELECT source, count(*)::BIGINT AS n_docs FROM gated GROUP BY 1),
        weights AS (
          SELECT source, n_docs,
                 CASE WHEN (r0 + CASE WHEN (r0+1)*(r0+1) <= x THEN 1 ELSE 0 END)
                           * (r0 + CASE WHEN (r0+1)*(r0+1) <= x THEN 1 ELSE 0 END) > x
                      THEN r0 + CASE WHEN (r0+1)*(r0+1) <= x THEN 1 ELSE 0 END - 1
                      ELSE r0 + CASE WHEN (r0+1)*(r0+1) <= x THEN 1 ELSE 0 END
                 END AS w
          FROM (SELECT source, n_docs, n_docs * 1048576 AS x,
                       CAST(floor(sqrt((n_docs * 1048576)::DOUBLE)) AS BIGINT) AS r0
                FROM counts)),
        tot AS (
          SELECT sum(n_docs)::BIGINT AS n_total, sum(w)::BIGINT AS sum_w
          FROM weights),
        thresholds AS (
          SELECT source,
                 least(65536::BIGINT, CAST(
                   ((n_total // 2)::HUGEINT * w::HUGEINT * 65536)
                     // (sum_w::HUGEINT * n_docs::HUGEINT) AS BIGINT)) AS k
          FROM weights, tot),
        admit AS (
          SELECT g.source, g.doc_id, len(g.w)::BIGINT AS nw,
                 (t.k >= 65536 OR
                  substr(md5('temp:' || g.doc_id::VARCHAR), 1, 4) <
                    lower(lpad(hex(t.k), 4, '0'))) AS kept
          FROM gated g JOIN thresholds t USING (source)),
        raw AS (SELECT source, count(*) AS n_raw FROM docs GROUP BY 1),
        surv AS (SELECT source, count(*) AS n_dedup FROM survivors GROUP BY 1),
        funnel AS (
          SELECT source, count(*) AS n_gated,
                 cast(sum(CASE WHEN kept THEN 1 ELSE 0 END) as bigint) AS n_admitted,
                 cast(sum(CASE WHEN kept THEN nw ELSE 0 END) as bigint) AS tok_admitted
          FROM admit GROUP BY 1)
        SELECT r.source, r.n_raw, s.n_dedup, f.n_gated, f.n_admitted,
               f.tok_admitted
        FROM raw r JOIN surv s USING (source) JOIN funnel f USING (source)"""),
      "composed curation funnel: URL-canonical dedup -> per-source percentile gate (cut on survivors) -> temperature admission (thresholds on gated) -> per-source funnel report"))
}
