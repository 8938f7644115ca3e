package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Money, QueryDef, Tables}

/** Data-quality constraint validation (the Deequ/Great-Expectations layer
  * a training pipeline runs before anything reads the tables): each
  * constraint is one aggregate over its target table, reported as a
  * (check, target, metric, threshold, passed) row.
  *
  * 100 TB shape: every check is a partial-aggregated scan of exactly one
  * table — uniqueness via count vs count-distinct, referential integrity
  * via a left-anti count (broadcast when the dimension is small) — then a
  * union of one-row frames. No check materializes row-level violations
  * here; the report bounds the output at one row per constraint, and a
  * violating pipeline drills in with the corresponding filter query.
  */
object Quality {
  import Tables._

  private def check(name: String, target: String, metric: DataFrame,
      threshold: Double): DataFrame =
    metric.select(
      lit(name).as("check"), lit(target).as("target"),
      round(col("metric") * 1.0, 6).as("metric"),
      lit(threshold).as("threshold"),
      (col("metric") <= threshold).as("passed"))

  def report(s: SparkSession, d: String): DataFrame = {
    // metric convention: a VIOLATION measure, passing when <= threshold
    val o = orders(s, d)
    val li = lineitem(s, d)
    val cust = customer(s, d)
    val docs = documents(s, d)
    val ev = events(s, d)
    val checks = Seq(
      // primary-key uniqueness: duplicate key count must be 0
      check("pk_unique", "orders.o_orderkey",
        o.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("metric")), 0),
      check("pk_unique", "customer.c_custkey",
        cust.agg((count(lit(1)) - countDistinct(col("c_custkey"))).as("metric")), 0),
      // referential integrity: orphan foreign keys must be 0 (anti join;
      // the dimension side broadcasts)
      check("fk_orphans", "orders.o_custkey -> customer",
        o.join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("metric")), 0),
      check("fk_orphans", "lineitem.l_orderkey -> orders",
        li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("metric")), 0),
      // completeness: null fraction must be 0
      check("null_frac", "documents.text",
        docs.agg((sum(when(col("text").isNull, 1L).otherwise(0L)) * lit(1.0) /
          count(lit(1))).as("metric")), 0),
      // domain range: lineitem quantities outside [1, 50] must be 0
      check("out_of_range", "lineitem.l_quantity in [1,50]",
        li.agg(sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("metric")), 0),
      // non-negative money
      check("out_of_range", "orders.o_totalprice >= 0",
        o.agg(sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("metric")), 0),
      // event-type domain: unexpected categories must be 0
      check("domain", "events.event_type",
        ev.agg(sum(when(!col("event_type").isin(
          "signup", "view", "click", "purchase", "error"), 1L)
          .otherwise(0L)).as("metric")), 0))
    checks.reduce(_.unionAll(_)).orderBy(col("check"), col("target"))
  }

  /** Per-column statistics profile of one table — row count, null count,
    * exact distinct count — melted to one row per column. ONE aggregation
    * pass over the table: the multi-column distinct aggregates plan as a
    * single Expand + partial/final aggregate, so the scan happens once
    * regardless of column count. Exact NDV is the oracle-comparable
    * choice at test scale; at 100 TB swap `countDistinct` for
    * `approx_count_distinct` (the q43 HLL path) — same plan shape minus
    * the Expand. */
  def profile(df: DataFrame, tableName: String): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val stacked = cols.map(c => s"'$c', `__nulls_$c`, `__nd_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"'$tableName' AS table_name",
        s"stack(${cols.length}, $stacked) AS (column_name, n_nulls, n_distinct)",
        "__n AS n_rows")
      .select(col("table_name"), col("column_name"),
        col("n_rows"), col("n_nulls"), col("n_distinct"))
  }

  /** The tables q109 profiles, with their fixture column lists (used to
    * generate the DuckDB oracle; embeddings' list column is excluded —
    * exact float-array NDV is not a profile anyone collects). */
  private val PROFILE_TABLES: Seq[(String, Seq[String])] = Seq(
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"))

  private val PROFILE_ORACLE: String =
    PROFILE_TABLES.flatMap { case (t, cols) =>
      cols.map(c =>
        s"""SELECT '$t' AS table_name, '$c' AS column_name, count(*) AS n_rows,
           cast(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) as bigint) AS n_nulls,
           count(DISTINCT $c) AS n_distinct FROM $t""")
    }.mkString("\nUNION ALL\n")

  /** Distribution drift (population stability index) between a baseline
    * and a comparison sample of one integer-valued column `c`: the base's
    * [min, max] range splits into `k` equal-width buckets, both sides
    * histogram into them (out-of-range comparison values clamp to the
    * edge buckets), and each bucket reports its Laplace-smoothed PSI term
    * in integer micro-units — the q83 trick that makes `ln` outputs
    * hash-comparable across engines (identical rational inputs, rounded
    * at 1e-6 per row BEFORE any summing; total drift = sum(psi6)/1e6,
    * exact over bigints). Shape: two single-pass histograms + a k-row
    * spine, every join side after the histograms is k-bounded. */
  def driftPsi(base: DataFrame, curr: DataFrame, k: Int = 10): DataFrame = {
    // one-row stats frame, cached: it feeds BOTH the broadcast into the
    // bucketing pass and the k-row spine, and without the cache each use
    // would be its own full scan of base
    val stats = graft.Caches.lease(
      base.agg(min(col("c")).as("lo"), max(col("c")).as("hi"),
        count(lit(1)).as("n1")))
    // ONE tagged pass histograms both cohorts together (base is scanned
    // twice in total — once for its range stats, once here — and curr
    // once; a naive per-side histogram would pay four full scans)
    val hist = base.select(col("c"), lit("b").as("side"))
      .unionByName(curr.select(col("c"), lit("c").as("side")))
      .crossJoin(broadcast(stats))
      .select(least(lit((k - 1).toLong), greatest(lit(0L),
        expr(s"((c - lo) * $k) div (hi - lo + 1)"))).as("bucket"), col("side"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("side") === "b", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("side") === "c", 1L).otherwise(0L)).as("n_curr"))
    // n2 falls out of the k-row frame itself: a window over the joined
    // histogram (partition key = the non-foldable pmod constant, the
    // exclusiveRunningSum leaf idiom — k rows, bounded at any scale)
    // instead of re-executing the histogram subtree for a scalar count
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy(pmod(col("bucket"), lit(1L)))
    val p = (col("n_curr") + 1.0) / (col("n2") + k)
    val q = (col("n_base") + 1.0) / (col("n1") + k)
    stats.select(explode(sequence(lit(0L), lit((k - 1).toLong))).as("bucket"), col("n1"))
      .join(hist, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_curr"), lit(0L)).as("n_curr"),
        col("n1"))
      .withColumn("n2", sum(col("n_curr")).over(wAll))
      .select(col("bucket"), col("n_base"), col("n_curr"),
        round((p - q) * log(p / q) * 1e6).cast("long").as("psi6"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q109_profile",
      (s, d) =>
        PROFILE_TABLES.map { case (t, cols) =>
          val df = if (t == "events") events(s, d) else table(s, d, t)
          profile(df.select(cols.map(col): _*), t)
        }.reduce(_.unionAll(_)),
      Some(PROFILE_ORACLE),
      "column-statistics profiler: one Expand-fused aggregation pass per table, exact NDV under the oracle"),

    QueryDef(
      "q111_distribution_drift",
      (s, d) => {
        // Has the order-value distribution moved between two cohorts?
        // Baseline = even order keys, comparison = odd — a deterministic
        // split whose PSI sits near zero; a real pipeline points `curr`
        // at today's ingest and alerts on sum(psi6)/1e6.
        def cohort(parity: Int) = orders(s, d)
          .filter(pmod(col("o_orderkey"), lit(2)) === parity)
          .select(Money.cents(col("o_totalprice")).as("c"))
        driftPsi(cohort(0), cohort(1))
      },
      Some(s"""
        WITH base AS (
          SELECT ${Money.sqlCents("o_totalprice")} AS c FROM orders WHERE o_orderkey % 2 = 0),
        curr AS (
          SELECT ${Money.sqlCents("o_totalprice")} AS c FROM orders WHERE o_orderkey % 2 = 1),
        stats AS (SELECT min(c) AS lo, max(c) AS hi, count(*) AS n1 FROM base),
        n2t AS (SELECT count(*) AS n2 FROM curr),
        hb AS (
          SELECT least(9, greatest(0, ((c - lo) * 10) // (hi - lo + 1))) AS bucket,
                 count(*) AS cnt
          FROM base, stats GROUP BY 1),
        hc AS (
          SELECT least(9, greatest(0, ((c - lo) * 10) // (hi - lo + 1))) AS bucket,
                 count(*) AS cnt
          FROM curr, stats GROUP BY 1),
        spine AS (SELECT unnest(range(0, 10)) AS bucket)
        SELECT s.bucket,
               cast(coalesce(hb.cnt, 0) as bigint) AS n_base,
               cast(coalesce(hc.cnt, 0) as bigint) AS n_curr,
               cast(round(
                 ((coalesce(hc.cnt, 0) + 1.0)/(n2 + 10) - (coalesce(hb.cnt, 0) + 1.0)/(n1 + 10))
                 * ln(((coalesce(hc.cnt, 0) + 1.0)/(n2 + 10)) / ((coalesce(hb.cnt, 0) + 1.0)/(n1 + 10)))
                 * 1000000) as bigint) AS psi6
        FROM spine s
        LEFT JOIN hb ON s.bucket = hb.bucket
        LEFT JOIN hc ON s.bucket = hc.bucket, stats, n2t"""),
      "distribution drift (PSI) between cohorts: k-bounded histogram compare, integer-micro ln terms"),

    QueryDef(
      "q92_data_quality",
      (s, d) => report(s, d),
      Some("""
        WITH checks AS (
          SELECT 'pk_unique' AS check, 'orders.o_orderkey' AS target,
                 count(*) - count(DISTINCT o_orderkey) AS metric, 0.0 AS threshold
          FROM orders
          UNION ALL
          SELECT 'pk_unique', 'customer.c_custkey',
                 count(*) - count(DISTINCT c_custkey), 0.0
          FROM customer
          UNION ALL
          SELECT 'fk_orphans', 'orders.o_custkey -> customer',
                 (SELECT count(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey)), 0.0
          UNION ALL
          SELECT 'fk_orphans', 'lineitem.l_orderkey -> orders',
                 (SELECT count(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey)), 0.0
          UNION ALL
          SELECT 'null_frac', 'documents.text',
                 sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 0.0
          FROM documents
          UNION ALL
          SELECT 'out_of_range', 'lineitem.l_quantity in [1,50]',
                 sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END), 0.0
          FROM lineitem
          UNION ALL
          SELECT 'out_of_range', 'orders.o_totalprice >= 0',
                 sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END), 0.0
          FROM orders
          UNION ALL
          SELECT 'domain', 'events.event_type',
                 sum(CASE WHEN event_type NOT IN
                   ('signup','view','click','purchase','error')
                   THEN 1 ELSE 0 END), 0.0
          FROM events)
        SELECT "check", target, round(metric * 1.0, 6) AS metric,
               threshold, metric <= threshold AS passed
        FROM checks
        ORDER BY "check", target"""),
      "data-quality constraint report: pk/fk/null/range/domain checks, one partial-agg scan each"),

    QueryDef(
      "q136_trend_regression",
      (s, d) => {
        // Group-wise OLS trend estimation in EXACT integers: per event
        // type, the least-squares slope of spend (cents) over time
        // (hour index), as the exact rational
        //   slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        // emitted as BIGINT numerator/denominator — the regression
        // itself runs under the hash gate, no float accumulation
        // anywhere. Hours are CENTERED on the corpus minimum (one
        // broadcast single-row agg) so the moment products stay in
        // 64-bit range at any calendar epoch; centering shifts the
        // intercept, never the slope. One partial-agg pass computes all
        // five moments per group.
        val ev = events(s, d)
          .select(col("event_type"),
            expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("h"),
            Money.cents(col("value")).as("y"))
        val minh = ev.agg(min(col("h")).as("h0"))
        ev.crossJoin(broadcast(minh))
          .select(col("event_type"), (col("h") - col("h0")).as("x"), col("y"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"), col("sy").as("total_cents"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type,
                 epoch(date_trunc('hour', cast(ts AS timestamp))) // 3600 AS h,
                 ${Money.sqlCents("\"value\"")} AS y
          FROM events),
        c AS (SELECT min(h) AS h0 FROM ev),
        m AS (
          SELECT event_type, count(*) AS n,
                 cast(sum(h - h0) AS bigint) AS sx,
                 cast(sum(y) AS bigint) AS sy,
                 cast(sum((h - h0) * y) AS bigint) AS sxy,
                 cast(sum((h - h0) * (h - h0)) AS bigint) AS sxx
          FROM ev CROSS JOIN c GROUP BY event_type)
        SELECT event_type, n, sy AS total_cents,
               n * sxy - sx * sy AS slope_num,
               n * sxx - sx * sx AS slope_den
        FROM m"""),
      "group-wise OLS trend slope as an exact BIGINT rational (centered hours; one moment pass)"),

    QueryDef(
      "q137_winsorized_stats",
      (s, d) => {
        // Robust per-group statistics: the exact P10/P90 winsorized sum
        // of document lengths per language. The scale trick is the
        // VALUE-HISTOGRAM: rows fold into (lang, value) counts by ONE
        // partial aggregation, so the per-lang window that locates the
        // exact rank-ceil(q*n) cut values runs over DISTINCT VALUES
        // (bounded by the value domain), never over rows — a mega-group
        // costs its value spread, not its row count. Clipping then
        // re-aggregates the histogram against the broadcast per-lang
        // cuts. All integers end to end; rank cuts use the
        // ceil(q*n)-th-smallest convention.
        val hist = documents(s, d)
          .groupBy(col("lang"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("lang")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cum", sum(col("cnt")).over(w))
          .withColumn("n", sum(col("cnt")).over(
            Window.partitionBy(col("lang"))))
        val cuts = cum
          .groupBy(col("lang"), col("n"))
          .agg(
            min(when(col("cum") * 10 >= col("n"), col("v"))).as("lo_cut"),
            min(when(col("cum") * 10 >= col("n") * 9, col("v"))).as("hi_cut"))
        hist.join(broadcast(cuts), Seq("lang"))
          .groupBy(col("lang"))
          .agg(max(col("n")).as("n"),
            max(col("lo_cut")).as("lo_cut"),
            max(col("hi_cut")).as("hi_cut"),
            sum(greatest(col("lo_cut"), least(col("hi_cut"), col("v")))
              * col("cnt")).as("winsorized_sum"))
      },
      Some("""
        WITH hist AS (
          SELECT lang, n_chars AS v, count(*) AS cnt
          FROM documents GROUP BY 1, 2),
        cum AS (
          SELECT lang, v, cnt,
                 sum(cnt) OVER (PARTITION BY lang ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 sum(cnt) OVER (PARTITION BY lang) AS n
          FROM hist),
        cuts AS (
          SELECT lang, n,
                 min(CASE WHEN cum * 10 >= n THEN v END) AS lo_cut,
                 min(CASE WHEN cum * 10 >= n * 9 THEN v END) AS hi_cut
          FROM cum GROUP BY lang, n)
        SELECT h.lang, cast(max(c.n) AS bigint) AS n,
               max(c.lo_cut) AS lo_cut, max(c.hi_cut) AS hi_cut,
               cast(sum(greatest(c.lo_cut, least(c.hi_cut, h.v)) * h.cnt)
                    AS bigint) AS winsorized_sum
        FROM hist h JOIN cuts c ON c.lang = h.lang
        GROUP BY h.lang"""),
      "exact winsorized group statistics via the value-histogram (windows over distinct values, never rows)"),

    QueryDef(
      "q159_percentile_gate",
      (s, d) => {
        // Per-source quality gating at an EXACT percentile — "keep the
        // top 75% of each source by score" — the per-domain filter rung
        // between q121's global threshold classifier and q102's count
        // cap. Score is lexical diversity (distinct-token fraction in
        // integer ten-thousandths): a pure MAP over the token array,
        // zero shuffles to score. The P25 cut re-uses q137's
        // value-histogram discipline: rows fold into (source, score)
        // counts in ONE partial agg, the rank scan runs over the
        // score DOMAIN (<= 10001 distinct values per source, whatever
        // the corpus size), and the per-source thresholds broadcast
        // back — a mega-source costs its score spread, never its rows.
        // Threshold convention: smallest score with cum >= ceil(n/4);
        // ties at the cut are KEPT (>=), so the gate never drops more
        // than the bottom quartile.
        val scored = documents(s, d)
          .select(col("doc_id"), col("source"),
            graft.functions.TextAnalysis.tokens(col("text")).as("w"))
          .filter(size(col("w")) > 0)
          .select(col("doc_id"), col("source"),
            graft.functions.TextAnalysis.lexDiversityScore4("w").as("score4"))
        val hist = scored.groupBy(col("source"), col("score4"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("source")).orderBy(col("score4"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cum", sum(col("cnt")).over(w))
          .withColumn("n", sum(col("cnt")).over(
            Window.partitionBy(col("source"))))
        val thr = cum
          .filter(col("cum") * 4 >= col("n"))
          .groupBy(col("source")).agg(min(col("score4")).as("thr4"))
        scored.join(broadcast(thr), Seq("source"))
          .select(col("doc_id"), col("source"), col("score4"), col("thr4"),
            (col("score4") >= col("thr4")).as("kept"))
      },
      Some("""
        WITH scored AS (
          SELECT doc_id, source,
                 (len(list_distinct(w)) * 10000) // len(w) AS score4
          FROM (SELECT doc_id, source,
                       list_filter(string_split(text, ' '), t -> t <> '') AS w
                FROM documents)
          WHERE len(w) > 0),
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
          FROM cum WHERE cum * 4 >= n GROUP BY 1)
        SELECT s.doc_id, s.source, s.score4, t.thr4,
               s.score4 >= t.thr4 AS kept
        FROM scored s JOIN thr t USING (source)"""),
      "per-source exact-percentile quality gate: map-side scoring + value-histogram rank cut (q137 discipline) + broadcast thresholds"),

    QueryDef(
      "q162_token_budget",
      (s, d) => {
        // TOKEN-BUDGET selection — the weighted sibling of q159's count
        // percentile: each source may contribute at most a token budget
        // (40% of its token mass here; the production knob is the
        // mixture recipe's per-source allotment), filled best-quality-
        // first. The cut is a WEIGHTED quantile: the score histogram
        // carries sum(tokens) per (source, score) cell, the descending
        // cumulative locates the highest score threshold whose
        // better-than-it mass still fits the budget, and the WHOLE
        // threshold bucket admits (overshoot bounded by one histogram
        // cell — the standard resolution trade, mirrored in the oracle).
        // Scale shape identical to q137/q159: one partial-agg fold to
        // the (source, score) domain, windows over score cells (never
        // rows), thresholds broadcast back to a map-side keep flag.
        val scored = documents(s, d)
          .select(col("doc_id"), col("source"),
            graft.functions.TextAnalysis.tokens(col("text")).as("w"))
          .filter(size(col("w")) > 0)
          .select(col("doc_id"), col("source"),
            size(col("w")).cast("long").as("ntok"),
            graft.functions.TextAnalysis.lexDiversityScore4("w").as("score4"))
        val hist = scored.groupBy(col("source"), col("score4"))
          .agg(sum(col("ntok")).as("tok"))
        val wdesc = Window.partitionBy(col("source"))
          .orderBy(col("score4").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cumtok", sum(col("tok")).over(wdesc))
          .withColumn("total", sum(col("tok")).over(
            Window.partitionBy(col("source"))))
        // budget = 40% of the source's token mass (integer, exact);
        // threshold = highest score cell at which the running best-first
        // mass first reaches the budget (every better cell underfills)
        val thr = cum
          .filter(col("cumtok") * 10 >= col("total") * 4)
          .groupBy(col("source"))
          .agg(max(col("score4")).as("thr4"),
            max(col("total")).as("total_tok"))
        scored.join(broadcast(thr), Seq("source"))
          .filter(col("score4") >= col("thr4"))
          .groupBy(col("source"), col("thr4"), col("total_tok"))
          .agg(count(lit(1)).as("n_admitted"),
            sum(col("ntok")).as("tok_admitted"))
      },
      Some("""
        WITH scored AS (
          SELECT doc_id, source, len(w)::BIGINT AS ntok,
                 (len(list_distinct(w)) * 10000) // len(w) AS score4
          FROM (SELECT doc_id, source,
                       list_filter(string_split(text, ' '), t -> t <> '') AS w
                FROM documents)
          WHERE len(w) > 0),
        hist AS (
          SELECT source, score4, sum(ntok) AS tok
          FROM scored GROUP BY 1, 2),
        cum AS (
          SELECT source, score4,
                 sum(tok) OVER (PARTITION BY source ORDER BY score4 DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtok,
                 sum(tok) OVER (PARTITION BY source) AS total
          FROM hist),
        thr AS (
          SELECT source, max(score4) AS thr4, max(total) AS total_tok
          FROM cum WHERE cumtok * 10 >= total * 4 GROUP BY 1)
        SELECT s.source, t.thr4, cast(t.total_tok as bigint) AS total_tok,
               count(*) AS n_admitted,
               cast(sum(s.ntok) as bigint) AS tok_admitted
        FROM scored s JOIN thr t USING (source)
        WHERE s.score4 >= t.thr4
        GROUP BY 1, 2, 3"""),
      "token-budget selection: best-quality-first weighted-quantile cut on the (source, score) histogram; whole-bucket admission bounds overshoot at one cell")
  )
}
