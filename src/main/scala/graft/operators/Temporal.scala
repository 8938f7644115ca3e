package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Temporal operators over the events stream table (SURVEY.md §2.2: range /
  * interval join, as-of join, tumbling / sliding / session windows, keyed
  * dedup). All are batch forms; the streaming module reuses the same
  * shapes with watermarks.
  *
  * The oracle SQL casts `events.ts` (nanosecond parquet) to microseconds
  * first so both engines compare identical instants — see
  * [[graft.Tables.events]].
  */
object Temporal {
  import Tables._

  /** DuckDB-side events relation with Spark-identical microsecond ts. */
  private val EV = "(SELECT event_id, cast(ts as timestamp) AS ts, user_id, event_type, value, props FROM events)"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q22_range_join",
      (s, d) => {
        // interval join: errors within 10 minutes after each purchase, same
        // user. Equi key (user_id) carries the shuffle; the time range is a
        // residual filter on the sort-merge join — no pair-space blowup.
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
        val e = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("ets"))
        p.join(e,
            p("user_id") === e("user_id") &&
              e("ets") >= p("pts") &&
              e("ets") < p("pts") + expr("INTERVAL 10 MINUTES"))
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n_errors_10m"))
          .orderBy(col("purchase_id"))
      },
      Some(s"""
        WITH ev AS (SELECT * FROM $EV)
        SELECT p.event_id AS purchase_id, count(*) AS n_errors_10m
        FROM ev p JOIN ev e
          ON p.user_id = e.user_id
         AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 10 MINUTE
        WHERE p.event_type = 'purchase' AND e.event_type = 'error'
        GROUP BY p.event_id
        ORDER BY p.event_id"""),
      "range/interval join: equi-key shuffle + time-range residual"),

    QueryDef(
      "q23_asof_join",
      (s, d) => {
        // latest signup at-or-before each purchase, per user — the
        // single-shuffle union+window as-of join (operators.AsOfJoin).
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"))
        AsOfJoin.backward(purchases, signups, key = "user_id", ts = "ts",
            payload = Seq("ts"))
          .select(
            col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("purchase_us"),
            unix_micros(col("matched_ts")).as("signup_us"),
            (unix_micros(col("ts")) - unix_micros(col("matched_ts"))).as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some(s"""
        WITH ev AS (SELECT * FROM $EV),
        p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        sg AS (SELECT user_id, ts FROM ev WHERE event_type = 'signup')
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS purchase_us,
               epoch_us(sg.ts) AS signup_us,
               epoch_us(p.ts) - epoch_us(sg.ts) AS gap_us
        FROM p ASOF LEFT JOIN sg
          ON p.user_id = sg.user_id AND p.ts >= sg.ts
        ORDER BY p.event_id"""),
      "as-of join (backward, inclusive) == DuckDB ASOF LEFT JOIN"),

    QueryDef(
      "q24_tumbling_window",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
               graft.Money.sum2(col("value")).as("sum_value"))
          .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))
          .orderBy(col("bucket"), col("event_type")),
      Some(s"""
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*) AS n,
               sum(cast(round("value"*100) as bigint))/100.0 AS sum_value
        FROM $EV
        GROUP BY 1, 2
        ORDER BY bucket, event_type"""),
      "tumbling window aggregation (window() generator == epoch-aligned date_trunc)"),

    QueryDef(
      "q25_sliding_window",
      (s, d) =>
        // 1-hour windows sliding every 30 min: each event lands in 2 windows.
        events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"),
               countDistinct(col("user_id")).as("n_users"))
          .select(col("w.start").as("bucket"), col("n"), col("n_users"))
          .orderBy(col("bucket")),
      Some(s"""
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - g.off AS bucket,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users
        FROM $EV
        CROSS JOIN (SELECT unnest([INTERVAL 0 MINUTE, INTERVAL 30 MINUTE]) AS off) g
        GROUP BY 1
        ORDER BY bucket"""),
      "sliding window: each row expands into size/slide windows"),

    QueryDef(
      "q26_session_window",
      (s, d) =>
        // session_window: native Spark session assignment (state-store-backed
        // in streaming; sort-based here). 30-minute inactivity gap.
        events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"),
               min(unix_micros(col("ts"))).as("first_us"),
               max(unix_micros(col("ts"))).as("last_us"))
          .select(col("user_id"), col("first_us"), col("last_us"), col("n_events"))
          .orderBy(col("user_id"), col("first_us")),
      Some(s"""
        WITH ordered AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM $EV),
        sess AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM ordered)
        SELECT user_id,
               epoch_us(min(ts)) AS first_us,
               epoch_us(max(ts)) AS last_us,
               count(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
        ORDER BY user_id, first_us"""),
      "session window (30-min gap); oracle derives sessions via lag+cumsum"),

    QueryDef(
      "q27_dedup_keep_first",
      (s, d) => {
        // deterministic keyed dedup: first event per (user_id, event_type)
        // by (ts, event_id) — the scale-correct dropDuplicates: one shuffle
        // on the key, per-partition top-1, no global sort.
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"),
                  unix_micros(col("ts")).as("first_us"), col("event_id"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some(s"""
        SELECT user_id, event_type, epoch_us(ts) AS first_us, event_id
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts, event_id) AS rn
              FROM $EV)
        WHERE rn = 1
        ORDER BY user_id, event_type"""),
      "keyed keep-first dedup (deterministic dropDuplicates)"),

    QueryDef(
      "q88_resample",
      (s, d) => {
        // Time-series resample to a regular hourly grid + forward-fill
        // (the gap-filling every monitoring/feature pipeline needs): a
        // (type x hour) spine left-joins the observed hourly aggregates;
        // missing hours carry the last observed revenue forward and an
        // explicit observed flag. The spine is TIME-bounded (hours in the
        // data's range x distinct types — tiny at any corpus size, so the
        // cross join broadcasts), the heavy aggregation partial-aggregates
        // before it, and the fill window is per-type over the spine, never
        // over raw events. Revenue uses the exact-cents sum so the filled
        // values hash identically across engines.
        val ev = events(s, d).select(col("event_type").as("typ"),
          date_trunc("hour", col("ts")).as("h"), col("value"))
        val hourly = ev.groupBy(col("typ"), col("h"))
          .agg(graft.Money.sum2(col("value")).as("rev"), count(lit(1)).as("n"))
        val spine = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("h"))
        val types = ev.select(col("typ")).distinct()
        val w = Window.partitionBy(col("typ")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, 0)
        types.crossJoin(spine)
          .join(hourly, Seq("typ", "h"), "left")
          .select(col("typ"), unix_micros(col("h")).as("hour_us"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            col("rev").isNotNull.as("observed"),
            coalesce(round(last(col("rev"), ignoreNulls = true).over(w), 2),
              lit(0.0)).as("rev_ff"))
          .orderBy(col("typ"), col("hour_us"))
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type AS typ, date_trunc('hour', ts) AS h, value
          FROM $EV),
        hourly AS (
          SELECT typ, h,
                 cast(sum(cast(round(value*100) as bigint)) as bigint)/100.0 AS rev,
                 count(*) AS n
          FROM ev GROUP BY 1, 2),
        bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
        spine AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
          FROM bounds),
        grid AS (
          SELECT typ, h FROM (SELECT DISTINCT typ FROM ev) CROSS JOIN spine),
        j AS (
          SELECT g.typ, g.h, hourly.rev, hourly.n
          FROM grid g LEFT JOIN hourly USING (typ, h))
        SELECT typ, epoch_us(h) AS hour_us,
               cast(coalesce(n, 0) as bigint) AS n_events,
               rev IS NOT NULL AS observed,
               coalesce(round(last_value(rev IGNORE NULLS) OVER (
                 PARTITION BY typ ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2), 0.0) AS rev_ff
        FROM j
        ORDER BY typ, hour_us"""),
      "time-series resample: hourly grid spine + forward-fill with exact-cents revenue"),

    QueryDef(
      "q89_funnel",
      (s, d) => {
        // Ordered funnel analysis (the product-analytics sequence match):
        // how many users progress signup -> view -> click -> purchase,
        // where each step's FIRST qualifying occurrence must fall within
        // [prev_t, prev_t + 1 day] — the conversion window that makes the
        // funnel discriminative (150 -> 39 -> 16 -> 5 at sf0.01; without a
        // window every active user eventually completes every step).
        // Each stage is one conditional
        // aggregation: the (user, t_prev) frame from stage k-1 — one row
        // per qualifying user — joins back to that user's events and takes
        // min(ts > t_prev). Every stage shuffles on user_id, so after the
        // first exchange the joins are co-partitioned; per-stage state is
        // one timestamp per surviving user, monotonically shrinking down
        // the funnel. Timestamps compare as integer micros — exact.
        val ev = events(s, d).select(col("user_id"),
          col("event_type").as("typ"), unix_micros(col("ts")).as("us"))
        val s1 = ev.filter(col("typ") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("t"))
        val winUs = 86400000000L // 1-day conversion window, micros
        def next(prev: org.apache.spark.sql.DataFrame, typ: String) =
          ev.filter(col("typ") === typ)
            .join(prev, "user_id")
            .filter(col("us") > col("t") && col("us") <= col("t") + winUs)
            .groupBy(col("user_id")).agg(min(col("us")).as("t"))
        val s2 = next(s1, "view")
        val s3 = next(s2, "click")
        val s4 = next(s3, "purchase")
        val counts = Seq((1, "signup", s1), (2, "view", s2),
          (3, "click", s3), (4, "purchase", s4))
          .map { case (i, name, df) =>
            df.agg(count(lit(1)).as("n_users"))
              .select(lit(i).as("step"), lit(name).as("stage"), col("n_users"))
          }.reduce(_.unionAll(_))
        val first = counts.filter(col("step") === 1)
          .select(col("n_users").as("n0"))
        counts.crossJoin(first)
          .select(col("step"), col("stage"), col("n_users"),
            round(col("n_users") * lit(1.0) / col("n0"), 4).as("conversion"))
          .orderBy(col("step"))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, event_type AS typ, epoch_us(ts) AS us FROM $EV),
        s1 AS (SELECT user_id, min(us) AS t FROM ev
               WHERE typ = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.us) AS t
               FROM ev e JOIN s1 USING (user_id)
               WHERE e.typ = 'view' AND e.us > s1.t AND e.us <= s1.t + 86400000000 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.us) AS t
               FROM ev e JOIN s2 USING (user_id)
               WHERE e.typ = 'click' AND e.us > s2.t AND e.us <= s2.t + 86400000000 GROUP BY 1),
        s4 AS (SELECT e.user_id, min(e.us) AS t
               FROM ev e JOIN s3 USING (user_id)
               WHERE e.typ = 'purchase' AND e.us > s3.t AND e.us <= s3.t + 86400000000 GROUP BY 1),
        counts AS (
          SELECT 1 AS step, 'signup' AS stage, count(*) AS n_users FROM s1
          UNION ALL SELECT 2, 'view', count(*) FROM s2
          UNION ALL SELECT 3, 'click', count(*) FROM s3
          UNION ALL SELECT 4, 'purchase', count(*) FROM s4),
        f AS (SELECT n_users AS n0 FROM counts WHERE step = 1)
        SELECT step, stage, n_users,
               round(n_users * 1.0 / n0, 4) AS conversion
        FROM counts CROSS JOIN f
        ORDER BY step"""),
      "ordered funnel: sequential conditional min-ts aggregation, per-stage state = one ts per user"),

    QueryDef(
      "q90_retention",
      (s, d) => {
        // Weekly retention cohorts (the funnel's companion report): users
        // grouped by first-seen week; for each later week, the share of
        // the cohort still active. Two partial-agg groupBys — first-seen
        // per user, then distinct (user, week) activity — joined on
        // user_id and rolled up to (cohort, week_offset). The cohort
        // matrix is weeks^2 rows at ANY corpus size; nothing user-sized
        // leaves the first aggregation. date_trunc('week') is identical
        // Monday-aligned in both engines.
        val ev = events(s, d).select(col("user_id"),
          date_trunc("week", col("ts")).as("wk"))
        val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("c0"))
        val active = ev.select(col("user_id"), col("wk")).distinct()
        val sizes = cohort.groupBy(col("c0")).agg(count(lit(1)).as("cohort_n"))
        active.join(cohort, "user_id")
          .groupBy(col("c0"), col("wk"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, Seq("c0"))
          .select(unix_micros(col("c0")).as("cohort_us"),
            ((unix_micros(col("wk")) - unix_micros(col("c0"))) /
              (7L * 86400000000L)).cast("long").as("week_offset"),
            col("n_active"), col("cohort_n"),
            round(col("n_active") * lit(1.0) / col("cohort_n"), 4).as("retention"))
          .orderBy(col("cohort_us"), col("week_offset"))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, date_trunc('week', ts) AS wk FROM $EV),
        cohort AS (SELECT user_id, min(wk) AS c0 FROM ev GROUP BY 1),
        active AS (SELECT DISTINCT user_id, wk FROM ev),
        sizes AS (SELECT c0, count(*) AS cohort_n FROM cohort GROUP BY 1),
        cells AS (
          SELECT c0, wk, count(*) AS n_active
          FROM active JOIN cohort USING (user_id)
          GROUP BY 1, 2)
        SELECT epoch_us(c0) AS cohort_us,
               (epoch_us(wk) - epoch_us(c0)) // ${7L * 86400000000L} AS week_offset,
               n_active, cohort_n,
               round(n_active * 1.0 / cohort_n, 4) AS retention
        FROM cells JOIN sizes USING (c0)
        ORDER BY cohort_us, week_offset"""),
      "weekly retention cohorts: first-seen week x activity week matrix, bounded by weeks^2"),

    QueryDef(
      "q112_interval_merge",
      (s, d) => {
        // Interval consolidation (islands & gaps): each event opens an
        // activity interval [ts, ts + value seconds]; overlapping or
        // touching intervals per user merge into islands. The classic
        // rewrite: a running max of interval ends over the (user, start)
        // order marks island breaks (start strictly beyond every earlier
        // end), a running sum of breaks numbers the islands, and a plain
        // groupBy collapses them. All three windows + the final aggregate
        // share ONE user_id partitioning — a single shuffle end to end.
        // Epoch-microsecond integers avoid engine-specific interval
        // arithmetic; floor() before the cast because Spark truncates
        // double->long while DuckDB rounds.
        val iv = events(s, d).select(
          col("user_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) +
            floor(col("value")).cast("long") * 1000000L).as("en"))
        val ord = Window.partitionBy(col("user_id")).orderBy(col("st"), col("en"))
        val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
        val toHere = ord.rowsBetween(Window.unboundedPreceding, 0)
        iv.withColumn("prev_end", max(col("en")).over(prior))
          .withColumn("brk",
            when(col("prev_end").isNull || col("st") > col("prev_end"), 1L).otherwise(0L))
          .withColumn("island", sum(col("brk")).over(toHere))
          .groupBy(col("user_id"), col("island"))
          .agg(min(col("st")).as("start_us"), max(col("en")).as("end_us"),
            count(lit(1)).as("n_events"))
      },
      Some(s"""
        WITH iv AS (
          SELECT user_id, epoch_us(ts) AS st,
                 epoch_us(ts) + cast(floor("value") as bigint) * 1000000 AS en
          FROM $EV),
        marked AS (
          SELECT user_id, st, en,
                 max(en) OVER (PARTITION BY user_id ORDER BY st, en
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          FROM iv),
        islands AS (
          SELECT user_id, st, en,
                 sum(CASE WHEN prev_end IS NULL OR st > prev_end THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY st, en
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM marked)
        SELECT user_id, cast(island as bigint) AS island,
               min(st) AS start_us, max(en) AS end_us, count(*) AS n_events
        FROM islands
        GROUP BY user_id, island"""),
      "interval consolidation (islands & gaps): running-max break detection, one shuffle end to end"),

    QueryDef(
      "q132_user_journeys",
      (s, d) => {
        // Path analysis: the top-20 opening journeys — each user's first
        // three event types in (ts, event_id) order, joined into one
        // path string — ranked by how many users share them. The window
        // partitions by user (state bounded by one user's activity,
        // never corpus-wide), the journey assembly is an order-carrying
        // struct sort inside a per-user aggregate, and the ranking is a
        // bounded TakeOrderedAndProject. The (ts, event_id) tiebreak
        // makes every journey string engine-deterministic.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .groupBy(col("user_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("event_type").as("et")))),
            x => x("et")), ">").as("journey"))
          .groupBy(col("journey"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("journey").asc)
          .limit(20)
      },
      Some(s"""
        WITH ranked AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rn
          FROM $EV),
        journeys AS (
          SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS journey
          FROM ranked WHERE rn <= 3 GROUP BY user_id)
        SELECT journey, count(*) AS n_users
        FROM journeys GROUP BY journey
        ORDER BY n_users DESC, journey LIMIT 20"""),
      "user-journey path analysis: per-user opening sequence -> shared-path ranking"),

    QueryDef(
      "q135_anomaly_detection",
      (s, d) => {
        // Time-series monitoring: flag hourly event-count anomalies per
        // event type against the trailing 24-bucket window — the
        // 3-sigma rule rearranged to be SQRT-FREE and integer-exact:
        //   |x - mu| > 3*sigma  <=>  (24x - S)^2 > 9*(24*SS - S^2)
        // with S/SS the trailing sum / sum-of-squares (both BIGINT), so
        // the verdict is bit-deterministic in any engine. The window
        // partitions by event type over HOURLY BUCKETS — state is one
        // row per bucket (years of hourly data stay thousands of rows
        // per type), never per event: raw volume is absorbed by the
        // time-bucket partial aggregation before any window runs.
        val buckets = events(s, d)
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("bucket"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
          .rowsBetween(-24, -1)
        buckets
          .withColumn("nw", count(col("x")).over(w))
          .withColumn("sw", sum(col("x")).over(w))
          .withColumn("ssw", sum(col("x") * col("x")).over(w))
          .filter(col("nw") === 24)
          .select(col("event_type"), col("bucket"), col("x"),
            col("sw").as("trailing_sum"),
            ((lit(24L) * col("x") - col("sw")) *
              (lit(24L) * col("x") - col("sw")) >
              lit(9L) * (lit(24L) * col("ssw") - col("sw") * col("sw")))
              .as("is_anomaly"))
          .filter(col("is_anomaly"))
      },
      Some(s"""
        WITH buckets AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS x
          FROM $EV GROUP BY 1, 2),
        win AS (
          SELECT event_type, bucket, x,
                 count(x) OVER w AS nw,
                 cast(sum(x) OVER w AS bigint) AS sw,
                 cast(sum(x * x) OVER w AS bigint) AS ssw
          FROM buckets
          WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT event_type, bucket, x, sw AS trailing_sum,
               true AS is_anomaly
        FROM win
        WHERE nw = 24
          AND (24 * x - sw) * (24 * x - sw) > 9 * (24 * ssw - sw * sw)"""),
      "trailing-window anomaly flags: sqrt-free integer 3-sigma test over hourly buckets, windows sized in buckets not events")
  )
}
