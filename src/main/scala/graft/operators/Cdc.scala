package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Money, QueryDef, Tables}

/** Change-data-capture operators: snapshot reconciliation (what changed
  * between two versions of a dimension?) and slowly-changing-dimension
  * type-2 history construction (turn a change log into validity
  * intervals). Both are daily-cadence steps of any warehouse/training
  * corpus that re-ingests mutable upstream tables.
  *
  * 100 TB shape: the diff is ONE full-outer equi join on the business key
  * — co-partitioned and shuffle-free when both snapshots are bucketed by
  * that key (the layout a daily pipeline would maintain), a plain
  * hash-join shuffle otherwise, with AQE handling key skew. Unchanged
  * rows are dropped pre-output, so the result is bounded by the churn,
  * not the dimension. SCD2 uses two windows over the SAME (key, ts)
  * partitioning, so Catalyst plans one Exchange+Sort and both
  * change-collapse and interval construction reuse it.
  */
object Cdc {
  import Tables._

  /** Reconcile two snapshots of a keyed table on one compared value
    * column: emits one row per INSERTED (`op = 'I'`), UPDATED (`'U'`,
    * value differs) or DELETED (`'D'`) key, with the old and new values.
    * Keys present in both with an unchanged value produce nothing.
    * `base`/`curr` must expose `key` and `value` columns. */
  def snapshotDiff(base: DataFrame, curr: DataFrame, key: String,
      value: String): DataFrame = {
    // presence markers, not value-nullness, decide I vs D — a legitimately
    // NULL value in one snapshot must not masquerade as a missing key,
    // and U detection is null-safe for the same reason
    val b = base.select(col(key).as("k"), col(value).as("old_v"), lit(true).as("__in_b"))
    val c = curr.select(col(key).as("k"), col(value).as("new_v"), lit(true).as("__in_c"))
    b.join(c, Seq("k"), "full_outer")
      .withColumn("op",
        when(col("__in_b").isNull, lit("I"))
          .when(col("__in_c").isNull, lit("D"))
          .when(!(col("old_v") <=> col("new_v")), lit("U")))
      .filter(col("op").isNotNull)
      .select(col("k").as(key), col("op"),
        col("old_v").as(s"old_$value"), col("new_v").as(s"new_$value"))
  }

  /** Type-2 history from a change log: rows (`key`, `ts`, `value`) become
    * validity intervals (key, value, valid_from, valid_to, is_current).
    * No-op updates (same value as the key's previous row) are collapsed
    * first — standard SCD2 ingestion, where upstream emits full rows on
    * every touch and only real transitions open a new version. `tieBreak`
    * makes ordering total when one key has several changes at one ts. */
  def scd2History(log: DataFrame, key: String, ts: String, tieBreak: String,
      value: String): DataFrame = {
    val ord = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val collapsed = log
      .withColumn("__prev", lag(col(value), 1).over(ord))
      // null-safe: first row of a key survives; equal-value touches drop
      .filter(!(col(value) <=> col("__prev")))
    collapsed
      .withColumn("valid_to", lead(col(ts), 1).over(ord))
      .select(col(key), col(value), col(ts).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Merkle-style anti-entropy checksums: order-independent per-bucket
    * fingerprints of a table, for replica/copy reconciliation without
    * moving rows — compare (bucket, n_rows, checksum) lists from two
    * sites and re-sync only the buckets that differ. The row hash is the
    * leading 40 bits of md5 over a canonical string, SUMMED per bucket
    * (sum, not xor: xor cancels duplicate-row pairs, the classic replica
    * divergence). 40-bit terms keep any realistic bucket's sum far from
    * 63-bit overflow, so Spark's wrapping bigint sum and DuckDB's hugeint
    * sum agree exactly. One partial-agg scan; buckets are key ranges so a
    * divergent bucket localizes the repair. */
  def bucketChecksums(df: DataFrame, bucket: Column, canonical: Column): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(conv(substring(md5(canonical), 1, 10), 16, 10).cast("long")).as("checksum"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q106_cdc_diff",
      (s, d) => {
        // Reconcile the customer dimension against a simulated "next
        // ingest" snapshot derived deterministically from the fixtures:
        // every 19th customer churned away (delete), customers with
        // orders saw their balance restated by their order total
        // (update), and the supplier roster arrives as new customer keys
        // offset past the existing id space (insert). Balances compare
        // as exact cents (the Money pattern) so 'U' detection is
        // deterministic in both engines.
        val base = customer(s, d)
          .select(col("c_custkey"), Money.cents(col("c_acctbal")).as("bal_cents"))
        val restated = orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(Money.cents(col("o_totalprice"))).as("ordered_cents"))
        val curr = base
          .filter(pmod(col("c_custkey"), lit(19)) =!= 3)
          .join(restated, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            (col("bal_cents") + coalesce(col("ordered_cents"), lit(0L))).as("bal_cents"))
          .unionByName(supplier(s, d).select(
            (col("s_suppkey") + 10000000L).as("c_custkey"),
            Money.cents(col("s_acctbal")).as("bal_cents")))
        snapshotDiff(base, curr, "c_custkey", "bal_cents")
      },
      Some(s"""
        WITH base AS (
          SELECT c_custkey, ${Money.sqlCents("c_acctbal")} AS bal_cents FROM customer),
        restated AS (
          SELECT o_custkey, sum(${Money.sqlCents("o_totalprice")}) AS ordered_cents
          FROM orders GROUP BY o_custkey),
        curr AS (
          SELECT b.c_custkey, b.bal_cents + coalesce(r.ordered_cents, 0) AS bal_cents
          FROM base b LEFT JOIN restated r ON b.c_custkey = r.o_custkey
          WHERE b.c_custkey % 19 <> 3
          UNION ALL
          SELECT s_suppkey + 10000000 AS c_custkey,
                 ${Money.sqlCents("s_acctbal")} AS bal_cents
          FROM supplier)
        SELECT coalesce(b.c_custkey, c.c_custkey) AS c_custkey,
               CASE WHEN b.c_custkey IS NULL THEN 'I'
                    WHEN c.c_custkey IS NULL THEN 'D'
                    WHEN b.bal_cents <> c.bal_cents THEN 'U' END AS op,
               b.bal_cents AS old_bal_cents,
               c.bal_cents AS new_bal_cents
        FROM base b FULL OUTER JOIN curr c ON b.c_custkey = c.c_custkey
        WHERE CASE WHEN b.c_custkey IS NULL THEN 'I'
                   WHEN c.c_custkey IS NULL THEN 'D'
                   WHEN b.bal_cents <> c.bal_cents THEN 'U' END IS NOT NULL"""),
      "CDC snapshot reconciliation: full-outer key join, churn-bounded I/U/D output"),

    QueryDef(
      "q107_scd2_history",
      (s, d) => {
        // The purchase stream as a per-user account-value change log →
        // type-2 validity intervals. event_id breaks same-timestamp ties
        // so the history is total-ordered and deterministic.
        val log = events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            Money.cents(col("value")).as("value_cents"))
        scd2History(log, "user_id", "ts", "event_id", "value_cents")
      },
      Some(s"""
        WITH log AS (
          SELECT user_id, ts, event_id, ${Money.sqlCents("value")} AS value_cents
          FROM events WHERE event_type = 'purchase'),
        collapsed AS (
          SELECT * FROM (
            SELECT user_id, ts, event_id, value_cents,
                   lag(value_cents) OVER w AS prev_cents,
                   CASE WHEN lag(value_cents) OVER w IS NULL THEN true
                        ELSE false END AS is_first
            FROM log
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          WHERE is_first OR value_cents IS DISTINCT FROM prev_cents)
        SELECT user_id, value_cents, ts AS valid_from,
               lead(ts) OVER w2 AS valid_to,
               (lead(ts) OVER w2 IS NULL) AS is_current
        FROM collapsed
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)"""),
      "SCD2 history: change-collapse + validity intervals, one shuffle for both windows"),

    QueryDef(
      "q110_bucket_checksums",
      (s, d) => {
        // Anti-entropy over lineitem: 1000-orderkey buckets, canonical row
        // string from the identity + exact-cents money columns (timestamps
        // excluded — their text forms are engine-dependent).
        val li = lineitem(s, d)
        val canon = concat_ws("|",
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"),
          Money.cents(col("l_extendedprice")), Money.cents(col("l_discount")),
          col("l_returnflag"), col("l_linestatus"))
        bucketChecksums(li, expr("l_orderkey div 1000"), canon)
      },
      Some(s"""
        WITH canon AS (
          SELECT l_orderkey // 1000 AS bucket,
                 concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber,
                   ${Money.sqlCents("l_extendedprice")}, ${Money.sqlCents("l_discount")},
                   l_returnflag, l_linestatus) AS c
          FROM lineitem)
        SELECT bucket, count(*) AS n_rows,
               cast(sum(CAST(concat('0x', substr(md5(c), 1, 10)) AS BIGINT)) as bigint) AS checksum
        FROM canon GROUP BY bucket"""),
      "Merkle-style replica reconciliation: per-key-range order-independent checksums, one agg scan"),

    QueryDef(
      "q113_incremental_agg",
      (s, d) => {
        // Incremental materialized-aggregate maintenance: a stored
        // per-customer aggregate absorbs a new batch WITHOUT rescanning
        // the base — count/sum are algebraic, so the update is
        // agg(delta) ++ outer-join-combine, touching base-side state only
        // for keys the delta contains plus passing the rest through.
        // The oracle recomputes from ALL rows directly, so the gate
        // proves merge(agg(base), agg(delta)) == agg(base ∪ delta) —
        // the algebraic-state contract streaming and cube maintenance
        // both rely on. Base = 80% of orders (the "stored" aggregate),
        // delta = the o_orderkey % 5 == 4 batch.
        def agg(df: DataFrame) = df.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), sum(Money.cents(col("o_totalprice"))).as("cents"))
        val o = orders(s, d)
        val base = agg(o.filter(pmod(col("o_orderkey"), lit(5)) =!= 4))
        val delta = agg(o.filter(pmod(col("o_orderkey"), lit(5)) === 4))
        base.select(col("o_custkey"), col("n").as("bn"), col("cents").as("bc"))
          .join(delta.select(col("o_custkey"), col("n").as("dn"), col("cents").as("dc")),
            Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
            (coalesce(col("bc"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("total_cents"))
      },
      Some(s"""
        SELECT o_custkey, count(*) AS n_orders,
               cast(sum(${Money.sqlCents("o_totalprice")}) as bigint) AS total_cents
        FROM orders GROUP BY o_custkey"""),
      "incremental aggregate maintenance: algebraic partial-state merge == full recompute, oracle-proven"),

    QueryDef(
      "q130_merge_upsert",
      (s, d) => {
        // MERGE INTO semantics (the lakehouse upsert): apply a keyed
        // change batch — UPDATEs, DELETEs, INSERTs — to a snapshot in one
        // pass. The batch here derives deterministically from the
        // snapshot itself: docs with doc_id%7==0 get re-scored text
        // (update), %13==0 are tombstoned (delete; delete wins over
        // update when both match), and two fresh ids insert. Shape: ONE
        // full-outer join on the key — matched+op=U takes the source row,
        // matched+op=D drops, unmatched target rows pass through,
        // unmatched source rows insert. No broadcast assumption on
        // either side (a change batch can be huge after backfills); AQE
        // picks broadcast when the batch is small.
        val snap = documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        val updates = snap.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select(col("doc_id"), lit("U").as("op"), col("lang"), col("source"),
            (col("n_chars") + 1000).as("n_chars"))
        val deletes = snap.filter(pmod(col("doc_id"), lit(13)) === 0)
          .select(col("doc_id"), lit("D").as("op"), col("lang"), col("source"),
            col("n_chars"))
        val inserts = s.range(2).toDF("i")
          .select((col("i") + 9000000L).as("doc_id"), lit("I").as("op"),
            lit("xx").as("lang"), lit("srcN").as("source"), lit(42L).as("n_chars"))
        // delete beats update on the same key: keep the D row
        val batch = updates.unionAll(deletes).unionAll(inserts)
          .groupBy(col("doc_id"))
          .agg(max(struct(
            when(col("op") === "D", 2).when(col("op") === "U", 1).otherwise(0).as("pri"),
            col("op").as("op"), col("lang").as("lang"),
            col("source").as("source"), col("n_chars").as("n_chars"))).as("m"))
          .select(col("doc_id"), col("m.op").as("op"), col("m.lang").as("lang"),
            col("m.source").as("source"), col("m.n_chars").as("n_chars"))
        snap.select(col("doc_id"), col("lang").as("tl"), col("source").as("ts_"),
            col("n_chars").as("tn"))
          .join(batch, Seq("doc_id"), "full_outer")
          .filter(coalesce(col("op"), lit("")) =!= "D")
          .select(col("doc_id"),
            coalesce(col("lang"), col("tl")).as("lang"),
            coalesce(col("source"), col("ts_")).as("source"),
            coalesce(col("n_chars"), col("tn")).as("n_chars"))
      },
      Some("""
        WITH updates AS (
          SELECT doc_id, 'U' AS op, lang, source, n_chars + 1000 AS n_chars
          FROM documents WHERE doc_id % 7 = 0),
        deletes AS (
          SELECT doc_id, 'D' AS op, lang, source, n_chars
          FROM documents WHERE doc_id % 13 = 0),
        inserts AS (
          SELECT unnest([9000000, 9000001]) AS doc_id, 'I' AS op,
                 'xx' AS lang, 'srcN' AS source, cast(42 AS bigint) AS n_chars),
        batch AS (
          SELECT doc_id, op, lang, source, n_chars FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY
              CASE op WHEN 'D' THEN 2 WHEN 'U' THEN 1 ELSE 0 END DESC) AS rn
            FROM (SELECT * FROM updates UNION ALL SELECT * FROM deletes
                  UNION ALL SELECT * FROM inserts))
          WHERE rn = 1)
        SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
               coalesce(b.lang, t.lang) AS lang,
               coalesce(b.source, t.source) AS source,
               coalesce(b.n_chars, t.n_chars) AS n_chars
        FROM documents t FULL OUTER JOIN batch b ON b.doc_id = t.doc_id
        WHERE coalesce(b.op, '') <> 'D'"""),
      "MERGE INTO upsert: one full-outer keyed pass applies U/D/I with delete-wins conflict rule"),

    QueryDef(
      "q131_cascade_delete",
      (s, d) => {
        // Right-to-be-forgotten: erase every customer of one nation and
        // cascade through the FK graph (customer -> orders -> lineitem),
        // reporting what each table would lose. The cascade is two
        // LEFT SEMI joins down the key chain — each table scans once,
        // keys flow top-down, nothing is quadratic and no row data moves
        // except the keys. (The deletion itself would be the same plan
        // with anti joins writing the survivors.)
        val victims = customer(s, d).filter(col("c_nationkey") === 7)
          .select(col("c_custkey"))
        val doomedOrders = orders(s, d)
          .join(victims, col("o_custkey") === col("c_custkey"), "left_semi")
          .select(col("o_orderkey"))
        val doomedLines = lineitem(s, d)
          .join(doomedOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        victims.agg(count(lit(1)).as("n_customers"))
          .crossJoin(doomedOrders.agg(count(lit(1)).as("n_orders")))
          .crossJoin(doomedLines.agg(count(lit(1)).as("n_lineitems"),
            coalesce(sum(Money.cents(col("l_extendedprice"))), lit(0L))
              .as("erased_cents")))
      },
      Some(s"""
        WITH victims AS (
          SELECT c_custkey FROM customer WHERE c_nationkey = 7),
        doomed_orders AS (
          SELECT o_orderkey FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM victims)),
        doomed_lines AS (
          SELECT l_extendedprice FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders))
        SELECT (SELECT count(*) FROM victims) AS n_customers,
               (SELECT count(*) FROM doomed_orders) AS n_orders,
               (SELECT count(*) FROM doomed_lines) AS n_lineitems,
               (SELECT cast(coalesce(sum(${Money.sqlCents("l_extendedprice")}), 0) AS bigint)
                FROM doomed_lines) AS erased_cents"""),
      "cascade deletion audit: semi-join key flow down the FK chain (the GDPR erasure plan)")
  )
}
