package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Money, QueryDef, Tables}

/** Core relational operator surface (SURVEY.md §2.2): aggregation, every join
  * flavor, windows, rollup/cube, sort/limit/top-k, set ops, distinct.
  *
  * Design rules for 100 TB scale, applied throughout:
  *   - declarative DataFrame plans only => Catalyst pushes filters/prunes
  *     columns into the parquet scan and picks join strategies with AQE;
  *   - dimension tables (region/nation/supplier) get explicit `broadcast`
  *     hints — they stay small at any scale factor;
  *   - fact-fact joins shuffle on their join key (sort-merge/shuffled-hash,
  *     AQE decides) — no driver-side collect anywhere;
  *   - aggregates use exact integer-cents arithmetic ([[graft.Money]]) so
  *     results are bit-identical regardless of partition count or order.
  */
object Relational {
  import Tables._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q01_agg",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Money.sum2(col("l_quantity")).as("sum_qty"),
            Money.sum2(col("l_extendedprice")).as("sum_base_price"),
            Money.sumDiscounted(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
            Money.avg2(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${Money.sqlSum2("l_quantity")} AS sum_qty,
               ${Money.sqlSum2("l_extendedprice")} AS sum_base_price,
               ${Money.sqlSumDiscounted("l_extendedprice", "l_discount")} AS sum_disc_price,
               ${Money.sqlAvg2("l_quantity")} AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      "hash aggregation with partial/final combine; filter + column pruning pushed to parquet scan"),

    QueryDef(
      "q02_join_broadcast",
      (s, d) => {
        // dim chain region->nation->customer is broadcast at every scale;
        // only orders (fact) streams.
        val o = orders(s, d)
        val c = customer(s, d)
        val n = nation(s, d)
        val r = region(s, d)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            Money.sum2(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"))
      },
      Some(s"""
        SELECT r_name,
               ${Money.sqlSum2("o_totalprice")} AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name"""),
      "broadcast hash join chain fact->dims (map-side, zero shuffle for the joins)"),

    QueryDef(
      "q03_join_shuffle",
      (s, d) => {
        // fact-fact equi join: shuffles both sides on the key (AQE picks
        // SMJ/shuffled-hash); per-group agg then top-10.
        val li = lineitem(s, d)
        val o = orders(s, d)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(Money.sumDiscounted(col("l_extendedprice"), col("l_discount")).as("revenue"),
               count(lit(1)).as("n_lines"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""
        SELECT o_orderkey, o_orderdate,
               ${Money.sqlSumDiscounted("l_extendedprice", "l_discount")} AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10"""),
      "shuffle equi join fact-fact + agg + deterministic top-k (TakeOrderedAndProject)"),

    QueryDef(
      "q04_semi_join",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_totalprice") > 400000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        ORDER BY c_custkey"""),
      "left semi join (EXISTS); selective predicate pushed below the join"),

    QueryDef(
      "q05_anti_join",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_totalprice") > 300000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
               Money.sum2(col("c_acctbal")).as("total_acctbal"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""
        SELECT c_mktsegment,
               count(*) AS n_customers,
               ${Money.sqlSum2("c_acctbal")} AS total_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
      "left anti join (NOT EXISTS) — same primitive as the reference's unused-tag accounting (SURVEY R14)"),

    QueryDef(
      "q06_outer_join",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
               coalesce(Money.sum2(col("o_totalprice")), lit(0.0)).as("total_spent"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""
        SELECT c_custkey,
               count(o_orderkey) AS n_orders,
               coalesce(${Money.sqlSum2("o_totalprice")}, 0.0) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey"""),
      "left outer join preserving unmatched rows; count(col) null semantics"),

    QueryDef(
      "q07_window_rank",
      (s, d) => {
        // top-3 orders per customer: rank inside a hash-partitioned window —
        // scales as one shuffle on o_custkey, no global sort.
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
          .orderBy(col("o_custkey"), col("rk"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rk
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders)
        WHERE rk <= 3
        ORDER BY o_custkey, rk"""),
      "per-group top-k via row_number window; partitionBy shuffle only"),

    QueryDef(
      "q08_window_running",
      (s, d) => {
        // running cumulative quantity per supplier ordered by ship date.
        // Deterministic frame: tie-broken by (l_orderkey, l_linenumber).
        val order = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        val w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lineitem(s, d)
          .filter(col("l_suppkey") <= 10)
          .select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            (sum(Money.cents(col("l_quantity"))).over(w) / 100.0).as("running_qty"),
            lag(Money.cents(col("l_quantity")), 1, 0).over(order).cast("double").divide(100.0).as("prev_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               sum(cast(round(l_quantity*100) as bigint))
                 OVER (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS running_qty,
               cast(lag(cast(round(l_quantity*100) as bigint), 1, 0)
                 OVER (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber) as double)/100.0 AS prev_qty
        FROM lineitem
        WHERE l_suppkey <= 10
        ORDER BY l_suppkey, l_orderkey, l_linenumber"""),
      "running-sum + lag window with explicit row frame (same primitive as GEDCOM record assignment, SURVEY R4)"),

    QueryDef(
      "q09_rollup",
      (s, d) =>
        lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(Money.sum2(col("l_extendedprice")).as("sum_price"),
               count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${Money.sqlSum2("l_extendedprice")} AS sum_price,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),
      "rollup grouping sets (partial agg expand)"),

    QueryDef(
      "q10_cube",
      (s, d) =>
        orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Money.sum2(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(s"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               ${Money.sqlSum2("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""),
      "cube grouping sets"),

    QueryDef(
      "q11_distinct",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_suppkey"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
               countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy(col("l_suppkey")),
      Some("""
        SELECT l_suppkey,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        GROUP BY l_suppkey
        ORDER BY l_suppkey"""),
      "multi-column distinct aggregation (expand + two-phase agg)"),

    QueryDef(
      "q12_topk",
      (s, d) =>
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(25),
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 25"""),
      "global top-k: Spark plans TakeOrderedAndProject (per-partition heap + driver merge), never a full sort"),

    QueryDef(
      "q13_setops",
      (s, d) => {
        val c = customer(s, d)
        val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_nationkey"))
        val bld = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
        val mach = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_nationkey"))
        auto.union(bld).distinct()
          .intersect(mach)
          .except(c.filter(col("c_acctbal") < -900.0).select(col("c_nationkey")))
          .orderBy(col("c_nationkey"))
      },
      Some("""
        SELECT c_nationkey FROM (
          SELECT DISTINCT c_nationkey FROM (
            SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
            UNION
            SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
          INTERSECT
          SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
          EXCEPT
          SELECT c_nationkey FROM customer WHERE c_acctbal < -900.0)
        ORDER BY c_nationkey"""),
      "union/intersect/except set algebra"),

    QueryDef(
      "q14_pivot",
      (s, d) =>
        // conditional aggregation (pivot by hand => identical semantics in
        // any engine, no dialect-specific PIVOT)
        events(s, d)
          .groupBy(col("user_id"))
          .agg(
            count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
            count(when(col("event_type") === "signup", 1)).as("n_signup"),
            count(when(col("event_type") === "error", 1)).as("n_error"),
            (sum(when(col("event_type") === "purchase", Money.cents(col("value")))) / 100.0)
              .as("purchase_value"))
          .filter(col("n_purchase") > 0)
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
               sum(CASE WHEN event_type = 'purchase'
                        THEN cast(round("value"*100) as bigint) END)/100.0 AS purchase_value
        FROM events
        GROUP BY user_id
        HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
        ORDER BY user_id"""),
      "conditional-aggregation pivot + HAVING"),

    QueryDef(
      "q15_theta_join",
      (s, d) => {
        // non-equi (theta) join: parts priced above their size-bucket average.
        // The bucket averages frame is tiny => broadcast nested loop stays cheap.
        val p = part(s, d)
        val buckets = p.groupBy((col("p_size") % 10).as("size_mod"))
          .agg(Money.avg2(col("p_retailprice")).as("avg_price"))
        p.join(broadcast(buckets),
            (p("p_size") % 10) === buckets("size_mod") &&
              p("p_retailprice") > buckets("avg_price") * 1.02)
          .select(col("p_partkey"), col("p_retailprice"), col("size_mod"), col("avg_price"))
          .orderBy(col("p_partkey"), col("size_mod"))
      },
      Some("""
        SELECT p_partkey, p_retailprice, size_mod, avg_price
        FROM part JOIN (
          SELECT p_size % 10 AS size_mod,
                 sum(cast(round(p_retailprice*100) as bigint))/100.0/count(*) AS avg_price
          FROM part GROUP BY p_size % 10) b
          ON part.p_size % 10 = b.size_mod AND p_retailprice > avg_price * 1.02
        ORDER BY p_partkey, size_mod"""),
      "theta join (equi + inequality residual) against a broadcast aggregate"),

    QueryDef(
      "q71_unpivot",
      (s, d) =>
        // pivot's inverse: wide per-flag aggregates melted to (metric,
        // value) long form via the native unpivot operator (an Expand
        // node — one pass, no join or union of self-scans)
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            Money.sum2(col("l_quantity")).as("sum_qty"),
            Money.sum2(col("l_extendedprice")).as("sum_price"),
            (count(lit(1)) * 1.0).as("n_rows"))
          .unpivot(
            Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price"), col("n_rows")),
            "metric", "value")
          .orderBy(col("l_returnflag"), col("metric")),
      Some(s"""
        WITH agg AS (
          SELECT l_returnflag,
                 ${Money.sqlSum2("l_quantity")} AS sum_qty,
                 ${Money.sqlSum2("l_extendedprice")} AS sum_price,
                 count(*) * 1.0 AS n_rows
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, metric, value FROM (
          SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
          UNION ALL
          SELECT l_returnflag, 'sum_price', sum_price FROM agg
          UNION ALL
          SELECT l_returnflag, 'n_rows', n_rows FROM agg)
        ORDER BY l_returnflag, metric"""),
      "unpivot/melt: wide aggregates to long form through the native Expand"),

    QueryDef(
      "q95_bloom_join",
      (s, d) => {
        // Bloom-pruned shuffle join: the regime BETWEEN broadcast and plain
        // shuffle join. The build side (urgent orders) is assumed too large
        // to broadcast-hash-join at 100 TB, but its KEY SET fits a few MB of
        // bloom bits — so the probe side (lineitem, the big fact) filters
        // map-side BEFORE its exchange, and only rows that can possibly
        // match are ever shuffled. False positives pass the bloom but die in
        // the exact join that follows, so the output is bit-identical to the
        // unpruned join (the oracle is the plain SQL join).
        val o = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        // size the bits from the real key count (what a 100 TB run would do)
        val nKeys = math.max(o.count(), 1000L)
        val bloom = o.stat.bloomFilter("o_orderkey", nKeys, 0.01)
        val l = lineitem(s, d)
          .filter(graft.functions.expressions.BloomExpressions
            .mightContain(col("l_orderkey"), bloom))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
          .agg(
            Money.sumDiscounted(col("l_extendedprice"), col("l_discount")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("ship_month"))
      },
      Some(s"""
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               ${Money.sqlSumDiscounted("l_extendedprice", "l_discount")} AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1
        ORDER BY 1"""),
      "bloom-filter-pruned shuffle join: probe side filtered map-side pre-exchange by a codegen'd sketch-membership expression; exact join guarantees output equality"),

    QueryDef(
      "q155_salted_join",
      (s, d) => {
        // [[SkewJoin.saltedJoin]] with its S derived from the data by
        // [[SkewJoin.saltFactor]] (one MG pass over the fact keys), not
        // a hardcoded literal. The oracle is the PLAIN join — result
        // identity regardless of S is the operator's contract, and the
        // aggregate stays exact-integer (Money cents) so it compares
        // bit-for-bit. targetRowsPerTask = 64 is the test-scale budget
        // (production: millions) so the gate exercises a real multi-salt
        // exchange; events' near-uniform keys under a production budget
        // would correctly yield S = 1 = the plain join. The event-id
        // coin is retry-stable (a task re-run salts identically);
        // forceShuffle keeps the demo honest (dim x S would broadcast at
        // test scale, and a broadcast join needs no salt).
        val fact = events(s, d)
          .select(col("user_id").as("k"), col("value"), col("event_id"))
        val dim = customer(s, d)
          .select(col("c_custkey").cast("long").as("k"), col("c_mktsegment"))
        val S = SkewJoin.saltFactor(fact.select(col("k")),
          targetRowsPerTask = 64L)
        SkewJoin.saltedJoin(fact, dim, "k", S,
            saltCoin = Some(col("event_id")), forceShuffle = true)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"),
            sum(Money.cents(col("value"))).as("value_cents"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_events,
               cast(sum(cast(round(value*100) as bigint)) as bigint) AS value_cents
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1"""),
      "salted skew join: per-row fact salt x S-replicated dim, join on (key, salt); oracle is the UNSALTED join, so result identity is the contract")
  )
}
