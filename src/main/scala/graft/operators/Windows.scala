package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Money, QueryDef, Tables}

/** Window-function long tail (SURVEY §2.2 windows row): time-RANGE frames,
  * rank variants, and positional value functions. */
object Windows {
  import Tables._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q57_range_frame",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("v_orders_w")
        // RANGE frame keyed by event time: every order sees the revenue of
        // its trailing 7 days for the same customer — the windowed analog
        // of an interval join, one shuffle on the partition key
        s.sql("""
          SELECT o_orderkey, o_custkey,
                 sum(cast(round(o_totalprice*100) as bigint)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
                 )/100.0D AS trailing_7d,
                 count(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
                 ) AS n_7d
          FROM v_orders_w
          ORDER BY o_orderkey""")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               sum(cast(round(o_totalprice*100) as bigint)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
               )/100.0 AS trailing_7d,
               count(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
               ) AS n_7d
        FROM orders
        ORDER BY o_orderkey"""),
      "time-RANGE window frame (trailing 7-day revenue per customer)"),

    QueryDef(
      "q58_rank_variants",
      (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(Money.cents(col("l_extendedprice")), col("l_orderkey"), col("l_linenumber"))
        lineitem(s, d)
          .filter(col("l_orderkey") <= 500)
          .select(
            col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 8).as("pct_rank"),
            round(cume_dist().over(w), 8).as("cume"))
          .orderBy(col("l_returnflag"), col("rnk"))
      },
      Some("""
        SELECT l_returnflag, l_orderkey, l_linenumber,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 8) AS pct_rank,
               round(cume_dist() OVER w, 8) AS cume
        FROM lineitem
        WHERE l_orderkey <= 500
        WINDOW w AS (PARTITION BY l_returnflag
                     ORDER BY cast(round(l_extendedprice*100) as bigint),
                              l_orderkey, l_linenumber)
        ORDER BY l_returnflag, rnk"""),
      "rank/dense_rank/ntile/percent_rank/cume_dist over a deterministic order"),

    QueryDef(
      "q59_value_functions",
      (s, d) => {
        val order = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(full).as("first_order"),
            last(col("o_orderkey")).over(full).as("last_order"),
            nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
            lead(col("o_orderkey"), 1).over(order).as("next_order"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER w AS last_order,
               nth_value(o_orderkey, 2) OVER w AS second_order,
               lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS next_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey"""),
      "first/last/nth_value/lead positional window functions")
  )
}
