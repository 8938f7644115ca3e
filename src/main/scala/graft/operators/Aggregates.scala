package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.{Money, QueryDef, Tables}

/** Aggregation extensions beyond the built-ins (SURVEY §2.2 UDAF row):
  *
  *   - q42: the SQL entry point — identical plans come out of `spark.sql`
  *     and the DataFrame API, so the engine is usable from both surfaces;
  *   - q43: HLL `approx_count_distinct` next to the exact count — the
  *     100 TB path for distinct cardinalities (fixed-size sketch, one pass,
  *     mergeable across partitions);
  *   - q44: a custom typed [[Aggregator]] computing a bounded top-k heap
  *     per group — the SURVEY §4.2 alternative to rank-then-filter that
  *     never materializes more than k rows per group per partition.
  */
object Aggregates {
  import Tables._

  private def dbl(c: String) = col(c).cast("double")

  /** Bounded top-k aggregator: keeps the k largest (value, tag) pairs.
    * Partial buffers are size-capped, merge is k-bounded — at any data
    * volume each partition contributes at most k candidates to the final
    * merge (classic partial-agg-friendly top-k). */
  final class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Double]] {
    override def zero: Seq[(Double, Long)] = Vector.empty
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (v, id) => (-v, id) }.take(k)
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ a)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)
    override def finish(r: Seq[(Double, Long)]): Seq[Double] =
      r.map(_._1)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Bounded min-k aggregator over (coin, id) pairs: keeps the k
    * lexicographically SMALLEST entries and finishes with their ids in
    * selection order. The sampling dual of [[TopK]] — partial buffers are
    * k-capped, so a group of any size contributes at most k candidates per
    * partition to the final merge. q102 uses it to take a deterministic
    * md5-coin sample per domain without ranking the whole domain through
    * one window partition (the coin makes selection order engine- and
    * layout-independent; the id tie-break makes it total). */
  final class MinKByCoin(k: Int)
      extends Aggregator[(String, Long), Seq[(String, Long)], Seq[Long]] {
    override def zero: Seq[(String, Long)] = Vector.empty
    private def trim(s: Seq[(String, Long)]): Seq[(String, Long)] =
      s.sorted.take(k)
    // The buffer is kept sorted ascending, so a full buffer rejects
    // anything >= its max in O(1) — the common case once the first k rows
    // have streamed in — and otherwise does one O(k) ordered insert; the
    // r9 version re-sorted the whole buffer on every row (O(k log k)).
    override def reduce(b: Seq[(String, Long)], a: (String, Long)): Seq[(String, Long)] = {
      val ord = Ordering[(String, Long)]
      if (b.size >= k && ord.lteq(b.last, a)) b
      else {
        val i = b.indexWhere(e => ord.gt(e, a))
        val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
        if (ins.size > k) ins.take(k) else ins
      }
    }
    override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
      trim(a ++ b)
    override def finish(r: Seq[(String, Long)]): Seq[Long] =
      r.sorted.map(_._2)
    override def bufferEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** [[MinKByCoin]] with the cap carried PER ROW instead of baked into
    * the aggregator instance: every row of a group presents the same k
    * (derived upstream, e.g. from the group's row count), so groups of
    * different sizes can take differently-sized exact samples in ONE
    * aggregation — the per-group window rank this replaces would shuffle
    * and sort each whole stratum through one task. Buffer stays k-capped
    * per partial, so a mega-stratum contributes at most its own k
    * candidates per map partition. */
  final class MinKByCoinN
      extends Aggregator[(String, Long, Int), (Seq[(String, Long)], Int), Seq[Long]] {
    override def zero: (Seq[(String, Long)], Int) = (Vector.empty, 0)
    private def trim(s: Seq[(String, Long)], k: Int): Seq[(String, Long)] =
      s.sorted.take(k)
    override def reduce(b: (Seq[(String, Long)], Int),
        a: (String, Long, Int)): (Seq[(String, Long)], Int) = {
      val k = math.max(b._2, a._3)
      val ord = Ordering[(String, Long)]
      val e = (a._1, a._2)
      val buf = b._1
      if (buf.size >= k && ord.lteq(buf.last, e)) (buf.take(k), k)
      else {
        val i = buf.indexWhere(x => ord.gt(x, e))
        val ins = if (i < 0) buf :+ e else (buf.take(i) :+ e) ++ buf.drop(i)
        (if (ins.size > k) ins.take(k) else ins, k)
      }
    }
    override def merge(a: (Seq[(String, Long)], Int),
        b: (Seq[(String, Long)], Int)): (Seq[(String, Long)], Int) = {
      val k = math.max(a._2, b._2)
      (trim(a._1 ++ b._1, k), k)
    }
    override def finish(r: (Seq[(String, Long)], Int)): Seq[Long] =
      trim(r._1, r._2).map(_._2)
    override def bufferEncoder: Encoder[(Seq[(String, Long)], Int)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[(String, Long)], Int)]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Mergeable Misra-Gries heavy-hitters summary (Agarwal et al.,
    * "Mergeable Summaries", PODS 2012): at most k counters; inserting
    * past capacity subtracts the (k+1)-th largest count from every
    * counter and drops the zeros. Guarantees, at any merge order:
    * estimate ∈ [true - N/(k+1), true], so every item with true frequency
    * above N/(k+1) SURVIVES the sketch — which is what makes it a safe
    * candidate generator (sketch to prune, exact-count the ≤k survivors
    * to emit deterministic results). Partial buffers are k-bounded like
    * [[TopK]]; the corpus never collects. Registered as q93 in exactly
    * that sketch-then-rescan shape over the one genuinely skewed domain
    * of this corpus (lang within source, en ~ 44%); the eviction-order
    * guarantee is additionally proven in AggregatesSpec on a
    * planted-skew corpus. */
  final class HeavyHitters(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    override def zero: Map[String, Long] = Map.empty
    private def trim(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
        m.collect { case (i, c) if c > cut => i -> (c - cut) }
      }
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      trim(b.updated(a, b.getOrElse(a, 0L) + 1))
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      trim(b.foldLeft(a) { case (m, (i, c)) => m.updated(i, m.getOrElse(i, 0L) + c) })
    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (i, c) => (-c, i) }
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q42_sql_surface",
      (s, d) => {
        // same engine through the SQL front door: views + spark.sql
        lineitem(s, d).createOrReplaceTempView("v_lineitem")
        orders(s, d).createOrReplaceTempView("v_orders")
        // 100.0D: Spark SQL parses a bare `100.0` literal as DECIMAL(4,1)
        // (DataFrame lit(100.0) is double) — the D suffix keeps the result
        // type double, matching the oracle
        s.sql(s"""
          SELECT o_orderpriority,
                 count(*) AS n_orders,
                 sum(cast(round(l_extendedprice*100) as bigint))/100.0D AS revenue
          FROM v_orders JOIN v_lineitem ON o_orderkey = l_orderkey
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               sum(cast(round(l_extendedprice*100) as bigint))/100.0 AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      "SQL API surface: spark.sql over temp views, same Catalyst plan as the DataFrame form"),

    QueryDef(
      "q43_approx_distinct",
      (s, d) =>
        // HLL sketch vs exact: the cheap scale path plus its error bound.
        // Both engines' sketches differ, so the oracle-checked columns are
        // the exact ones; the HLL column is asserted within 5% in
        // AggregatesSpec instead.
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""),
      "distinct cardinality: exact (oracle) + HLL approx (spec-checked tolerance)"),

    QueryDef(
      "q84_approx_percentiles",
      (s, d) => {
        // Quantile sketch (Greenwald-Khanna via approx_percentile) as a
        // CANDIDATE GENERATOR, the q93 pattern applied to order
        // statistics: the sketch's answers are engine-specific, but its
        // rank GUARANTEE is not, so the registered output is the EXACT
        // value at a fixed rank t = ceil(q*n) — deterministic and
        // hash-comparable against DuckDB — computed by an exact rescan
        // the sketch has pruned to a sliver of each group:
        //
        //   1. sketch pass: per group, GK values at q -/+ DELTA bracket
        //      the target (accuracy 10000 => rank error n/10000, and
        //      merged partials at worst double it — DELTA = 0.002 is
        //      ~10x that bound, so [v_lo, v_hi] provably contains the
        //      rank-t value);
        //   2. rescan: count rows strictly below v_lo (r_lo) and gather
        //      the ~2*DELTA*n rows inside the bracket; the global
        //      rank-t value is the (t - r_lo)-th smallest of the
        //      gathered sliver. Ties are safe: positions shift only by
        //      values OUTSIDE [v_lo, v_hi].
        //
        // 100 TB shape: one partial-agg shuffle of bounded sketches,
        // then one scan whose gathered sliver is DELTA-proportional
        // (pick DELTA ~ B/n to cap the buffer at B rows; past that,
        // sort the filtered sliver distributedly instead of gathering).
        // AggregatesSpec still bounds the raw sketch values against the
        // exact interpolation; an out-of-bracket regression here nulls
        // an output cell, which the hash gate catches loudly.
        val acc = 10000
        val delta = 0.002
        val qs = Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99")
        val los = qs.map { case (q, _) => math.max(0.0, q - delta) }
        val his = qs.map { case (q, _) => math.min(1.0, q + delta) }
        val bounds = lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            expr(s"approx_percentile(l_extendedprice, array(${los.mkString(",")}), $acc)").as("vlo"),
            expr(s"approx_percentile(l_extendedprice, array(${his.mkString(",")}), $acc)").as("vhi"))
          .select(col("l_returnflag"), col("n"),
            posexplode(arrays_zip(col("vlo"), col("vhi"))).as(Seq("qi", "b")))
          .select(col("l_returnflag"), col("n"), col("qi"),
            col("b.vlo").as("vlo"), col("b.vhi").as("vhi"))
        val qlit = array(qs.map { case (q, _) => lit(q) }: _*)
        val sliver = lineitem(s, d)
          .select(col("l_returnflag"), col("l_extendedprice").as("v"))
          .join(broadcast(bounds), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"), col("qi"))
          .agg(
            max(col("n")).as("n"),
            sum(when(col("v") < col("vlo"), 1L).otherwise(0L)).as("r_lo"),
            sort_array(collect_list(when(col("v").between(col("vlo"), col("vhi")), col("v"))))
              .as("window"))
          .withColumn("t", ceil(element_at(qlit, col("qi") + 1) * col("n")).cast("long"))
          // try_element_at: an out-of-bracket index (sketch guarantee
          // violated) must surface as a null cell -> hash mismatch, not an
          // ANSI INVALID_ARRAY_INDEX crash of the whole gate run
          .withColumn("pct", round(try_element_at(col("window"),
            (col("t") - col("r_lo")).cast("int")), 2))
        sliver
          .groupBy(col("l_returnflag"))
          .agg(
            max(col("n")).as("n"),
            max(when(col("qi") === 0, col("pct"))).as("p50"),
            max(when(col("qi") === 1, col("pct"))).as("p95"),
            max(when(col("qi") === 2, col("pct"))).as("p99"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        WITH s AS (
          SELECT l_returnflag, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice) AS rk,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem)
        SELECT l_returnflag, max(n) AS n,
               round(max(CASE WHEN rk = cast(ceil(0.50 * n) as bigint) THEN l_extendedprice END), 2) AS p50,
               round(max(CASE WHEN rk = cast(ceil(0.95 * n) as bigint) THEN l_extendedprice END), 2) AS p95,
               round(max(CASE WHEN rk = cast(ceil(0.99 * n) as bigint) THEN l_extendedprice END), 2) AS p99
        FROM s
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""),
      "approx percentiles: GK sketch brackets the rank, exact rescan emits the deterministic rank-t value"),

    QueryDef(
      "q62_stats_moments",
      (s, d) =>
        // correlation/covariance from exact integer-cents moment sums: the
        // five sums are exact bigints, the closed-form combination is one
        // deterministic double expression — unlike corr()/covar_pop(),
        // whose streaming accumulation is partition-order dependent
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(Money.cents(col("l_quantity"))).as("sx"),
            sum(Money.cents(col("l_extendedprice"))).as("sy"),
            sum(Money.cents(col("l_quantity")) * Money.cents(col("l_quantity"))).as("sxx"),
            sum(Money.cents(col("l_extendedprice")) * Money.cents(col("l_extendedprice"))).as("syy"),
            sum(Money.cents(col("l_quantity")) * Money.cents(col("l_extendedprice"))).as("sxy"))
          .select(
            col("l_returnflag"), col("n"),
            // exact integer sums, then ONE deterministic double conversion
            // each before combining — products like syy*n overflow int64
            // in Spark while DuckDB silently promotes to HUGEINT, so the
            // combination must happen in double on both sides
            round((dbl("sxy") * dbl("n") - dbl("sx") * dbl("sy")) /
              (sqrt(dbl("sxx") * dbl("n") - dbl("sx") * dbl("sx")) *
                sqrt(dbl("syy") * dbl("n") - dbl("sy") * dbl("sy"))), 8).as("corr_qty_price"),
            round((dbl("sxy") / dbl("n") -
              (dbl("sx") / dbl("n")) * (dbl("sy") / dbl("n"))) / 10000.0, 4)
              .as("covar_pop"))
          .orderBy(col("l_returnflag")),
      Some("""
        WITH m AS (
          SELECT l_returnflag,
                 count(*) AS n,
                 sum(cast(round(l_quantity*100) as bigint)) AS sx,
                 sum(cast(round(l_extendedprice*100) as bigint)) AS sy,
                 sum(cast(round(l_quantity*100) as bigint) * cast(round(l_quantity*100) as bigint)) AS sxx,
                 sum(cast(round(l_extendedprice*100) as bigint) * cast(round(l_extendedprice*100) as bigint)) AS syy,
                 sum(cast(round(l_quantity*100) as bigint) * cast(round(l_extendedprice*100) as bigint)) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               round((cast(sxy as double) * cast(n as double) - cast(sx as double) * cast(sy as double)) /
                 (sqrt(cast(sxx as double) * cast(n as double) - cast(sx as double) * cast(sx as double)) *
                  sqrt(cast(syy as double) * cast(n as double) - cast(sy as double) * cast(sy as double))), 8) AS corr_qty_price,
               round((cast(sxy as double) / cast(n as double) -
                      (cast(sx as double) / cast(n as double)) * (cast(sy as double) / cast(n as double))) / 10000.0, 4) AS covar_pop
        FROM m
        ORDER BY l_returnflag"""),
      "correlation/covariance via exact integer moment sums (order-independent)"),

    QueryDef(
      "q44_topk_aggregator",
      (s, d) => {
        // custom bounded-heap top-k per customer: k values survive per
        // partition per group, vs rank-over-window which sorts everything.
        import s.implicits._
        val topk = udaf(new TopK(3))
        orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top3"))
          .select(col("o_custkey"),
            round(try_element_at(col("top3"), lit(1)), 2).as("top1"),
            round(coalesce(try_element_at(col("top3"), lit(2)), lit(0.0)), 2).as("top2"),
            round(coalesce(try_element_at(col("top3"), lit(3)), lit(0.0)), 2).as("top3"))
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey,
               round(max(CASE WHEN rk = 1 THEN o_totalprice END), 2) AS top1,
               round(coalesce(max(CASE WHEN rk = 2 THEN o_totalprice END), 0), 2) AS top2,
               round(coalesce(max(CASE WHEN rk = 3 THEN o_totalprice END), 0), 2) AS top3
        FROM (SELECT o_custkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders)
        WHERE rk <= 3
        GROUP BY o_custkey
        ORDER BY o_custkey"""),
      "custom Aggregator UDAF: bounded top-k heap with k-capped partial buffers"),

    QueryDef(
      "q93_heavy_hitters",
      (s, d) => {
        // Misra-Gries as a CANDIDATE GENERATOR — the only way a sketch
        // ships deterministic output: the k=3 sketch per source can never
        // evict an item with frequency above N/(k+1) = 25% (mergeable-
        // summaries guarantee), so its <=k survivors are a superset of
        // the true heavy hitters; an exact rescan of just those
        // candidates emits exact counts. lang-within-source is this
        // corpus's genuinely skewed domain (en ~ 44%), and 5 langs vs 3
        // counters means eviction REALLY runs — an MG regression that
        // dropped a guaranteed survivor would lose a row vs the oracle.
        // 100 TB shape: sketch = one partial-agg shuffle of k-bounded
        // buffers; rescan = a groupBy over only the <=k*|groups|
        // candidate keys (left-semi pruned before the count).
        // lang coalesces to a sentinel BEFORE grouping on both engines:
        // the plain equi left-semi join drops NULL keys while DuckDB's
        // GROUP BY keeps a NULL group, so a null-heavy corpus would
        // diverge (and a null would also hit the String-typed UDAF).
        val hh = udaf(new HeavyHitters(3))
        val docs = documents(s, d)
          .withColumn("lang", coalesce(col("lang"), lit("__null__")))
        val cand = docs
          .groupBy(col("source"))
          .agg(hh(col("lang")).as("sketch"))
          .select(col("source"), explode(col("sketch")).as("c"))
          .select(col("source"), col("c._1").as("lang"))
        val exact = docs
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n"))
        val totals = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("tot"))
        exact.join(cand, Seq("source", "lang"), "left_semi")
          .join(totals, "source")
          .filter(col("n") * 4 > col("tot"))
          .select(col("source"), col("lang").as("item"), col("n"))
          .orderBy(col("source"), col("item"))
      },
      Some("""
        WITH c AS (SELECT source, coalesce(lang, '__null__') AS lang, count(*) AS n
                   FROM documents GROUP BY 1, 2),
        t AS (SELECT source, sum(n) AS tot FROM c GROUP BY 1)
        SELECT c.source, c.lang AS item, c.n
        FROM c JOIN t USING (source)
        WHERE c.n * 4 > t.tot
        ORDER BY source, item"""),
      "Misra-Gries heavy hitters: k-bounded mergeable sketch prunes candidates, exact rescan confirms"),

    QueryDef(
      "q116_kmv_distinct",
      (s, d) => {
        // KMV (k-minimum-values) distinct sketch — unlike HLL (q43), the
        // estimate is a DETERMINISTIC function of the input set given the
        // hash family: keep the k smallest 48-bit md5 hashes of the
        // distinct items, estimate NDV as (k-1) * 2^48 div h_(k) (the
        // Beyer et al. 2007 unbiased form, in exact integer division so
        // both engines agree bit-for-bit), fall back to the exact kept
        // count when a group has fewer than k distinct items. The
        // (lang, word) distinct is a partial-agg shuffle; the k-min fold
        // reuses the MinKByCoin bounded aggregator (hex-string coins
        // order exactly like their numeric hashes), so per-group state is
        // k entries regardless of vocabulary size. The exact n_distinct
        // column rides along as the report's error reference.
        val K = 16
        val mink = udaf(new MinKByCoin(K))
        documents(s, d)
          .select(col("lang"),
            explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
          .distinct()
          .select(col("lang"),
            substring(md5(col("word")), 1, 12).as("hx"))
          .select(col("lang"), col("hx"), conv(col("hx"), 16, 10).cast("long").as("h"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_distinct"), mink(col("hx"), col("h")).as("ks"))
          .select(col("lang"), col("n_distinct"),
            when(size(col("ks")) < K, col("n_distinct"))
              .otherwise(expr(s"(${K - 1} * 281474976710656) div element_at(ks, $K)"))
              .as("kmv_est"))
      },
      Some("""
        WITH dw AS (
          SELECT DISTINCT lang,
                 unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
          FROM documents),
        h AS (
          SELECT lang, CAST(concat('0x', substr(md5(word), 1, 12)) AS BIGINT) AS hv
          FROM dw),
        r AS (
          SELECT lang, hv,
                 row_number() OVER (PARTITION BY lang ORDER BY hv) AS rk,
                 count(*) OVER (PARTITION BY lang) AS nd
          FROM h)
        SELECT lang,
               cast(max(nd) as bigint) AS n_distinct,
               cast(CASE WHEN max(nd) < 16 THEN max(nd)
                    ELSE (15 * 281474976710656) // max(CASE WHEN rk = 16 THEN hv END)
                    END as bigint) AS kmv_est
        FROM r GROUP BY lang"""),
      "KMV distinct sketch: k-min hash fold with a deterministic, oracle-reproducible estimate"),

    QueryDef(
      "q134_join_cardinality",
      (s, d) => {
        // Optimizer-statistics estimation WITHOUT running the join: the
        // expected row count of orders ⋈ events on the customer key,
        // from two k=256 KMV key sketches. Each side folds to ONE row
        // (row count + k smallest 48-bit key hashes — the per-side scan
        // is all a 100 TB stats collection would pay); the union sketch
        // is the k smallest of the two k-min sets (the standard KMV
        // union identity), inclusion-exclusion gives the key-overlap
        // estimate, and uniform-multiplicity scaling
        // (inter * n_a * n_b) div (d_a * d_b) gives the join size — all
        // exact integer arithmetic, so the ESTIMATE itself is
        // deterministic and runs under the hash gate. The true join
        // count rides along as the error reference (affordable here;
        // the estimate is the part that scales).
        val K = 256
        val mink = udaf(new MinKByCoin(K))
        def sketch(df: org.apache.spark.sql.DataFrame, suffix: String) = {
          val n = df.agg(count(lit(1)).as(s"n_$suffix"))
          val ks = df.distinct()
            .select(substring(md5(col("key").cast("string")), 1, 12).as("hx"))
            .select(col("hx"), conv(col("hx"), 16, 10).cast("long").as("h"))
            .agg(mink(col("hx"), col("h")).as(s"ks_$suffix"))
          n.crossJoin(ks)
        }
        val a = orders(s, d).select(col("o_custkey").cast("long").as("key"))
        val b = events(s, d).select(col("user_id").cast("long").as("key"))
        val truth = a.join(b, "key").agg(count(lit(1)).as("true_join_rows"))
        def dhat(ks: String, alias: String) =
          when(size(col(ks)) < K, size(col(ks)).cast("long"))
            .otherwise(expr(s"(${K - 1} * 281474976710656) div element_at($ks, $K)"))
            .as(alias)
        sketch(a, "a").crossJoin(sketch(b, "b")).crossJoin(broadcast(truth))
          .withColumn("ks_u",
            slice(array_sort(array_distinct(concat(col("ks_a"), col("ks_b")))),
              1, K))
          .select(col("n_a"), col("n_b"),
            dhat("ks_a", "dhat_a"), dhat("ks_b", "dhat_b"),
            dhat("ks_u", "dhat_u"), col("true_join_rows"))
          .select(col("n_a"), col("n_b"), col("dhat_a"), col("dhat_b"),
            greatest(lit(0L), col("dhat_a") + col("dhat_b") - col("dhat_u"))
              .as("dhat_inter"),
            // divisions INTERLEAVED with the products: the naive
            // inter*n_a*n_b // (dhat_a*dhat_b) overflows int64 once
            // n_a*n_b reaches ~3.6e16 (a few hundred million rows per
            // side — exactly the regime the estimator targets). Here the
            // largest intermediate is inter*n_a <= distinct_a+b * n_a
            // (~2^63 only past ~1e9 distincts x ~4e9 rows), then the
            // first quotient ~ selectivity_a * n_a <= n_a before n_b
            // multiplies in. The oracle computes the identical
            // interleaving, so the floor-division value drift stays in
            // lockstep.
            expr("""((greatest(0, dhat_a + dhat_b - dhat_u) * n_a)
                    div dhat_a) * n_b div dhat_b""").as("est_join_rows"),
            col("true_join_rows"))
      },
      Some("""
        WITH ra AS (SELECT cast(o_custkey AS bigint) AS key FROM orders),
        rb AS (SELECT cast(user_id AS bigint) AS key FROM events),
        ha AS (
          SELECT DISTINCT CAST(concat('0x', substr(md5(cast(key AS varchar)), 1, 12)) AS BIGINT) AS h
          FROM ra),
        hb AS (
          SELECT DISTINCT CAST(concat('0x', substr(md5(cast(key AS varchar)), 1, 12)) AS BIGINT) AS h
          FROM rb),
        ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT 256),
        da AS (SELECT CASE WHEN count(*) < 256 THEN count(*)
                           ELSE 255 * 281474976710656 // max(h) END AS dhat_a FROM ka),
        db AS (SELECT CASE WHEN count(*) < 256 THEN count(*)
                           ELSE 255 * 281474976710656 // max(h) END AS dhat_b FROM kb),
        du AS (SELECT CASE WHEN count(*) < 256 THEN count(*)
                           ELSE 255 * 281474976710656 // max(h) END AS dhat_u FROM ku),
        na AS (SELECT count(*) AS n_a FROM ra),
        nb AS (SELECT count(*) AS n_b FROM rb),
        tj AS (SELECT count(*) AS true_join_rows
               FROM ra JOIN rb ON ra.key = rb.key)
        SELECT n_a, n_b,
               cast(dhat_a AS bigint) AS dhat_a,
               cast(dhat_b AS bigint) AS dhat_b,
               cast(greatest(0, dhat_a + dhat_b - dhat_u) AS bigint) AS dhat_inter,
               cast(((greatest(0, dhat_a + dhat_b - dhat_u) * n_a)
                    // dhat_a) * n_b // dhat_b AS bigint) AS est_join_rows,
               true_join_rows
        FROM na, nb, da, db, du, tj"""),
      "join-cardinality estimation from KMV key sketches (deterministic optimizer statistics; true count as reference)"),

    QueryDef(
      "q154_countmin",
      (s, d) => cmFreqReport(Tables.documents(s, d)),
      Some(cmOracle),
      "count-min sketch frequency estimation: D x W bounded counters off the vocab domain, min-probe vs exact, one-sided error audited")
  )

  // final val => compile-time constants, INLINED at use sites: `defs`
  // initializes before this point in the object body, and a plain val
  // would interpolate 0 into the oracle SQL (caught by selfcheck —
  // range(0)/LIMIT 0 made the oracle empty)
  /** Count-min sketch rows (independent md5-derived hash families). */
  final val CM_D = 4
  /** Counter width per row. */
  final val CM_W = 512
  /** Words reported (top by exact frequency, word tiebreak). */
  final val CM_TOP = 20

  /** Row-d bucket of a word: 48 md5 bits under the "cm<d>:" draw, mod
    * width — decorrelated per row and from every other coin family. */
  private def cmBucket(d: Int, w: org.apache.spark.sql.Column, width: Int) =
    pmod(conv(substring(md5(concat(lit(s"cm$d:"), w)), 1, 12), 16, 10)
      .cast("long"), lit(width.toLong))

  /** The D x W counter table from a (word, f) frequency frame. Exposed
    * for the mergeability spec: cellwise ADDITION of two corpus halves'
    * sketches must equal the whole corpus's sketch — the property that
    * makes this the per-partition/streaming frequency store. */
  private[graft] def cmCountersOfFreq(wf: org.apache.spark.sql.DataFrame,
      dRows: Int = CM_D, width: Int = CM_W): org.apache.spark.sql.DataFrame =
    wf
      .select(col("f"), explode(array((0 until dRows).map(dd =>
        struct(lit(dd).as("d"), cmBucket(dd, col("word"), width).as("b"))): _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.b").as("b"))
      .agg(sum(col("f")).as("cnt"))

  /** Counter table straight from documents (tokenize + count + sketch). */
  private[graft] def cmCounters(docs: org.apache.spark.sql.DataFrame,
      dRows: Int = CM_D, width: Int = CM_W): org.apache.spark.sql.DataFrame =
    cmCountersOfFreq(docs
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f")), dRows, width)

  /** Count-min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
    * Summary: The Count-Min Sketch and its Applications", J.Alg 2005)
    * over corpus word frequencies, with its one-sided error AUDITED
    * against the exact counts for the top words: every estimate must be
    * >= exact (collisions only ever add), and the overestimate column is
    * the observable price of compressing an unbounded vocabulary into
    * D x W integers.
    *
    * 100 TB shape: counts are additive, so the counters build from the
    * vocab-compressed word-frequency table, not the raw token stream —
    * one corpus-volume partial agg (the q147 discipline), then a
    * D-fold explode on the VOCAB domain into (row, bucket) partial sums:
    * sketch state is D*W cells regardless of corpus or vocabulary size,
    * and it merges by cellwise addition — the property that makes it the
    * streaming/multi-tenant frequency store (a per-partition sketch
    * union is the same groupBy). The probe side broadcasts the D*W
    * counter table. */
  private[graft] def cmFreqReport(docs: org.apache.spark.sql.DataFrame,
      dRows: Int = CM_D, width: Int = CM_W, topN: Int = CM_TOP): org.apache.spark.sql.DataFrame = {
    val wf = graft.Caches.lease(docs
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f")))
    val counters = cmCountersOfFreq(wf, dRows, width)
    val top = wf.orderBy(col("f").desc, col("word")).limit(topN)
    top
      .select(col("word"), col("f"), explode(array((0 until dRows).map(dd =>
        struct(lit(dd).as("d"), cmBucket(dd, col("word"), width).as("b"))): _*)).as("c"))
      .join(broadcast(counters),
        col("c.d") === counters("d") && col("c.b") === counters("b"))
      .groupBy(col("word"), col("f"))
      .agg(min(col("cnt")).as("cm_est"))
      .select(col("word"), col("f").as("exact_cnt"), col("cm_est"),
        (col("cm_est") - col("f")).as("overestimate"))
  }

  private def cmOracle: String = s"""
    WITH wf AS (
      SELECT w AS word, count(*)::BIGINT AS f
      FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
            FROM documents)
      GROUP BY 1),
    ctr AS (
      SELECT d,
             CAST(concat('0x', substr(md5('cm' || d::VARCHAR || ':' || word), 1, 12)) AS BIGINT) % $CM_W AS b,
             sum(f)::BIGINT AS cnt
      FROM (SELECT word, f, unnest(range($CM_D)) AS d FROM wf)
      GROUP BY 1, 2),
    top AS (SELECT word, f FROM wf ORDER BY f DESC, word LIMIT $CM_TOP),
    probe AS (
      SELECT word, f, d,
             CAST(concat('0x', substr(md5('cm' || d::VARCHAR || ':' || word), 1, 12)) AS BIGINT) % $CM_W AS b
      FROM (SELECT word, f, unnest(range($CM_D)) AS d FROM top)),
    est AS (
      SELECT p.word, p.f, min(c.cnt) AS cm_est
      FROM probe p JOIN ctr c ON c.d = p.d AND c.b = p.b
      GROUP BY 1, 2)
    SELECT word, f AS exact_cnt, cm_est, cm_est - f AS overestimate
    FROM est"""
}
