package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** q92's constraint checks must actually CATCH violations — the clean
  * testdata passes everything, so this plants one violation per check
  * family in a fixture star schema and asserts each is flagged with the
  * right metric. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("every q92 check family flags its planted violation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quality").toString
    // orders: duplicate pk (1 twice), one orphan custkey (99), one
    // negative total
    Seq(
      (1L, 10L, "O", 100.0, java.sql.Timestamp.valueOf("1995-06-01 00:00:00"), "1-URGENT"),
      (1L, 10L, "O", 50.0, java.sql.Timestamp.valueOf("1995-06-02 00:00:00"), "1-URGENT"),
      (2L, 99L, "F", -5.0, java.sql.Timestamp.valueOf("1995-06-03 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "Customer#10", 1L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // lineitem: one orphan orderkey (7), one out-of-range quantity (99)
    Seq((1L, 1L, 1L, 99.0, 10.0), (7L, 1L, 1L, 5.0, 10.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // documents: one null text
    Seq((1L, Option("some text"), "en", "s", 9L), (2L, None, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // events: one unknown event_type; ts stored as raw nanos (the events
    // loader expects TIMESTAMP(NANOS)-as-long parquet)
    Seq((1L, 1000000000L, 1L, "purchase", 1.0, "{}"),
      (2L, 2000000000L, 1L, "bogus", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = Quality.report(spark, dir)
      .select(col("check"), col("target"), col("metric"), col("passed"))
      .as[(String, String, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out.size == 8)
    // every family catches its planted violation with the exact count
    assert(out(("pk_unique", "orders.o_orderkey")) == (1.0, false))
    assert(out(("pk_unique", "customer.c_custkey")) == (0.0, true))
    assert(out(("fk_orphans", "orders.o_custkey -> customer")) == (1.0, false))
    assert(out(("fk_orphans", "lineitem.l_orderkey -> orders")) == (1.0, false))
    assert(out(("null_frac", "documents.text")) == (0.5, false))
    assert(out(("out_of_range", "lineitem.l_quantity in [1,50]")) == (1.0, false))
    assert(out(("out_of_range", "orders.o_totalprice >= 0")) == (1.0, false))
    assert(out(("domain", "events.event_type")) == (1.0, false))
  }

  test("q109 profiler counts rows, nulls, and exact NDV in one scan per table") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")), (Some(2L), None),
      (None, Some("b")), (None, None))
      .toDF("k", "s")
    val got = operators.Quality.profile(df, "t")
      .collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // 5 rows; k: 2 nulls, NDV {1,2} = 2; s: 2 nulls, NDV {a,b} = 2
    assert(got == Map("k" -> ((5L, 2L, 2L)), "s" -> ((5L, 2L, 2L))))
    // the multi-column distinct melts through ONE scan of the input
    val plan = operators.Quality.profile(df, "t").queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size <= 1, plan)
  }

  test("q111 PSI is zero on identical cohorts and flags a planted shift") {
    import spark.implicits._
    def vals(xs: Seq[Long]) = xs.toDF("c")
    val base = vals((1L to 1000L).map(i => i % 100))
    def psi(b: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      operators.Quality.driftPsi(b, c)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // identical distribution => every smoothed term is exactly 0
    val same = psi(base, vals((1L to 1000L).map(i => i % 100)))
    assert(same.values.forall(_ == 0L), same.toString)
    assert(same.keySet == (0L to 9L).toSet)
    // mass shifted hard to the right => strong positive drift terms at
    // both ends (loss on the left, gain on the right), total PSI large
    val shifted = psi(base, vals((1L to 1000L).map(i => 80 + i % 20)))
    assert(shifted.values.sum > 500000L, s"expected total PSI > 0.5, got $shifted")
    assert(shifted(9L) > 0L && shifted(0L) > 0L)
  }

  test("q136 recovers a planted linear trend as an exact rational") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trend").toString
    // one event per hour h=0..9 with value 3h + 7 cents (0.03h + 0.07):
    // the OLS slope is exactly 3 cents/hour -> slope_num == 3 * slope_den
    val rows = (0 until 10).map { h =>
      (h.toLong, new java.sql.Timestamp(h * 3600000L), 1L, "view",
        (3 * h + 7) / 100.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q136_trend_regression")(spark, dir)
      .collect().head
    assert(r.getString(0) == "view" && r.getLong(1) == 10L)
    val (num, den) = (r.getLong(3), r.getLong(4))
    assert(den > 0 && num == 3 * den, s"slope $num/$den != 3")
  }

  test("q137 winsorizes at the exact ceil-rank cut values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winsor").toString
    // 10 docs, lengths 1..9 plus an outlier 1000. ceil(0.1*10)=rank 1 ->
    // lo=1; ceil(0.9*10)=rank 9 -> hi=9; the 1000 clips to 9:
    // winsorized sum = 1+..+9 + 9 = 54
    val rows = ((1 to 9).map(_.toLong) :+ 1000L).zipWithIndex.map {
      case (len, i) => (i.toLong, "t", "en", "s", len)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q137_winsorized_stats")(spark, dir)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10L, 1L, 9L, 54L)))
  }
}
