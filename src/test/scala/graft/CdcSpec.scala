package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Planted-fixture checks for the CDC operators: the synthetic corpus
  * exercises them at volume (q106/q107 oracles), these pin the semantic
  * corners — classification, unchanged-row suppression, no-op-update
  * collapse, same-timestamp ties, interval chaining. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies I/U/D and suppresses unchanged rows") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "v")
    val curr = Seq((1L, 10L), (2L, 25L), (4L, 40L), (5L, 50L)).toDF("k", "v")
    val got = Cdc.snapshotDiff(base, curr, "k", "v")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    assert(got == Set(
      (2L, "U", Some(20L), Some(25L)),
      (3L, "D", Some(30L), None),
      (5L, "I", None, Some(50L))))
  }

  test("snapshotDiff treats NULL values as values, not missing keys") {
    val base = Seq((1L, Some(10L)), (2L, None), (3L, None)).toDF("k", "v")
    val curr = Seq((1L, None), (2L, None), (3L, Some(7L))).toDF("k", "v")
    val got = Cdc.snapshotDiff(base, curr, "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // value transitions to/from NULL are updates; NULL==NULL is unchanged;
    // nothing here is an insert or delete
    assert(got == Set((1L, "U"), (3L, "U")))
  }

  test("scd2History collapses no-op touches, breaks ts ties, chains intervals") {
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")
    // user 1: 10 -> touch(10, collapsed) -> 20 -> 10 (reverting reopens);
    // user 2: two changes at the SAME ts, event_id orders them
    val log = Seq(
      (1L, ts(1), 100L, 10L), (1L, ts(2), 101L, 10L),
      (1L, ts(3), 102L, 20L), (1L, ts(4), 103L, 10L),
      (2L, ts(5), 200L, 7L), (2L, ts(5), 201L, 8L))
      .toDF("user_id", "ts", "event_id", "value_cents")
    val hist = Cdc.scd2History(log, "user_id", "ts", "event_id", "value_cents")
    val rows = hist.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    val u1 = rows.filter(_._1 == 1L).sortBy(_._3.getTime)
    assert(u1.map(_._2).toSeq == Seq(10L, 20L, 10L), "touch row must collapse, revert must reopen")
    // intervals chain: each valid_to is the next valid_from
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a._4.contains(b._3), s"gap between $a and $b")
    }
    val u2 = rows.filter(_._1 == 2L).sortBy(_._5)
    assert(u2.map(_._2).toSeq == Seq(7L, 8L), "same-ts changes must order by event_id")
    // exactly one open (is_current) version per key
    assert(rows.filter(_._5).groupBy(_._1).forall(_._2.length == 1))
    assert(rows.count(_._5) == 2)
  }

  test("bucket checksums localize a divergence and catch duplicate-row drift") {
    val a = Seq((1L, "x"), (2L, "y"), (1001L, "z"), (2002L, "w")).toDF("k", "v")
    // replica b: one value changed in bucket 1; bucket 0 and 2 untouched
    val b = Seq((1L, "x"), (2L, "y"), (1001L, "CHANGED"), (2002L, "w")).toDF("k", "v")
    def sums(df: org.apache.spark.sql.DataFrame) =
      operators.Cdc.bucketChecksums(df, expr("k div 1000"), concat_ws("|", col("k"), col("v")))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (sa, sb) = (sums(a), sums(b))
    assert(sa(0L) == sb(0L) && sa(2L) == sb(2L))
    assert(sa(1L) != sb(1L), "divergent bucket must mismatch")
    // same n_rows, same row SET, different multiplicity: row (2,y)
    // duplicated, row (1,x) dropped — xor would cancel, the sum must not
    val c = Seq((2L, "y"), (2L, "y"), (2L, "y"), (1001L, "z")).toDF("k", "v")
    val d2 = Seq((1L, "x"), (2L, "y"), (2L, "y"), (1001L, "z")).toDF("k", "v")
    val (sc, sd) = (sums(c), sums(d2))
    assert(sc(0L)._1 == sd(0L)._1, "fixture: equal row counts")
    assert(sc(0L)._2 != sd(0L)._2, "multiplicity drift must change the checksum")
  }

  test("q113 partial-state merge is associative across any batch split") {
    // three batches, keys overlapping partially; merging in any grouping
    // must equal the one-shot aggregate — the algebraic-state contract
    val rows = Seq((1L, 10L), (1L, 5L), (2L, 7L), (3L, 1L), (2L, 2L), (4L, 9L))
    def agg(xs: Seq[(Long, Long)]) = xs.toDF("k", "v").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    def merge(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.select(col("k"), col("n").as("an"), col("s").as("as"))
        .join(b.select(col("k"), col("n").as("bn"), col("s").as("bs")), Seq("k"), "full_outer")
        .select(col("k"),
          (coalesce(col("an"), lit(0L)) + coalesce(col("bn"), lit(0L))).as("n"),
          (coalesce(col("as"), lit(0L)) + coalesce(col("bs"), lit(0L))).as("s"))
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (b1, b2, b3) = (rows.take(2), rows.slice(2, 4), rows.drop(4))
    val full = collect(agg(rows))
    assert(collect(merge(merge(agg(b1), agg(b2)), agg(b3))) == full)
    assert(collect(merge(agg(b1), merge(agg(b2), agg(b3)))) == full)
  }

  test("scd2 plans ONE shuffle: both windows reuse the (key, ts) sort") {
    val log = Tables.events(spark, SF)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        Money.cents(col("value")).as("value_cents"))
    val plan = Cdc.scd2History(log, "user_id", "ts", "event_id", "value_cents")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected one exchange, got:\n$plan")
    assert("(?m)^\\s*\\+?-? ?Sort ".r.findAllIn(plan).size == 1,
      s"both windows must reuse one sort:\n$plan")
  }

  test("q130 merge applies update, delete, insert, and delete-wins conflicts") {
    val dir = java.nio.file.Files.createTempDirectory("mergedocs").toString
    // 5: untouched; 7: update (+1000); 13: delete; 91: update AND delete
    // (7*13) -> the delete must win
    Seq((5L, "t", "en", "s", 10L), (7L, "t", "en", "s", 20L),
      (13L, "t", "en", "s", 30L), (91L, "t", "en", "s", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q130_merge_upsert")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(5L -> 10L, 7L -> 1020L,
      9000000L -> 42L, 9000001L -> 42L))
  }

  test("q131 cascade counts flow down the FK chain") {
    val dir = java.nio.file.Files.createTempDirectory("gdpr").toString
    Seq((1L, 7L), (2L, 7L), (3L, 8L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 1L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1.50), (10L, 2.25), (11L, 4.00), (12L, 99.0))
      .toDF("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q131_cascade_delete")(spark, dir).collect().head
    // victims 1,2 -> orders 10,11,13 -> lines on 10,11: 1.50+2.25+4.00
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 3L, 3L, 775L)))
  }
}
