package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Contract of the salted skew join and its data-driven salt factor:
  * S = 1 must degenerate to the PLAIN join (same plan — no salt column,
  * no dim replication), any S must leave values identical, and
  * [[SkewJoin.saltFactor]] must size S from the hottest key's
  * multiplicity, monotonically in the per-task budget. */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    (1L, 10.0, 100L), (1L, 20.0, 101L), (1L, 30.0, 102L),
    (2L, 40.0, 103L), (3L, 50.0, 104L))
    .toDF("k", "value", "event_id")
  private def dim = Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D"))
    .toDF("k", "seg")

  private def rows(s: Int): Set[(Long, Double, Long, String)] =
    SkewJoin.saltedJoin(fact, dim, "k", s, saltCoin = Some(col("event_id")), forceShuffle = true)
      .select(col("k"), col("value"), col("event_id"), col("seg"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
      .toSet

  test("S=1 degenerates to the plain join: same plan, no salt machinery") {
    val degenerate = SkewJoin.saltedJoin(fact, dim, "k", 1, saltCoin = Some(col("event_id")), forceShuffle = true)
    val plain = fact.join(dim, Seq("k"))
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString.replaceAll("#\\d+", "#_")
    val dp = shape(degenerate)
    assert(!dp.contains("explode"), dp)
    assert(!dp.contains("_salt"), dp)
    // same optimized plan shape (modulo expr ids) => same execution
    assert(dp == shape(plain))
  }

  test("values are identical across S = 1, 2, 8 (layout-only transform)") {
    val expect = rows(1)
    assert(expect.size == 5)
    assert(rows(2) == expect)
    assert(rows(8) == expect)
  }

  test("every fact row meets its dim row exactly once at any S") {
    for (s <- Seq(2, 3, 8)) {
      val n = SkewJoin.saltedJoin(fact, dim, "k", s, saltCoin = Some(col("event_id")), forceShuffle = true).count()
      assert(n == 5, s"S=$s produced $n rows")
    }
  }

  test("saltFactor: hot key with a small budget forces S > 1; generous budget gives 1") {
    // one key carries 400 of 430 rows — the skew the operator exists for
    val skewed = spark.range(0, 400).select(lit(7L).as("k"))
      .unionAll(spark.range(0, 30).select((col("id") % 3 + 100).as("k")))
    val tight = SkewJoin.saltFactor(skewed, targetRowsPerTask = 50L)
    assert(tight > 1, s"expected multi-salt under a 50-row budget, got $tight")
    // budget at production scale: the whole hot key fits one task
    val loose = SkewJoin.saltFactor(skewed, targetRowsPerTask = 1000000L)
    assert(loose == 1, s"expected S=1 under a generous budget, got $loose")
    // monotone: a bigger budget never asks for more salt
    val mid = SkewJoin.saltFactor(skewed, targetRowsPerTask = 200L)
    assert(mid <= tight && mid >= loose)
  }

  test("saltFactor upper-bounds the hottest key: S covers max_mult/target") {
    // uniform 64 keys x 10 rows: MG residuals are small, the n/(k+1)
    // error term dominates — the bound stays sound (never < true need)
    val uniform = spark.range(0, 640).select((col("id") % 64).as("k"))
    val s = SkewJoin.saltFactor(uniform, targetRowsPerTask = 5L)
    // true max mult is 10 -> needs >= 2; the MG bound may ask for more
    assert(s >= 2, s"S=$s under-covers a 10-row key at 5 rows/task")
    assert(s <= 64, s"clamp failed: $s")
  }
}
