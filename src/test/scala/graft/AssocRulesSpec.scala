package graft

/** q125 association rules: exact integer support/confidence/lift on a
  * hand-computed basket fixture. */
class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  test("q125 computes exact micro-unit support, confidence, and lift") {
    val dir = java.nio.file.Files.createTempDirectory("baskets").toString
    // 6 baskets; pair (1,2) co-occurs 3x (passes the floor), every other
    // pair once (pruned). cnt(1)=4, cnt(2)=4.
    Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L),
      (5L, 2L), (5L, 3L),
      (6L, 3L), (6L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q125_assoc_rules")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getLong(2) == 3L) // pair_orders
    assert(r.getLong(3) == 500000L) // 3e6 div 6
    assert(r.getLong(4) == 750000L) // 3e6 div 4
    assert(r.getLong(5) == 750000L)
    assert(r.getLong(6) == 1125000L) // 3*6*1e6 div (4*4)
  }

  test("q125 duplicate lineitems of one part in one order count once") {
    val dir = java.nio.file.Files.createTempDirectory("baskets2").toString
    // part 1 appears twice in basket 1: the DISTINCT basket-item
    // relation must collapse it, or supports overcount
    Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q125_assoc_rules")(spark, dir).collect().head
    assert(r.getLong(2) == 3L)
    assert(r.getLong(3) == 1000000L) // in every basket
    assert(r.getLong(6) == 1000000L) // independent-at-certainty: lift 1
  }

  test("q125 lift arithmetic survives an amplified corpus where the naive form overflows") {
    // the registered query's exact lift expression, applied to a
    // corpus-scale row: 5e6 co-occurrences over 1e7 baskets with 6e6-row
    // item counts. The naive pc*N*1e6/(cu*cv) numerator is 5e19 > 2^63
    // (an ANSI overflow error at exactly the scale the operator targets);
    // the interleaved form's largest intermediate is 1e6 * n_baskets.
    val row = Seq((5000000L, 6000000L, 6000000L, 10000000L))
      .toDF("pc", "cu", "cv", "n_baskets")
    val got = row
      .select(org.apache.spark.sql.functions
        .expr("((pc * 1000000 div cu) * n_baskets) div cv").as("lift_micro"))
      .head.getLong(0)
    val expect = (BigInt(5000000) * 1000000 / 6000000 * 10000000 / 6000000).toLong
    assert(got == expect, s"$got != $expect")
    // and the interleaved floor drifts <= 1e-6 relative from the true ratio
    val exact = BigInt(5000000) * 10000000 * 1000000 / (BigInt(6000000) * 6000000)
    assert((BigInt(got) - exact).abs.toDouble <= exact.toDouble * 1e-6)
  }

  test("q126 star graph is perfectly disassortative (r = -1 in exact integers)") {
    val dir = java.nio.file.Files.createTempDirectory("stardeg").toString
    // three baskets pairing hub 0 with leaves 1..3 -> star K1,3:
    // m=6, sx=12, sxx=30, sxy=18 -> num=-36, den=36 (r = -1)
    Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 2L), (3L, 0L), (3L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q126_degree_assortativity")(spark, dir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 1L, 3L)))
    assert(r.getLong(3) == -36L)
    assert(r.getLong(4) == 36L)
  }
}
