package graft

import org.apache.spark.sql.functions._

import graft.operators.Aggregates

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL approx_count_distinct stays within 5% of exact at sf0.001") {
    val rows = Tables.lineitem(spark, SF)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (_, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("percentile_approx tracks the exact percentile within its accuracy bound") {
    val li = Tables.lineitem(spark, SF)
    val (approx, exact) = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)),
      percentile(col("l_extendedprice"), lit(0.5)))
      .as[(Double, Double)].head()
    // the sketch path for 100 TB: bounded memory, mergeable, small error
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx exact $exact")
  }

  test("TopK aggregator matches rank-over-window on random data") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(500)((rnd.nextInt(20).toLong, rnd.nextInt(10000) / 100.0, rnd.nextLong().abs))
      .toDF("k", "v", "id")
    val topk = udaf(new Aggregates.TopK(3))
    val got = df.groupBy("k").agg(topk(col("v"), col("id")).as("t"))
      .as[(Long, Seq[Double])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .orderBy("k", "rk").as[(Long, Double, Long, Int)].collect()
      .groupBy(_._1).map { case (k, xs) => k -> xs.sortBy(_._4).map(_._2).toSeq }
    assert(got == want)
  }

  test("TopK partial buffers stay bounded at k") {
    val agg = new Aggregates.TopK(2)
    val big = (1 to 100).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i.toDouble, i.toLong)))
    assert(big.size == 2 && agg.finish(big) == Seq(100.0, 99.0))
    val merged = agg.merge(big, agg.reduce(agg.zero, (1000.0, 1L)))
    assert(agg.finish(merged) == Seq(1000.0, 100.0))
  }
}
