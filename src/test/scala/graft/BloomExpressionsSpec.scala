package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.expressions.BloomExpressions

class BloomExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def filterOf(keys: Seq[Long]): BloomFilter = {
    val bf = BloomFilter.create(math.max(keys.size.toLong, 16L), 0.01)
    keys.foreach(bf.putLong)
    bf
  }

  test("bloom_might_contain has no false negatives and respects nulls") {
    val bf = filterOf(Seq(1L, 5L, 9L))
    val df = Seq(Some(1L), Some(2L), Some(5L), Some(9L), None).toDF("k")
    val got = df.select(BloomExpressions.mightContain(col("k"), bf)).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    // inserted keys MUST test true; nulls stay null; absent keys are
    // allowed either answer (false positive ok) — only pin the must-trues.
    assert(got(0).contains(true) && got(2).contains(true) && got(3).contains(true))
    assert(got(4).isEmpty)
  }

  test("interpreted eval agrees with codegen") {
    val bf = filterOf(0L until 512L by 3L)
    val df = spark.range(0, 512).select(col("id").as("k"))
    val expr = BloomExpressions.mightContain(col("k"), bf)
    val viaCodegen = df.select(col("k"), expr.as("m")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // interpreted path: drive nullSafeEval directly
    val interpreted = (0L until 512L).map(k => k ->
      graft.functions.expressions.BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(k), bf)
        .eval(null).asInstanceOf[Boolean]).toMap
    assert(viaCodegen == interpreted)
  }

  test("q95 bloom-pruned join is bit-identical to the unpruned join") {
    val pruned = SparkEntry.queries("q95_bloom_join")(spark, SF)
    val o = Tables.orders(spark, SF)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = Tables.lineitem(spark, SF)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        Money.sumDiscounted(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("ship_month"))
    assert(pruned.collect().toSeq == plain.collect().toSeq)
    assert(pruned.count() > 0)
  }

  test("the bloom prune sits below the probe-side exchange") {
    val plan = SparkEntry.queries("q95_bloom_join")(spark, SF)
      .queryExecution.executedPlan.toString
    // the membership test must appear in the plan (pushed into the probe
    // scan's filter, pre-shuffle), never above an Exchange
    val lines = plan.linesIterator.toSeq
    val bloomAt = lines.indexWhere(_.contains("bloom_might_contain"))
    val exchangeAt = lines.indexWhere(_.contains("Exchange"))
    assert(bloomAt >= 0, s"bloom_might_contain missing from plan:\n$plan")
    assert(exchangeAt >= 0 && bloomAt > exchangeAt,
      s"bloom filter should be below (deeper than) the first Exchange in:\n$plan")
  }
}
