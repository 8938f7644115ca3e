package graft

import org.apache.spark.sql.functions._

/** JDBC source/sink coverage (SURVEY §2.2 external-DB row) against embedded
  * Derby — the same `spark.read.jdbc` path a warehouse/RDBMS would use. */
class JdbcSpec extends SparkSpec {

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("derby")
    s"jdbc:derby:$dir/testdb;create=true"
  }

  test("jdbc round-trip preserves rows and types") {
    val c = Tables.customer(spark, SF)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    c.write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", "customer").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "customer").load()
    assert(back.count() == c.count())
    assert(back.schema("c_custkey").dataType.typeName == "long")
    val sum = back.agg(graft.Money.sum2(col("c_acctbal"))).head().getDouble(0)
    val want = c.agg(graft.Money.sum2(col("c_acctbal"))).head().getDouble(0)
    assert(sum == want)
  }

  test("jdbc predicate pushdown reaches the external engine") {
    val df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "customer").load()
      .filter(col("c_custkey") < 10)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("LessThan(c_custkey"), p)
    assert(df.count() == 10)
  }

  test("jdbc partitioned parallel read") {
    val df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "customer")
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", "0").option("upperBound", "150")
      .option("numPartitions", "4").load()
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 150)
  }
}
