package graft

/** Probe which SQL surface features this Spark build supports (recursive
  * CTE landed in Spark 4.x; LATERAL subqueries in 3.4+). */
class SqlFeatureProbe extends SparkSpec {

  test("probe: WITH RECURSIVE") {
    val ok = try {
      spark.sql("""WITH RECURSIVE t(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5)
        SELECT sum(n) FROM t""").head().getLong(0) == 15L
    } catch { case e: Throwable => info(s"unsupported: ${e.getMessage.take(120)}"); false }
    info(s"recursive CTE supported: $ok")
  }

  test("probe: LATERAL subquery") {
    val ok = try {
      Tables.nation(spark, SF).createOrReplaceTempView("pn")
      spark.sql("""SELECT n_name, x FROM pn,
        LATERAL (SELECT n_nationkey * 2 AS x) t LIMIT 3""").count() == 3
    } catch { case e: Throwable => info(s"unsupported: ${e.getMessage.take(120)}"); false }
    info(s"lateral supported: $ok")
  }
}
