package graft

/** Smoke: every registered query runs at sf0.001 and (except two that are
  * legitimately empty at this tiny scale) returns rows. The value-level
  * check is the driver's DuckDB oracle at sf0.01 (tools/selfcheck.py). */
class QueriesSpec extends SparkSpec {

  // too selective to produce rows on ~1k-row inputs; non-empty at sf0.01+
  private val emptyOkAtTinyScale = Set("q15_theta_join", "q22_range_join")

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.fn(spark, SF).count()
      if (!emptyOkAtTinyScale(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has unique registration") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("oracle map only references registered queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
