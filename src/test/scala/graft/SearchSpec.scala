package graft

import org.apache.spark.sql.functions._

import graft.functions.{Search, TextAnalysis}

/** Ranking-semantics checks for BM25 (q78) beyond the oracle hash: the
  * oracle proves engine agreement; these pin that the scoring itself
  * behaves like BM25. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val results =
    Search.defs.find(_.name == "q78_bm25").get.fn(spark, SF)
      .select(col("qid"), col("rk"), col("doc_id").cast("long"), col("score"))
      .as[(Int, Int, Long, Double)].collect()

  test("q78 returns a full, strictly-ranked top-k per query") {
    val byQ = results.groupBy(_._1)
    assert(byQ.keySet == Search.QUERIES.map(_._1).toSet)
    byQ.values.foreach { rows =>
      assert(rows.length == Search.TOPK)
      val scores = rows.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
  }

  test("q78 top hits for the rare-term query actually contain the rare term") {
    // 'dup' is in ~5% of docs and carries nearly all of query 1's idf mass:
    // every top-5 doc must contain it, else the ranking isn't term-driven
    val topDocs = results.filter(_._1 == 1).map(_._3).toSet
    val docsWithDup = Tables.documents(spark, SF)
      .select(col("doc_id"))
      .filter(array_contains(TextAnalysis.tokens(col("text")), "dup"))
      .as[Long].collect().toSet
    assert(topDocs.subsetOf(docsWithDup),
      s"non-'dup' docs in the rare-term top-k: ${topDocs.diff(docsWithDup)}")
  }

  test("q78 idf orders rare above common: rare-term scores dominate") {
    // query 1's best score (driven by 'dup', df ~5%) must exceed query 3's
    // (all common terms, near-zero idf) — the defining BM25 property
    val best1 = results.filter(_._1 == 1).map(_._4).max
    val best3 = results.filter(_._1 == 3).map(_._4).max
    assert(best1 > best3,
      s"rare-term query scored $best1 <= common-term query $best3")
  }
}
