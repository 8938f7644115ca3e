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

  private lazy val hybrid =
    Search.defs.find(_.name == "q144_hybrid_rrf").get.fn(spark, SF)
      .select(col("qid"), col("rk"), col("doc_id").cast("long"), col("rrf"),
        col("rk_lex"), col("rk_vec"))
      .as[(Int, Int, Long, Long, Int, Int)].collect()

  test("q144 fused scores are the exact RRF arithmetic of the rank columns") {
    // non-circular: the emitted rrf is recomputed in the driver from the
    // emitted per-system ranks, so the fusion can't silently drift from
    // the Cormack et al. formula it claims
    assert(hybrid.length == Search.QUERIES.length * Search.TOPK)
    def part(r: Int): Long =
      if (r > 0) Search.RRF_UNIT / (Search.RRF_K0 + r) else 0L
    hybrid.foreach { case (qid, _, doc, rrf, rl, rv) =>
      assert(rl >= 0 && rl <= Search.FUSE_DEPTH, s"q$qid doc$doc rk_lex=$rl")
      assert(rv >= 0 && rv <= Search.FUSE_DEPTH, s"q$qid doc$doc rk_vec=$rv")
      assert(rl > 0 || rv > 0, s"q$qid doc$doc in neither list")
      assert(rrf == part(rl) + part(rv), s"q$qid doc$doc rrf=$rrf != ${part(rl) + part(rv)}")
    }
    hybrid.groupBy(_._1).values.foreach { rows =>
      val rrfs = rows.sortBy(_._2).map(_._4)
      assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b },
        "fused rrf not non-increasing in rank")
    }
  }

  test("q144's anchor document, when it survives the cut, tops the vector list") {
    // each qid's query vector IS doc qid's embedding, so that doc scores
    // cosine 1.0 against itself — if it appears in the fused top-k its
    // vector rank must be 1 (a regression here means the doc_id==vec_id
    // linkage or the scoring went wrong)
    for ((qid, _) <- Search.QUERIES;
        row <- hybrid.find(r => r._1 == qid && r._3 == qid.toLong))
      assert(row._6 == 1, s"anchor $qid has rk_vec=${row._6}")
    // and fusion genuinely mixes systems: across the workload some fused
    // hit must come from each side (lex-only and vec-contributing rows)
    assert(hybrid.exists(_._5 > 0), "no lexical contribution anywhere")
    assert(hybrid.exists(_._6 > 0), "no vector contribution anywhere")
  }
}
