package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** ANN quality checks: the LSH path is approximate by construction, so its
  * contract is recall against the exact brute-force baseline. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def topk(name: String): Map[Long, Seq[Long]] =
    SparkEntry.queries(name)(spark, SF)
      .select(col("qid"), col("ib"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2) }

  test("brute-force top-k is well formed: K neighbors per query, no self") {
    val rows = SparkEntry.queries("q39_knn_brute")(spark, SF)
      .select(col("qid"), col("rk"), col("ib"), col("cos")).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == Similarity.N_QUERIES)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == Similarity.K)
      assert(!rs.exists(_.getLong(2) == q), s"self match for query $q")
      val coss = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b }, "cos not descending")
    }
  }

  test("LSH ANN reaches useful recall vs brute force") {
    val exact = topk("q39_knn_brute")
    val approx = topk("q40_knn_lsh")
    val recalls = exact.map { case (q, ex) =>
      approx.get(q).map(ap => ex.count(ap.toSet).toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // random-hyperplane LSH with radius-2 multiprobe on random gaussian
    // data: modest recall is expected; this guards against total breakage.
    assert(mean >= 0.2, s"mean recall@${Similarity.K} = $mean < 0.2")
  }

  test("probe mask set has the right size") {
    // 1 + C(8,1) + C(8,2) = 37
    assert(Similarity.probeMasks.size == 37)
  }
}
