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

  // computed once: the brute-force cross product is the suite's most
  // expensive query and every recall test needs the same baseline
  private lazy val exact: Map[Long, Seq[Long]] = topk("q39_knn_brute")

  private def meanRecall(name: String): Double = {
    val approx = topk(name)
    val recalls = exact.map { case (q, ex) =>
      approx.get(q).map(ap => ex.count(ap.toSet).toDouble / ex.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  test("LSH ANN reaches useful recall vs brute force") {
    // random-hyperplane LSH with radius-2 multiprobe on random gaussian
    // data: modest recall is expected; this guards against total breakage.
    val mean = meanRecall("q40_knn_lsh")
    assert(mean >= 0.2, s"mean recall@${Similarity.K} = $mean < 0.2")
  }

  test("probe mask set has the right size") {
    // 1 + C(8,1) + C(8,2) = 37
    assert(Similarity.probeMasks.size == 37)
  }

  test("IVF ANN reaches strong recall vs brute force on clustered data") {
    // the embeddings table is 10-way clustered, so a 16-cell codebook with
    // nprobe=4 should capture most true neighbors (measured ~0.9+); 0.6
    // guards the contract without flaking on retrains
    val mean = meanRecall("q67_knn_ivf")
    assert(mean >= 0.6, s"mean recall@${Similarity.K} = $mean < 0.6")
  }

  test("IVF codebook is deterministic and its lists cover the corpus") {
    val e = spark.read.parquet(s"$SF/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VectorOps.asDouble(col("embedding")).as("v"))
    val c1 = Similarity.trainCentroids(e, Similarity.N_CENTROIDS, Similarity.LLOYD_ROUNDS)
    val c2 = Similarity.trainCentroids(e, Similarity.N_CENTROIDS, Similarity.LLOYD_ROUNDS)
    assert(c1 == c2, "training is not deterministic")
    assert(c1.size == Similarity.N_CENTROIDS)
    // unit-normalized codebook
    c1.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    // every vector lands in exactly one list, and no list is the whole corpus
    val assigned = e.withColumn("cid", Similarity.nearestCid(col("v"), c1))
    val n = assigned.count()
    val sizes = assigned.groupBy("cid").count()
      .collect().map(_.getLong(1))
    assert(sizes.sum == n)
    assert(sizes.max < n, "degenerate codebook: one list holds everything")
  }
}
