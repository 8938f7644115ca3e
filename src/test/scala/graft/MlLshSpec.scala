package graft

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.linalg.{SparseVector, Vectors}
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, VectorOps}

/** Cross-checks graft's hand-built LSH operators against spark.ml's
  * implementations (SURVEY §4.2 lists MLlib MinHashLSH as the library
  * alternative) — both should surface the same planted near-duplicates. */
class MlLshSpec extends SparkSpec {
  import spark.implicits._

  test("spark.ml MinHashLSH finds the high-jaccard document pairs") {
    val docs = Tables.documents(spark, SF)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("words"))
    // vocabulary index -> sparse binary vectors
    val vocab = docs.select(explode(col("words")).as("w")).distinct()
      .collect().map(_.getString(0)).sorted.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(vocab)
    val vecs = docs.map { r =>
      val idx = r.getSeq[String](1).distinct.map(bc.value).sorted.toArray
      (r.getLong(0), Vectors.sparse(bc.value.size, idx, Array.fill(idx.length)(1.0)))
    }.toDF("doc_id", "features")
    val model = new MinHashLSH().setNumHashTables(8).setSeed(42)
      .setInputCol("features").setOutputCol("hashes").fit(vecs)
    val mlPairs = model.approxSimilarityJoin(vecs, vecs, 0.2, "dist") // jaccard >= 0.8
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(col("datasetA.doc_id").as("ia"), col("datasetB.doc_id").as("ib"))
      .as[(Long, Long)].collect().toSet
    // graft's exact-jaccard oracle query at the same threshold, same scope
    // as ml (global, not lang/source-bucketed): recompute globally
    val toks = docs.select(col("doc_id"), explode(array_distinct(col("words"))).as("w"))
    val sizes = toks.groupBy("doc_id").count()
    val exact = toks.alias("a").join(toks.alias("b"), Seq("w"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("ia"), col("count").as("sa")), "ia")
      .join(sizes.select(col("doc_id").as("ib"), col("count").as("sb")), "ib")
      .filter(col("i") * 1.0 / (col("sa") + col("sb") - col("i")) >= 0.8)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    val recall = if (exact.isEmpty) 1.0 else exact.count(mlPairs).toDouble / exact.size
    assert(recall >= 0.8, s"ml recall $recall over ${exact.size} true pairs")
  }

  test("spark.ml random-projection LSH agrees with brute-force neighbors") {
    val e = Tables.embeddings(spark, SF)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val vecs = e.map(r => (r.getLong(0), Vectors.dense(r.getSeq[Double](1).toArray)))
      .toDF("vec_id", "features")
    val model = new BucketedRandomProjectionLSH().setBucketLength(2.0)
      .setNumHashTables(4).setSeed(42)
      .setInputCol("features").setOutputCol("hashes").fit(vecs)
    val q = vecs.filter(col("vec_id") === 0L).head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    val ann = model.approxNearestNeighbors(vecs.filter(col("vec_id") =!= 0L), q, 5)
      .select("vec_id").as[Long].collect().toSet
    // brute-force euclidean top-5 (same metric as BRP-LSH)
    val brute = e.filter(col("vec_id") =!= 0L).map { r =>
      val v = r.getSeq[Double](1)
      val d = math.sqrt(v.zip(q.toArray).map { case (a, b) => (a - b) * (a - b) }.sum)
      (r.getLong(0), d)
    }.collect().sortBy(_._2).take(5).map(_._1).toSet
    assert(ann.intersect(brute).size >= 2, s"ann=$ann brute=$brute")
  }
}
