package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Approximate-nearest-neighbor search over the embedding column
  * (builder mandate): brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane LSH bucketed variant as the 100 TB path.
  *
  * Brute force broadcasts the (small) query set against the full candidate
  * table — a map-side nested loop, no shuffle, linear in candidates. The
  * LSH variant buckets both sides on an 8-bit hyperplane sign code (256
  * buckets) with radius-2 multi-probe, turning the pair space into an equi
  * join; recall is measured against the exact baseline in SimilaritySpec.
  */
object Similarity {
  import Tables._

  val K = 5
  val N_QUERIES = 20
  val N_PLANES = 8
  val PROBE_RADIUS = 2

  /** Deterministic random hyperplanes (seed 42), dim 64. */
  lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(N_PLANES)(Seq.fill(64)(rnd.nextGaussian()))
  }

  /** Sign code of a vector against the fixed hyperplanes. */
  def lshCode(v: Column): Column =
    (0 until N_PLANES)
      .map(p => when(VectorOps.dot(v, typedlit(planes(p))) > 0, lit(1L << p)).otherwise(lit(0L)): Column)
      .reduce(_ + _)

  /** Multi-probe masks: all codes within `radius` bit flips. Similar
    * vectors differ in few sign bits, so probing nearby buckets recovers
    * most true neighbors while touching only a fraction of the space
    * (radius 2 = 37/256 of it, radius 3 = 93/256). */
  def probeMasksUpTo(radius: Int): Seq[Long] =
    (0L until (1L << N_PLANES)).filter(m => java.lang.Long.bitCount(m) <= radius)

  lazy val probeMasks: Seq[Long] = probeMasksUpTo(PROBE_RADIUS)

  private def prepared(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))

  /** Exact top-k: per query, rank all candidates by rounded cosine with
    * neighbor-id tiebreak (deterministic across engines). */
  def bruteForceTopK(e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("ib"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("ib"),
        round(VectorOps.cosinePre(VectorOps.dot(col("v"), col("qv")), col("nrm"), col("qn")), 6)
          .as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q39_knn_brute",
      (s, d) =>
        bruteForceTopK(prepared(s, d), N_QUERIES, K)
          .select(col("qid"), col("rk"), col("ib"), col("cos"))
          .orderBy(col("qid"), col("rk")),
      Some(s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
                   FROM embeddings),
        pairs AS (
          SELECT q.vec_id AS qid, c.vec_id AS ib,
                 round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos
          FROM e q JOIN e c ON q.vec_id < $N_QUERIES AND c.vec_id <> q.vec_id),
        ranked AS (
          SELECT qid, ib, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, ib) AS rk
          FROM pairs)
        SELECT qid, rk, ib, cos FROM ranked WHERE rk <= $K
        ORDER BY qid, rk"""),
      "exact cosine top-k: broadcast query set, map-side scoring, per-query rank"),

    QueryDef(
      "q40_knn_lsh",
      (s, d) => {
        // ANN: candidates = vectors in any probed bucket. At 100 TB the
        // bucket equi join is the only pairwise work — per query it touches
        // ~|probes|/2^planes of the corpus instead of all of it.
        val e = prepared(s, d).withColumn("code", lshCode(col("v"))).cache()
        val q = e.filter(col("vec_id") < N_QUERIES)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
            explode(array(probeMasks.map(m =>
              col("code").bitwiseXOR(lit(m))): _*)).as("code"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("ib"))
        e.join(broadcast(q), Seq("code"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("ib"),
            round(VectorOps.cosinePre(VectorOps.dot(col("v"), col("qv")),
              col("nrm"), col("qn")), 6).as("cos"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= K)
          .select(col("qid"), col("rk"), col("ib"), col("cos"))
          .orderBy(col("qid"), col("rk"))
      },
      None, // approximate by construction; recall vs q39 asserted in SimilaritySpec
      s"LSH-bucketed ANN: $N_PLANES random hyperplanes -> equi join on sign code")
  )
}
