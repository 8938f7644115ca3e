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
  val N_CENTROIDS = 16
  val N_PROBE = 4
  val LLOYD_ROUNDS = 2

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

  /** Per-centroid (similarity, cid) structs for a vector column. Centroids
    * are pre-normalized, so argmax dot == argmax cosine (|v| is constant
    * across candidates for one row). */
  private def centScores(v: Column, cents: Seq[Seq[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, cid) =>
      struct(VectorOps.dot(v, typedlit(c)).as("s"), lit(cid).as("cid"))
    }: _*)

  /** Nearest-centroid id (struct max compares s first; cid breaks ties
    * deterministically). */
  def nearestCid(v: Column, cents: Seq[Seq[Double]]): Column =
    array_max(centScores(v, cents)).getField("cid")

  /** The `nprobe` closest centroid ids, best first. */
  def topProbeCids(v: Column, cents: Seq[Seq[Double]], nprobe: Int): Column =
    transform(
      slice(sort_array(centScores(v, cents), asc = false), 1, nprobe),
      x => x.getField("cid"))

  /** IVF coarse quantizer (the inverted-file layer of Jégou, Douze &
    * Schmid, "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011 — coarse cells + probed lists, without the PQ residual
    * codes): Lloyd's k-means over (vec_id, v) with
    * deterministic init (the first `c` rows of the passed frame by id —
    * NOT an absolute id range, so a sampled frame still seeds a full
    * codebook). Each round is ONE distributed job — nearest-centroid
    * assignment fused with a (cid, pos) partial-aggregated sum — and
    * collects only c×dim (sum, count) cells to the driver, so driver
    * state is bounded by the codebook size, never the corpus. At 100 TB
    * you train on a sample: pass e.g.
    * `e.filter(pmod(xxhash64($"vec_id"), lit(S)) === 0)` — the
    * index/query path below accepts any codebook. Centroid means are
    * rounded to 1e-6 before normalizing: partial double sums merge in
    * shuffle-arrival order, and the rounding squashes the order-dependent
    * low bits so the codebook is stable across cluster layouts too. */
  def trainCentroids(e: DataFrame, c: Int, rounds: Int): Seq[Seq[Double]] = {
    def normalize(x: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(x.map(y => y * y).sum)
      if (n == 0) x else x.map(_ / n)
    }
    var cents: Seq[Seq[Double]] = e
      .orderBy(col("vec_id")).limit(c).select(col("v"))
      .collect().map(r => normalize(r.getSeq[Double](0))).toSeq
    require(cents.nonEmpty, "trainCentroids: empty training frame")
    for (_ <- 1 to rounds) {
      val cells = e
        .select(nearestCid(col("v"), cents).as("cid"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCid = cells.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, cid) =>
        byCid.get(cid) match {
          case Some(rows) =>
            normalize(rows.sortBy(_.getInt(1))
              .map(r => math.rint(r.getDouble(2) / r.getLong(3) * 1e6) / 1e6)
              .toSeq)
          case None => old // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  private def prepared(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))

  /** Shared scoring tail of q39/q40/q67: a joined frame carrying
    * candidate (vec_id, v, nrm) × query (qid, qv, qn) becomes the
    * per-query top-k by rounded cosine with neighbor-id tiebreak
    * (deterministic across engines). One definition so the ranking
    * contract cannot drift between the exact and ANN paths. */
  private def scoreTopK(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("ib"))
    joined
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("ib"),
        round(VectorOps.cosinePre(VectorOps.dot(col("v"), col("qv")), col("nrm"), col("qn")), 6)
          .as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("ib"), col("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Exact top-k: broadcast query set, map-side scoring over every
    * candidate. */
  def bruteForceTopK(e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    scoreTopK(e.crossJoin(broadcast(q)), k)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q39_knn_brute",
      (s, d) => bruteForceTopK(prepared(s, d), N_QUERIES, K),
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
        scoreTopK(e.join(broadcast(q), Seq("code")), K)
      },
      None, // approximate by construction; recall vs q39 asserted in SimilaritySpec
      s"LSH-bucketed ANN: $N_PLANES random hyperplanes -> equi join on sign code"),

    QueryDef(
      "q67_knn_ivf",
      (s, d) => {
        // IVF ANN: a k-means codebook partitions the corpus into inverted
        // lists; each query probes only its nprobe closest lists. Candidate
        // generation is an equi join on cid — per query it scores
        // ~nprobe/C of the corpus, and the inverted lists are exactly a
        // partitioning key at 100 TB (write the index bucketed by cid and
        // the probe join co-locates without a shuffle).
        val e = prepared(s, d).cache()
        val cents = trainCentroids(e, N_CENTROIDS, LLOYD_ROUNDS)
        val indexed = e.withColumn("cid", nearestCid(col("v"), cents))
        val q = indexed.filter(col("vec_id") < N_QUERIES)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
            explode(topProbeCids(col("v"), cents, N_PROBE)).as("cid"))
        scoreTopK(indexed.join(broadcast(q), Seq("cid")), K)
      },
      None, // approximate by construction; recall vs q39 asserted in SimilaritySpec
      s"IVF ANN: $N_CENTROIDS-centroid Lloyd codebook, nprobe=$N_PROBE inverted-list equi join")
  )
}
