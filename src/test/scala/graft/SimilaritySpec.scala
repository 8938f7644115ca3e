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

  test("LSH ANN reaches strong recall vs brute force") {
    // corpus-derived planes (N=500 -> 6), radius-2 multiprobe, L=4
    // independent tables (the COVERAGE.md operating point): measured
    // 0.93 here, 0.99 at sf0.01, 0.91 at sf0.1 — >= 0.9 at every tested
    // scale. The floor pins that contract; everything is deterministic
    // (seeded planes, fixed corpus), so 0.93 is exact, not noisy.
    val mean = meanRecall("q40_knn_lsh")
    assert(mean >= 0.9, s"mean recall@${Similarity.K} = $mean < 0.9")
  }

  test("LSH hard negatives recall the exact q145 set and never share the anchor's label") {
    val ex = topk("q145_hard_negatives")
    val approx = SparkEntry.queries("q156_hard_negatives_lsh")(spark, SF)
      .select(col("qid"), col("ib"), col("label")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byQ = approx.groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSeq }
    val recall = ex.map { case (q, e) =>
      byQ.get(q).map(ap => e.count(ap.toSet).toDouble / e.size).getOrElse(0.0)
    }.sum / ex.size
    // deterministic (seeded planes, fixed corpus): measured 0.95 at
    // sf0.001; the floor pins the operating point
    assert(recall >= 0.85, s"mean hard-negative recall@${Similarity.K} = $recall")
    // the label contract must hold on the approximate path too
    val qLabels = Similarity.prepared(spark, SF).sparkSession.read
      .parquet(s"$SF/embeddings.parquet")
      .select(col("vec_id"), col("label"))
      .filter(col("vec_id") < Similarity.N_QUERIES)
      .as[(Long, Int)].collect().toMap
    approx.foreach { case (q, _, lb) =>
      assert(lb != qLabels(q), s"same-label negative for anchor $q")
    }
  }

  test("multi-table LSH recall dominates single-table at equal planes") {
    val e = Similarity.prepared(spark, SF).cache()
    val p = Similarity.planesForCorpus(e.count())
    def recallAt(tables: Int): Double = {
      val approx = Similarity
        .lshTopK(e, p, Similarity.radiusFor(p), Similarity.N_QUERIES,
          Similarity.K, tables)
        .select(col("qid"), col("ib"))
        .as[(Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2) }
      exact.map { case (q, ex) =>
        approx.get(q).map(ap => ex.count(ap.toSet).toDouble / ex.size).getOrElse(0.0)
      }.sum / exact.size
    }
    // candidates are a superset per added table, so recall is monotone
    assert(recallAt(3) > recallAt(1),
      "3-table recall did not beat single-table")
  }

  test("probe mask rings are combinatorial in the plane count") {
    assert(Similarity.probeMasks(8, 2).size == 37) // 1 + 8 + C(8,2)
    assert(Similarity.probeMasks(4, 2).size == 11) // 1 + 4 + C(4,2)
    assert(Similarity.probeMasks(24, 3).size == 2325) // the stated explode budget
    // a ring never exceeds its own code space
    assert(Similarity.probeMasks(4, 9).size == 16)
  }

  test("code space tracks the corpus; hyperplanes are prefix-stable") {
    assert(Similarity.planesForCorpus(500) == 6) // ceil(log2(500/8))
    assert(Similarity.planesForCorpus(1) == Similarity.MIN_PLANES)
    assert(Similarity.planesForCorpus(1L << 50) == Similarity.MAX_PLANES)
    // doubling the corpus adds one plane: occupancy stays ~TARGET_BUCKET
    assert(Similarity.planesForCorpus(1L << 20) + 1 == Similarity.planesForCorpus(1L << 21))
    // growing the code space only appends sign bits — codes at p planes
    // are a bit-prefix of codes at p' > p planes
    assert(Similarity.hyperplanes(16).take(8) == Similarity.hyperplanes(8))
  }

  private lazy val vecs = spark.read.parquet(s"$SF/embeddings.parquet")
    .select(col("vec_id"),
      graft.functions.VectorOps.asDouble(col("embedding")).as("v"))

  test("bucket occupancy shrinks as the plane count grows") {
    def maxBucket(p: Int): Long =
      vecs.withColumn("code", Similarity.lshCode(col("v"), p))
        .groupBy("code").count().agg(max("count")).first().getLong(0)
    val occ = Seq(4, 8, 12).map(maxBucket)
    assert(occ(0) > occ(1) && occ(1) > occ(2),
      s"occupancy did not shrink with planes: $occ")
  }

  test("radius scaling mitigates recall decay at wide codes") {
    // the decay regime radiusFor exists for: a code 2^16 wide over only
    // 500 vectors (planesForCorpus would pick 6 — p=16 is what a ~500k
    // corpus earns). Buckets are near-singleton, so recall comes entirely
    // from the probe ring; this pins that the widened radius-3 ring
    // (radiusFor(16) = 3) recovers strictly more than the narrow radius-2
    // ring would, i.e. the radius must keep tracking the plane count.
    val e = Similarity.prepared(spark, SF).cache()
    val p = 16
    def recallAt(radius: Int): Double = {
      val approx = Similarity
        .lshTopK(e, p, radius, Similarity.N_QUERIES, Similarity.K)
        .select(col("qid"), col("ib"))
        .as[(Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2) }
      val recalls = exact.map { case (q, ex) =>
        approx.get(q).map(ap => ex.count(ap.toSet).toDouble / ex.size).getOrElse(0.0)
      }
      recalls.sum / recalls.size
    }
    assert(Similarity.radiusFor(p) == 3)
    val narrow = recallAt(2)
    val scaled = recallAt(3)
    assert(scaled > narrow,
      s"radius-3 recall $scaled did not beat radius-2 recall $narrow at $p planes")
    assert(scaled >= 0.05, s"recall collapsed entirely at $p planes: $scaled")
  }

  test("IVF ANN reaches strong recall vs brute force on clustered data") {
    // the embeddings table is 10-way clustered, so a sqrt(N)=23-cell
    // codebook probing its nprobe=5 best lists captures most true
    // neighbors. Training is fully deterministic (id-ordered init,
    // order-independent rounded means), so the measured 0.91 here
    // (0.96/0.96 at sf0.01/0.1, RecallReport) cannot flake — the floor
    // pins the operating point, leaving headroom only for deliberate
    // knob changes
    val mean = meanRecall("q67_knn_ivf")
    assert(mean >= 0.85, s"mean recall@${Similarity.K} = $mean < 0.85")
  }

  test("ring-bounded radius: full radius at tested scales, shrinks at extreme p") {
    // tested scale factors sit at p=6..9 where the cap must be inactive
    for (p <- 6 to 9)
      assert(Similarity.ringBoundedRadius(p) == 3, s"cap fired at p=$p")
    // C(12,<=3)=299 > 192 -> radius 2; C(25,<=2)=326 > 192 -> radius 1
    assert(Similarity.ringBoundedRadius(12) == 2)
    assert(Similarity.ringBoundedRadius(25) == 1)
  }

  test("derived IVF knobs: sqrt(N) cells, log2(C) probes") {
    assert(Similarity.centroidsForCorpus(500) == 23)
    assert(Similarity.centroidsForCorpus(1) == 4)
    assert(Similarity.centroidsForCorpus(Long.MaxValue) == 65536)
    assert(Similarity.nprobeFor(4) == 4) // floor binds, clamped to C
    assert(Similarity.nprobeFor(23) == 5) // ceil(log2 23)
    assert(Similarity.nprobeFor(65536) == 16) // log2, not C/4=16384
  }

  test("JL projection (q82) preserves relative distances and top-k candidates") {
    import spark.implicits._
    val e = Similarity.prepared(spark, "/root/testdata/sf0.001").cache()
    val proj = Similarity.projected(e)
      .collect().map(r => r.getLong(0) ->
        (1 until 1 + Similarity.PROJ_DIM).map(r.getDouble).toArray).toMap
    val full = e.select(col("vec_id"), col("v"))
      .as[(Long, Seq[Double])].collect().map { case (i, v) => i -> v.toArray }.toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // JL estimator: projected squared distances concentrate around the
    // originals — the MEAN ratio must sit near 1 (per-pair distortion at
    // k=16 is ~sqrt(ln n / k), so individual pairs swing; the mean pins
    // the 1/sqrt(k) scaling is right, not accidentally k-dependent)
    val ids = full.keys.toSeq.sorted.take(60)
    val ratios = for {
      i <- ids; j <- ids if i < j
      df2 = d2(full(i), full(j)) if df2 > 0
    } yield d2(proj(i), proj(j)) / df2
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean distance ratio $mean far from 1")
    // pipeline property: the near-dup PAIRS (cosine >= 0.4 in full space —
    // the pairs with real structure, vs the near-uniform background) must
    // stay separable after projection: a coarse filter at the background
    // median keeps them. JL guarantees (1 +/- eps) DISTANCES, not rank
    // order among near-equal background distances — so the prefilter
    // contract, not generic top-k overlap, is the one worth pinning.
    val dups = e.alias("a").join(e.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .filter(functions.VectorOps.cosinePre(
        functions.VectorOps.dot(col("a.v"), col("b.v")),
        col("a.nrm"), col("b.nrm")) >= 0.4)
      .select(col("a.vec_id"), col("b.vec_id"))
      .as[(Long, Long)].collect()
    assert(dups.nonEmpty)
    val bgPairs = for (i <- ids; j <- ids if i < j) yield d2(proj(i), proj(j))
    val median = bgPairs.sorted.apply(bgPairs.size / 2)
    val kept = dups.count { case (i, j) => d2(proj(i), proj(j)) < median }
    val recall = kept.toDouble / dups.length
    assert(recall >= 0.95,
      s"projected-space prefilter at the background median keeps only $recall of near-dups")
  }

  test("IVF-PQ (q86) reaches usable recall and its codes actually compress") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    def topk(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("qid"), col("ib")).as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topk("q39_knn_brute")
    val pq = topk("q86_knn_ivfpq")
    val recall = exact.map { case (q, ex) =>
      pq.get(q).map(s => ex.count(s).toDouble / ex.size).getOrElse(0.0)
    }.sum / exact.size
    // 0.91 measured at K=32/adcK=20K (0.86 at K=16; adcK=10K read 0.86 at
    // sf0.1 where 20K reads 0.94); the floor pins the operating point
    // against silent cheapening
    assert(recall >= 0.9, s"q86 recall $recall < 0.9")
    // the compression claim: every code must fit 5 bits (K=32 cells)
    val e = Similarity.prepared(spark, sf)
    val subDim = Similarity.DIM / Similarity.PQ_M
    val books = (0 until Similarity.PQ_M).map { m =>
      Similarity.trainSubCentroidsL2(
        e.select(col("vec_id"), slice(col("v"), m * subDim + 1, subDim).as("v")),
        Similarity.PQ_K, Similarity.LLOYD_ROUNDS)
    }
    val codes = e.select(Similarity.pqCodes(col("v"), books).as("c"))
      .select(explode(col("c")).as("code")).as[Int].collect()
    assert(codes.nonEmpty)
    assert(codes.forall(c => c >= 0 && c < Similarity.PQ_K))
    assert(codes.distinct.size > Similarity.PQ_K / 2,
      "sub-codebooks must actually spread the corpus across cells")
    // the fused family trainer (one job per round for all M books — the
    // path q86 runs) must produce the same codebooks as training each
    // subspace independently: same sample, same init rows, same rounding
    val fused = Similarity.trainSubCentroidsL2All(
      e, Similarity.PQ_K, Similarity.LLOYD_ROUNDS)
    assert(fused == books, "fused PQ training diverged from per-book training")
  }

  test("IVF-PQ at the production operating point (K=256, 8-bit codes) holds recall") {
    import spark.implicits._
    // the standard IVF-PQ production point is one BYTE per sub-code
    // (K=256) — q86 ships K=32 as the small-SF default; this pins the
    // K=256 path at the largest local scale factor so scaling the books
    // up is a measured config change, not a leap (COVERAGE.md row).
    val sf = "/root/testdata/sf0.1"
    def topkOf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("ib")).as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topkOf(SparkEntry.queries("q39_knn_brute")(spark, sf))
    val e = Similarity.prepared(spark, sf).cache()
    val n = e.count()
    val c = Similarity.centroidsForCorpus(n)
    val cents = Similarity.trainCentroids(e, c, Similarity.LLOYD_ROUNDS)
    val books256 = Similarity.trainSubCentroidsL2All(
      e, 256, Similarity.LLOYD_ROUNDS, knownTotal = n)
    assert(books256.forall(_.size == 256))
    val pq = topkOf(Similarity.ivfPqTopK(e, cents, books256,
      Similarity.nprobeFor(c), Similarity.N_QUERIES, Similarity.K,
      adcK = 20 * Similarity.K))
    val recall = exact.map { case (q, ex) =>
      pq.get(q).map(s => ex.count(s).toDouble / ex.size).getOrElse(0.0)
    }.sum / exact.size
    // finer sub-quantizers can only sharpen the ADC preselect, so K=256
    // must hold at least the K=32 floor (measured: see COVERAGE.md)
    info(f"q86@K=256 recall@${Similarity.K} = $recall%.3f (sf0.1)")
    assert(recall >= 0.9, s"q86@K=256 recall $recall < 0.9")
    e.unpersist()
  }

  test("IVF codebook is deterministic and its lists cover the corpus") {
    val e = vecs
    val nCents = Similarity.centroidsForCorpus(e.count())
    val c1 = Similarity.trainCentroids(e, nCents, Similarity.LLOYD_ROUNDS)
    val c2 = Similarity.trainCentroids(e, nCents, Similarity.LLOYD_ROUNDS)
    assert(c1 == c2, "training is not deterministic")
    assert(c1.size == nCents)
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

  test("q145 hard negatives: K different-label neighbors, true max-similarity top-1") {
    val rows = SparkEntry.queries("q145_hard_negatives")(spark, SF)
      .select(col("qid"), col("rk"), col("ib"), col("label"), col("cos"))
      .as[(Long, Int, Long, Int, Double)].collect()
    val e = Tables.embeddings(spark, SF)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .as[(Long, Seq[Double], Int)].collect()
    val byId = e.map(r => r._1 -> r).toMap
    def cosv(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.lazyZip(b).map(_ * _).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == Similarity.N_QUERIES)
    byQ.foreach { case (q, rs) =>
      val (_, qv, qlabel) = byId(q)
      assert(rs.length == Similarity.K)
      assert(!rs.exists(_._3 == q), s"anchor $q returned itself")
      assert(rs.forall(_._4 != qlabel), s"same-label neighbor for anchor $q")
      assert(rs.forall(r => byId(r._3)._3 == r._4),
        "emitted label must be the neighbor's own")
      val coss = rs.sortBy(_._2).map(_._5)
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
      // the engine's top hard negative achieves the true different-label
      // maximum (driver recompute; 1e-6 covers the engine's 6 dp rounding)
      val best = e.filter(c => c._3 != qlabel && c._1 != q)
        .map(c => cosv(qv, c._2)).max
      assert(coss.head >= best - 1e-6,
        s"anchor $q: top-1 ${coss.head} below brute-force $best")
    }
  }
}
