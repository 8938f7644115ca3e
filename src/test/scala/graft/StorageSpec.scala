package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Source/sink format coverage, salted skew join, and bucketed co-located
  * joins (SURVEY §2.2 storage + partitioning rows). */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, SF)
    .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")

  test("orc/csv/json round-trip preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    val want = li.count()
    li.write.mode(SaveMode.Overwrite).orc(s"$dir/orc")
    li.write.mode(SaveMode.Overwrite).option("header", true).csv(s"$dir/csv")
    li.write.mode(SaveMode.Overwrite).json(s"$dir/json")
    assert(spark.read.orc(s"$dir/orc").count() == want)
    val csv = spark.read.option("header", true).option("inferSchema", true).csv(s"$dir/csv")
    assert(csv.count() == want)
    assert(spark.read.json(s"$dir/json").count() == want)
    // orc round-trip is type-exact
    assert(spark.read.orc(s"$dir/orc").schema == li.schema)
  }

  test("orc scans get filter pushdown too") {
    val dir = java.nio.file.Files.createTempDirectory("orcpd").toString
    li.write.mode(SaveMode.Overwrite).orc(dir)
    val p = spark.read.orc(dir).filter(col("l_orderkey") === 42)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]"), p)
  }

  test("salted join equals the plain join on skewed data") {
    val rnd = new scala.util.Random(11)
    // 90% of rows share one key — the classic hot-key shape
    val skewed = Seq.fill(2000)(
      (if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(100).toLong, rnd.nextInt(1000)))
      .toDF("k", "payload")
    val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(plain.exceptAll(salted).count() == 0 && salted.exceptAll(plain).count() == 0)
    // and the SHIPPED salt expression really spreads the hot key — even
    // when all hot-key rows are identical (content hashing would collapse)
    val dupHot = Seq.fill(64)((7L, 1)).toDF("k", "payload")
    val spread = dupHot.withColumn("_salt", SkewJoin.saltColumn(8))
      .select("_salt").distinct().count()
    assert(spread >= 6, s"hot key only hit $spread of 8 salt buckets")
  }

  test("partitionBy layout gives partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("ppart").toString
    Tables.lineitem(spark, SF)
      .write.mode(SaveMode.Overwrite).partitionBy("l_returnflag").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val p = pruned.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // not in PushedFilters (row-group filtering)
    assert(p.contains("PartitionFilters: [isnotnull(l_returnflag"), p)
    assert(pruned.count() ==
      Tables.lineitem(spark, SF).filter(col("l_returnflag") === "R").count())
  }

  test("seeded sampling is reproducible and near the target fraction") {
    val li = Tables.lineitem(spark, SF)
    val a = li.sample(withReplacement = false, 0.2, seed = 42).count()
    val b = li.sample(withReplacement = false, 0.2, seed = 42).count()
    assert(a == b) // same seed + same partitioning => identical sample
    val frac = a.toDouble / li.count()
    assert(frac > 0.15 && frac < 0.25, s"sample fraction $frac")
  }

  test("N-way z-value interleaves round-robin and reduces to the 2-way form") {
    import graft.sources.Layout
    val row = Seq((5L, 3L, 1L)).toDF("a", "b", "c")
    // a=101b, b=011b, c=001b at 3 bits, n=3: bit i of col ci -> 3i+ci
    // a: bits 0,2 -> pos 0,6; b: bits 0,1 -> pos 1,4; c: bit 0 -> pos 2
    val got = row.select(
      Layout.zvalueN(Seq(col("a"), col("b"), col("c")), bits = 3).as("z"),
      Layout.zvalue(col("a"), col("b"), bits = 3).as("z2"),
      Layout.zvalueN(Seq(col("a"), col("b")), bits = 3).as("z2n"))
      .as[(Long, Long, Long)].head()
    assert(got._1 == ((1L << 0) | (1L << 6) | (1L << 1) | (1L << 4) | (1L << 2)),
      s"3-way interleave wrong: ${got._1.toBinaryString}")
    assert(got._2 == got._3, "2-way zvalue must be the n=2 special case")
    intercept[IllegalArgumentException] {
      Layout.zvalueN(Seq.fill(4)(col("a")), bits = 16) // 64 bits > long
    }
  }

  test("z-ordered layout serves BOTH dimensions; a linear sort serves one") {
    import graft.sources.Layout
    val li = Tables.lineitem(spark, SF)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val total = li.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // small files => fine-grained min/max stats, so pruning is visible
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "100")
    try {
      li.repartitionByRange(8, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite").parquet(s"$dir/linear")
      Layout.writeZOrdered(li, "l_partkey", "l_suppkey", s"$dir/zorder")
      def scanRows(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
        val df = spark.read.parquet(path).filter(pred)
        // execute THIS plan instance: metrics live on the executed tree,
        // so a separate count() would read an unpopulated scan
        val result = df.collect().length.toLong
        val scan = df.queryExecution.executedPlan.collectLeaves().head
        (scan.metrics("numOutputRows").value, result)
      }
      // dimension 1 (the linear layout's own sort key): both layouts prune
      val p1 = col("l_partkey").between(100, 115)
      val (_, linR1) = scanRows(s"$dir/linear", p1)
      val (z1, zR1) = scanRows(s"$dir/zorder", p1)
      assert(linR1 == zR1 && zR1 > 0)
      assert(z1 < total / 2, s"z-order must still prune partkey: scanned $z1 of $total")
      // dimension 2: the linear layout has NO information — every file
      // spans the full suppkey range, so it scans everything; the
      // interleaved sort keeps suppkey min/max tight per file and skips
      // most of the table. This asymmetry is the whole point of Z-order.
      val p2 = col("l_suppkey").between(2, 3)
      val (lin2, linR2) = scanRows(s"$dir/linear", p2)
      val (z2, zR2) = scanRows(s"$dir/zorder", p2)
      assert(linR2 == zR2 && zR2 > 0)
      // ratios, not exact counts: min/max stats may prune a stray file or
      // two of the linear layout by luck, but never a material fraction
      assert(lin2 * 100 >= total * 95,
        s"linear layout should barely prune suppkey (scanned $lin2 of $total)")
      assert(z2 * 2 <= total,
        s"z-order must prune >=50% on the second dimension (scanned $z2 of $total)")
      assert(z2 * 2 <= lin2,
        s"z-order scanned $z2 rows vs linear $lin2 on the second dimension — no win")
    } finally {
      spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bucketed tables join without an exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, SF).write.mode(SaveMode.Overwrite)
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, SF).write.mode(SaveMode.Overwrite)
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("x", col("l_quantity") * 2) // defeat trivial pruning
    // disable auto-broadcast so the test exercises the co-located path
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(joined.count() == Tables.lineitem(spark, SF).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("stored minhash band index bucketed on the probe keys joins without shuffling the corpus side") {
    // proves the stored-index family's 100 TB claim THROUGH the probe
    // function itself: an index bucketed on the FULL probe key set
    // (scope ++ band ++ bh — a subset-key bucketing does not satisfy the
    // join's required distribution) scans with its partitioning intact, so the corpus side joins
    // with NO Exchange even on the over-broadcast-cap SHUFFLE_HASH path
    // — this is exactly why the r16 probes union candidate PAIRS instead
    // of unioning the batch into the build side (a union voids the
    // bucketed partitioning and re-shuffles the corpus every probe).
    import graft.functions.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val scope = Seq("lang", "source")
    val sigs = Dedup.minhashSignaturesRowwise(
      Tables.documents(spark, SF), scope).cache()
    val bands = Dedup.minhashBandIndex(sigs, scope)
    spark.sql("DROP TABLE IF EXISTS b_mhbands")
    bands.write.mode(SaveMode.Overwrite)
      .bucketBy(4, "lang", "source", "band", "bh").saveAsTable("b_mhbands")
    val incoming = sigs.filter(col("doc_id") % 10 === 0)
    def run(idx: org.apache.spark.sql.DataFrame) =
      Dedup.probeMinhashBands(idx, sigs, incoming, scope, 0.75)
    // reference values on the default (broadcast) path, unbucketed input
    val plain = run(bands).collect().map(_.toSeq).toSet
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.graft.verifyBroadcastVectors", "1") // force SHUFFLE_HASH
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain tree for collect()
    try {
      val df = run(spark.table("b_mhbands"))
      val plan = df.queryExecution.executedPlan
      val bandScans = plan.collect {
        case s: FileSourceScanExec
          if s.tableIdentifier.exists(_.table == "b_mhbands") => s
      }
      assert(bandScans.nonEmpty && bandScans.forall(_.bucketedScan),
        s"expected a bucketed scan of b_mhbands:\n$plan")
      // the precise claim: the corpus side ENTERS its join exchange-free
      // (later pair-domain exchanges — dedup, verify — are output-bounded
      // and expected); only the batch-sized probe side shuffles
      val exchangeFreeBuild = plan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.exists { j =>
        j.right.collect {
          case s: FileSourceScanExec
            if s.tableIdentifier.exists(_.table == "b_mhbands") => s
        }.nonEmpty &&
        j.right.collect { case e: ShuffleExchangeExec => e }.isEmpty
      }
      assert(exchangeFreeBuild,
        s"the bucketed index must enter its join with NO Exchange:\n$plan")
      // and the plan flip + bucketing changed no values
      assert(df.collect().map(_.toSeq).toSet == plain)
    } finally {
      spark.conf.unset("spark.graft.verifyBroadcastVectors")
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      sigs.unpersist(false)
    }
  }

  test("stored image band index bucketed on (band, bv) joins without shuffling the corpus side") {
    // the image member of the stored-index family gets the same pin the
    // minhash member has (r16 ADVICE): a (band, bv)-bucketed dHash index
    // — the FULL probe join key set — enters its join exchange-free
    // THROUGH probeImageBandIndex even on the over-cap SHUFFLE_HASH
    // path, and the plan flip changes no values.
    import graft.functions.Multimodal
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val hashes = Multimodal.imageDhashes(
      Multimodal.syntheticImageCorpus(spark)).cache()
    val bands = Multimodal.imageBandIndex(hashes)
    spark.sql("DROP TABLE IF EXISTS b_imgbands")
    bands.write.mode(SaveMode.Overwrite)
      .bucketBy(4, "band", "bv").saveAsTable("b_imgbands")
    val incoming = hashes.filter(col("asset_id") % 8 === 3)
    def run(idx: org.apache.spark.sql.DataFrame) =
      Multimodal.probeImageBandIndex(idx, incoming, 2)
    val plain = run(bands).collect().map(_.toSeq).toSet
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.graft.verifyBroadcastVectors", "1") // force SHUFFLE_HASH
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain tree for collect()
    try {
      val df = run(spark.table("b_imgbands"))
      val plan = df.queryExecution.executedPlan
      val bandScans = plan.collect {
        case s: FileSourceScanExec
          if s.tableIdentifier.exists(_.table == "b_imgbands") => s
      }
      assert(bandScans.nonEmpty && bandScans.forall(_.bucketedScan),
        s"expected a bucketed scan of b_imgbands:\n$plan")
      val exchangeFreeBuild = plan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.exists { j =>
        j.right.collect {
          case s: FileSourceScanExec
            if s.tableIdentifier.exists(_.table == "b_imgbands") => s
        }.nonEmpty &&
        j.right.collect { case e: ShuffleExchangeExec => e }.isEmpty
      }
      assert(exchangeFreeBuild,
        s"the bucketed image index must enter its join with NO Exchange:\n$plan")
      assert(df.collect().map(_.toSeq).toSet == plain)
      assert(plain.nonEmpty) // the probe actually pairs something
    } finally {
      spark.conf.unset("spark.graft.verifyBroadcastVectors")
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      hashes.unpersist(false)
    }
  }

  test("IVF index bucketed by cid probes without shuffling the index side") {
    // proves q67's scale claim: the inverted lists ARE a partitioning key.
    // Write the index bucketed by cid once; every probe query then equi
    // joins on cid with NO Exchange under the index scan — only the (tiny)
    // probe side shuffles to meet the bucket layout.
    import graft.functions.Similarity
    val e = Similarity.prepared(spark, SF)
    val cents = Similarity.trainCentroids(e, 8, 1)
    spark.sql("DROP TABLE IF EXISTS ivf_index")
    e.withColumn("cid", Similarity.nearestCid(col("v"), cents))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(4, "cid").saveAsTable("ivf_index")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(Similarity.topProbeCids(col("v"), cents, 2)).as("cid"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("ivf_index").join(probes, Seq("cid"))
        .select(col("qid"), col("vec_id"),
          graft.functions.VectorOps.dot(col("v"), col("qv")).as("s"))
      val p = joined.queryExecution.executedPlan.toString
      // exactly one Exchange: the probe side; the bucketed index scan has none
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges == 1, s"expected only the probe-side shuffle, got $exchanges:\n$p")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
