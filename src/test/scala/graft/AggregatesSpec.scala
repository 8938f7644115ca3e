package graft

import org.apache.spark.sql.functions._

import graft.operators.Aggregates

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL approx_count_distinct stays within 5% of exact at sf0.001") {
    val rows = Tables.lineitem(spark, SF)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (_, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("percentile_approx tracks the exact percentile within its accuracy bound") {
    val li = Tables.lineitem(spark, SF)
    val (approx, exact) = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)),
      percentile(col("l_extendedprice"), lit(0.5)))
      .as[(Double, Double)].head()
    // the sketch path for 100 TB: bounded memory, mergeable, small error
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx exact $exact")
  }

  test("q84 emits the EXACT rank-ceil(q*n) value the sketch bracket promises") {
    // the registered query's contract is now deterministic (q93-style
    // sketch-prunes-exact-rescan): every cell must EQUAL the value at rank
    // ceil(q*n) of the group's sorted multiset — a null cell means the GK
    // bracket failed to contain the target rank
    val out = SparkEntry.queries("q84_approx_percentiles")(spark, SF)
      .select(col("l_returnflag"), col("n"), col("p50"), col("p95"), col("p99"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])].collect()
    assert(out.nonEmpty)
    val byFlag = Tables.lineitem(spark, SF)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (f, xs) => f -> xs.map(_._2).sorted }
    out.foreach { case (f, n, p50, p95, p99) =>
      val sorted = byFlag(f)
      assert(n == sorted.length, s"$f n")
      Seq((0.50, p50), (0.95, p95), (0.99, p99)).foreach { case (q, cell) =>
        val expected = sorted(math.ceil(q * n).toLong.toInt - 1)
        assert(cell.contains(math.rint(expected * 100) / 100),
          s"$f q=$q: got $cell, exact rank-${math.ceil(q * n).toLong} value $expected")
      }
    }
  }

  test("q49 min_by/max_by tiebreaks match the oracle's ASC/ASC and DESC/DESC rankings") {
    // constructed ties: custkey 1 has two orders at the same minimum AND the
    // same maximum price — min_by must pick the SMALLEST orderkey among tied
    // minimums (the oracle's ORDER BY price ASC, key ASC), max_by the
    // LARGEST among tied maximums (DESC, DESC)
    val df = Seq(
      (1L, 10L, 5.0), (1L, 20L, 5.0),   // tied minimum
      (1L, 30L, 9.0), (1L, 40L, 9.0),   // tied maximum
      (2L, 50L, 3.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val agg = df.groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("best"),
        min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("worst"))
      .orderBy("o_custkey")
      .as[(Long, Long, Long)].collect().toSeq
    assert(agg == Seq((1L, 40L, 10L), (2L, 50L, 50L)))
    // and the ranking formulation (the oracle's shape, run in Spark) agrees
    import org.apache.spark.sql.expressions.Window
    val rb = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val rw = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val ranked = df
      .withColumn("rb", row_number().over(rb)).withColumn("rw", row_number().over(rw))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("rb") === 1, col("o_orderkey"))).as("best"),
        max(when(col("rw") === 1, col("o_orderkey"))).as("worst"))
      .orderBy("o_custkey")
      .as[(Long, Long, Long)].collect().toSeq
    assert(ranked == agg)
  }

  test("q48 histogram percentiles are bit-identical to percentile() on lineitem") {
    // the scale-safe histogram+interpolation rewrite must reproduce the
    // buffer-all percentile() arithmetic exactly (it replicates the
    // (hi-pos)*lo + (pos-lo)*hi two-sided form with both shortcuts)
    val q48 = operators.Advanced.defs.find(_.name == "q48_percentiles").get
    val hist = q48.fn(spark, SF).as[(String, Double, Double, Double, Double)].collect().toSeq
    val ref = Tables.lineitem(spark, SF)
      .groupBy(col("l_returnflag"))
      .agg(
        (percentile(Money.cents(col("l_extendedprice")), lit(0.5)) / 100.0).as("p50"),
        (percentile(Money.cents(col("l_extendedprice")), lit(0.9)) / 100.0).as("p90"),
        (percentile(Money.cents(col("l_extendedprice")), lit(0.99)) / 100.0).as("p99"),
        (max(Money.cents(col("l_extendedprice"))) / 100.0).as("pmax"))
      .orderBy(col("l_returnflag"))
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    assert(hist == ref)
  }

  test("Misra-Gries heavy hitters keep every item above N/(k+1) at any partitioning") {
    import graft.operators.Aggregates.HeavyHitters
    // planted zipf-ish skew: item "hot0" 40%, "hot1" 20%, "hot2" 10%,
    // tail of 200 distinct items sharing the remaining 30%
    val rnd = new scala.util.Random(13)
    val items = Seq.fill(8000) {
      val r = rnd.nextDouble()
      if (r < 0.4) "hot0" else if (r < 0.6) "hot1"
      else if (r < 0.7) "hot2" else s"tail${rnd.nextInt(200)}"
    }
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    val k = 20
    for (parts <- Seq(1, 7)) { // merge order must not break the guarantee
      val sketch = spark.createDataset(items).repartition(parts)
        .select(udaf(new HeavyHitters(k)).apply(col("value")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e._1").as("item"), col("e._2").as("est"))
        .as[(String, Long)].collect().toMap
      assert(sketch.size <= k)
      val threshold = n / (k + 1)
      exact.filter(_._2 > threshold).keys.foreach { hot =>
        assert(sketch.contains(hot), s"true heavy hitter $hot lost at parts=$parts")
        // estimates under-count by at most N/(k+1) and never over-count
        assert(sketch(hot) <= exact(hot) &&
          sketch(hot) >= exact(hot) - threshold,
          s"$hot est=${sketch(hot)} true=${exact(hot)} at parts=$parts")
      }
    }
  }

  test("TopK aggregator matches rank-over-window on random data") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(500)((rnd.nextInt(20).toLong, rnd.nextInt(10000) / 100.0, rnd.nextLong().abs))
      .toDF("k", "v", "id")
    val topk = udaf(new Aggregates.TopK(3))
    val got = df.groupBy("k").agg(topk(col("v"), col("id")).as("t"))
      .as[(Long, Seq[Double])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .orderBy("k", "rk").as[(Long, Double, Long, Int)].collect()
      .groupBy(_._1).map { case (k, xs) => k -> xs.sortBy(_._4).map(_._2).toSeq }
    assert(got == want)
  }

  test("TopK partial buffers stay bounded at k") {
    val agg = new Aggregates.TopK(2)
    val big = (1 to 100).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i.toDouble, i.toLong)))
    assert(big.size == 2 && agg.finish(big) == Seq(100.0, 99.0))
    val merged = agg.merge(big, agg.reduce(agg.zero, (1000.0, 1L)))
    assert(agg.finish(merged) == Seq(1000.0, 100.0))
  }

  test("MinKByCoin equals a full sort under any partition split") {
    // the q102 contract: the k-bounded partial-agg selection must be the
    // SAME set a global sort-take-k yields, for any way the rows are
    // sliced into partitions and any merge order
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((f"${rnd.nextInt(1 << 24)}%06x", rnd.nextLong().abs))
    val agg = new Aggregates.MinKByCoin(7)
    val want = rows.sorted.take(7).map(_._2)
    (1 to 20).foreach { trial =>
      val shuffled = new scala.util.Random(trial).shuffle(rows)
      val nParts = 1 + trial % 6
      val partials = shuffled.grouped(math.max(1, shuffled.size / nParts)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      partials.foreach(p => assert(p.size <= 7, "partial buffer exceeded k"))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == want, s"trial $trial diverged")
    }
  }

  test("MinKByCoin via udaf matches rank-over-window per group") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(400)((rnd.nextInt(6).toLong, f"${rnd.nextInt(1 << 20)}%05x", rnd.nextLong().abs))
      .toDF("g", "coin", "id").repartition(7)
    val mink = udaf(new Aggregates.MinKByCoin(4))
    val got = df.groupBy("g").agg(mink(col("coin"), col("id")).as("kept"))
      .as[(Long, Seq[Long])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("coin"), col("id"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 4)
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.sortBy(_._4).map(_._3).toSeq }
    assert(got == want)
  }

  test("MinKByCoinN honors a per-group k under any partition split") {
    // the q129 contract: k arrives on every row (same within a group) and
    // the k-capped fold must equal a global sort-take-k for any slicing
    val rnd = new scala.util.Random(17)
    for (k <- Seq(1, 3, 9)) {
      val rows = Seq.fill(250)(
        (f"${rnd.nextInt(1 << 24)}%06x", rnd.nextLong().abs, k))
      val agg = new Aggregates.MinKByCoinN
      val want = rows.map(r => (r._1, r._2)).sorted.take(k).map(_._2)
      (1 to 10).foreach { trial =>
        val shuffled = new scala.util.Random(trial).shuffle(rows)
        val partials = shuffled.grouped(math.max(1, shuffled.size / (1 + trial % 5)))
          .toSeq.map(_.foldLeft(agg.zero)(agg.reduce))
        partials.foreach(p => assert(p._1.size <= k, "partial buffer exceeded k"))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged) == want, s"k=$k trial $trial diverged")
      }
    }
  }

  test("MinKByCoinN via udaf: groups of different sizes take different quotas") {
    // two strata sharing one aggregation: g=0 with quota 2, g=1 with 5
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(120)((0L, f"${rnd.nextInt(1 << 20)}%05x", rnd.nextLong().abs, 2)) ++
      Seq.fill(80)((1L, f"${rnd.nextInt(1 << 20)}%05x", rnd.nextLong().abs, 5))
    val df = rows.toDF("g", "coin", "id", "k").repartition(7)
    val minkn = udaf(new Aggregates.MinKByCoinN)
    val got = df.groupBy("g")
      .agg(minkn(col("coin"), col("id"), col("k")).as("kept"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(x => (x._2, x._3)).sorted.take(xs.head._4).map(_._2)
    }
    assert(got == want)
    assert(got(0L).size == 2 && got(1L).size == 5)
  }

  test("q134 join estimate is exact when the sketches hold both key sets") {
    val dir = java.nio.file.Files.createTempDirectory("joinest").toString
    // A: keys 1..100 x3; B: keys 51..150 x2 -> overlap 50, true join
    // 50*3*2 = 300. Both domains are < k=256, so the KMV sketches are
    // the EXACT key sets, inclusion-exclusion is exact, and the uniform
    // multiplicity assumption holds by construction -> estimate == truth
    val a = (1 to 100).flatMap(k => Seq.fill(3)(k.toLong))
    val b = (51 to 150).flatMap(k => Seq.fill(2)(k.toLong))
    a.map(k => (k, k)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    b.zipWithIndex.map { case (k, i) =>
      (i.toLong, new java.sql.Timestamp(i * 1000L), k, "view", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q134_join_cardinality")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((300L, 200L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((100L, 100L, 50L)))
    assert(r.getLong(5) == 300L, s"estimate ${r.getLong(5)} != 300")
    assert(r.getLong(6) == 300L)
  }

  test("KMV estimate lands within the k-bound error on a 20k-item universe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val K = 256
    val n = 20000
    val mink = udaf(new graft.operators.Aggregates.MinKByCoin(K))
    // each item duplicated 3x: the registered pipeline pre-distincts, and
    // this pins that the estimate is duplication-invariant through it
    val items = (1 to n).flatMap(i => Seq.fill(3)(s"item_$i")).toDF("word")
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.distinct()
        .select(substring(md5(col("word")), 1, 12).as("hx"))
        .select(col("hx"), conv(col("hx"), 16, 10).cast("long").as("h"))
        .agg(mink(col("hx"), col("h")).as("ks"))
        .select(expr(s"(${K - 1} * 281474976710656) div element_at(ks, $K)"))
        .as[Long].head()
    val e = est(items)
    // KMV standard error ~ 1/sqrt(k-2) ~ 6.3%; 20% is a 3-sigma bound
    assert(math.abs(e - n) < 0.2 * n, s"estimate $e vs true $n")
    assert(est(items.distinct()) == e)
  }

  // ---- q154 count-min ----

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "xx", "s") }
      .toDF("doc_id", "text", "lang", "source")

  test("count-min is one-sided: estimates never undercount, and a squeezed width must overcount") {
    // 50 distinct words into width-8 rows: every word shares its bucket
    // with others in ALL 4 rows (50 > 8), and all colliders have
    // positive counts, so every estimate is a strict overcount.
    val words = (0 until 50).map(i => f"w$i%02d")
    val docs = docsOf(Seq(words.mkString(" ")))
    val rows = Aggregates.cmFreqReport(docs, width = 8, topN = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 50)
    rows.foreach { case (w, exact, est, over) =>
      assert(exact === 1L, w)
      assert(est > exact && over === est - exact, s"$w: est $est exact $exact")
    }
    // and at the real width the corpus report still never undercounts
    val real = Aggregates.cmFreqReport(Tables.documents(spark, SF)).collect()
    assert(real.length > 0)
    real.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"undercount: $r")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
  }

  test("count-min sketches merge by cellwise addition (half + half == whole)") {
    val docs = Tables.documents(spark, SF)
    val whole = Aggregates.cmCounters(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def half(p: Int) = Aggregates.cmCounters(docs.filter(col("doc_id") % 2 === p))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (a, b) = (half(0), half(1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole,
      s"cells differing: ${(merged.toSet diff whole.toSet).take(5)}")
  }
}
