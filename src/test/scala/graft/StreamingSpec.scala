package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

/** Streaming operators driven through MemoryStream -> memory sink, and
  * checked for batch/stream parity where the shape exists in both. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(min: Int): Timestamp = new Timestamp(3600_000L * 24 + min * 60_000L)

  private val sample = Seq(
    Event(1, ts(0), 1, "purchase", 10.0, "{}"),
    Event(2, ts(5), 1, "purchase", 12.0, "{}"),
    Event(3, ts(10), 1, "purchase", 100.0, "{}"), // >3x mean(10,12) => alert
    Event(4, ts(61), 2, "click", 1.0, "{}"),
    Event(5, ts(62), 2, "purchase", 5.0, "{}"),
    Event(5, ts(62), 2, "purchase", 5.0, "{}"),   // exact duplicate
    Event(6, ts(200), 2, "click", 2.0, "{}"))

  private def runStream[T](df: org.apache.spark.sql.Dataset[T], name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("tumbling counts match the batch plan") {
    val in = MemoryStream[Event]
    in.addData(sample: _*)
    val out = runStream(StreamingOps.tumblingCounts(in.toDF(), "1 hour"), "tumb", "complete")
      .select("bucket", "event_type", "n").as[(Timestamp, String, Long)].collect().toSet
    val batch = StreamingOps.tumblingCounts(sample.toDF(), "1 hour")
      .select("bucket", "event_type", "n").as[(Timestamp, String, Long)].collect().toSet
    assert(out == batch)
    assert(out.exists { case (_, t, n) => t == "purchase" && n == 3 }) // hour 1, user 1
  }

  test("sessionize closes sessions on gap") {
    val in = MemoryStream[Event]
    in.addData(sample: _*)
    val out = runStream(StreamingOps.sessionize(in.toDF(), "30 minutes"), "sess", "complete")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    // user1: one session (0,5,10); user2: (61,62,62) and (200)
    assert(out == Set((1L, 3L), (2L, 3L), (2L, 1L)))
  }

  test("streaming dedup drops the exact duplicate") {
    val in = MemoryStream[Event]
    in.addData(sample: _*)
    val out = runStream(StreamingOps.dedupEvents(in.toDF()), "dedup")
    assert(out.count() == sample.size - 1)
  }

  test("flatMapGroupsWithState emits anomaly alerts with running state") {
    val in = MemoryStream[Event]
    in.addData(sample: _*)
    val out = runStream(StreamingOps.purchaseAnomalies(in.toDS()), "alerts")
      .as[StreamingOps.Alert].collect()
    assert(out.toSeq.map(_.event_id) == Seq(3L))
    assert(math.abs(out.head.mean_before - 11.0) < 1e-9)
  }

  test("stream-stream interval join matches the batch range join") {
    val data = Seq(
      Event(1, ts(0), 1, "purchase", 10.0, "{}"),
      Event(2, ts(5), 1, "error", 0.0, "{}"),    // within 10 min of 1
      Event(3, ts(20), 1, "error", 0.0, "{}"),   // outside
      Event(4, ts(6), 2, "error", 0.0, "{}"),    // other user
      Event(5, ts(30), 2, "purchase", 5.0, "{}"),
      Event(6, ts(31), 2, "error", 0.0, "{}"),   // within
      Event(7, ts(300), 9, "view", 0.0, "{}"))   // watermark pusher
    val in = MemoryStream[Event]
    in.addData(data: _*)
    val out = runStream(StreamingOps.purchaseErrorJoin(in.toDF()), "ssjoin")
      .select("purchase_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 5L))
    val batch = StreamingOps.purchaseErrorJoin(data.toDF())
      .select("purchase_id").as[Long].collect().sorted
    assert(batch.toSeq == out.toSeq)
  }

  test("stream-static join enriches per micro-batch without state") {
    val in = MemoryStream[Event]
    in.addData(sample: _*)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = runStream(StreamingOps.enrichWithStatic(in.toDF(), dim), "enrich")
    assert(out.count() == sample.size)
    assert(out.filter($"user_id" === 1L).select("tier").distinct().head().getString(0) == "gold")
  }

  test("checkpointed file sink survives a query restart without duplicates") {
    val base = java.nio.file.Files.createTempDirectory("ckpt")
    val (src, ckpt, sink) = (s"$base/src", s"$base/ckpt", s"$base/sink")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def copyChunk(name: String): Unit =
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(src, name))
    def runOnce(): Unit = {
      val q = StreamingOps.readEventStream(spark, src)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    copyChunk("a.parquet"); runOnce()
    copyChunk("b.parquet"); runOnce() // restart: only the new file processes
    assert(spark.read.parquet(sink).count() == 2000L) // 1000 per chunk, no dupes
  }

  test("late data beyond the watermark is dropped in append mode") {
    val in = MemoryStream[Event]
    val agg = StreamingOps.tumblingCounts(in.toDF(), "1 hour")
    val q = agg.writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      // batch 1: hour-1 events + an hour-4 event that pushes the watermark
      // to 3:50, far past hour 1
      in.addData(
        Event(1, ts(10), 1, "click", 1.0, "{}"),
        Event(2, ts(20), 1, "click", 1.0, "{}"),
        Event(3, ts(240), 1, "click", 1.0, "{}"))
      q.processAllAvailable()
      // batch 2: a straggler for hour 1 — behind the watermark, must be dropped
      in.addData(Event(4, ts(30), 1, "click", 99.0, "{}"))
      q.processAllAvailable()
      // batch 3: advance the watermark past hour 4 to flush remaining state
      in.addData(Event(5, ts(600), 1, "view", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val hour1 = spark.table("late")
      .filter($"bucket" === new Timestamp(3600_000L * 24) && $"event_type" === "click")
      .select("n").as[Long].collect()
    assert(hour1.toSeq == Seq(2L), s"late event leaked in: ${hour1.toSeq}") // not 3
  }

  test("watermark late-data drops equal the batch-simulated set across replay schedules") {
    // the r15 directive-4 pin: watermark/late-data semantics get a
    // batch-computed oracle. A DataFrame simulator reproduces Spark's
    // contract — the watermark a batch observes is max(ts) over EARLIER
    // batches minus the delay; a row whose window end lags that watermark
    // is dropped; a window is emitted once the final watermark passes its
    // end — and two different replay schedules of the same fixture must
    // both match it (the planted stragglers are late by hours, so no
    // schedule boundary can save them).
    import org.apache.spark.sql.expressions.Window
    val E = Seq(
      Event(1, ts(10), 1, "click", 1.0, "{}"),
      Event(2, ts(20), 1, "click", 2.0, "{}"),
      Event(3, ts(25), 1, "view", 3.0, "{}"),
      Event(4, ts(240), 2, "click", 4.0, "{}"), // advances wm to 3:50
      Event(5, ts(35), 1, "click", 99.0, "{}"), // hour-0 straggler => drop
      Event(6, ts(40), 1, "view", 99.0, "{}"), // hour-0 straggler => drop
      Event(7, ts(250), 2, "view", 5.0, "{}"),
      Event(8, ts(600), 3, "click", 6.0, "{}")) // flush; own window unemitted
    val byId = E.map(e => e.event_id -> e).toMap
    val schedA = Seq(Seq(1L, 2L, 3L), Seq(4L), Seq(5L, 6L, 7L), Seq(8L))
      .map(_.map(byId))
    val schedB = Seq(Seq(1L, 2L, 3L, 4L), Seq(5L, 6L, 7L, 8L)).map(_.map(byId))

    def simulate(sched: Seq[Seq[Event]])
        : (Set[(Timestamp, String, Long, Double)], Set[Long]) = {
      val rows = sched.zipWithIndex.flatMap { case (b, i) =>
        b.map(e => (e.event_id, e.ts, e.event_type, e.value, i))
      }
      val df = rows.toDF("event_id", "ts", "event_type", "value", "batch")
        .withColumn("wend", timestamp_seconds(
          (floor(unix_timestamp($"ts") / 3600) + 1) * 3600))
      val wmB = df.groupBy($"batch").agg(max($"ts").as("bmax"))
        .withColumn("wm", max($"bmax").over(
          Window.orderBy($"batch").rowsBetween(Window.unboundedPreceding, -1))
          - expr("INTERVAL 10 minutes"))
        .select($"batch", $"wm")
      val joined = df.join(wmB, "batch")
      val drops = joined.filter($"wm".isNotNull && $"wend" <= $"wm")
        .select($"event_id").as[Long].collect().toSet
      val finalWm = new Timestamp(sched.flatten.map(_.ts.getTime).max - 600000L)
      val expected = joined.filter($"wm".isNull || $"wend" > $"wm")
        .withColumn("bucket", timestamp_seconds(
          floor(unix_timestamp($"ts") / 3600) * 3600))
        .groupBy($"bucket", $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
        .filter($"bucket" + expr("INTERVAL 1 hour") <= lit(finalWm))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      (expected, drops)
    }

    def runSched(sched: Seq[Seq[Event]], name: String)
        : Set[(Timestamp, String, Long, Double)] = {
      val in = MemoryStream[Event]
      val q = StreamingOps.tumblingCounts(in.toDF(), "1 hour")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try sched.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name)
        .as[(Timestamp, String, Long, Double)].collect().toSet
    }

    val (expA, dropsA) = simulate(schedA)
    val (expB, dropsB) = simulate(schedB)
    // the batch oracle predicts exactly the planted stragglers, under
    // BOTH schedules — the fixture is schedule-insensitive by design
    assert(dropsA == Set(5L, 6L) && dropsB == Set(5L, 6L), (dropsA, dropsB))
    assert(expA == expB, s"schedules must agree:\n$expA\n$expB")
    assert(expA.nonEmpty && expA.toSeq.map(_._3).sum == 5L, expA) // 5 surviving events emitted
    val gotA = runSched(schedA, "wm_replay_a")
    val gotB = runSched(schedB, "wm_replay_b")
    assert(gotA == expA, s"schedule A diverged from the batch oracle:\n$gotA\n$expA")
    assert(gotB == expA, s"schedule B diverged from the batch oracle:\n$gotB\n$expA")
  }

  test("streaming GEDCOM ingestion processes arriving files exactly once") {
    val base = java.nio.file.Files.createTempDirectory("gedstream")
    val (watch, out) = (s"$base/in", s"$base/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(watch))
    def drop(name: String, people: Range): Unit = {
      val body = "0 HEAD\n1 SOUR stream\n" + people.map { i =>
        s"0 @I$i@ INDI\n1 NAME P$i /Fam/\n1 FAMS @F0@\n"
      }.mkString + "0 TRLR\n"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(watch, name), body)
    }
    drop("a.ged", 0 until 5)
    val q = graft.streaming.GedcomStreamIngest.start(spark, watch, out)
    try {
      q.processAllAvailable()
      drop("b.ged", 5 until 12)
      q.processAllAvailable()
    } finally q.stop()
    val nodes = spark.read.parquet(s"$out/nodes")
    // 12 INDI + 2 HEAD nodes across the two files; every edge from FAMS
    assert(nodes.filter($"rawTag" === "INDI").count() == 12)
    assert(nodes.filter($"rawTag" === "HEAD").count() == 2)
    assert(spark.read.parquet(s"$out/edges").count() == 12)
    // restart the stream: nothing reprocesses
    val q2 = graft.streaming.GedcomStreamIngest.start(spark, watch, out)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$out/nodes").count() == 14)
  }

  test("streaming URL-canonical dedup matches batch q158 on a replayed corpus") {
    import graft.streaming.StreamingOps.DocIn
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    // complete mode: the final table is the full collapse, independent of
    // replay order or batch boundaries (min/count are order-free)
    val q = StreamingOps.urlDedupStream(in.toDS())
      .writeStream.format("memory").queryName("urldedup")
      .outputMode("complete").start()
    try {
      // split mid-canonical-group on purpose: survivors must still be the
      // global min, carried by the aggregation state across batches
      val (b1, b2) = docs.splitAt(docs.length / 2 + 1)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("urldedup")
      .select(col("canon_url"), col("survivor"), col("n_docs"))
      .as[(String, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q158_url_dedup")(spark, SF)
      .select(col("canon_url"), col("survivor"), col("n_docs"))
      .as[(String, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${stream -- batch}; batch-only: ${batch -- stream}")
  }

  test("streaming MinHash near-dup matches batch q36 on a replayed corpus") {
    import graft.streaming.StreamingOps.{DocIn, DupPair}
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.minhashNearDups(in.toDS())
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      // three micro-batches split mid-corpus: pairs whose members arrive in
      // DIFFERENT batches only exist if the bucket state carries across
      val (b1, rest) = docs.splitAt(150)
      val (b2, b3) = rest.splitAt(200)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    // set semantics collapse the per-band duplicate emissions (identical
    // rows by construction: same signatures => same est)
    val stream = spark.table("neardup").as[DupPair].collect()
      .map(p => (p.ia, p.ib, p.est_jaccard)).toSet
    val batch = SparkEntry.queries("q36_minhash_lsh")(spark, SF)
      .select(col("ia").cast("long"), col("ib").cast("long"), col("est_jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "replayed corpus has no near-dups to find")
    assert(stream == batch,
      s"stream-only: ${stream -- batch}; batch-only: ${batch -- stream}")
  }

  test("streaming incremental near-dup probe matches batch q96's mixed pairs") {
    import graft.streaming.StreamingOps.DocIn
    import graft.functions.{Dedup, TextAnalysis}
    // sf0.01, split mod 3: this corpus's planted dup partners always
    // share their mod-10 residue (q96's own split yields only
    // incoming-incoming pairs), so the streaming probe — which by design
    // covers only incoming-vs-CORPUS pairs — needs a split that
    // separates partners; mod 3 mixes 198 of the 401 pairs
    val sf = "/root/testdata/sf0.01"
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    // static index over the "existing corpus", exactly the stored shape a
    // production pipeline maintains
    val corpusToks = docsDf.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("word"))
    val index = Dedup.prefixIndex(corpusToks, 0.8).cache()
    // the "incoming batch" replayed as a stream in two batches
    val docs = docsDf.filter(col("doc_id") % 3 === 0)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.incrementalNearDupProbe(in.toDS(), index)
      .writeStream.format("memory").queryName("incdup").outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("incdup")
      .select(col("ia").cast("long"), col("ib").cast("long"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    // the full exact pair relation's mixed pairs (one incoming, one
    // existing member) are exactly what the corpus-probe half must emit
    val allToks = docsDf.select(col("doc_id"), col("lang"), col("source"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("word"))
    val batch = Dedup.jaccardPairsPrefix(allToks, 0.8)
      .select(col("ia").cast("long"), col("ib").cast("long"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 3 == 0) != (b % 3 == 0) }.toSet
    assert(batch.nonEmpty, "replayed corpus has no mixed near-dup pairs")
    assert(stream == batch,
      s"stream-only: ${stream -- batch}; batch-only: ${batch -- stream}")
  }

  test("streaming split-leakage guard matches batch q138 on incoming-involving pairs") {
    import graft.streaming.StreamingOps.DocIn
    import graft.functions.{Dedup, TextAnalysis}
    // same replay harness as the probe-parity test (mod-3 split mixes
    // partners); the guard must emit exactly the batch audit's crossing
    // pairs that involve an incoming doc, with identical split tags
    val sf = "/root/testdata/sf0.01"
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val corpusToks = docsDf.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("word"))
    val index = Dedup.prefixIndex(corpusToks, 0.8).cache()
    val docs = docsDf.filter(col("doc_id") % 3 === 0)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.splitLeakageGuard(in.toDS(), index)
      .writeStream.format("memory").queryName("leakguard")
      .outputMode("append").start()
    try {
      in.addData(docs: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("leakguard")
      .select(col("ia").cast("long"), col("ib").cast("long"),
        col("split_a"), col("split_b"))
      .as[(Long, Long, String, String)].collect()
      .map { case (a, b, sa, sb) =>
        if (a <= b) (a, b, sa, sb) else (b, a, sb, sa) }.toSet
    val batch = SparkEntry.queries("q138_split_leakage")(spark, sf)
      .select(col("ia").cast("long"), col("ib").cast("long"),
        col("split_a"), col("split_b"))
      .as[(Long, Long, String, String)].collect()
      .filter { case (a, b, _, _) => (a % 3 == 0) != (b % 3 == 0) }.toSet
    assert(batch.nonEmpty, "replayed corpus has no crossing mixed pairs")
    assert(stream == batch,
      s"stream-only: ${stream -- batch}; batch-only: ${batch -- stream}")
  }

  test("streaming embedding probe matches the batch index probe") {
    import graft.streaming.StreamingOps.VecIn
    import graft.functions.{Dedup, Similarity}
    // mod-3 split for the same reason as the q96 streaming test: planted
    // partners tend to share their mod-10 residue, and the probe-only
    // stream covers exactly the incoming-vs-CORPUS pairs
    val e = Similarity.prepared(spark, SF).cache()
    val corpus = e.filter(col("vec_id") % 3 =!= 0)
    val p = Similarity.planesForCorpus(corpus.count(), 32)
    // static code index over the "existing corpus" — the stored shape a
    // production pipeline maintains
    val index = Dedup.lshCodeIndex(corpus, p).cache()
    val incoming = e.filter(col("vec_id") % 3 === 0)
    // since r16 the batch probe also surfaces incoming-incoming pairs
    // (its build side unions the batch's own codes); the streaming twin
    // deliberately does NOT — incoming-incoming pairs are the next index
    // refresh's business (the split that keeps the corpus-probe half
    // stateless) — so parity is pinned on the incoming-vs-CORPUS
    // restriction, the relation both sides claim
    val expected = Dedup.probeLshIndex(index, incoming, p)
      .filter(!(col("ia") % 3 === 0 && col("ib") % 3 === 0))
      .as[(Long, Long, Double)].collect().toSet
    val vecs = incoming.select(col("vec_id"), col("v")).collect()
      .map(r => VecIn(r.getLong(0), r.getSeq[Double](1),
        new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.vec_id)
    val in = MemoryStream[VecIn]
    val q = StreamingOps.incrementalEmbedProbe(in.toDS(), index, p)
      .writeStream.format("memory").queryName("incembed").outputMode("append").start()
    try {
      val (b1, b2) = vecs.splitAt(vecs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("incembed")
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "replayed corpus has no mixed near-dup pairs")
    assert(stream == expected,
      s"stream-only: ${stream -- expected}; batch-only: ${expected -- stream}")
  }

  test("streaming contamination probe matches batch q73 hit counts") {
    import graft.streaming.StreamingOps.DocIn
    import graft.functions.TextAnalysis
    val docsDf = spark.read.parquet(s"$SF/documents.parquet")
    // the static bench side, built exactly like batch q73 (src0 slice)
    val bench = docsDf
      .select(col("lang"), col("source"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3 && col("source") === "src0")
      .select(col("lang"), explode(TextAnalysis.trigramSet(col("w"))).as("g"))
      .distinct()
    val docs = docsDf.filter(col("source") =!= "src0")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.contaminationProbe(in.toDS(), bench)
      .writeStream.format("memory").queryName("contam").outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // advance the watermark past every window so append mode flushes:
      // a sentinel doc far in the future with no grams in the bench
      in.addData(DocIn(999999L, "zz", "none", "solo tok stream",
        new Timestamp(86400_000L * 30))); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("contam")
      .select(col("doc_id"), col("n_hits")).as[(Long, Long)].collect().toMap
    val batch = SparkEntry.queries("q73_decontamination")(spark, SF)
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("n_hits")).as[(Long, Long)].collect().toMap
    assert(batch.nonEmpty, "replayed corpus has no contaminated docs")
    assert(stream == batch,
      s"stream-only: ${stream.toSet -- batch.toSet}; batch-only: ${batch.toSet -- stream.toSet}")
  }

  test("streaming temperature admission matches the batch q151 kept set") {
    import graft.streaming.StreamingOps.DocIn
    import graft.functions.Mixture
    val sf = "/root/testdata/sf0.01"
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    // thresholds trained on the stored corpus — the table a production
    // refresh would broadcast to the ingest job
    val thresholds = Mixture.temperatureMixOf(docsDf)
      .select(col("source"), col("k")).cache()
    val docs = docsDf.select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.temperatureAdmission(in.toDS(), thresholds)
      .writeStream.format("memory").queryName("tempadm").outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // an unknown source admits open (k defaults to 65536)
      in.addData(DocIn(424242L, "zz", "brand-new-source", "hello",
        new Timestamp(86400_000L * 2))); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("tempadm")
      .select(col("doc_id")).as[Long].collect().toSet
    val batch = docsDf.join(broadcast(thresholds), Seq("source"))
      .filter(Mixture.keptUnder(col("doc_id"), col("k")))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(batch.nonEmpty && batch.size < docs.length,
      "batch keep must be a strict non-empty subset for the parity to mean anything")
    assert(stream - 424242L == batch,
      s"stream-only: ${stream -- batch - 424242L}; batch-only: ${batch -- stream}")
    assert(stream.contains(424242L), "unknown source must admit open")
    thresholds.unpersist()
  }

  test("streaming frontier schedule matches batch q186 on a single-batch replay") {
    import graft.streaming.StreamingOps.{FrontierIn, FrontierOut}
    // the exact q186 input population: robots-admitted fixture entries
    // joined to the per-host config (the stream-static enrichment a
    // live frontier would do per micro-batch)
    val docsDf = spark.read.parquet(s"$SF/documents.parquet")
    val adm = graft.sources.Sitemap.sitemapAdmissionRel(
        graft.sources.Sitemap.syntheticSitemaps(docsDf),
        col("xml"), col("robots"), "graftbot", keys = Nil)
      .filter(col("allowed"))
      .join(broadcast(graft.sources.Sitemap.syntheticConfig(docsDf)),
        Seq("host"))
    val cands = adm
      .select(col("host"), col("ord"), col("loc"), col("priority"),
        col("delay_ms"))
      .as[FrontierIn].collect().sortBy(c => (c.host, c.ord))
    val in = MemoryStream[FrontierIn]
    val q = StreamingOps.frontierStream(in.toDS())
      .writeStream.format("memory").queryName("frontstream")
      .outputMode("append").start()
    try { in.addData(cands.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    val stream = spark.table("frontstream")
      .as[FrontierOut].collect().toSet
    val batch = SparkEntry.queries("q186_frontier_schedule")(spark, SF)
      .as[FrontierOut].collect().toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
    graft.Caches.release()
  }

  test("frontier state continues across batches: later arrivals append, never re-rank") {
    import graft.streaming.StreamingOps.{FrontierIn, FrontierOut}
    val in = MemoryStream[FrontierIn]
    val q = StreamingOps.frontierStream(in.toDS())
      .writeStream.format("memory").queryName("frontstream2")
      .outputMode("append").start()
    try {
      in.addData(
        FrontierIn("h", 0L, "a", None, 1000L),
        FrontierIn("h", 1L, "b", Some("0.9"), 1000L))
      q.processAllAvailable()
      // batch 2: HIGHER priority than anything in batch 1 — but slots
      // 0/1 are already handed out, so it takes seq 2
      in.addData(FrontierIn("h", 2L, "c", Some("1.0"), 1000L),
        FrontierIn("g", 0L, "z", None, 500L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("frontstream2").as[FrontierOut].collect().toSet
    assert(got == Set(
      FrontierOut("h", 0L, "b", 1000L, 0L),    // 0.9 beats null in batch 1
      FrontierOut("h", 1L, "a", 1000L, 1000L),
      FrontierOut("h", 2L, "c", 1000L, 2000L), // appended, not re-ranked
      FrontierOut("g", 0L, "z", 500L, 0L)), got)
  }

  test("streaming frontier delta matches batch q189 statuses on a primed replay") {
    import graft.streaming.StreamingOps.{DeltaIn, DeltaOut}
    val docsDf = spark.read.parquet(s"$SF/documents.parquet")
    // batch 1 PRIMES the state with the stored rows (tagged ord = -1 so
    // their own outputs filter out); batch 2 streams the admitted
    // sitemap batch — its statuses must equal q189's, minus 'gone'
    // (absence has no event; the sweep is the batch operator's job)
    val stored = graft.sources.Sitemap.syntheticStoredFrontier(docsDf)
      .select(col("host"), col("loc"), lit(-1L).as("ord"),
        col("known_lastmod").as("lastmod"))
      .as[DeltaIn].collect()
    val batchIn = graft.sources.Sitemap.sitemapAdmissionRel(
        graft.sources.Sitemap.syntheticSitemaps(docsDf),
        col("xml"), col("robots"), "graftbot", keys = Nil)
      .filter(col("allowed"))
      .select(col("host"), col("loc"), col("ord"), col("lastmod"))
      .as[DeltaIn].collect()
    val in = MemoryStream[DeltaIn]
    val q = StreamingOps.frontierDeltaStream(in.toDS())
      .writeStream.format("memory").queryName("deltastream")
      .outputMode("append").start()
    try {
      in.addData(stored.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(batchIn.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("deltastream").as[DeltaOut].collect()
      .filter(_.ord >= 0).map(o => (o.host, o.loc) -> o.status).toMap
    val batch = SparkEntry.queries("q189_frontier_delta")(spark, SF)
      .filter(col("status") =!= "gone")
      .select(col("host"), col("loc"), col("status"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2))
      .toMap
    assert(batch.nonEmpty && batch.values.toSet ==
      Set("new", "changed", "unchanged"), "all three statuses must occur")
    assert(stream == batch,
      s"stream-only: ${(stream.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- stream.toSet).take(3)}")
    graft.Caches.release()
  }

  test("streaming anomaly flags match batch q135 on the replayed corpus") {
    val evs = Tables.events(spark, SF)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // one far-future sentinel per type closes the final real bucket; its
    // own bucket stays open and never emits
    val sentinels = evs.map(_.event_type).distinct.zipWithIndex.map {
      case (et, i) => Event(900000L + i, new Timestamp(4102444800000L),
        0L, et, 0.0, "{}")
    }
    val in = MemoryStream[Event]
    val q = StreamingOps.anomalyStream(in.toDS())
      .writeStream.format("memory").queryName("anomstream")
      .outputMode("append").start()
    try {
      val (b1, b2) = evs.splitAt(evs.length / 2)
      in.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(sentinels.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("anomstream")
      .as[(String, Timestamp, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q135_anomaly_detection")(spark, SF)
      .select(col("event_type"), col("bucket"), col("x"), col("trailing_sum"))
      .as[(String, Timestamp, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "replayed corpus produced no batch anomalies")
    assert(stream == batch,
      s"stream-only: ${stream -- batch}; batch-only: ${batch -- stream}")
  }

  test("streaming classifier scores match batch q121 exactly") {
    import graft.streaming.StreamingOps.DocIn
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.classifierScores(in.toDS())
      .writeStream.format("memory").queryName("clsstream").outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("clsstream")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val batch = SparkEntry.queries("q121_quality_classifier")(spark, SF)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${stream -- batch}; batch-only: ${batch -- stream}")
  }

  test("streaming HTML extraction matches batch q168 exactly") {
    import graft.streaming.StreamingOps.DocIn
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.htmlExtractStream(in.toDS())
      .writeStream.format("memory").queryName("htmlstream").outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("htmlstream")
      .as[(Long, Long, Long, Long, Long, Long, String, String)].collect().toSet
    val batch = SparkEntry.queries("q168_html_extract")(spark, SF)
      .as[(Long, Long, Long, Long, Long, Long, String, String)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
  }

  test("streaming line-quality rules match batch q169 exactly") {
    import graft.streaming.StreamingOps.DocIn
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.lineQualityStream(in.toDS())
      .writeStream.format("memory").queryName("linestream").outputMode("append").start()
    try {
      // three uneven batches: rowwise statelessness means any replay
      // schedule must reproduce batch exactly
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("linestream")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q169_line_quality")(spark, SF)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
  }

  test("streaming Gopher document-shape rules match batch q175 exactly") {
    import graft.streaming.StreamingOps.DocIn
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.gopherRulesStream(in.toDS())
      .writeStream.format("memory").queryName("gopherstream").outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("gopherstream")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q175_gopher_rules")(spark, SF)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
  }

  test("streaming robots verdicts match batch q177 exactly") {
    import graft.streaming.StreamingOps.DocIn
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.robotsStream(in.toDS())
      .writeStream.format("memory").queryName("robotsstream").outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("robotsstream")
      .as[(Long, String, Boolean, String)].collect().toSet
    val batch = SparkEntry.queries("q177_robots_rules")(spark, SF)
      .as[(Long, String, Boolean, String)].collect().toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
  }

  test("streaming binary WARC container parse matches batch q183 exactly") {
    // whole-file binary containers arrive as rows (the binaryFile
    // tailer's unit of work); the byte-cursor walk is the stateless
    // map under test — batch and stream share warcBinaryRecordsRel
    // (and the WarcRecords expression under it) verbatim
    import graft.sources.Warc
    val containers = Warc.syntheticBinaryContainers(
        spark.read.parquet(s"$SF/documents.parquet"))
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val in = MemoryStream[(Long, Array[Byte])]
    val rel = Warc.warcBinaryRecordsRel(
        in.toDS().toDF("gid", "container"), col("container"), 6, Seq("gid"))
      .select(col("gid"), col("leftover_bytes"),
        posexplode_outer(col("records")).as(Seq("rec_idx", "r")))
      .select(col("gid"), col("rec_idx").cast("long").as("rec_idx"),
        col("r.typ"), col("r.rid"), col("r.uri"), col("r.clen"),
        length(col("r.payload")).cast("long").as("payload_octets"),
        col("r.gzipped"), col("leftover_bytes"))
    val q = rel.writeStream.format("memory").queryName("warcstream")
      .outputMode("append").start()
    try {
      val (b1, b2) = containers.splitAt(containers.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("warcstream").collect().map(_.toString).toSet
    // batch side: the SAME rel over the same fixture (q183's registered
    // output reports the HTTP-decoded entity since r20, so the raw walk
    // fields — clen, payload octets — compare here at full fidelity
    // against the identical expression the stream ran)
    val batch = Warc.warcBinaryRecordsRel(
        Warc.syntheticBinaryContainers(
          spark.read.parquet(s"$SF/documents.parquet")),
        col("container"), 6, Seq("gid"))
      .select(col("gid"), col("leftover_bytes"),
        posexplode_outer(col("records")).as(Seq("rec_idx", "r")))
      .select(col("gid"), col("rec_idx").cast("long").as("rec_idx"),
        col("r.typ"), col("r.rid"), col("r.uri"), col("r.clen"),
        length(col("r.payload")).cast("long").as("payload_octets"),
        col("r.gzipped"), col("leftover_bytes"))
      .collect().map(_.toString).toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
  }

  test("streaming JSONL container parse matches batch q179 exactly") {
    // containers arrive as rows (a file tailer's unit of work); the
    // parse is the stateless map under test — batch and stream share
    // jsonlRecordsRel verbatim
    import graft.sources.Jsonl
    val containers = Jsonl.syntheticBinaryContainers(
        spark.read.parquet(s"$SF/documents.parquet"))
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val in = MemoryStream[(Long, Array[Byte])]
    val q = Jsonl.jsonlBinaryRecordsRel(
        in.toDS().toDF("gid", "container"), col("container"), Seq("gid"))
      .writeStream.format("memory").queryName("jsonlstream").outputMode("append").start()
    try {
      val (b1, b2) = containers.splitAt(containers.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // 11 columns — past the comfortable tuple-encoder arity; the rows
    // hold only scalars, so the Row rendering is a faithful set key
    val stream = spark.table("jsonlstream").collect().map(_.toString).toSet
    val batch = SparkEntry.queries("q179_jsonl_ingest")(spark, SF)
      .collect().map(_.toString).toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
  }

  test("file-source event stream aggregates the sf0.001 table like batch") {
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    // stage the driver parquet into a stream-source dir
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val stream = StreamingOps.readEventStream(spark, dir)
    val out = runStream(StreamingOps.tumblingCounts(stream, "1 hour"), "filetumb", "complete")
    val batch = StreamingOps.tumblingCounts(
      Tables.events(spark, "/root/testdata/sf0.001"), "1 hour")
    assert(out.agg(sum("n")).head.getLong(0) == 1000L)
    assert(out.count() == batch.count())
  }

  test("streaming domain quota admits exactly the first k per domain across batches") {
    import graft.streaming.StreamingOps.{Admitted, DocIn}
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val k = 5
    val in = MemoryStream[DocIn]
    val q = StreamingOps.domainQuota(in.toDS(), k)
      .writeStream.format("memory").queryName("quota").outputMode("append").start()
    try {
      // split mid-corpus: domains that fill their quota in batch 1 must
      // admit NOTHING from batch 2 — the per-key counter carries across
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("quota").as[Admitted].collect()
      .map(a => (a.lang, a.source, a.doc_id, a.rank)).toSet
    // arrival order == doc_id order here, so the admitted set is the
    // batch keep-first-k-by-id relation
    var want = Set.empty[(String, String, Long, Int)]
    docs.groupBy(d => (d.lang, d.source)).foreach { case ((lang, src), ds) =>
      ds.sortBy(_.doc_id).take(k).zipWithIndex.foreach { case (d, i) =>
        want += ((lang, src, d.doc_id, i + 1))
      }
    }
    assert(got == want,
      s"stream-only: ${got -- want take 3}; missing: ${want -- got take 3}")
    // and no domain exceeds its cap
    got.groupBy(t => (t._1, t._2)).foreach { case (dom, rows) =>
      assert(rows.size <= k, s"$dom over quota")
    }
  }

  test("streaming SCD2 matches batch q107 on a replayed change log") {
    import graft.streaming.StreamingOps.{ChangeIn, Scd2Out}
    val log = Tables.events(spark, SF)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        Money.cents(col("value")).as("value_cents"))
    val changes = log.as[ChangeIn].collect().sortBy(c => (c.ts.getTime, c.event_id))
    assert(changes.length > 100, "fixture too small to exercise cross-batch state")
    val in = MemoryStream[ChangeIn]
    val q = StreamingOps.scd2Stream(in.toDS())
      .writeStream.format("memory").queryName("scd2s").outputMode("append").start()
    try {
      // version chains must span micro-batch boundaries for the test to
      // prove state carries: split the ts-ordered log in three
      val (b1, rest) = changes.splitAt(changes.length / 3)
      val (b2, b3) = rest.splitAt(changes.length / 3)
      in.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b3.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("scd2s").as[Scd2Out].collect()
    val batch = operators.Cdc.scd2History(log, "user_id", "ts", "event_id", "value_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        Option(r.getTimestamp(3))))
    def counts[T](xs: Seq[T]): Map[T, Int] = xs.groupBy(identity).map { case (k, v) => k -> v.size }
    // closed stream versions == batch closed versions (multiset: a key can
    // revisit a value, so identical rows may legitimately repeat)
    val closedStream = counts(out.filter(!_.is_current).toSeq
      .map(o => (o.user_id, o.value_cents, o.valid_from, o.valid_to)))
    val closedBatch = counts(batch.filter(_._4.isDefined).toSeq)
    assert(closedStream == closedBatch)
    // every version (incl. the still-open tail) was opened exactly once
    val opened = counts(out.filter(_.is_current).toSeq
      .map(o => (o.user_id, o.value_cents, o.valid_from)))
    val allBatch = counts(batch.toSeq.map(v => (v._1, v._2, v._3)))
    assert(opened == allBatch)
  }

  test("streaming image onboarding matches the batch incoming-vs-corpus relation") {
    import graft.streaming.StreamingOps.MediaIn
    import graft.functions.Multimodal
    // the stored band index over the "existing corpus" (75% of the fixture)
    val all = Multimodal.imageDhashes(
      Multimodal.syntheticImageCorpus(spark)).cache()
    def isNew(id: Long) = id / 48 == 3 || id / 48 == 6 // the q142 batch
    val index = Multimodal.imageBandIndex(
      all.filter(!expr("asset_id div 48").isin(3, 6))).cache()
    // batch truth: the exact hamming<=2 relation restricted to pairs with
    // exactly ONE incoming member (incoming-incoming is the next index
    // refresh's business, same contract as the embed probe)
    val hs = all.as[(Long, Long)].collect()
    val expected = (for {
      (ia, ha) <- hs.iterator; (ib, hb) <- hs.iterator
      if ia < ib && (isNew(ia) != isNew(ib))
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 2
    } yield (ia, ib, d)).toSet
    // stream the incoming 25% as raw payloads: decode happens in-batch
    val incoming = Multimodal.syntheticImageCorpus(spark)
      .filter(a => isNew(a.asset_id)).collect()
      .map(a => MediaIn(a.asset_id, a.payload, a.meta.kind,
        new Timestamp(86400_000L + a.asset_id * 1000)))
      .sortBy(_.asset_id)
    val in = MemoryStream[MediaIn]
    val q = StreamingOps.imageOnboardProbe(in.toDS(), index)
      .writeStream.format("memory").queryName("imgprobe")
      .outputMode("append").start()
    try {
      val (b1, b2) = incoming.splitAt(incoming.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("imgprobe")
      .select(col("ia"), col("ib"), col("hamming").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(expected.nonEmpty, "fixture plants no mixed image matches")
    assert(stream == expected,
      s"stream-only: ${stream -- expected}; batch-only: ${expected -- stream}")
    all.unpersist(); index.unpersist()
  }

  test("streaming index maintenance converges to the batch q146 index") {
    import graft.streaming.StreamingOps.{DocIn, IndexStateOut}
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), new Timestamp(86400_000L + r.getLong(0) * 1000)))
      .sortBy(_.doc_id)
    val in = MemoryStream[DocIn]
    val q = StreamingOps.indexMaintain(in.toDS())
      .writeStream.format("memory").queryName("idxmaint")
      .outputMode("update").start()
    try {
      // three micro-batches: most (word, bucket) states are touched in
      // SEVERAL batches, so convergence proves the fold carries across
      val (b1, rest) = docs.splitAt(150)
      val (b2, b3) = rest.splitAt(200)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    // the last emitted state per key = the row with the largest n_docs
    // (monotone counter)
    val finalStates = spark.table("idxmaint").as[IndexStateOut].collect()
      .groupBy(s => (s.word, s.bucket))
      .map { case (k, ss) => k -> {
        val last = ss.maxBy(_.n_docs)
        (last.n_docs, last.tf_sum, last.set_sig)
      } }
    val batch = SparkEntry.queries("q146_incremental_index")(spark, SF)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(batch.nonEmpty)
    assert(finalStates.keySet == batch.keySet,
      s"keyspace drift: ${finalStates.keySet.diff(batch.keySet)} / ${batch.keySet.diff(finalStates.keySet.toSet)}")
    finalStates.foreach { case (k, v) =>
      assert(batch(k) == v, s"state drift at $k: stream $v vs batch ${batch(k)}")
    }
  }
}
