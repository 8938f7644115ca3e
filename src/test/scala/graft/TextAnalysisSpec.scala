package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Fixture-level checks for the text-pipeline operators whose interesting
  * inputs don't occur in the synthetic corpus: the PII patterns (q76) are
  * exercised on real emails/phones/IPs here, and the span-dedup gram logic
  * (q77) on planted shared spans. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  // the exact patterns q76 registers (kept in sync by the shared literals)
  private val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IPV4 = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
  private val PHONE = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  test("hierarchical running sum equals the naive global window") {
    // 10k rows with sparse, shuffled-ish ids: > PACK_FANOUT, so the
    // bucket recursion actually runs (one level); values vary so a
    // bucket-boundary mistake cannot cancel out
    val rows = (0 until 10000).map(i => (i.toLong * 3 + (i % 7), (i % 13).toLong + 1))
    val df = rows.toDF("id", "v").repartition(8).cache()
    val got = TextAnalysis.exclusiveRunningSum(df, "id", "v", "cum")
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, v) =>
      val r = (id, acc); acc += v; r
    }.toMap
    assert(got.size == rows.size)
    assert(got == want,
      s"first diffs: ${got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
        .filter(p => p._1 != p._2).take(3)}")
    // and the log-depth plan never falls back to an unpartitioned window
    val wins = TextAnalysis.exclusiveRunningSum(df, "id", "v", "cum")
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "every window in the packing spine must declare a partition key")
  }

  test("q76 PII patterns match real emails, phones, and IPs") {
    val df = Seq(
      ("contact bob.smith+spam@mail.example.org or 555-867-5309x", 1, 0, 0),
      ("server at 10.0.255.7 and 192.168.1.1 rebooted", 0, 2, 0),
      ("call 415 555 0123 or 415.555.0124 today", 0, 0, 2),
      ("no pii here just words", 0, 0, 0))
      .toDF("text", "e", "i", "p")
    val got = df.select(
      regexp_count(col("text"), lit(EMAIL)).as("ge"),
      regexp_count(col("text"), lit(IPV4)).as("gi"),
      regexp_count(col("text"), lit(PHONE)).as("gp"),
      col("e"), col("i"), col("p")).collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(3), s"email count: $r")
      assert(r.getInt(1) == r.getInt(4), s"ipv4 count: $r")
      assert(r.getInt(2) == r.getInt(5), s"phone count: $r")
    }
  }

  test("q76 redaction masks every match and nothing else") {
    val df = Seq("mail a@b.co and c.d@e.org now").toDF("text")
    val masked = df.select(
      regexp_replace(col("text"), EMAIL, "[PII]").as("m")).as[String].head()
    assert(masked == "mail [PII] and [PII] now")
  }

  test("q77 span dedup flags exactly the planted shared 5-gram spans") {
    // docs 1 and 2 share a verbatim 6-word span (two 5-grams); doc 3 shares
    // nothing 5 words long
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 unique2"),
      (2L, "pre1 alpha beta gamma delta epsilon zeta post2"),
      (3L, "alpha beta gamma other delta epsilon zeta2 tail"))
      .toDF("doc_id", "text")
    val fn = TextAnalysis.defs.find(_.name == "q77_span_dedup").get
    // run the same plan shape inline (the registered fn reads the corpus):
    val n = 5
    val toks = df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= n)
    val grams = toks.select(col("doc_id"),
      explode(array_distinct(
        transform(sequence(lit(0), size(col("w")) - n), i =>
          concat_ws(" ", (0 until n).map(j =>
            element_at(col("w"), i + j + 1)): _*)))).as("g"))
    val gdf = grams.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    val out = grams.join(gdf, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("gdf") > 1, 1L).otherwise(0L)).as("n_shared"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2, s"doc1 shares two 5-grams, got ${out(1L)}")
    assert(out(2L) == 2, s"doc2 shares two 5-grams, got ${out(2L)}")
    assert(out(3L) == 0, s"doc3 shares nothing, got ${out(3L)}")
    assert(fn.oracle.nonEmpty, "q77 must stay oracle-checked")
  }

  test("q80 hierarchical prefix sum equals the naive global-order window") {
    // the scalable two-level running sum (bucket offsets + partitioned
    // window) must be value-identical to sum() OVER (ORDER BY doc_id) —
    // including across bucket boundaries and with gaps in doc_id
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).filter(_ => rnd.nextDouble() < 0.8)
      .map(i => (i.toLong, rnd.nextInt(50) + 1L))
    val df = rows.toDF("doc_id", "t")
    val naive = df.withColumn("start",
        coalesce(sum(col("t")).over(Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("start"))
      .as[(Long, Long)].collect().toMap
    val BUCKET = 64L
    val bucketed = df.withColumn("bkt", expr(s"doc_id div $BUCKET"))
    val offs = bucketed.groupBy(col("bkt")).agg(sum(col("t")).as("bt"))
      .select(col("bkt"), coalesce(sum(col("bt")).over(
        Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("off"))
    val hier = bucketed.join(broadcast(offs), Seq("bkt"))
      .withColumn("start", col("off") + coalesce(sum(col("t")).over(
        Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("start"))
      .as[(Long, Long)].collect().toMap
    assert(hier == naive, s"hierarchical != naive; diff=${
      hier.collect { case (k, v) if naive(k) != v => (k, v, naive(k)) }.take(5)}")
  }

  test("q83 unigram cross-entropy ranks repetitive below diverse text") {
    // 8 mid-frequency docs anchor the distribution; one doc repeats a
    // single common word (low surprise) and one is all rare words (high):
    // the LM proxy must order them and flag both extremes
    val common = (1 to 8).map(i => (i.toLong, s"alpha beta gamma delta w$i"))
    val fixture = (common :+
      (100L, "alpha alpha alpha alpha alpha alpha alpha alpha") :+
      (200L, "zeta1 zeta2 zeta3 zeta4 zeta5 zeta6 zeta7 zeta8"))
      .map { case (i, t) => (i, t, "xx", "s") }
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.unigramXent(fixture)
      .select(col("doc_id"), col("xent"), col("is_outlier"))
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(100L)._1 < out(1L)._1, "repetitive doc must score lowest")
    assert(out(200L)._1 > out(1L)._1, "rare-vocab doc must score highest")
    assert(out(100L)._1 < out(200L)._1)
  }

  test("row-wise repetition stats equal the registered groupBy path") {
    val docs = Tables.documents(spark, SF)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("top_word_frac"), col("dup_word_frac"),
        col("top_bigram_frac"))
        .as[(Long, Double, Double, Double)].collect().toSet
    val registered = collect(
      TextAnalysis.defs.find(_.name == "q69_repetition").get.fn(spark, SF))
    val rowwise = collect(TextAnalysis.repetitionRowwise(docs))
    assert(registered == rowwise)
  }

  test("pipeline ops tolerate degenerate inputs") {
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(TextAnalysis.unigramXent(empty).count() == 0)
    // a single-doc language has sigma 0 => the doc is not its own outlier
    val one = Seq((1L, "a b c", "xx", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val flags = TextAnalysis.unigramXent(one)
      .select(col("is_outlier")).as[Boolean].collect().toSeq
    assert(flags == Seq(false))
    // trigram guard: a 3-token doc has exactly one trigram, shorter none
    val sets = Seq((1L, "a b c"), (2L, "a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        when(size(TextAnalysis.tokens(col("text"))) >= 3,
          TextAnalysis.trigramSet(TextAnalysis.tokens(col("text"))))
          .otherwise(array().cast("array<string>")).as("g"))
      .select(col("doc_id"), size(col("g")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(sets(1L) == 1 && sets(2L) == 0)
  }

  test("q81 rebalancing drives every source toward the language minimum") {
    val out = TextAnalysis.defs.find(_.name == "q81_mixture_balance").get
      .fn(spark, SF)
      .select(col("lang"), col("source"), col("n_docs"), col("k"), col("n_kept"))
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val byLang = out.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val minDocs = rows.map(_._3).min
      rows.foreach { case (_, src, n, k, kept) =>
        assert(kept <= n)
        // the minimum source keeps everything (k >= 65536)
        if (n == minDocs) assert(kept == n, s"$lang/$src min source must keep all")
        // a 16-bit coin binomial around n*k/65536: allow generous slack
        val expect = n * k / 65536.0
        assert(math.abs(kept - expect) <= math.max(8.0, 4 * math.sqrt(expect)),
          s"$lang/$src kept=$kept expected~$expect")
      }
    }
  }

  test("q100 bucketed postings reassemble into the full sorted posting list") {
    // the registered q100 md5-digests `postings` for the driver's scalar
    // hasher; the raw-array invariants are pinned against the API instead
    val out = TextAnalysis.invertedIndex(spark, SF)
      .select(col("word"), col("bucket"), col("n_docs"), col("tf_sum"), col("postings"))
      .as[(String, Long, Long, Long, Seq[Long])].collect()
    assert(out.nonEmpty)
    out.foreach { case (w, bkt, n, tf, p) =>
      assert(p.size == n && tf >= n, s"$w/$bkt")
      assert(p.size <= 500, s"$w/$bkt postings exceed the bucket width")
      assert(p == p.sorted && p.distinct == p, s"$w/$bkt postings unsorted or duped")
      assert(p.forall(id => id / 500 == bkt), s"$w/$bkt holds out-of-range doc ids")
    }
    // concatenating a word's buckets in bucket order IS the classic full
    // posting list (the segment-merge identity an index reader relies on)
    val docsWith = Tables.documents(spark, SF)
      .select(col("doc_id"), explode(array_distinct(TextAnalysis.tokens(col("text")))).as("word"))
      .as[(Long, String)].collect().groupBy(_._2)
      .map { case (w, xs) => w -> xs.map(_._1).toSeq.sorted }
    out.groupBy(_._1).foreach { case (w, rows) =>
      val merged = rows.sortBy(_._2).flatMap(_._5).toSeq
      assert(merged == docsWith(w), s"$w merged postings diverge")
    }
  }

  test("q101 epoch shuffle is layout-independent and covers the corpus exactly once") {
    val q = TextAnalysis.defs.find(_.name == "q101_epoch_shuffle").get
    val out = q.fn(spark, SF)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every shard key is a 2-hex prefix; doc counts sum to the corpus
    assert(out.forall(r => r._1.matches("[0-9a-f]{2}")))
    assert(out.map(_._2).sum == Tables.documents(spark, SF).count())
    // deterministic: a rerun yields identical rows, checksum included
    // (partition-layout invariance is pinned separately in InvarianceSpec)
    val again = q.fn(spark, SF).as[(String, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // different epoch salts produce different permutations (the whole
    // point of an epoch shuffle); same-shard doc sets would be a salt bug
    val sig2 = Tables.documents(spark, SF)
      .select(col("doc_id"),
        md5(concat(lit("epoch2:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("shard", substring(col("h"), 1, 2))
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val sig1 = out.map(r => r._1 -> r._2).toMap
    assert(sig1 != sig2, "epoch2 salt produced the identical shard layout")
  }

  test("q102 domain cap equals rank-over-window and bounds every domain") {
    val out = TextAnalysis.defs.find(_.name == "q102_domain_cap").get
      .fn(spark, SF)
      .as[(String, String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(r => (r._1, r._2)).foreach { case (dom, rows) =>
      assert(rows.length <= 25, s"$dom over cap")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"$dom ranks not dense")
    }
    // the bounded-aggregator selection must equal the window-rank form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source"))
      .orderBy(md5(concat(lit("cap1:"), col("doc_id").cast("string"))), col("doc_id"))
    val want = Tables.documents(spark, SF)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 25)
      .select(col("lang"), col("source"), col("rank"), col("doc_id"))
      .as[(String, String, Long, Long)].collect()
    assert(out.toSet == want.toSet)
  }

  test("q103 PMI ranks a planted collocation above independent fillers") {
    // "zyq wvx" always co-occurs (20 times); fillers pair uniformly at
    // random — the planted bigram must surface with the top PMI
    val rnd = new scala.util.Random(7)
    val fillers = Vector("aa", "bb", "cc", "dd")
    val docs = (1 to 40).map { i =>
      val noise = Seq.fill(10)(fillers(rnd.nextInt(4))).mkString(" ")
      (i.toLong, if (i % 2 == 0) s"zyq wvx $noise" else noise)
    }.toDF("doc_id", "text")
    val n = size(col("toks"))
    val bigrams = when(n >= 2,
      zip_with(slice(col("toks"), lit(1), n - 1), slice(col("toks"), lit(2), n - 1),
        (a, b) => struct(a.as("a"), b.as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
    val uni = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val big = docs.select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(explode(bigrams).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    val tot = uni.agg(sum(col("c")).as("n_tokens"))
    val ranked = big
      .join(uni.select(col("w").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"),
        (round(log(col("c_ab") * lit(1.0) * col("n_tokens") /
          (col("c_a") * lit(1.0) * col("c_b"))) * 1000000)).cast("long").as("pmi6"))
      .orderBy(col("pmi6").desc, col("a"), col("b"))
      .as[(String, String, Long)].collect()
    assert(ranked.nonEmpty)
    assert((ranked.head._1, ranked.head._2) == ("zyq", "wvx"),
      s"planted collocation not top: ${ranked.take(3).toSeq}")
    // and the planted pair's PMI is positive while ln N/c for a uniform
    // filler pair sits near zero
    assert(ranked.head._3 > 0)
  }

  test("q104 phrase search equals brute-force sliding-window counting") {
    val out = TextAnalysis.defs.find(_.name == "q104_phrase_search").get
      .fn(spark, SF)
      .as[(Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val want = (for {
      (pid, phrase) <- TextAnalysis.PHRASES
      p = phrase.split(" ").filter(_.nonEmpty)
      (id, text) <- docs
      toks = text.split(" ").filter(_.nonEmpty)
      starts = (0 to toks.length - p.length)
        .filter(i => toks.slice(i, i + p.length).sameElements(p))
      if starts.nonEmpty
    } yield (pid, id) -> (starts.size.toLong, starts.min.toLong)).toMap
    assert(out.size == want.size,
      s"got ${out.size} (phrase,doc) hits, want ${want.size}")
    assert(out == want,
      s"first diffs: ${out.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
        .filter(p => p._1 != p._2).take(3)}")
    // the repeated-term phrase relies on the distinct-slot vote; it must
    // both match AND count overlapping starts where the corpus has runs
    assert(want.keys.exists(_._1 == 3), "'batch batch' found nothing to test")
  }

  test("q105 chunking covers every token, overlaps by stride, and is shuffle-free") {
    // doc lengths straddle every geometry edge: shorter than one chunk,
    // exactly one chunk, exactly chunk+stride, and long enough for 4 chunks
    val size = 64; val stride = 48
    val docs = Seq(1 -> 10, 2 -> size, 3 -> (size + stride), 4 -> 200, 5 -> 1)
      .map { case (id, n) => (id.toLong, (0 until n).map(i => s"t${id}_$i").mkString(" ")) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkedDocs(docs, size, stride)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))
    for ((id, n) <- Seq(1 -> 10, 2 -> size, 3 -> (size + stride), 4 -> 200, 5 -> 1)) {
      val chunks = got.filter(_._1 == id).sortBy(_._2)
      val expected = (n - 1) / stride + 1
      assert(chunks.length == expected, s"doc $id: ${chunks.length} chunks, want $expected")
      // chunk i starts at i*stride and holds min(size, n - start) tokens
      chunks.foreach { case (_, i, start, len, h) =>
        assert(start == i * stride)
        assert(len == math.min(size, n - start))
        val toks = (start.toInt until (start.toInt + len)).map(p => s"t${id}_$p")
        assert(h == java.security.MessageDigest.getInstance("MD5")
          .digest(toks.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }
      // coverage: last chunk reaches the final token
      val (_, _, lastStart, lastLen, _) = chunks.last
      assert(lastStart + lastLen == n)
    }
    // the plan is a pure scan+generate: no exchange anywhere
    val plan = TextAnalysis.chunkedDocs(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking plan shuffles:\n$plan")
  }

  test("q117 content-defined chunks cover exactly and survive a mid-doc edit") {
    def chunks(text: String): Seq[(Long, Long, Long, String)] = {
      val dir = java.nio.file.Files.createTempDirectory("cdcdocs").toString
      Seq((1L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("q117_cdc_chunking")(spark, dir)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    }
    val words = (0 until 600).map(i => s"w${i * 7 % 601}")
    val orig = chunks(words.mkString(" "))
    // coverage: chunks chain gaplessly from 0 to n
    assert(orig.head._2 == 0L)
    orig.sliding(2).foreach { case Seq(a, b) => assert(a._2 + a._3 == b._2); case _ => () }
    assert(orig.last._2 + orig.last._3 == 600L)
    assert(orig.size > 3, "fixture long enough to have several content boundaries")
    // edit ONE token mid-doc: a boundary at i hashes gram (i-2..i), so
    // the edit at pos can only disturb boundaries in [pos, pos+2] — any
    // chunk ending before the gram window or starting past boundary
    // pos+3 must survive byte-identically
    val pos = 300
    val edited = chunks(words.updated(pos, "EDITED").mkString(" "))
    val stable = orig.filter(c => c._2 + c._3 <= pos - 2 || c._2 > pos + 3).map(c => (c._2, c._3, c._4)).toSet
    val editedSet = edited.map(c => (c._2, c._3, c._4)).toSet
    assert(stable.subsetOf(editedSet),
      s"chunks away from the edit changed: ${stable -- editedSet}")
    // and the edit DID change something
    assert(editedSet != orig.map(c => (c._2, c._3, c._4)).toSet)
  }

  test("q118 ordinals are dense rank-in-id-order under sparse shuffled ids") {
    val dir = java.nio.file.Files.createTempDirectory("orddocs").toString
    val ids = scala.util.Random.shuffle((0 until 9000).map(i => i.toLong * 5 + (i % 3)).distinct)
    ids.map(i => (i, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q118_global_ordinals")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = ids.sorted.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("q121 classifier: scores are k * w(token), empty docs kept at 0") {
    // reference model of the frozen weight hash, mirroring the query
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h12(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(12), 16)
    def weight(word: String): Long = {
      val b = h12(word) % 4096L
      h12(s"w#$b") % 2001L - 1000L
    }
    val dir = java.nio.file.Files.createTempDirectory("clsdocs").toString
    Seq((0L, "alpha alpha alpha", "en", "s", 17L),
      (1L, "alpha beta", "en", "s", 10L),
      (2L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q121_quality_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val wa = weight("alpha"); val wb = weight("beta")
    assert(got(0L) == ((3L, 3 * wa, 3 * wa >= 0)))
    assert(got(1L) == ((2L, wa + wb, wa + wb >= 0)))
    assert(got(2L) == ((0L, 0L, true)))
  }

  test("q128 OOV rate against the deterministic top-V vocabulary") {
    val dir = java.nio.file.Files.createTempDirectory("oovdocs").toString
    // vocab is top-1000 by (freq desc, word asc) and this corpus has 1001
    // distinct words: "aa"(5) and "zz"(2) outrank the 999 singleton
    // fillers, and the alphabetically-last filler "w0999" is the one word
    // squeezed out — the deterministic boundary tie-break in action
    val fillers = (1 to 999).map(i => f"w$i%04d")
    val common = Seq.fill(5)("aa")
    val text0 = (common ++ Seq("zz", "zz")).mkString(" ") // all in-vocab
    val text1 = fillers.mkString(" ")                     // w0999 is OOV
    Seq((0L, text0, "en", "s", 1L), (1L, text1, "en", "s", 1L),
      (2L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q128_oov_rate")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((7L, 0L, 0L)))
    assert(got(1L) == ((999L, 1L, 1000000L / 999L))) // integer div: 1001
    assert(got(2L) == ((0L, 0L, 0L)))
  }

  test("q146 merged index states equal the q100 full rebuild") {
    // the merge==rebuild contract inside one engine (the oracle proves it
    // across engines): q146 merges base+delta partial indexes, q100
    // aggregates the whole corpus — their (word, bucket) keyspaces and
    // n_docs/tf_sum states must be identical
    val merged = SparkEntry.queries("q146_incremental_index")(spark, SF)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val rebuilt = graft.functions.TextAnalysis.invertedIndex(spark, SF)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(merged.keySet == rebuilt.keySet,
      s"keyspace drift: ${merged.keySet.diff(rebuilt.keySet)} / ${rebuilt.keySet.diff(merged.keySet)}")
    merged.foreach { case (k, v) =>
      assert(rebuilt(k) == v, s"state drift at $k: merged $v vs rebuilt ${rebuilt(k)}")
    }
    // and the batch genuinely contributes: some bucket state must differ
    // between the base-only index and the merged one (i.e. delta != empty)
    assert(Tables.documents(spark, SF)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(4)) === 3).count() > 0)
  }

  test("q165 exact substring dedup: maximal extents, intra-doc repeats count") {
    val dir = java.nio.file.Files.createTempDirectory("ssdocs").toString
    // A/B share an 8-token run (cross-doc dup: 4 dup'd 5-gram starts in A,
    // merged into ONE maximal extent of 8 tokens); C repeats a 5-token run
    // INSIDE itself (site-frequency criterion — q91's cross-doc test would
    // miss it) at gap > n, so two disjoint extents; D is unique.
    Seq(
      (0L, "dup1 dup2 dup3 dup4 dup5 dup6 dup7 dup8 ua1 ua2 ua3"),
      (1L, "ub1 ub2 dup1 dup2 dup3 dup4 dup5 dup6 dup7 dup8 ub3"),
      (2L, "x1 x2 x3 x4 x5 f1 f2 f3 f4 f5 f6 x1 x2 x3 x4 x5"),
      (3L, "z1 z2 z3 z4 z5 z6"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q165_substring_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L), s"unique doc must be absent: $got")
    // (n_tokens, n_spans, dup_tokens, max_span, first_start, dup_frac)
    assert(got(0L) == ((11L, 1L, 8L, 8L, 0L, 0.7273)), got(0L).toString)
    assert(got(1L) == ((11L, 1L, 8L, 8L, 2L, 0.7273)), got(1L).toString)
    assert(got(2L) == ((16L, 2L, 10L, 5L, 0L, 0.625)), got(2L).toString)
  }

  test("q166 decontamination flags partial inclusion q138's doc-level audit misses") {
    val dir = java.nio.file.Files.createTempDirectory("decondocs").toString
    // doc 10 is eval (% 10 == 0); train doc 1 QUOTES five of its tokens
    // inside otherwise-unique text (Jaccard vs doc 10 is 5/10 = 0.5,
    // far under q138's 0.8 — exactly the partial-inclusion case);
    // train doc 2 is clean.
    Seq(
      (10L, "e1 e2 e3 e4 e5 e6"),
      (1L, "t1 t2 e1 e2 e3 e4 e5 tz1 tz2"),
      (2L, "u1 u2 u3 u4 u5 u6 u7"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q166_decontamination")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // only the quoting doc is flagged: 5 distinct grams, 1 shared
    assert(got == Map(1L -> ((5L, 1L, 0.2))), got.toString)
  }
}
