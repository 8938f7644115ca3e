package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Mixture, Tokenizer, Winnowing}
import graft.operators.{DocPoint, Skyline}

/** Contracts of the r13 curation additions: BPE training (q147),
  * winnowing fingerprints (q148), skyline selection (q149),
  * temperature mixture (q151). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: Seq[String]): DataFrame =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "src") }
      .toDF("doc_id", "text", "lang", "source")

  // ---- q147 BPE training ----

  test("bpe merge application is greedy-left non-overlapping") {
    // word "aaa": after merge (a,a) the rendering must be [aa, a] (the
    // leftmost pair wins; the overlapping middle pair is consumed), so
    // round 2's top pair is (aa, a) — NOT (a, aa).
    val m = Tokenizer.bpeTrainOf(spark, docsOf(Seq.fill(5)("aaa aaa")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq === Seq(
      (1L, "a", "a", "aa", 20L),
      (2L, "aa", "a", "aaa", 10L)))
  }

  test("bpe pair counts after a merge reflect the merged symbol") {
    // "aaaa" x10 + "bc" x20: round 1 merges (a,a) cnt 30; round 2 must
    // count "aaaa" as [aa, aa] (one (aa,aa) pair), so (b,c) cnt 20 wins;
    // round 3 merges (aa,aa) cnt 10; round 4 has no pairs -> exhausted.
    val docs = docsOf(Seq.fill(10)("aaaa bc bc"))
    val m = Tokenizer.bpeTrainOf(spark, docs)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
    assert(m.toSeq === Seq((1L, "aa", 30L), (2L, "bc", 20L), (3L, "aaaa", 10L)))
  }

  test("bpe argmax ties break lexicographically") {
    val m = Tokenizer.bpeTrainOf(spark, docsOf(Seq.fill(7)("cd ab")))
      .limit(1).collect()(0)
    assert((m.getString(1), m.getString(2)) === ("a", "b"))
  }

  test("bpe merge counts are non-increasing on the real corpus") {
    val counts = Tokenizer.bpeTrain(spark, SF)
      .select(col("pair_count")).collect().map(_.getLong(0)).toSeq
    assert(counts.nonEmpty && counts == counts.sortBy(-_),
      s"merge counts must be non-increasing, got $counts")
  }

  test("bpe merge-table memo is value-invisible: memoized == fresh == frame-level") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val memoized = rows(Tokenizer.bpeTrain(spark, SF)) // memo hit or fill
    Tokenizer.clearMemo()
    val fresh = rows(Tokenizer.bpeTrain(spark, SF))    // forced re-fit
    val frame = rows(Tokenizer.bpeTrainOf(spark,       // unmemoized path
      graft.Tables.documents(spark, SF)))
    assert(memoized == fresh, "memoized table differs from a fresh fit")
    assert(fresh == frame, "path-keyed fit differs from the frame-level fit")
  }

  // ---- q150 BPE encode ----

  test("bpe encode counts tokens under the trained merges, fallback 1 per alien word") {
    // 12 equal-frequency 2-char words: the 8 merge rounds take the 8
    // lexicographically smallest pairs (argmax ties break on l, r), so
    // ab..op encode to 1 token, qr/st/uv/wx stay 2, and "X!" (outside
    // the [a-z0-9] alphabet) falls back to 1: 8*1 + 4*2 + 1 = 17.
    val text = "ab cd ef gh ij kl mn op qr st uv wx X!"
    val docs = (0 until 10).map(i => (i.toLong, text, "xx", s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Tokenizer.bpeEncodeStatsOf(spark, docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(("s0", 5L, 65L, 85L), ("s1", 5L, 65L, 85L)))
  }

  test("bpe encode is bounded by chars below and words above on the real corpus") {
    val r = Tokenizer.bpeEncodeStats(spark, SF).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (words, toks) = (row.getLong(2), row.getLong(3))
      assert(toks >= words, s"every word is >= 1 token: $row")
    }
  }

  // ---- q153 BPE drift ----

  test("bpe drift: an incoming batch that rearranges the argmax shows shifted+new") {
    // base (ids not %10): "ab" x9 -> one merge (a,b,9). Incoming ids 10/20
    // add "cd" x12, so the full fit takes (c,d,12) first and (a,b,9)
    // second: (a,b) SHIFTS 1->2 and (c,d) is NEW.
    val docs = ((1 to 9).map(i => (i.toLong, "ab", "xx", "s")) ++
      Seq((10L, "cd cd cd cd cd cd", "xx", "s"), (20L, "cd cd cd cd cd cd", "xx", "s")))
      .toDF("doc_id", "text", "lang", "source")
    val got = Tokenizer.bpeDriftOf(spark, docs)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(5), r.getString(7)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      ("ab", 1L, 2L, "shifted"),
      ("cd", -1L, 1L, "new")))
  }

  test("bpe drift: no incoming batch means every merge is stable") {
    val docs = (0 until 12).map(i => (i.toLong * 10 + 1, "ab ba abba", "xx", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Tokenizer.bpeDriftOf(spark, docs).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getString(7) === "stable", r.toString)
      assert(r.getLong(3) === r.getLong(5), r.toString)
    }
  }

  test("bpe drift on the real corpus: full side carries all K merges") {
    val rows = Tokenizer.bpeDrift(spark, SF).collect()
      .map(r => (r.getLong(3), r.getLong(5), r.getString(7)))
    assert(rows.nonEmpty)
    val valid = Set("stable", "shifted", "dropped", "new")
    rows.foreach { case (sb, sf_, st) =>
      assert(valid(st), st)
      if (st == "dropped") assert(sf_ === -1L && sb >= 1)
      if (st == "new") assert(sb === -1L && sf_ >= 1)
    }
    assert(rows.count(_._2 != -1L) === Tokenizer.BPE_MERGES)
    assert(rows.count(_._1 != -1L) === Tokenizer.BPE_MERGES)
  }

  // ---- q151 temperature mixture ----

  test("isqrt is exact at perfect squares and their neighbors") {
    val xs = Seq(0L, 1L, 2L, 3L, 4L, 99L, 100L, 101L,
      (1L << 26) * (1L << 26) - 1, (1L << 26) * (1L << 26),
      104857600L, 419430400L, 4503599627370495L) // 2^52 - 1
    val got = xs.toDF("x")
      .select(col("x"), Mixture.isqrt(col("x")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val t = math.sqrt(x.toDouble).toLong
      val expect = Seq(t - 1, t, t + 1).filter(r => r >= 0 && r * r <= x).max
      assert(got(x) === expect, s"isqrt($x)")
    }
  }

  test("temperature mix: hand-computed thresholds and md5-recomputed keeps") {
    // sources a=100 docs, b=400: w = isqrt(n * 2^20) = 10240 / 20480,
    // sum_w = 30720, B = 500 div 2 = 250,
    // k_a = (250*10240*65536) div (30720*100) = 54613  (keep ~83%)
    // k_b = (250*20480*65536) div (30720*400) = 27306  (keep ~42%)
    // -> the tail source keeps DOUBLE the head source's rate: alpha=1/2.
    val docs = ((0 until 100).map(i => (i.toLong, "t", "xx", "a")) ++
      (100 until 500).map(i => (i.toLong, "t", "xx", "b")))
      .toDF("doc_id", "text", "lang", "source")
    val rows = Mixture.temperatureMixOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows("a")._1 === 100L && rows("a")._2 === 10240L && rows("a")._3 === 54613L)
    assert(rows("b")._1 === 400L && rows("b")._2 === 20480L && rows("b")._3 === 27306L)
    // independent recount of the md5 coin in plain Java
    def kept(ids: Range, k: Long): Long = {
      val mdig = java.security.MessageDigest.getInstance("MD5")
      val kHex = f"$k%04x"
      ids.count { i =>
        val h = mdig.digest(s"temp:$i".getBytes("UTF-8"))
          .take(2).map(b => f"$b%02x").mkString
        h < kHex
      }.toLong
    }
    assert(rows("a")._4 === kept(0 until 100, 54613L))
    assert(rows("b")._4 === kept(100 until 500, 27306L))
  }

  test("temperature mix on the real corpus: budget respected, head downweighted") {
    val rows = Mixture.temperatureMix(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    val expectedKept = rows.map { case (_, nd, k, _) => nd.toDouble * math.min(k, 65536L) / 65536.0 }.sum
    assert(expectedKept <= n / 2 + 1e-6, s"budget exceeded: $expectedKept vs ${n / 2}")
    assert(expectedKept >= n / 2 * 0.95, s"budget underused: $expectedKept vs ${n / 2}")
    // alpha = 1/2 means keep RATE falls as source size grows
    rows.sortBy(_._2).map(_._3).sliding(2).foreach {
      case Array(kSmall, kBig) => assert(kBig <= kSmall,
        s"bigger source must not keep at a higher rate: $kBig > $kSmall")
      case _ =>
    }
  }

  // ---- q148 winnowing ----

  test("winnowing guarantee: a shared run of W+K-1 tokens is always caught") {
    // Schleimer et al. theorem 1: any match of length >= t = W+K-1 (here
    // 7 tokens) yields at least one COMMON selected fingerprint. The
    // shared run sits at different offsets in otherwise-disjoint docs.
    val shared = "s1 s2 s3 s4 s5 s6 s7"
    val a = s"u1 u2 u3 $shared u4 u5"
    val b = s"v1 v2 v3 v4 v5 v6 v7 v8 v9 $shared"
    val fps = Winnowing.fingerprints(docsOf(Seq(a, b)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val common = fps.filter(_._1 == 0L).map(_._2).toSet
      .intersect(fps.filter(_._1 == 1L).map(_._2).toSet)
    assert(common.nonEmpty, "shared 7-token run must share a fingerprint")
  }

  test("winnowing reports planted near-dups and not unrelated docs") {
    val rnd = new scala.util.Random(11)
    def randDoc() = Seq.fill(40)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val base = Seq.fill(6)(randDoc())
    // doc 6 = near-copy of doc 0 (one token changed mid-doc)
    val nearDup = { val t = base(0).split(" "); t(20) = "CHANGED"; t.mkString(" ") }
    val pairs = Winnowing.copyPairsOf(docsOf(base :+ nearDup))
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 6L)), s"planted pair missing from $pairs")
    assert(pairs.forall { case (x, y) => (x, y) == ((0L, 6L)) },
      s"unrelated docs must not pair: $pairs")
  }

  test("winnowing df cap suppresses boilerplate-only matches") {
    // DF_CAP+5 docs share ONE boilerplate block; suffixes are disjoint.
    // Every shared fingerprint has df > DF_CAP, so no pair may survive.
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = (0 until Winnowing.DF_CAP + 5).map { i =>
      s"$boiler " + (1 to 12).map(j => s"d${i}_$j").mkString(" ")
    }
    assert(Winnowing.copyPairsOf(docsOf(docs)).isEmpty)
  }

  // ---- q149 skyline ----

  private def bruteSkyline(pts: Seq[DocPoint]): Set[Long] =
    pts.filter(p => !pts.exists(q =>
      q.m_len >= p.m_len && q.m_lex >= p.m_lex && q.m_wlen >= p.m_wlen &&
        (q.m_len > p.m_len || q.m_lex > p.m_lex || q.m_wlen > p.m_wlen)))
      .map(_.doc_id).toSet

  private def randomPoints(seed: Int, n: Int): Seq[DocPoint] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      DocPoint(i.toLong, rnd.nextInt(40).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
  }

  test("skyline equals brute-force dominance on random points") {
    for (seed <- Seq(1, 2, 3)) {
      val pts = randomPoints(seed, 300)
      val got = Skyline.frontierOf(pts.toDF())
        .select(col("doc_id")).as[Long].collect().toSet
      assert(got === bruteSkyline(pts), s"seed $seed")
    }
  }

  test("skyline is partitioning-invariant") {
    val pts = randomPoints(42, 500).toDF()
    val one = Skyline.frontierOf(pts.repartition(1))
      .as[DocPoint].collect().toSet
    val many = Skyline.frontierOf(pts.repartition(13))
      .as[DocPoint].collect().toSet
    assert(one === many && one.nonEmpty)
  }

  test("skyline keeps equal-vector duplicates (neither dominates)") {
    val pts = Seq(
      DocPoint(1, 10, 10, 10), DocPoint(2, 10, 10, 10), // equal frontier twins
      DocPoint(3, 9, 10, 10),                           // dominated by both
      DocPoint(4, 11, 1, 1))                            // incomparable corner
    val got = Skyline.frontierOf(pts.toDF())
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === Set(1L, 2L, 4L))
  }
}
