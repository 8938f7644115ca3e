package graft

import org.apache.spark.sql.functions._

import graft.functions.Fuzzy

/** Semantics of the deletion-neighborhood fuzzy join: each single-edit
  * class must match, double edits must not, and the candidate join must
  * equal brute force on corpora where keys collide heavily. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def brute(feed: Seq[(Long, String)], roster: Seq[String]): Set[(Long, String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    (for ((id, f) <- feed; r <- roster; d = lev(f, r) if d <= 1)
      yield (id, f, r, d)).toSet
  }

  private def run(feed: Seq[(Long, String)], roster: Seq[String]): Set[(Long, String, String, Int)] =
    Fuzzy.fuzzyJoin(feed.toDF("id", "name"), roster.toSeq.toDF("name"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet

  test("every single-edit class matches; double edits do not") {
    val roster = Seq("pipeline", "partition", "shuffle", "broadcast")
    val feed = Seq(
      1L -> "pipeline",   // exact: d = 0
      2L -> "pipelane",   // substitution
      3L -> "pipeine",    // deletion
      4L -> "pipelinee",  // insertion
      5L -> "shufle",     // deletion mid-doubled-char
      6L -> "broadcst",   // deletion
      7L -> "partittion", // insertion
      8L -> "pipelllne",  // two edits: must NOT match
      9L -> "zzz")        // unrelated
    val got = run(feed, roster)
    assert(got == brute(feed, roster))
    assert(got.map(_._1) == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(got.forall { case (_, _, _, d) => d <= 1 })
  }

  test("empty and single-char strings keep deletion-key completeness") {
    val roster = Seq("", "a", "b", "ab")
    val feed = Seq(1L -> "", 2L -> "a", 3L -> "c", 4L -> "ba")
    assert(run(feed, roster) == brute(feed, roster))
  }

  test("candidate join equals brute force on a dense colliding vocabulary") {
    // short strings over a 2-letter alphabet: deletion keys collide
    // constantly, so candidate dedupe and the exact verify both work hard
    val all = (for {
      len <- 1 to 4
      s <- (0 until math.pow(2, len).toInt).map(n =>
        (0 until len).map(b => if (((n >> b) & 1) == 1) 'a' else 'b').mkString)
    } yield s).distinct
    val feed = all.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val got = run(feed, all)
    assert(got == brute(feed, all))
    assert(got.nonEmpty)
  }

  test("q108 plans an equi join on deletion keys — no cartesian, no nested loop") {
    val plan = SparkEntry.queries("q108_fuzzy_join")(spark, SF)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // ---- q152 sorted-neighborhood ----

  private def snm(recs: Seq[(Long, String, Int)]): Seq[(Long, String, String, Int, Long, Long)] =
    Fuzzy.snmMatch(recs.toDF("id", "name", "is_feed"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4), r.getLong(5))).toSeq

  test("snm: reverse-key pass catches first-char edits the name pass cannot reach") {
    // pass 1 sorts "azzz" under 'a' and "zzz" under 'z' with 21 roster
    // fillers between — out of the 16-window. Reversed, "zzza" and "zzz"
    // are adjacent (no other record ends in 'zz'), so ONLY pass 2 finds
    // the pair: multi-pass is load-bearing, not decoration.
    val fillers = (0 to 20).map(i => (10L + i, f"b$i%02d", 0))
    val recs = Seq((1L, "zzz", 0), (101L, "azzz", 1)) ++ fillers
    val got = snm(recs)
    assert(got === Seq((101L, "azzz", "zzz", 1, 1L, 1L)),
      s"expected the pass-2-only adjacent match, got $got")
  }

  test("snm: a middle edit isolated in BOTH sort orders is missed (windowed recall)") {
    // lev("apz","akz") = 1, but 21 fillers separate them in name order
    // AND 21 more separate their reverses — the documented recall trade
    // vs q108's structurally-complete deletion keys.
    val passA = (0 to 20).map(i => (10L + i, f"al$i%02d", 0))
    val passB = (40 to 60).map(i => (i.toLong, f"${i - 40}%02dmz", 0))
    val recs = Seq((2L, "akz", 0), (102L, "apz", 1)) ++ passA ++ passB
    assert(snm(recs).isEmpty)
    // control: drop the separators and the same pair IS found
    val close = snm(Seq((2L, "akz", 0), (102L, "apz", 1)))
    assert(close.map(t => (t._1, t._2, t._3, t._4)) === Seq((102L, "apz", "akz", 1)))
  }

  test("snm: adjacent end-edit is caught by the name pass with gap 1") {
    val got = snm(Seq((3L, "yyyw", 0), (103L, "yyywq", 1)))
    assert(got.map(t => (t._1, t._3, t._4, t._6)) === Seq((103L, "yyyw", 1, 1L)))
  }

  test("q152 on the real corpus: gaps inside the window, d <= 1, passes in range") {
    val rows = SparkEntry.queries("q152_sorted_neighborhood")(spark, SF)
      .collect().map(r => (r.getInt(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, nPasses, minGap) =>
      assert(d >= 0 && d <= 1, s"d out of range: $d")
      assert(nPasses >= 1 && nPasses <= 2, s"n_passes out of range: $nPasses")
      assert(minGap >= 1 && minGap < Fuzzy.SNM_W, s"gap outside window: $minGap")
    }
  }

  test("q123 resolves exact dups, fuzzy bridges, and singletons into clusters") {
    import spark.implicits._
    // planted roster: p1/p2 share a name (exact-dup pair), p3 and p4 are
    // only reachable through their corrupted feed twins. Corruption drops
    // char at p_partkey % len:
    //   p1 "ab" -> "a", p2 "ab" -> "b", p3 "xz" -> "x", p4 "qqqq" -> "qqq"
    // so feeds fuzzy-bridge to their sources and the p1/p2 group merges.
    val dir = java.nio.file.Files.createTempDirectory("erparts").toString
    Seq((1L, "ab", 1), (2L, "ab", 2), (3L, "xz", 3), (4L, "qqqq", 4))
      .toDF("p_partkey", "p_name", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q123_entity_resolution")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 4L, "ab"),     // p1+p2 (same name) + both feeds ("a"~"ab", "b"~"ab")
      (3L, 2L, "xz"),     // p3 + its feed "x"
      (4L, 2L, "qqqq"))) // p4 + its feed "qqq"
  }
}
