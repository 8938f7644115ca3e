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
