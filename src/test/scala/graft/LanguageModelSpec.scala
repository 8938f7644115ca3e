package graft

import org.apache.spark.sql.functions._

import graft.functions.LanguageModel

/** Semantics of the smoothed bigram-LM scorer on planted corpora: seen
  * bigrams must score cheaper than unseen ones, smoothing must keep
  * unseen-history docs finite, and the per-source outlier flag must fire
  * on the engineered surprise. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "source", "text")

  private def score(base: Seq[(Long, String, String)],
      batch: Seq[(Long, String, String)]): Map[Long, (Long, Double, Boolean)] =
    LanguageModel.bigramLmScore(docsOf(base: _*), docsOf(batch: _*))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

  // base corpus: a,b,a,b,a,b,a,c -> c(a b)=3, c(b a)=3, c(a c)=1;
  // histories c1(a)=4, c1(b)=3; vocabulary V = {a,b,c} = 3
  private val base = Seq((1L, "s", "a b a b a b a c"))

  test("under the SAME history: dominant < rare < unseen, at exact smoothed values") {
    val got = score(base, Seq(
      (10L, "s", "a b"),   // p = (3+1)/(4+3) -> ln(7/4)
      (11L, "s", "a c"),   // p = (1+1)/7     -> ln(7/2)
      (12L, "s", "a z")))  // unseen: p = 1/7 -> ln 7
    val (n10, x10, _) = got(10L)
    val (_, x11, _) = got(11L)
    val (_, x12, _) = got(12L)
    assert(n10 == 1)
    assert(math.abs(x10 - math.log(7.0 / 4)) < 0.001, s"x10=$x10")
    assert(math.abs(x11 - math.log(7.0 / 2)) < 0.001, s"x11=$x11")
    assert(math.abs(x12 - math.log(7.0)) < 0.001, s"x12=$x12")
    assert(x10 < x11 && x11 < x12, s"$x10 / $x11 / $x12")
  }

  test("unseen HISTORY stays finite via add-one smoothing (cost = ln V)") {
    val got = score(base, Seq((20L, "s", "q q")))
    val (n, x, _) = got(20L)
    assert(n == 1)
    // p = (0+1)/(0 + V) with V = 3 -> xent = ln 3 = 1.0986
    assert(math.abs(x - 1.0986) < 0.001, s"xent $x")
  }

  test("per-source outlier flag fires on the engineered surprise") {
    // batch: many ordinary docs + one all-unseen shocker in one source
    val ordinary = (30L to 39L).map(i => (i, "s", "a b a b"))
    val got = score(base, ordinary :+ ((99L, "s", "z q z q z")))
    assert(got(99L)._3, "the all-unseen doc must flag as outlier")
    assert(!got(30L)._3, "ordinary docs must not flag")
  }

  test("sources are scored against their own batch statistics only") {
    // the same shocker is NOT an outlier when its whole source looks like it
    val got = score(base,
      Seq((50L, "t", "z q z"), (51L, "t", "q z q"), (52L, "t", "z q z")))
    assert(got.values.forall(!_._3), s"uniform source must not flag: $got")
  }

  test("q167 degenerate distribution: one distinct score => everything is head") {
    // identical batch docs share one x4, so both tercile cuts land on it
    // and the <= t1 branch takes every row — the tie rule (ties fall to
    // the LOWER bucket, whole) reduced to its sharpest case; middle and
    // tail groups must be ABSENT, not zero-count
    val dir = java.nio.file.Files.createTempDirectory("ppldocs").toString
    (Seq((1L, "a b a b a b a c"), (3L, "a b a c a b")) ++ // base (% 10 != 0)
      Seq((10L, "a b a b"), (20L, "a b a b"), (30L, "a b a b"))) // batch: identical
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q167_ppl_buckets")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("s", "head") -> 3L), got.toString)
  }
}
