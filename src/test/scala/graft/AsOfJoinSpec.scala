package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("backward match picks the latest right row atomically, nulls included") {
    // the true as-of match at ts=10 has a NULL payload — it must win, and
    // its null must be returned (not an older non-null value)
    val left = Seq((1L, ts(12)), (1L, ts(7))).toDF("k", "ts")
    val right = Seq(
      (1L, ts(5), Option("a"), Option(100)),
      (1L, ts(10), Option.empty[String], Option(200))).toDF("k", "ts", "x", "y")
    val out = AsOfJoin.backward(left, right, "k", "ts", Seq("x", "y"))
      .orderBy(col("ts"))
      .select("ts", "matched_x", "matched_y")
      .as[(Timestamp, Option[String], Option[Int])].collect()
    assert(out(0) == ((ts(7), Some("a"), Some(100))))   // ts=5 is the match
    assert(out(1) == ((ts(12), None, Some(200))))       // ts=10 row, null x kept
  }

  test("unmatched left rows keep all-null payloads") {
    val left = Seq((9L, ts(1))).toDF("k", "ts")
    val right = Seq((9L, ts(5), "late")).toDF("k", "ts", "x")
    val out = AsOfJoin.backward(left, right, "k", "ts", Seq("x"))
      .select("matched_x").as[Option[String]].collect()
    assert(out.toSeq == Seq(None))
  }

  test("equal timestamps match inclusively with tiebreak") {
    val left = Seq((1L, ts(5))).toDF("k", "ts")
    val right = Seq((1L, ts(5), "exact"), (1L, ts(4), "older")).toDF("k", "ts", "x")
    val out = AsOfJoin.backward(left, right, "k", "ts", Seq("x"), tiebreak = Seq("x"))
      .select("matched_x").as[String].head()
    assert(out == "exact")
  }

  test("forward match picks the smallest following right row, inclusive at equal ts") {
    val left = Seq((1L, 10L), (1L, 5L), (1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "at10"), (1L, 20L, "at20")).toDF("k", "ts", "x")
    val out = AsOfJoin.forward(left, right, "k", "ts", Seq("x"))
      .orderBy(col("ts")).select("ts", "matched_x")
      .as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((5L, Some("at10")), (10L, Some("at10")), (100L, None)))
  }

  test("forward tiebreak: smallest wins among equal right timestamps") {
    val left = Seq((1L, 5L)).toDF("k", "ts")
    val right = Seq((1L, 7L, "b"), (1L, 7L, "a")).toDF("k", "ts", "x")
    val out = AsOfJoin.forward(left, right, "k", "ts", Seq("x"), tiebreak = Seq("x"))
      .select("matched_x").as[String].head()
    assert(out == "a") // mirror of backward's greatest-wins
  }

  test("nearest picks the closer side and ties to backward") {
    val left = Seq((1L, 10L), (1L, 14L), (1L, 15L), (1L, 2L), (2L, 1L))
      .toDF("k", "ts")
    val right = Seq((1L, 8L, "b8"), (1L, 20L, "f20")).toDF("k", "ts", "x")
    val out = AsOfJoin.nearest(left, right, "k", "ts", Seq("x"))
      .orderBy(col("k"), col("ts"))
      .select("k", "ts", "matched_x", "matched_dir")
      .as[(Long, Long, Option[String], Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, 2L, Some("b8"), Some("forward")),    // nothing behind; next is ts=8
      (1L, 10L, Some("b8"), Some("backward")),  // gap 2 vs 10
      (1L, 14L, Some("b8"), Some("backward")),  // equal gaps 6/6 -> backward
      (1L, 15L, Some("f20"), Some("forward")),  // gap 7 vs 5
      (2L, 1L, None, None)))                    // no right rows for key
  }

  test("nearest resolves SUB-SECOND timestamp gaps (microsecond precision)") {
    // regression: cast("long") truncates timestamps to whole seconds, so a
    // left row 100 ms after one right row and 400 ms before another saw
    // equal (0) gaps and could pick the farther side
    def t(ms: Long) = new Timestamp(ms)
    val left = Seq((1L, t(1100))).toDF("k", "ts") // 1.100 s
    val right = Seq(
      (1L, t(1000), "b100ms"),                    // 100 ms behind
      (1L, t(1500), "f400ms")).toDF("k", "ts", "x") // 400 ms ahead
    val out = AsOfJoin.nearest(left, right, "k", "ts", Seq("x"))
      .select("matched_x", "matched_dir").as[(String, String)].head()
    assert(out == (("b100ms", "backward")),
      s"sub-second gap must pick the 100 ms side, got $out")
  }

  test("nearest supports DateType ts columns") {
    // regression: DATE->BIGINT casts are illegal in Spark, so a DateType
    // ts column used to throw AnalysisException in nearest (backward and
    // forward never convert and were fine); dates now go through
    // unix_date. Gap math: 2020-01-10 is 3 days from the 01-07 row and
    // 5 days from the 01-15 row.
    def d(s: String) = java.sql.Date.valueOf(s)
    val left = Seq((1L, d("2020-01-10"))).toDF("k", "ts")
    val right = Seq(
      (1L, d("2020-01-07"), "b3d"),
      (1L, d("2020-01-15"), "f5d")).toDF("k", "ts", "x")
    val out = AsOfJoin.nearest(left, right, "k", "ts", Seq("x"))
      .select("matched_x", "matched_dir").as[(String, String)].head()
    assert(out == (("b3d", "backward")), s"date gaps must compare in days, got $out")
  }
}
