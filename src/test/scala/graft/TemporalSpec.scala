package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the interval-consolidation operator
  * (q112): the synthetic corpus exercises it at volume under the oracle,
  * this pins the merge rules — overlap, touch, nesting, gaps — and the
  * single-shuffle plan. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def islands(iv: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long, Long)] = {
    // mirror of the q112 plan over explicit (user, start, end) micros
    val df = iv.toDF("user_id", "st", "en")
    val ord = Window.partitionBy(col("user_id")).orderBy(col("st"), col("en"))
    df.withColumn("prev_end", max(col("en")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("st") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("s"), max(col("en")).as("e"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("interval merge: overlap and touch fuse, nesting absorbs, gaps split") {
    val got = islands(Seq(
      (1L, 0L, 10L),   // island 1…
      (1L, 5L, 20L),   // overlaps -> fuses
      (1L, 20L, 30L),  // touches (start == prev end) -> fuses
      (1L, 22L, 25L),  // nested -> absorbed
      (1L, 31L, 40L),  // gap of 1 -> island 2
      (2L, 0L, 1L)))   // separate user
    assert(got == Seq(
      (1L, 1L, 0L, 30L, 4L),
      (1L, 2L, 31L, 40L, 1L),
      (2L, 1L, 0L, 1L, 1L)))
  }

  test("q112 runs in ONE shuffle: windows and final aggregate share the user partitioning") {
    val plan = SparkEntry.queries("q112_interval_merge")(spark, SF)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q132 journeys assemble in event order with deterministic tie-breaks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("journeys").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // user 1: view -> click -> purchase -> error (4th is cut); user 2:
    // two SAME-ts events where event_id breaks the tie; user 3: one event
    Seq(
      (101L, ts(10), 1L, "view", 0.0, "{}"),
      (102L, ts(20), 1L, "click", 0.0, "{}"),
      (103L, ts(30), 1L, "purchase", 0.0, "{}"),
      (104L, ts(40), 1L, "error", 0.0, "{}"),
      (202L, ts(10), 2L, "click", 0.0, "{}"),
      (201L, ts(10), 2L, "view", 0.0, "{}"),
      (301L, ts(10), 3L, "signup", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q132_user_journeys")(spark, dir)
      .as[(String, Long)].collect().toSet
    // user 2's same-ts pair orders by event_id: 201 (view) before 202
    assert(got == Set(("view>click>purchase", 1L), ("view>click", 1L),
      ("signup", 1L)))
  }

  test("q135 flags exactly the planted spike, after a full trailing window") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("anomaly").toString
    def ts(hour: Int, i: Int) =
      new java.sql.Timestamp(hour * 3600000L + i * 1000L)
    // hours 0..23: 4 events each (dead-flat baseline); hour 24: 50-event
    // spike. Hours 0..23 have no complete trailing window -> only hour 24
    // is eligible, and it must flag (sigma = 0, any deviation trips)
    val rows = (for (h <- 0 until 24; i <- 0 until 4) yield (h, i)) ++
      (for (i <- 0 until 50) yield (24, i))
    rows.zipWithIndex.map { case ((h, i), id) =>
      (id.toLong, ts(h, i), 1L, "view", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q135_anomaly_detection")(spark, dir)
      .collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got.head
    assert(r.getString(0) == "view")
    assert(r.getLong(2) == 50L && r.getLong(3) == 96L)
  }
}
