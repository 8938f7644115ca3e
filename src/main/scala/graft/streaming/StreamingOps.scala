package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.2 streaming rows; the analog of
  * the reference's pipe-based incremental processing, index.js:77).
  *
  * Every transform takes a DataFrame that may be batch or streaming — the
  * same declarative plan runs in both modes, which is how the operators are
  * unit-tested (StreamingSpec drives them through MemoryStream + memory
  * sink) while staying deployable with file/kafka sources and checkpoints.
  *
  * Scale notes: watermarks bound the state store (late rows beyond the
  * delay are dropped); all aggregations are keyed so state partitions by
  * the shuffle key; `flatMapGroupsWithState` state is per-key constant
  * size.
  */
object StreamingOps {

  /** Schema of the events table for `readStream` (ts arrives as raw nanos
    * when reading the driver parquet — see graft.Tables.events). */
  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Tumbling-window counts/sums per event type, late data beyond 10
    * minutes dropped. Append-mode compatible (watermarked window key). */
  def tumblingCounts(events: DataFrame, size: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), size).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window distinct-ish user activity. */
  def slidingUserCounts(events: DataFrame, size: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), size, slide).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("user_id"), col("n"))

  /** Session windows per user with an inactivity gap — the streaming form
    * of q26; state closes (and emits) once the watermark passes the gap. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup on event_id: watermark bounds the id state. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id", "ts")

  /** Per-user purchase anomaly detector via flatMapGroupsWithState: emits
    * an alert row whenever a purchase exceeds `factor` x the user's running
    * mean purchase value. Custom keyed state = (count, sum) — constant per
    * user. */
  final case class SpendState(n: Long, sum: Double)
  final case class Alert(user_id: Long, event_id: Long, value: Double, mean_before: Double)

  def purchaseAnomalies(events: Dataset[Event], factor: Double = 3.0): Dataset[Alert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SpendState, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SpendState]) =>
          var st = state.getOption.getOrElse(SpendState(0L, 0.0))
          val alerts = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
            val alert =
              if (st.n > 0 && e.value > factor * (st.sum / st.n))
                Some(Alert(userId, e.event_id, e.value, st.sum / st.n))
              else None
            st = SpendState(st.n + 1, st.sum + e.value)
            alert
          }
          state.update(st)
          alerts.iterator
      }
  }

  /** Stream-stream interval join: purchases joined to the errors that
    * follow them within 10 minutes for the same user (the streaming form of
    * q22). Both sides are watermarked so the state store can discard
    * buffered rows once the event-time bound passes — the join condition's
    * time range is what makes the state finite. */
  def purchaseErrorJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"))
      .withWatermark("pts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("ets"))
      .withWatermark("ets", "10 minutes")
    purchases.join(errors,
      col("p_user") === col("e_user") &&
        col("ets") >= col("pts") &&
        col("ets") < col("pts") + expr("INTERVAL 10 MINUTES"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("pts"), col("ets"))
  }

  /** Stream-static enrichment: a streaming fact joined to a static
    * dimension frame — planned as a broadcast join per micro-batch, no
    * streaming state at all. */
  def enrichWithStatic(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")

  /** File-source stream over a directory of parquet events (raw nanosecond
    * ts converted like the batch loader). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
