package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ✚ Structured Streaming extension (SURVEY §2.B.10). The reference has
  * zero streaming constructs — its freshness model is batch rebuild
  * gated on a checksum (A16/A17) — so these are declared extensions for
  * the `events`-shaped stream, never reference parity.
  *
  * Each transform takes a (possibly streaming) DataFrame with the
  * events schema (ts timestamp, user_id long, event_type string,
  * value double, event_id long) and returns a plan that runs both in
  * batch and incrementally under `readStream`/`writeStream` — the same
  * declarative plan, which is the point: Catalyst handles incremental
  * state (partial aggregates, watermark GC) without a custom engine.
  */
object EventsStream {

  /** Tumbling-window counts with late-data drop via watermark. */
  def tumblingCounts(events: DataFrame, window_ : String = "10 minutes",
      watermark: String = "15 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "15 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("cnt"))

  /** Session windows (30-minute gap) per user. */
  def sessionize(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Stateful dedup bounded by the watermark (the streaming analogue of
    * exact dedup — state is GC'd past the watermark, so it scales). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
}
