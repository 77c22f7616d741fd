package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the stateful operators (the events schema of
  * FIXTURES.md, as a case class so `Encoder` derivation is automatic). */
case class EventRow(ts: java.sql.Timestamp, user_id: Long, event_type: String,
  value: Double, event_id: Long)

/** Accumulating per-user session state for [[EventsStream.sessionizeStateful]]. */
case class SessionState(start: Long, lastTs: Long, n: Long, sumCents: Long)

/** A closed session emitted by [[EventsStream.sessionizeStateful]]. */
case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
  n_events: Long, sum_value: Double)

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

  /** CUSTOM-STATE sessionization via `flatMapGroupsWithState` — the
    * §2.B.10/§2.B.11 extension point Spark's built-in `session_window`
    * cannot reach when per-session state is richer than an aggregate
    * (here it also demonstrates the API; the emitted sessions match
    * `session_window` exactly, which the spec asserts).
    *
    * Semantics: per-user sessions split on gaps ≥ `gapMinutes`
    * (matching `session_window`'s half-open [start, start+gap) merge
    * rule); money is accumulated in integer cents (the determinism
    * doctrine — partial sums in any order). A session is emitted when a
    * later event proves the gap, or on event-time timeout once the
    * watermark passes `lastTs + gap` — so state size is
    * O(active users), GC'd by the same watermark that bounds
    * correctness. Scale: one shuffle on user_id (the groupByKey), state
    * store per partition, no driver involvement.
    */
  def sessionizeStateful(events: Dataset[EventRow], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def close(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new java.sql.Timestamp(s.start), s.n, s.sumCents / 100.0)

    def update(userId: Long, rows: Iterator[EventRow],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // watermark passed lastTs + gap: the open session is final
        val out = close(userId, state.get)
        state.remove()
        Iterator.single(out)
      } else {
        val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
        var cur = state.getOption
        // event-time order within the batch (micro-batches deliver
        // unordered); events older than an emitted session boundary are
        // late beyond the watermark and were already dropped upstream
        rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
          val t = r.ts.getTime
          val cents = math.round(r.value * 100)
          cur match {
            case Some(s) if t - s.lastTs < gapMs =>
              cur = Some(SessionState(s.start, t, s.n + 1, s.sumCents + cents))
            case Some(s) =>
              out += close(userId, s)
              cur = Some(SessionState(t, t, 1, cents))
            case None =>
              cur = Some(SessionState(t, t, 1, cents))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastTs + gapMs)
        }
        out.iterator
      }
    }

    events.withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
