package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A single event on the stream (mirrors the batch `events` table). */
final case class Event(
    event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** One emitted session (the streaming analogue of e02's output rows). */
final case class Session(
    user_id: Long, n_events: Long, start_us: Long, end_us: Long, sum_value: Double)

/** Accumulating per-user session state for the custom-state sessionizer. */
final case class SessionState(
    n_events: Long, start_us: Long, end_us: Long, sum_value: Double)

/** Structured Streaming operators over the event stream — the streaming
  * counterparts of the batch queries e01 (hourly tumbling aggregation) and
  * e02 (30-minute-gap sessionization). The reference is batch-only
  * (SURVEY §2.9), so these are engine extensions: `readStream` →
  * transform → `writeStream` pipelines designed for unbounded input —
  * watermarks bound state, aggregation state lives in the state store, and
  * every operator is partition-parallel on the grouping key.
  */
object EventStreams {

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** e01 as a stream: tumbling 1-hour event-time windows per event type.
    * The watermark lets the store drop windows older than the lateness
    * bound — state stays O(active windows), not O(stream length). */
  def hourlyAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("cnt"), col("sum_value"))

  /** e02 as a stream, declaratively: built-in session windows with a
    * 30-minute gap. Catalyst manages merge/expiry of session state. */
  def sessionizeDeclarative(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stream-stream attribution join: each purchase joins the same user's
    * clicks from the preceding hour. The time-range condition plus
    * watermarks on BOTH sides bound the join state — without them a
    * stream-stream join would buffer each side forever. */
  def attributePurchases(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "click_id", "click_ts", "purchase_ts", "purchase_value")
  }

  /** Streaming exact dedup — the ingest-time guard of a training-data
    * pipeline: drop events whose id was already seen, with the dedup
    * state bounded by the watermark instead of growing forever. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** e02 as a stream with CUSTOM state: flatMapGroupsWithState keyed by
    * user, event-time timeout at watermark + gap. Demonstrates the escape
    * hatch for session semantics the built-ins can't express (e.g. value-
    * dependent gaps). Sessions are emitted when the watermark passes their
    * close; in-flight state is one small record per active user. */
  def sessionizeCustomState(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.n_events, s.start_us, s.end_us, s.sum_value))
          } else {
            // Fold the micro-batch's events into gap-delimited sessions;
            // emit every closed session, keep the open one in state.
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              open match {
                case Some(s) if us - s.end_us <= SessionGapMs * 1000L =>
                  open = Some(SessionState(
                    s.n_events + 1, s.start_us, us, s.sum_value + e.value))
                case Some(s) =>
                  closed += Session(userId, s.n_events, s.start_us, s.end_us, s.sum_value)
                  open = Some(SessionState(1L, us, us, e.value))
                case None =>
                  open = Some(SessionState(1L, us, us, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close the session once the watermark passes its gap
              state.setTimeoutTimestamp(s.end_us / 1000L + SessionGapMs)
            }
            closed.result().iterator
          }
      }
  }
}
