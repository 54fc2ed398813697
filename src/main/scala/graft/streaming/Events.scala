package graft.streaming

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the custom-state sessionizer. */
case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value_cents: Long)

/** Open-session accumulator kept in GroupState (all epoch-millis — the
  * state store serializes product encoders directly). */
case class SessionAcc(start: Long, last: Long, cnt: Long, cents: Long)

/** A closed session emitted by the sessionizer. */
case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, event_cnt: Long,
    total_value_cents: Long)

/** Structured Streaming surface (SURVEY §2.10).
  *
  * The reference is batch-only (full drop/reload); its README lists
  * incremental/real-time refresh as future work. This module supplies
  * that capability Spark-natively: the same event-time hourly aggregation
  * as the batch `event_time_window` query key, expressed as a
  * stream-agnostic transform — apply it to `spark.readStream` sources for
  * incremental execution with watermarked state eviction, or to a batch
  * DataFrame for backfill (identical results, one definition).
  */
object Events {

  /** Hourly tumbling-window counts/sums per event type. Watermark bounds
    * state: late events beyond 2 hours are dropped instead of growing
    * executor state forever — the knob that keeps this runnable on an
    * unbounded stream. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("event_cnt"),
           sum(cents(col("value"))).as("total_value_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("event_cnt"), col("total_value_cents"))

  /** Per-user session rollup via event-time session windows (gap 30 min):
    * the `mapGroupsWithState`-class capability expressed with the
    * built-in session_window operator (codegen'd, AQE-compatible). */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("event_cnt"),
           sum(cents(col("value"))).as("total_value_cents"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
              col("user_id"), col("event_cnt"), col("total_value_cents"))

  /** Exactly-once streaming dedup: drop replayed event_ids inside the
    * watermark horizon (`dropDuplicates` keeps one state entry per id and
    * the watermark evicts ids older than the horizon — bounded state on
    * an unbounded stream). The at-least-once → exactly-once adapter every
    * ingestion front-end needs. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicates("event_id", "ts")

  /** Custom-gap sessionization via flatMapGroupsWithState — the
    * explicit-state twin of `userSessions` for session semantics the
    * built-in session_window can't express (e.g. gap rules that depend on
    * accumulated session content). State is ONE open-session accumulator
    * per user; an event-time timeout at (last event + gap) closes and
    * emits the session once the watermark passes it, so state is bounded
    * by the active-user count, never by history. */
  def sessionizeCustom(events: Dataset[UserEvent],
      gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[UserEvent],
         state: GroupState[SessionAcc]) =>
          def close(a: SessionAcc) = UserSession(uid,
            new java.sql.Timestamp(a.start), new java.sql.Timestamp(a.last),
            a.cnt, a.cents)
          if (evs.isEmpty) {
            // timeout fired: the open session's gap elapsed → emit it
            val out = state.getOption.map(close).toList
            state.remove()
            out.iterator
          } else {
            // micro-batch arrival order is not event-time order — sort the
            // batch before folding (bounded by the batch, not the stream)
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var acc = state.getOption.orNull
            val closed = List.newBuilder[UserSession]
            for (e <- sorted) {
              val t = e.ts.getTime
              if (acc == null) acc = SessionAcc(t, t, 1L, e.value_cents)
              else if (t - acc.last > gapMs) {
                closed += close(acc)
                acc = SessionAcc(t, t, 1L, e.value_cents)
              } else acc = SessionAcc(acc.start, math.max(acc.last, t),
                acc.cnt + 1, acc.cents + e.value_cents)
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.last + gapMs)
            closed.result().iterator
          }
      }
  }
}
