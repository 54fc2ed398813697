package graft.streaming

import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
