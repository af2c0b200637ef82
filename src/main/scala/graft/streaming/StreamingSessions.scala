package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Continuous sessionization — the streaming face of
  * [[Events.sessionize]], expressed with Spark's NATIVE session windows:
  * `session_window(ts, gap)` merges events into per-key dynamic windows
  * that close when the watermark passes last-event + gap, so completed
  * sessions are emitted exactly once in append mode (no foreachBatch, no
  * custom state — the engine's state store does the merging).
  *
  * Batch [[Events.sessionize]] numbers sessions 1..n per user for the
  * ledger; the streaming view keys sessions by their window instead
  * (start/end ARE the session identity once numbering can't be assigned
  * retroactively on an unbounded stream). Same gap constant, so a closed
  * streaming session covers exactly the events one batch session does —
  * pinned in `StreamingSessionsSpec`.
  *
  * 100 TB shape: state is per (user, open-session) — bounded by active
  * users within the gap horizon, evicted at watermark; the one shuffle is
  * hash(user_id), as in batch.
  */
object StreamingSessions {

  /** Per-closed-session rollup: (user_id, session_start, session_end,
    * n_events, n_errors, total_value). `events` must be a STREAMING frame
    * with (ts timestamp, user_id, event_type, value); emit is append-mode
    * on watermark close. `allowedLateness` mirrors the transit jobs'
    * zero-grace default. */
  def sessionStats(events: DataFrame, allowedLateness: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", allowedLateness)
      .groupBy(
        session_window(col("ts"), s"${Events.SessionGapMinutes} minutes"),
        col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        sum("value").as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("n_errors"), col("total_value"))
}
