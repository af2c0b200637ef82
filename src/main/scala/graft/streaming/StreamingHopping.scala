package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Continuous hopping-window counts — the streaming face of
  * [[Events.hoppingCounts]] (Kafka Streams' hopping windows, e.g.
  * `TimeWindows.ofSizeWithNoGrace(1h).advanceBy(15m)`): the SAME native
  * sliding `window()` expression as batch, under a watermark, so each
  * overlapping window is emitted exactly once when the watermark passes
  * its end (append mode). Batch and streaming share the window-assignment
  * expression, so a closed streaming window carries exactly the rows the
  * batch query reports for that window — pinned in
  * `StreamingHoppingSpec`.
  *
  * 100 TB shape: identical to batch — the hop assignment is a map-local
  * `Expand` (constant ×(size/advance) multiply), then one
  * hash((window, type)) shuffle into the windowed-aggregate state store;
  * state is bounded by the watermark horizon × open windows per key.
  */
object StreamingHopping {

  /** Per-closed-window (event_type) counts and value mass. `events` must
    * be a STREAMING frame with (ts timestamp, event_type, value); emit is
    * append-mode on watermark close. Output: (win_start_us, event_type,
    * n_events, value_sum) — the batch face's exact schema. */
  def hoppingCounts(events: DataFrame, allowedLateness: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", allowedLateness)
      .groupBy(
        window(col("ts"),
          s"${Events.HopWindowMinutes} minutes",
          s"${Events.HopAdvanceMinutes} minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("value_sum"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n_events"), col("value_sum"))
}
