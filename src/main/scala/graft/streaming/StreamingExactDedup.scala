package graft.streaming

import org.apache.spark.sql.DataFrame

/** Continuous at-least-once ingestion dedup — the streaming face of
  * [[graft.operators.Events.replayDedup]], expressed with Spark's NATIVE
  * `dropDuplicatesWithinWatermark`: the first arrival of each event_id
  * passes through immediately (append mode), redeliveries within the
  * watermark horizon are dropped, and the id state is evicted once the
  * watermark passes — so state is bounded by the redelivery horizon, not
  * the stream's lifetime (the reason `dropDuplicates` alone is wrong on
  * an unbounded stream: its state never evicts).
  *
  * Exactly the broker-redelivery contract: a transport that can replay a
  * record for at most `delay` after first delivery yields exactly-once
  * downstream. Batch [[graft.operators.Events.replayDedup]] keeps the
  * deterministic earliest copy for the ledger; the streaming face keeps
  * the FIRST ARRIVAL (identical whenever redeliveries carry later
  * event times, as broker retries do — pinned in
  * `StreamingExactDedupSpec`).
  *
  * 100 TB shape: one hash(event_id) shuffle into the dedup state store;
  * per-key state is one timestamp, evicted at the watermark. */
object StreamingExactDedup {

  /** `events` must be a STREAMING frame with (ts timestamp, event_id,
    * ...); `delay` is the maximum redelivery lateness to absorb. */
  def dedup(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
}
