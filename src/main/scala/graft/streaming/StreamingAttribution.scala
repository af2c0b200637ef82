package graft.streaming

import org.apache.spark.sql.DataFrame

/** Continuous click→purchase attribution — the STREAM⋈STREAM interval
  * join face of the events family (the batch as-of operator,
  * [[graft.operators.Events.asofClickValue]], carries the latest click
  * forward; the streaming attribution shape emits every (purchase,
  * preceding click ≤ horizon) pair as soon as both sides have arrived,
  * and any "latest only" refinement is a downstream per-purchase argmax).
  *
  * This is Spark's native stream-stream inner join: both sides carry
  * event-time watermarks and the join condition carries the time-range
  * bound, so the state store holds each side only within the horizon —
  * clicks older than `purchase watermark − horizon` are evicted, state
  * is bounded by in-horizon traffic, and matched pairs emit exactly once
  * in append mode.
  *
  * 100 TB shape: one hash(user) shuffle per side into co-located join
  * state — the same partitioning the batch as-of join uses; no
  * broadcast, no unbounded buffer. The SAME call works on batch frames
  * (watermarks are no-ops in batch), which the spec uses to pin
  * streamed == batch.
  */
object StreamingAttribution {

  /** (purchase_id, user_id, purchase_ts, click_ts, click_value) for every
    * click of the same user within `[purchase_ts − horizon, purchase_ts]`.
    * `clicks` needs (user_id, ts, value); `purchases` needs (event_id,
    * user_id, ts). Streaming frames emit in append mode; batch frames
    * return the same rows eagerly. Delegates to the ONE shared
    * implementation ([[graft.operators.Events.attributionPairs]]) the
    * oracle-checked `events_attribution` batch query also runs. */
  def pairs(clicks: DataFrame, purchases: DataFrame,
            horizon: String = "1 hour",
            allowedLateness: String = "0 seconds"): DataFrame =
    graft.operators.Events.attributionPairs(clicks, purchases, horizon, allowedLateness)
}
