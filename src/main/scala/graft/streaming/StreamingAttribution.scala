package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * return the same rows eagerly. */
  def pairs(clicks: DataFrame, purchases: DataFrame,
            horizon: String = "1 hour",
            allowedLateness: String = "0 seconds"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", allowedLateness)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", allowedLateness)
    p.join(c, expr(
        s"""c_user = p_user AND
           |click_ts <= purchase_ts AND
           |click_ts >= purchase_ts - INTERVAL $horizon""".stripMargin))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"), col("click_value"))
  }
}
