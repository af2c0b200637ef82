package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Continuous span-grain ingestion gate — the streaming face of
  * [[Dedup.probeSpans]]: documents arrive as a stream, every micro-batch's
  * positional [[Dedup.MinSpanTokens]]-gram hashes are probed against a
  * FROZEN span index of the resident corpus, and each incoming document's
  * maximal resident-repeating spans (doc_id, span_start, span_tokens,
  * n_positions) go to the caller's sink — the arrival-time twin of
  * `dedup_span_exact`: a crawl batch that lifts a ≥50-token passage from
  * anything already ingested is flagged, with exact span boundaries,
  * before the batch dedup pass ever runs.
  *
  * foreachBatch for the [[StreamingNovelty]] reason: the probe ends in a
  * per-document islands rollup that is trivially correct per micro-batch
  * against a static index — no cross-batch state exists.
  *
  * 100 TB shape: the index side is built once ([[Dedup.buildSpanIndex]] —
  * at scale a persisted distinct-hash table bucketed on gh); per-trigger
  * work is O(batch) gram cells joined against it on the 8-byte hash plus
  * a per-incoming-doc window. The corpus never rescans. */
object StreamingSpanProbe {

  /** Start the continuous gate. `incoming` must be a STREAMING frame with
    * (doc_id long, text string); `index` is [[Dedup.buildSpanIndex]]'s
    * (gh) table; `sink` receives (batchId, spans) per trigger. */
  def run(incoming: DataFrame, index: DataFrame,
          checkpointDir: String,
          queryName: String = "graft_streaming_span_probe",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, Dedup.probeSpans(index, batch))
      }
      .start()
}
