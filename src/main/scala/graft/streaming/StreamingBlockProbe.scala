package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Multimodal

/** Continuous binary ingestion gate — the streaming face of
  * [[Multimodal.probeBlocks]]: multimodal records arrive as a stream,
  * every micro-batch's content-block hashes are probed against a FROZEN
  * block index of the resident store, and each record's (n_blocks,
  * n_seen, resident_frac) goes to the caller's sink — re-uploads and
  * re-containered payloads are flagged AT ARRIVAL, before a byte is
  * decoded.
  *
  * foreachBatch for the [[StreamingNovelty]] reason: the probe ends in a
  * per-record rollup that is trivially correct per micro-batch against a
  * static index — no cross-batch state exists.
  *
  * 100 TB shape: the index side is built once
  * ([[Multimodal.buildBlockIndex]] — at scale a persisted distinct-hash
  * table bucketed on bh); per-trigger work is O(batch) block cells joined
  * on the 8-byte hash. Payload bytes never shuffle — only their block
  * hashes. */
object StreamingBlockProbe {

  /** Start the continuous gate. `incoming` must be a STREAMING frame with
    * (doc_id long, text string) — the same documents-shaped source
    * [[Multimodal.records]] views as binary payloads; `index` is
    * [[Multimodal.buildBlockIndex]]'s (bh) table; `sink` receives
    * (batchId, scored) per trigger. */
  def run(incoming: DataFrame, index: DataFrame,
          checkpointDir: String,
          queryName: String = "graft_streaming_block_probe",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, Multimodal.probeBlocks(index, batch))
      }
      .start()
}
