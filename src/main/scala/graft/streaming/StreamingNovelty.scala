package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Continuous novelty gate — the streaming face of
  * [[TextAnalysis.probeNovelty]]: documents arrive as a stream, every
  * micro-batch's [[TextAnalysis.NoveltyN]]-grams are probed against a
  * FROZEN gram index of the resident corpus, and each document's
  * (n_grams, n_seen, novelty) goes to the caller's sink — the online
  * admission gate that flags boilerplate/near-copies AT ARRIVAL, before
  * they ever enter the batch dedup pass.
  *
  * foreachBatch for the [[StreamingSurprisal]] reason: the probe ends in
  * a per-document aggregation that is trivially correct per micro-batch
  * against a static index — no cross-batch state exists.
  *
  * 100 TB shape: the index side is built once (a persisted distinct-gram
  * table, bucketed on gram); per-trigger work is O(batch) gram cells
  * joined against it on hash(gram). */
object StreamingNovelty {

  /** Start the continuous gate. `incoming` must be a STREAMING frame
    * with (doc_id long, text string); `index` is
    * [[TextAnalysis.buildGramIndex]]'s (gram) table; `sink` receives
    * (batchId, scored) per trigger. */
  def run(incoming: DataFrame, index: DataFrame,
          checkpointDir: String,
          queryName: String = "graft_streaming_novelty",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, TextAnalysis.probeNovelty(index, batch))
      }
      .start()
}
