package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Continuous BQ-accelerated similarity search — the streaming face of
  * [[Similarity.bqProbe]]: query vectors arrive as a stream and every
  * micro-batch is probed against a static prepared [[Similarity.BqIndex]]
  * through the SAME [[Similarity.probeHamming]] core the oracle-checked
  * batch query uses, so a streamed query returns exactly the batch answer
  * (`StreamingHammingProbeSpec`, which also drives a
  * [[Similarity.loadBqIndex]]-reopened persisted index).
  *
  * Design: foreachBatch, for the same reason as [[StreamingAnnProbe]] —
  * the probe ends in a bounded per-query top-k aggregation, a shape that
  * is per-batch-correct and stateless across batches (each query is
  * answered within the trigger it arrives in).
  *
  * 100 TB shape: the corpus side is the persisted packed-sign table
  * ([[Similarity.saveBqIndex]] — 8 bytes/vector, 64× smaller than the
  * embedding column, bucketed by vec_id alongside its rerank store);
  * per-trigger work broadcasts only the micro-batch's packed query
  * signatures against it and reads float vectors for the bounded rerank
  * rows alone — O(batch) probe cost at whatever trigger interval the
  * query feed needs, the online-serving-over-offline-index split. */
object StreamingHammingProbe {

  /** Start the probe. `queries` must be a STREAMING frame with
    * (query_id long, qv array<double>, qn double); `index` a prepared
    * [[Similarity.BqIndex]] (built in-session or reopened via
    * [[Similarity.loadBqIndex]]). `sink` receives (batchId, top-k frame)
    * per trigger. */
  def run(queries: DataFrame, index: Similarity.BqIndex,
          checkpointDir: String,
          queryName: String = "graft_streaming_bq",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    queries.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, Similarity.probeHamming(index, batch))
      }
      .start()
}
