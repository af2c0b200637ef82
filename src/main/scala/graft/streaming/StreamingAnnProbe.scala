package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Continuous similarity search — the streaming face of
  * [[Similarity.annLshTopK]]: query vectors arrive as a stream and every
  * micro-batch is probed against a static prepared corpus through the
  * SAME [[Similarity.annProbe]] the oracle-checked batch query uses, so
  * a streamed query returns exactly the batch answer
  * (`StreamingAnnProbeSpec`).
  *
  * Design: foreachBatch, for the same reason as
  * [[StreamingDedup]] — the probe ends in a bounded per-query top-k
  * aggregation, a shape that is per-batch-correct and stateless across
  * batches (each query is answered within the trigger it arrives in).
  *
  * 100 TB shape: the corpus side is the persisted embedding table (at
  * scale: pre-banded and bucketed); per-trigger work broadcasts only the
  * micro-batch's banded signatures against it — O(batch) probe cost at
  * whatever trigger interval the query feed needs, the classic
  * online-serving-over-offline-index split. */
object StreamingAnnProbe {

  /** Start the probe. `queries` must be a STREAMING frame with
    * (query_id long, qv array<double>, qn double); `corpus` a static
    * (vec_id, v, nrm) frame ([[Similarity.annCorpus]]). `sink` receives
    * (batchId, top-k frame) per trigger. */
  def run(queries: DataFrame, corpus: DataFrame, checkpointDir: String,
          queryName: String = "graft_streaming_ann",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    queries.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, Similarity.annProbe(corpus, batch))
      }
      .start()
}
