package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Continuous cluster assignment — the online face of the trained
  * quantizer: vectors arrive as a stream and every micro-batch is
  * assigned to its nearest frozen [[Similarity.kmeansCentroids]] centroid
  * through the SAME bit-exact [[Similarity.kmeansProbe]] argmin the
  * training loop and the oracle-checked `sim_kmeans_train` /
  * `sim_ivf_trained_topk` queries use, so a streamed vector gets exactly
  * the batch assignment (`StreamingKmeansAssignSpec`). The
  * train-offline / assign-online split is the standard deployment of a
  * clustering model (routing new documents to index shards, tagging
  * incoming embeddings with their IVF list before upsert).
  *
  * Design: foreachBatch, for the same reason as [[StreamingAnnProbe]] —
  * assignment is stateless across batches (each vector is routed within
  * the trigger it arrives in), and the centroid side is a tiny static
  * broadcast frame.
  *
  * 100 TB shape: per-trigger cost is one map-only scan of the
  * micro-batch against K broadcast centroids — O(batch · K · dim),
  * independent of corpus size. */
object StreamingKmeansAssign {

  /** Start the assigner. `vectors` must be a STREAMING frame with
    * (vec_id long, v array<double>); `centroids` a static (cent_id, cv)
    * frame ([[Similarity.kmeansCentroids]]). `sink` receives
    * (batchId, (vec_id, cent_id, d2) frame) per trigger. */
  def run(vectors: DataFrame, centroids: DataFrame, checkpointDir: String,
          queryName: String = "graft_streaming_kmeans",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    vectors.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, Similarity.kmeansProbe(centroids, batch))
      }
      .start()
}
