package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Corpus

/** Continuous importance weighting — the online face of the trained
  * DSIR bucket model: documents arrive as a stream and every micro-batch
  * is scored through the SAME [[Corpus.dsirScore]] arithmetic the
  * oracle-checked `corpus_dsir_weights` query uses, so a streamed
  * document gets exactly the batch log weight (`StreamingDsirSpec`).
  * The train-offline / score-online split is how importance resampling
  * deploys: estimate the target/raw bucket models on a corpus snapshot
  * once, then weigh every newly crawled document with the frozen model —
  * re-estimating per batch would let the selection distribution drift
  * with the crawl.
  *
  * Design: foreachBatch, for the same reason as [[StreamingBpeEncode]] —
  * scoring is stateless across batches and the model side is a tiny
  * static frame attached by broadcast.
  *
  * 100 TB shape: per-trigger cost is one map-only feature projection of
  * the micro-batch plus a broadcast join against [[Corpus.DsirBuckets]]
  * model rows — O(batch · grams), independent of corpus size. */
object StreamingDsir {

  /** Start the scorer. `documents` must be a STREAMING frame with
    * (doc_id long, text string); `model` a static
    * [[Corpus.dsirModel]]-shaped frame (typically
    * [[Corpus.loadDsirModel]]). `sink` receives
    * (batchId, (doc_id, n_feats, log_weight) frame) per trigger. */
  def run(documents: DataFrame, model: DataFrame, checkpointDir: String,
          queryName: String = "graft_streaming_dsir",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    documents.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, Corpus.dsirScore(model, batch))
      }
      .start()
}
