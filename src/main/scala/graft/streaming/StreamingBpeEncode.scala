package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Continuous tokenization — the online face of the trained BPE merge
  * table: documents arrive as a stream and every micro-batch is encoded
  * through the SAME greedy ordered-replay
  * [[TextAnalysis.bpeApply]] the batch path uses, so a streamed document
  * gets exactly the batch encoding (`StreamingBpeEncodeSpec`). The
  * train-offline / encode-online split is the standard deployment of a
  * tokenizer (train merges on a corpus snapshot once, tokenize every
  * newly ingested document with the frozen table — retraining per
  * document would change token ids under the pipeline's feet).
  *
  * Design: foreachBatch, for the same reason as
  * [[StreamingKmeansAssign]] — encoding is stateless across batches and
  * the model side is a tiny static frame packed into a 1-row broadcast.
  *
  * 100 TB shape: per-trigger cost is one map-only scan of the
  * micro-batch folding ≤[[TextAnalysis.BpeMergeRounds]] string
  * replaces per document — O(batch · rounds · doc length), independent
  * of corpus size; documents never shuffle. */
object StreamingBpeEncode {

  /** Start the encoder. `documents` must be a STREAMING frame with
    * (doc_id long, text string); `merges` a static
    * [[TextAnalysis.bpeMerges]]-shaped frame (typically
    * [[TextAnalysis.loadMerges]]). `sink` receives
    * (batchId, (doc_id, encoded, n_tokens, n_words) frame) per trigger. */
  def run(documents: DataFrame, merges: DataFrame, checkpointDir: String,
          queryName: String = "graft_streaming_bpe",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    documents.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, TextAnalysis.bpeApply(merges, batch))
      }
      .start()
}
