package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Continuous surprisal scoring — the streaming face of
  * [[TextAnalysis.probeSurprisal]]: documents arrive as a stream, every
  * micro-batch is scored against a FROZEN [[TextAnalysis.UnigramModel]]
  * of the reference corpus, and each document's (n_tokens,
  * cross_entropy, perplexity) goes to the caller's sink exactly once per
  * batch — the online form of CCNet's reference-LM quality filter.
  *
  * foreachBatch, not a stream-static join chain, for the same reason as
  * [[StreamingDedup]]: the probe ends in a per-document aggregation,
  * which is trivially correct per micro-batch (documents are scored in
  * the batch they arrive in; the model is static, so no cross-batch
  * state exists).
  *
  * 100 TB shape: the model side is built once (at scale, a persisted
  * term-frequency table); per-trigger work is O(batch) tokens joined
  * against it. */
object StreamingSurprisal {

  /** Start the continuous scorer. `incoming` must be a STREAMING frame
    * with (doc_id long, text string); `sink` receives (batchId, scored)
    * per trigger. */
  def run(incoming: DataFrame, model: TextAnalysis.UnigramModel,
          checkpointDir: String,
          queryName: String = "graft_streaming_surprisal",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, TextAnalysis.probeSurprisal(model, batch))
      }
      .start()

  /** The bigram-backoff variant: identical loop, scoring each micro-batch
    * through [[TextAnalysis.probeBigramSurprisal]] against a FROZEN
    * [[TextAnalysis.BigramModel]] — the model tables are staged once;
    * per-trigger work joins only the batch's tokens against them. */
  def runBigram(incoming: DataFrame, model: TextAnalysis.BigramModel,
                checkpointDir: String,
                queryName: String = "graft_streaming_bigram_surprisal",
                trigger: Trigger = Trigger.ProcessingTime(0))(
                sink: (Long, DataFrame) => Unit): StreamingQuery =
    incoming.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, TextAnalysis.probeBigramSurprisal(model, batch))
      }
      .start()
}
