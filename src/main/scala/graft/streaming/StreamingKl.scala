package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Corpus

/** Continuous distribution-drift monitoring — the online face of
  * [[graft.operators.Corpus.klProbe]]: the reference unigram model
  * freezes on a corpus snapshot ([[Corpus.klModelFromCounts]]) and every
  * arriving micro-batch scores its per-source KL against it through the
  * SAME [[Corpus.klScoreAgainst]] arithmetic the oracle-checked probe
  * uses — a crawl whose token distribution drifts away from the resident
  * corpus alarms while still in flight, not after admission
  * (`StreamingKlSpec` pins streamed == batch per slice).
  *
  * Design: foreachBatch, for the same reason as [[StreamingDsir]] —
  * scoring is stateless across batches (each batch is its own sample of
  * the incoming distribution; cross-batch accumulation is a serving-side
  * rollup decision) and the model side is a tiny static frame attached
  * by broadcast.
  *
  * 100 TB shape: per-trigger cost is one map-side-combined (source,
  * word) count of the micro-batch plus broadcast joins against the
  * V-row frozen model — O(batch · tokens), independent of corpus size. */
object StreamingKl {

  /** Start the scorer. `documents` must be a STREAMING frame with
    * (doc_id long, text string, source string); `model` a static
    * [[Corpus.klModelFromCounts]]-shaped frame. `sink` receives
    * (batchId, (source, vocab_tokens, n_vocab_present, kl_nats) frame)
    * per trigger. */
  def run(documents: DataFrame, model: DataFrame, checkpointDir: String,
          queryName: String = "graft_streaming_kl",
          trigger: Trigger = Trigger.ProcessingTime(0))(
          sink: (Long, DataFrame) => Unit): StreamingQuery =
    documents.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, Corpus.klScoreAgainst(model, batch))
      }
      .start()
}
