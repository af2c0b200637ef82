package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous growth accounting — the streaming face of
  * [[graft.operators.Events.growthAccounting]]: the per-user state is ONE
  * number (the last active day, O(1) — never a day buffer), and each
  * arriving event's day classifies AT ARRIVAL with the batch family's
  * exact day grain and rules: first day ever → `new`, consecutive day →
  * `retained`, a gap ≥ 2 days → `resurrected` PLUS the retro-emitted
  * `churned` increment at the first silent day (the gap's existence is
  * exactly what proves the churn, so the two increments become known at
  * the same moment). Same-day repeats emit nothing.
  *
  * What the stream cannot emit is the batch face's TERMINAL churn — a
  * user who never returns churns only relative to a corpus-end anchor,
  * which a running stream does not have (the same time-vs-data argument
  * as [[StreamingChurn]]'s read-time segmentation). The spec pins the
  * exact decomposition: batch churn == streamed churn + terminal churns
  * of never-returning users, and the other three kinds match the batch
  * face row-for-row.
  *
  * Delivery contract: per-user (ts, event_id) order across batches, as
  * [[StreamingJourneys]] documents (a keyed topic partition's guarantee);
  * within one batch the operator sorts its slice itself. A late
  * out-of-order day inside the state's past is ignored rather than
  * misclassified.
  *
  * 100 TB shape: one hash(user_id) shuffle — the same exchange the batch
  * face pays — O(1) state per user, append-mode emission of ≤ 2 rows per
  * user-day. The day rollup (counts per day per kind) is an additive
  * downstream aggregation a serving store applies on read or upsert
  * ([[JdbcUpsertSink]] pattern). */
object StreamingGrowth {

  /** The minimal event slice the classifier needs (ts in epoch-µs). */
  case class Ev(event_id: Long, ts: Long, user_id: Long)

  /** Carried per-user state: the last active day index. */
  case class GrowthState(lastDay: Long)

  /** One emitted increment: user u contributes `kind` on `day`. */
  case class Inc(user_id: Long, day: Long, kind: String)

  /** The increment stream. Works on a streaming OR batch Dataset — on a
    * batch frame every user's history folds in one group call, making
    * the spec's parity pin a direct comparison against
    * [[graft.operators.Events.growthAccounting]]. */
  def increments(events: Dataset[Ev]): Dataset[Inc] = {
    import events.sparkSession.implicits._
    val usPerDay = graft.operators.Events.UsPerDay
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[GrowthState, Inc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[GrowthState]) =>
          val out = Seq.newBuilder[Inc]
          var last = state.getOption.map(_.lastDay).getOrElse(Long.MinValue)
          evs.toSeq.map(_.ts / usPerDay).distinct.sorted.foreach { d =>
            if (d > last) {
              if (last == Long.MinValue) out += Inc(user, d, "new")
              else if (d == last + 1) out += Inc(user, d, "retained")
              else {
                out += Inc(user, last + 1, "churned")
                out += Inc(user, d, "resurrected")
              }
              last = d
            } // d <= last: same-day repeat or a late day already absorbed
          }
          if (last != Long.MinValue) state.update(GrowthState(last))
          out.result().iterator
      }
  }
}
