package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous churn board — the streaming face of
  * [[graft.operators.Events.churnSegments]]: a per-user activity ledger
  * (last seen, event count, purchase-value mass) maintained as keyed
  * state with `mapGroupsWithState`, emitting each user's UPDATED ledger
  * row per micro-batch. A downstream consumer upserts those rows into a
  * serving table (the [[JdbcUpsertSink]] pattern) and derives the
  * segment rollup on read via [[graft.operators.Events.segmentsOfLedger]]
  * — the segment CASE is the same single definition the batch query
  * uses, so the boundaries cannot drift between faces.
  *
  * Why a ledger and not streamed segment counts: a user's segment decays
  * with TIME, not with data — a user flips active→churned without any
  * new event arriving, so no event-driven operator can emit the final
  * segmentation. The scalable contract is exactly what warehouses do:
  * keep the additive, event-driven part (the ledger) incrementally
  * correct, and evaluate the time-dependent CASE at read time against
  * the anchor of the moment.
  *
  * 100 TB shape: state is O(1) per user (three numbers — never a buffer
  * of events), the one shuffle is hash(user_id), and emission is
  * update-mode: only users touched by the batch re-emit. Restart-safe
  * under checkpointing like every keyed-state face in this repo
  * (`DurableStateSpec` pattern). */
object StreamingChurn {

  /** The event slice the ledger needs (ts in epoch-µs, as
    * [[graft.sources.Tables.events]] normalizes). */
  case class Ev(event_id: Long, ts: Long, user_id: Long,
                event_type: String, value: Double)

  /** Carried per-user state == emitted row. last_ts is a max, the other
    * two are sums — all three merge associatively, so per-batch folding
    * order inside a group is irrelevant. */
  case class UserLedger(user_id: Long, last_ts: Long, n_events: Long,
                        purchase_value: Double)

  /** The updated-ledger stream. Works on a streaming OR batch Dataset —
    * on a batch frame every user folds in one group call, which makes
    * the spec's parity pin a direct equality against the batch
    * groupBy(user) aggregate. */
  def ledger(events: Dataset[Ev]): Dataset[UserLedger] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserLedger, UserLedger](GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[UserLedger]) =>
          var st = state.getOption.getOrElse(UserLedger(user, Long.MinValue, 0L, 0.0))
          evs.foreach { e =>
            st = UserLedger(user, math.max(st.last_ts, e.ts), st.n_events + 1,
              st.purchase_value +
                (if (e.event_type == "purchase") e.value else 0.0))
          }
          state.update(st)
          st
      }
  }

  /** Read-time segmentation of a ledger snapshot — delegates to the
    * batch family's single rollup definition. */
  def segments(ledgerSnapshot: DataFrame): DataFrame =
    graft.operators.Events.segmentsOfLedger(ledgerSnapshot)
}
