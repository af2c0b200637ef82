package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.Events

/** Continuous bot/abuse monitor — the streaming face of
  * [[graft.operators.Events.botFlag]], because traffic hygiene is only
  * worth much in real time: per-user keyed state tracks the burst
  * signal exactly (current minute, its count, the running maximum) and
  * the metronome signal in O(1) as the LONGEST RUN of identical
  * consecutive gaps. The burst columns are bit-equal to the batch
  * query's (pinned in `StreamingBotFlagSpec`); the regularity signal is
  * the documented face divergence — the batch side ranks the full
  * per-gap histogram (order-free, needs the whole day), the stream
  * keeps a 2-number run tracker (order-sensitive, O(1) state) — and
  * both fire on the timer-driven client that motivates the operator.
  *
  * Arrival-order contract: events are folded in (ts, event_id) order
  * WITHIN a batch (the group buffer is per-(user, batch) — bounded by
  * micro-batch size, never corpus-sized) and batches are assumed
  * time-ordered per user across triggers, the same ordered-ingest
  * assumption as `StreamingJourneys` — gap continuity across the batch
  * boundary is exactly what the carried (last_ts, last_gap, run) state
  * buys.
  *
  * 100 TB shape: one hash(user) shuffle per micro-batch, O(1) state per
  * user (nine numbers), update-mode emission of touched users only. */
object StreamingBotFlag {

  /** The event slice the monitor needs (ts in epoch-µs). */
  case class Ev(event_id: Long, ts: Long, user_id: Long)

  /** Carried per-user state == emitted row. */
  case class BotState(user_id: Long, last_ts: Long, cur_minute: Long,
                      cur_minute_n: Long, max_per_min: Long, n_events: Long,
                      last_gap: Long, run_len: Long, max_run: Long,
                      is_bot: Boolean)

  /** Identical-gap run length that trips the streaming metronome flag —
    * [[Events.BotMinGaps]] consecutive equal gaps, the run-form analogue
    * of the batch side's share cut. */
  val BotRunFlag: Long = Events.BotMinGaps

  private def fold(st: BotState, ts: Long): BotState = {
    val minute = Math.floorDiv(ts, Events.UsPerMinute)
    val (cm, cn) =
      if (minute == st.cur_minute) (st.cur_minute, st.cur_minute_n + 1)
      else (minute, 1L)
    val gap = if (st.n_events == 0) -1L else ts - st.last_ts
    val (lg, run) =
      if (gap < 0) (st.last_gap, st.run_len)
      else if (gap == st.last_gap) (gap, st.run_len + 1)
      else (gap, 1L)
    val maxRun = math.max(st.max_run, run)
    val maxMin = math.max(st.max_per_min, cn)
    BotState(st.user_id, ts, cm, cn, maxMin, st.n_events + 1, lg, run, maxRun,
      maxMin >= Events.BotBurstPerMin || maxRun >= BotRunFlag)
  }

  /** The updated-monitor stream: one row per touched user per trigger.
    * Works on a streaming OR batch Dataset — on a batch frame every
    * user folds in one group call, making the spec's burst-parity pin a
    * direct equality against [[Events.botFlag]]. */
  def monitor(events: Dataset[Ev]): Dataset[BotState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[BotState, BotState](GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[BotState]) =>
          val init = state.getOption.getOrElse(
            BotState(user, Long.MinValue, Long.MinValue, 0L, 0L, 0L, -1L, 0L,
              0L, is_bot = false))
          val st = evs.toSeq.sortBy(e => (e.ts, e.event_id))
            .foldLeft(init)((s, e) => fold(s, e.ts))
          state.update(st)
          st
      }
  }
}
