package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression — the custom-state twin of
  * [[graft.operators.Cohorts.funnel]]: the batch operator computes
  * each user's strictly-after step chain with a cascade of per-step
  * min aggregates over FULL history; a stream folds the same chain
  * forward instead, because under per-user event-time order the
  * cascade IS a forward fold — step i's earliest valid completion is
  * final the moment it happens (no later event can lower an
  * already-minimal time), so each completion can be EMITTED
  * append-only and never revised. That finality is what makes the
  * funnel streamable at all: per-user DEPTH keeps changing (wrong for
  * Append mode), per-step COMPLETION does not.
  *
  * State per user: one long per funnel step (the completion time, or
  * unset) — constant size, the [[TransitionStream]] argument. Non-step
  * events pass through statelessly. The strictly-after tie rule is the
  * batch twin's: an event at exactly the previous step's completion
  * microsecond does NOT advance (engine-portable ordering, q73's pin).
  *
  * Ordering contract (same notch as [[TransitionStream]]): exact
  * within a micro-batch (sorted by (ts, event id)); across batches the
  * carried state assumes per-user event-time order — a step event
  * arriving BEHIND its user's already-completed step cannot retro-open
  * a chain the stream already emitted. FunnelStreamSpec drains
  * time-split batches and pins the depth census ≡ the batch funnel.
  *
  * The funnel report itself is a downstream aggregation of the emitted
  * completions (max step per user + the user census), so the stateful
  * stage stays O(users · steps) forever and the counting stays
  * partial-aggregated.
  */
object FunnelStream {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)

  /** Constant per-user state: completion time per step;
    * Long.MinValue = not reached. */
  final case class StepTimes(ts: Array[Long])

  final case class Completion(user_id: Long, step_idx: Int,
      step: String, ts_us: Long)

  /** One append-only row per (user, step) completion, from a stream
    * (or an AvailableNow-drained frame) with columns
    * (user_id, ts_us, event_id, event_type). */
  def completions(events: DataFrame, steps: Seq[String])
      : Dataset[Completion] = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnel: steps must be non-empty and distinct, got $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val n = steps.size
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts_us").cast("long").as("ts_us"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"))
      // non-step events carry no funnel information — drop them BEFORE
      // the stateful exchange, the pushed-to-scan filter of the batch
      // twin
      .where(col("event_type").isInCollection(steps))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], st: GroupState[StepTimes]) =>
          val t = st.getOption.map(_.ts.clone())
            .getOrElse(Array.fill(n)(Long.MinValue))
          val out = Seq.newBuilder[Completion]
          var changed = false
          evs.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            val i = stepIdx(e.event_type)
            val open = t(i) == Long.MinValue &&
              (i == 0 || (t(i - 1) != Long.MinValue && e.ts_us > t(i - 1)))
            if (open) {
              t(i) = e.ts_us
              changed = true
              out += Completion(user, i, steps(i), e.ts_us)
            }
          }
          if (changed) st.update(StepTimes(t))
          out.result().iterator
      }
  }
}
