package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transition extraction — the custom-state twin of
  * [[graft.operators.Cohorts.transitionMatrix]]'s lag: the batch
  * operator needs the WHOLE per-user history under one window to pair
  * consecutive events; a stream can't re-sort history, but it doesn't
  * need to — the only state a first-order transition needs is THE LAST
  * EVENT PER USER (three fields, constant size), exactly what
  * `GroupState` holds. Each micro-batch sorts its own slice by
  * (ts, event id) — the batch twin's tie rule — folds transitions
  * against the carried last event, and emits one row per transition;
  * the matrix itself is a plain downstream aggregation of the emitted
  * rows, so counting stays partial-aggregated and the stateful stage
  * stays O(users) forever.
  *
  * Ordering contract (the SessionizeStream divergence, one notch
  * stricter): within a micro-batch, order is exact; across batches the
  * carried last event assumes arrival respects per-user event-time
  * order. An event older than its user's carried state would pair
  * against the newer event (a stream cannot retro-insert into history
  * it already emitted) — bound it with source-side ordering or accept
  * the standard streaming trade. TransitionStreamSpec drains
  * time-split batches and pins the emitted counts ≡ the batch
  * operator's matrix over the same events.
  */
object TransitionStream {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)

  /** Constant per-user state: the last event seen. */
  final case class Last(ts_us: Long, event_id: Long, event_type: String)

  final case class Trans(user_id: Long, from_type: String,
      to_type: String)

  /** One row per consecutive-event transition, from a stream (or an
    * AvailableNow-drained frame) with columns
    * (user_id, ts_us, event_id, event_type). */
  def transitions(events: DataFrame): Dataset[Trans] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts_us").cast("long").as("ts_us"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], st: GroupState[Last]) =>
          val out = Seq.newBuilder[Trans]
          var last = st.getOption
          evs.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            last.foreach(l => out += Trans(user, l.event_type,
              e.event_type))
            last = Some(Last(e.ts_us, e.event_id, e.event_type))
          }
          last.foreach(st.update)
          out.result().iterator
      }
  }
}
