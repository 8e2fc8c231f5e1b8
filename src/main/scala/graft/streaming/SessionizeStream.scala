package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the custom-state Structured
  * Streaming shape (`flatMapGroupsWithState`, SURVEY §2.9's "state"
  * row) and the streaming counterpart of q34's batch lag+running-sum
  * sessionizer: a silence longer than `gapUs` closes the session.
  *
  * Why custom state and not a windowed agg: session windows have
  * data-dependent extent (each event can stretch its session), so the
  * state is "the one open session per user", not a fixed window — the
  * exact use case the `GroupState` API exists for. State size is
  * CONSTANT per active user (three longs), the scale requirement for a
  * stream that runs forever; Spark hash-partitions groups by user_id
  * across executors.
  *
  * Emission contract (append mode): a session is emitted when it
  * CLOSES — either a later event for the same user arrives past the
  * gap (the data path), or the event-time watermark passes the
  * session's end + gap (the timeout path, `EventTimeTimeout`), which
  * bounds how long a crashed-away user pins state. Event-time
  * semantics: events are sorted by timestamp WITHIN each micro-batch
  * before folding; across batches, events that arrive later than
  * `lateness` after the watermark may split a session that a batch
  * recomputation would merge — the inherent stream/batch divergence of
  * sessionization, bounded by the watermark delay (same trade as the
  * reference upgrade path documented in SURVEY §2.9).
  *
  * Works unchanged over a batch frame drained through
  * `Trigger.AvailableNow` — SessionizeStreamSpec pins streaming ≡
  * batch-q34 output over the same drained events.
  */
object SessionizeStream {

  /** One input event; `event_time` is `timestamp_micros(ts_us)` (the
    * watermark column — Spark's watermark API needs a TIMESTAMP, while
    * the session arithmetic stays on integer µs, engine-exact like
    * q34's). */
  final case class Ev(user_id: Long, ts_us: Long,
      event_time: java.sql.Timestamp)

  /** The constant-size per-user state: the one open session. */
  final case class Open(start_us: Long, end_us: Long, n: Long)

  /** A closed session. */
  final case class Sess(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Sessionize a stream (or an AvailableNow-drained frame) with
    * columns (user_id: long, ts_us: long). Emits CLOSED sessions. */
  def sessions(events: DataFrame, gapUs: Long = 30L * 60 * 1000 * 1000,
      lateness: String = "10 minutes"): Dataset[Sess] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gap = gapUs
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts_us").cast("long").as("ts_us"),
        timestamp_micros(col("ts_us")).as("event_time"))
      .withWatermark("event_time", lateness)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], st: GroupState[Open]) =>
          val out = Seq.newBuilder[Sess]
          if (st.hasTimedOut) {
            // watermark passed end + gap with no further event: the
            // open session can never be extended — close it
            st.getOption.foreach(o =>
              out += Sess(user, o.start_us, o.end_us, o.n))
            st.remove()
          } else {
            var open = st.getOption
            evs.toArray.sortBy(_.ts_us).foreach { e =>
              open match {
                case Some(o) if e.ts_us - o.end_us <= gap =>
                  open = Some(Open(o.start_us, math.max(o.end_us, e.ts_us),
                    o.n + 1))
                case Some(o) =>
                  out += Sess(user, o.start_us, o.end_us, o.n)
                  open = Some(Open(e.ts_us, e.ts_us, 1L))
                case None =>
                  open = Some(Open(e.ts_us, e.ts_us, 1L))
              }
            }
            open.foreach { o =>
              st.update(o)
              // timeout in ms (the GroupState API's unit): sum in µs
              // FIRST, then round the boundary UP to the next ms —
              // per-term truncation could fire up to ~1 ms before
              // end + gap and close a session a within-gap event would
              // still extend
              st.setTimeoutTimestamp((o.end_us + gap) / 1000 + 1)
            }
          }
          out.result().iterator
      }
  }
}
