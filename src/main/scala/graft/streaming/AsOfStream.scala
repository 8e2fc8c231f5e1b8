package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — [[graft.operators.Joins.asOf]]'s
  * incremental twin and the streaming world's "temporal table join"
  * (Flink's processing/event-time lookup join executes the same shape):
  * a probe stream (q43's purchases) is matched against the LATEST
  * version of a keyed update stream (the views) with
  * `update.ts <= probe.ts`.
  *
  * Why custom state and not a stream-stream join: Spark's stream-stream
  * interval join buffers BOTH sides across the watermark horizon and
  * emits every pair in the interval — neither the state bound nor the
  * only-the-latest semantics of as-of. Here the state is the minimal
  * possible for the semantics: ONE (ts, value) per key, constant
  * forever, hash-partitioned across executors. That bound is also why
  * the state never expires on its own: evicting a key would silently
  * unmatch a future probe, so retention is the semantics (a business
  * TTL belongs to the caller, same stance as the batch operator's
  * determinism contract).
  *
  * Event-time discipline mirrors [[SessionizeStream]]: each micro-batch
  * is sorted by (ts, side, value) before folding — inside one batch the
  * result is EXACTLY the batch as-of join (AsOfStreamSpec pins ≡ over a
  * one-batch drain); across batches, an update that arrives after a
  * probe with a later event time cannot retro-match it (the inherent
  * stream/batch divergence, bounded by how out-of-order the arrival
  * is). A LATE probe — older than the state's version — emits
  * unmatched rather than matching a too-new version: never wrong in
  * time, conservatively incomplete (pinned by spec).
  *
  * Tie semantics are the batch operator's: an update at exactly the
  * probe's timestamp is visible (inclusive), and among same-timestamp
  * updates the greatest value wins — the same convention q43's
  * max(event_id) pre-aggregation fixes on the batch side.
  */
object AsOfStream {

  /** Tagged union row: side 0 = update (carries `rv`), 1 = probe
    * (carries `pid`, its identity in the output). */
  final case class In(key: Long, ts_us: Long, side: Int, pid: Long,
      rv: Long)

  /** Constant per-key state: the latest update version. */
  final case class Latest(ts_us: Long, rv: Long)

  /** One enriched probe; `m_*` are null when no update qualifies. */
  final case class Enriched(pid: Long, key: Long, ts_us: Long,
      m_ts_us: Option[Long], m_rv: Option[Long])

  /** Enrich `probes` (pid, key, ts_us) against the latest qualifying
    * version of `updates` (key, ts_us, rv). Works unchanged over
    * batch frames drained through `Trigger.AvailableNow`. */
  def enriched(probes: DataFrame, updates: DataFrame): Dataset[Enriched] = {
    val spark = probes.sparkSession
    import spark.implicits._
    val tagged = probes
      .select(col("key").cast("long").as("key"),
        col("ts_us").cast("long").as("ts_us"),
        lit(1).as("side"), col("pid").cast("long").as("pid"),
        lit(0L).as("rv"))
      .unionByName(updates
        .select(col("key").cast("long").as("key"),
          col("ts_us").cast("long").as("ts_us"),
          lit(0).as("side"), lit(0L).as("pid"),
          col("rv").cast("long").as("rv")))
      .as[In]
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[In], st: GroupState[Latest]) =>
          val out = Seq.newBuilder[Enriched]
          var latest = st.getOption
          // (ts, side, rv): updates before probes at equal ts
          // (inclusive match), greatest value wins an update tie
          rows.toArray.sortBy(e => (e.ts_us, e.side, e.rv)).foreach { e =>
            if (e.side == 0) {
              if (latest.forall(_.ts_us <= e.ts_us))
                latest = Some(Latest(e.ts_us, e.rv))
            } else {
              val m = latest.filter(_.ts_us <= e.ts_us)
              out += Enriched(e.pid, key, e.ts_us,
                m.map(_.ts_us), m.map(_.rv))
            }
          }
          latest.foreach(st.update)
          out.result().iterator
      }
  }
}
