package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Watermarked tumbling-window aggregation over an event stream — the
  * idiomatic Structured-Streaming shape (readStream → event-time window
  * agg → writeStream) for rollups the reference's batch report computes
  * daily (SURVEY §2.9 upgrade path; the `events` fixture exists for
  * exactly this).
  *
  * The transform is PLAN-ONLY: the same function runs in a batch frame
  * (tests compare the two) or a streaming frame, where the watermark
  * bounds the window state Spark keeps — without it, every window ever
  * seen stays in the state store forever, the streaming analog of the
  * unbounded-state hazard [[IncrementalStream]] avoids for dedup.
  */
object EventRollup {

  /** Event-time from the fixture's raw nanosecond longs (read with
    * `spark.sql.legacy.parquet.nanosAsLong`): exact µs conversion via
    * DECIMAL division — Column `/` on longs is double division, and
    * epoch nanos (~1.7e18) need 61 bits against a double's 53-bit
    * mantissa, so the naive form can land ±1 µs off at window
    * boundaries. Decimal divides exactly; the long cast truncates the
    * fractional digits (floor for the post-epoch domain), matching
    * integer `div 1000`. */
  def nanosToTimestamp(tsNanos: Column): Column =
    timestamp_micros(
      (tsNanos.cast(DecimalType(20, 0)) / lit(1000)).cast("long"))

  /** Tumbling-window counts + value sums per key. `events` needs an
    * event-time TIMESTAMP column `tsCol`; watermark `delay` declares
    * how late events may arrive before their window finalizes. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String = "1 hour", delay: String = "10 minutes")
      : DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))
}
