package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming attribution — [[graft.operators.Joins.intervalJoin]]'s
  * incremental twin, and the one Structured Streaming feature the rest
  * of the streaming surface doesn't exercise: a watermarked
  * STREAM-STREAM inner join. An impression stream is joined to a click
  * stream on the user key with the click falling inside the
  * impression's attribution window `[imp_ts, imp_ts + windowUs]`.
  *
  * Why a stream-stream join IS the right tool here (where
  * [[AsOfStream]] rejected it): attribution wants EVERY qualifying
  * (impression, click) pair inside a bounded time window — exactly the
  * all-pairs-in-interval semantics the join's state machine implements.
  * Spark derives the state bound from the join condition plus the two
  * watermarks: an impression can be dropped from state once the click
  * watermark passes `imp_ts + windowUs`, a click once the impression
  * watermark passes `click_ts` — both sides' buffers stay
  * watermark-horizon-sized, hash-partitioned on the key, at any
  * corpus rate.
  *
  * Event times arrive as µs longs (the events fixture's clock) and are
  * lifted to TimestampType via `timestamp_micros` — an exact lift,
  * since Spark timestamps are themselves µs-precision integers, so the
  * timestamp range predicate IS the integer predicate (inclusive both
  * ends, like the batch operator's `between`). The predicate must stay
  * in timestamp form only: StreamingJoinHelper derives each side's
  * state retention by solving the condition for the watermarked
  * columns, and a redundant raw-long copy of the bound makes that
  * derivation fail (it tries to evaluate the non-watermark attribute).
  */
object AttributionStream {

  /** Join clicks to the impressions they attribute to.
    *
    * `impressions`: (imp_id, imp_user, imp_ts_us);
    * `clicks`: (click_id, click_user, click_ts_us).
    * Output: one row per qualifying pair with the attribution delay.
    * `delayUs` bounds out-of-order arrival tolerated before rows are
    * dropped as late (the watermark). */
  def attributed(impressions: DataFrame, clicks: DataFrame,
      windowUs: Long, delayUs: Long = 10_000_000L): DataFrame = {
    require(windowUs > 0, s"need windowUs > 0, got $windowUs")
    require(delayUs >= 0, s"need delayUs >= 0, got $delayUs")
    // microsecond interval form directly — a ms division would silently
    // truncate sub-ms tolerances to a 0 ms watermark
    val delay = s"$delayUs microseconds"
    val imp = impressions
      .select(col("imp_id"), col("imp_user"), col("imp_ts_us"),
        timestamp_micros(col("imp_ts_us")).as("imp_ts"))
      .withWatermark("imp_ts", delay)
    val clk = clicks
      .select(col("click_id"), col("click_user"), col("click_ts_us"),
        timestamp_micros(col("click_ts_us")).as("click_ts"))
      .withWatermark("click_ts", delay)
    imp.join(clk,
      col("imp_user") === col("click_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(
          s"INTERVAL ${windowUs} MICROSECONDS"))
      .select(col("imp_id"), col("click_id"), col("imp_user").as("user_id"),
        col("imp_ts_us"), col("click_ts_us"),
        (col("click_ts_us") - col("imp_ts_us")).as("delay_us"))
  }
}
