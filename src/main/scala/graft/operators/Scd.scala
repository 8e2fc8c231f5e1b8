package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build: collapse an ordered
  * change-event stream into validity intervals — the warehouse-side
  * complement of the as-of join family (q43/q63/q78 LOOK UP the value
  * current at a time; this MATERIALIZES every value's reign so the
  * lookup becomes a plain interval join). The same gaps-and-islands
  * idiom also backs audit trails and feature-store history tables.
  *
  * Scale shape: ONE shuffle on the key; both windows (the lag that
  * detects changes, the lead that closes intervals) share that
  * partitioning and ordering, and the second runs on the
  * already-collapsed change rows — Spark plans a single Exchange with
  * no re-sort (plan-pinned). No per-key state beyond the sort, no
  * driver-side iteration. Ordering is (ts, tieCol) so equal-timestamp
  * events resolve deterministically on any engine.
  */
object Scd {

  /** Validity intervals per key: consecutive equal values collapse into
    * one interval [valid_from, valid_to); the latest value's interval
    * is open (valid_to NULL). `tieCol` (a unique id) makes the
    * event order total. Output: (key, tie, value, valid_from,
    * valid_to) — `tie` is the id of the event that OPENED the
    * interval, kept for audit lineage. */
  def intervals(df: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, valCol: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
    df.select(keyCol.as("key"), tsCol.as("ts"), tieCol.as("tie"),
        valCol.as("value"))
      .withColumn("prev", lag(col("value"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      // rn=1 (not prev IS NULL — lag can't distinguish "no previous
      // row" from "previous value was NULL") opens the first interval;
      // after that, null-safe inequality: NULL is a real state, not a
      // wildcard
      .where(col("rn") === 1 || !(col("prev") <=> col("value")))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("key"), col("tie"), col("value"),
        col("ts").as("valid_from"), col("valid_to"))
  }

  /** Dwell-time rollup over [[intervals]] — "how long do keys SIT in
    * each state" (the time-in-stage/funnel-latency readout an interval
    * table exists to answer): per value, the closed-interval count,
    * total dwell, and mean dwell as INTEGER division (exact on any
    * engine — no doubles). Open intervals (valid_to NULL) have no
    * duration yet and are excluded — their dwell is censored, and
    * counting "now minus start" would make the result
    * clock-dependent. Compositional: one partial-aggregable groupBy
    * over the already-reduced interval frame. */
  def dwellByValue(df: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, valCol: Column): DataFrame =
    intervals(df, keyCol, tsCol, tieCol, valCol)
      .where(col("valid_to").isNotNull)
      .groupBy(col("value"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("valid_to") - col("valid_from")).as("total_dwell"))
      .withColumn("mean_dwell", expr("total_dwell div n_intervals"))
      .orderBy(col("value"))
}
