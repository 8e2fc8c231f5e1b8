package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Dec

/** Trailing-window moving aggregates — the RANGE-frame window surface
  * (SURVEY.md §2.8) the rest of the registry doesn't exercise: a
  * ROWS frame counts physical rows, a RANGE frame counts VALUE
  * distance, which is what "last 7 days" means when days are missing
  * (a 7-row frame would silently stretch across gaps).
  *
  * Scale shape: the window NEVER sees the fact table — the input is
  * first reduced to one row per (key, day) by a partial-aggregable
  * decimal sum (the only corpus-sized pass), and the range window runs
  * over that |keys|·|days| frame, partitioned by key so the per-key
  * ordered scans parallelize. Money stays DECIMAL(12,2) end-to-end
  * ([[Dec]]) so both the daily and the windowed sums are exact and
  * order-independent; day distance is integer days-since-epoch —
  * `RANGE (windowDays−1) PRECEDING` on an integer axis is
  * engine-portable where interval frames are not.
  */
object Rolling {

  /** Per-key daily decimal totals plus the trailing `windowDays`-day
    * moving total. Output: (key, day, total, moving) with money as
    * DOUBLE cast from exact decimal at the boundary. */
  def movingDailySum(df: DataFrame, keyCol: Column, dayCol: Column,
      valueCol: Column, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val daily = df
      .select(keyCol.as("key"), dayCol.as("day"), Dec.d2(valueCol).as("v"))
      .groupBy(col("key"), col("day")).agg(sum(col("v")).as("total"))
      .withColumn("day_i",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy(col("key")).orderBy(col("day_i"))
      .rangeBetween(-(windowDays - 1L), 0L)
    daily
      .withColumn("moving", sum(col("total")).over(w))
      .select(col("key"), col("day"),
        Dec.outD(col("total")).as("total"),
        Dec.outD(col("moving")).as("moving"))
  }
}
