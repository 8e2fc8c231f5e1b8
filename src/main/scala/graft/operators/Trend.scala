package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.CacheScope

/** Trend estimation over per-key daily series — "is this stream
  * growing, and how fast", the question [[Drift]]'s anomaly alarms
  * (level shifts) and [[Rolling]]'s readouts (windows over the past)
  * don't answer. Two rungs with one contract:
  *
  *  - [[olsTrend]] — the CHEAP path: least-squares slope from the five
  *    classical sums (n, Σx, Σy, Σxy, Σx²), fully partial-aggregable,
  *    one corpus pass, one boundary division. Sensitive to outliers —
  *    a single spiked day drags the fit.
  *  - [[theilSenTrend]] — the ROBUST path: the median of all pairwise
  *    slopes (Theil–Sen, up to 29.3% breakdown) plus the
  *    Mann–Kendall S statistic (Σ sign of pairwise differences — the
  *    standard nonparametric trend-direction test). Pairwise over the
  *    REDUCED (key, day) frame: |days|²/2 pairs per key, bounded by
  *    the CALENDAR, not the corpus (the q137 justification) — the
  *    documented profile-time cost; olsTrend is the streaming-scale
  *    rung.
  *
  * Engine-exactness: day indexes and daily counts are exact integers;
  * every OLS sum and the MK sign-sum folds order-independently in
  * DECIMAL(38,0)/longs; the OLS slope is ONE IEEE division of exact
  * scalars; each pairwise slope is one IEEE division of exact ints
  * (deterministic per pair) and the median of that double multiset
  * interpolates identically on both engines (same sorted values, one
  * IEEE average at even counts).
  */
object Trend {

  private val epoch = to_date(lit("1970-01-01"))
  private val dec = "DECIMAL(38,0)"

  /** Per-key (day-index, count) daily frame. */
  private def daily(events: DataFrame, keyCol: Column, dayCol: Column) =
    events.select(keyCol.as("key"), datediff(dayCol, epoch).as("d"))
      .groupBy(col("key"), col("d")).agg(count(lit(1)).as("c"))

  /** Least-squares daily-count trend per key:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) in counts/day, NULL
    * below two distinct days. Output: (key, n_days, slope). */
  def olsTrend(events: DataFrame, keyCol: Column, dayCol: Column)
      : DataFrame =
    olsFromDaily(daily(events, keyCol, dayCol))

  /** The fit stage alone, over an already-reduced (key, d, c) daily
    * frame — shared with the mergeable [[graft.etl.TrendStore]]
    * (per-(key, day) counts are the SPLIT-ADDITIVE granularity; the
    * five sums themselves are not, since Σd/Σd² double-count days
    * shared across batches). */
  private[graft] def olsFromDaily(dailyFrame: DataFrame): DataFrame =
    dailyFrame
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("d").cast(dec)).as("sx"),
        sum(col("c").cast(dec)).as("sy"),
        sum((col("d") * col("c")).cast(dec)).as("sxy"),
        sum((col("d") * col("d")).cast(dec)).as("sxx"))
      .select(col("key"), col("n_days"),
        when(col("n_days") >= 2,
          (col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (col("n_days") * col("sxx") - col("sx") * col("sx"))
            .cast("double")).as("slope"))
      .orderBy(col("key"))

  /** Robust daily-count trend per key: the Theil–Sen slope (median of
    * pairwise slopes) and the Mann–Kendall S (Σ sign(c_b − c_a) over
    * day pairs a < b; positive = rising). Output:
    * (key, n_days, n_pairs, mk_s, sen_slope); keys with a single day
    * keep NULL slope and zero pairs. */
  def theilSenTrend(events: DataFrame, keyCol: Column, dayCol: Column,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val dd = scope.persist(daily(events, keyCol, dayCol))
    val pairs = dd.select(col("key"), col("d").as("da"),
        col("c").as("ca"))
      .join(dd.select(col("key"), col("d").as("db"), col("c").as("cb")),
        Seq("key"))
      .where(col("da") < col("db"))
      .select(col("key"),
        signum((col("cb") - col("ca")).cast("double")).cast("long")
          .as("sgn"),
        ((col("cb") - col("ca")).cast("double") /
          (col("db") - col("da")).cast("double")).as("slope"))
    val stats = pairs.groupBy(col("key"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("sgn")).as("mk_s"),
        expr("percentile(slope, 0.5D)").as("sen_slope"))
    dd.groupBy(col("key")).agg(count(lit(1)).as("n_days"))
      .join(stats, Seq("key"), "left")
      .select(col("key"), col("n_days"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("mk_s"), lit(0L)).as("mk_s"), col("sen_slope"))
      .orderBy(col("key"))
  }
}
