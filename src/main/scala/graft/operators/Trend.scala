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
        sum(col("d").cast(dec) * col("c").cast(dec)).as("sxy"),
        sum(col("d").cast(dec) * col("d").cast(dec)).as("sxx"))
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

  /** LAG-k AUTOCORRELATION — the seasonality STRENGTH
    * [[graft.operators.Drift.seasonalNaiveError]]'s WMAPE prices in
    * error units, read as a correlation instead: per key, the Pearson
    * r between each day's count and the count `lagDays` earlier
    * (r → 1: strong weekly rhythm, a dow-conditioned baseline will
    * pay off; r → 0: the season is noise). Only days with an observed
    * lagged partner score (the q173 rule).
    *
    * Engine-exact: the six classical sums fold as exact integers
    * (DECIMAL(38,0)); r is a FIXED IEEE tree over those scalars —
    * `(nΣxy − ΣxΣy) / (sqrt(nΣx² − (Σx)²) · sqrt(nΣy² − (Σy)²))` —
    * identical on both engines; zero variance on either side keeps
    * NULL. Scale shape: q173's (key, day) count + day-lag self-join,
    * then ONE partial-aggregable six-sum fold per key. */
  def lagAutocorrelation(events: DataFrame, keyCol: Column,
      dayCol: Column, lagDays: Int = 7): DataFrame = {
    require(lagDays >= 1, s"need lagDays >= 1, got $lagDays")
    val dd = daily(events, keyCol, dayCol)
    val cur = dd.select(col("key"), col("d"), col("c").as("y"))
    val prior = dd.select(col("key"), (col("d") + lagDays).as("d"),
      col("c").as("x"))
    cur.join(prior, Seq("key", "d"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
      .select(col("key"), col("n_days"),
        when(col("n_days") >= 2 &&
          (col("n_days") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n_days") * col("syy") - col("sy") * col("sy")) > 0,
          (col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n_days") * col("syy") - col("sy") * col("sy"))
            .cast("double")))).as("autocorr"))
      .orderBy(col("key"))
  }

  /** GROUP CORRELATION — Pearson r between two INTEGER metrics per
    * group ([[lagAutocorrelation]]'s six-sum machinery off the time
    * axis): "do bigger orders discount deeper, per segment" as one
    * exact-integer pass. Same engine-exact contract: six
    * DECIMAL(38,0) sums, ONE fixed IEEE tree, zero variance on
    * either side keeps NULL. */
  def groupCorrelation(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column): DataFrame =
    df.select(groupCol.as("key"), xCol.as("x"), yCol.as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
      .select(col("key"), col("n"),
        when(col("n") >= 2 &&
          (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          (col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double")))).as("r"))
      .orderBy(col("key"))

  /** STRATUM MEAN ± STANDARD ERROR — the survey-estimator readout
    * ([[graft.operators.Profiling.columnProfile]] counts; this
    * estimates): per stratum, the mean of an integer measure with its
    * standard error — the error bar that turns "en averages 2 341
    * chars" into a statement with a confidence width, and the number
    * a mixture designer needs before trusting small-stratum stats.
    *
    * Exact sums (n, Σx, Σx² in DECIMAL(38,0)); the mean is ONE
    * division; the SE is the fixed tree
    * `sqrt(nΣx² − (Σx)²) / (n · sqrt(n−1))` — sample-variance based,
    * NULL below two rows. ONE partial-aggregable pass. */
  def stratumMeanSE(df: DataFrame, stratumCol: Column, valueCol: Column)
      : DataFrame =
    df.select(stratumCol.as("stratum"), valueCol.as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).as("s"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("q"))
      .select(col("stratum"), col("n"),
        (col("s").cast("double") / col("n").cast("double")).as("mean"),
        when(col("n") >= 2 &&
          (col("n") * col("q") - col("s") * col("s")) >= 0,
          sqrt((col("n") * col("q") - col("s") * col("s"))
            .cast("double")) /
          (col("n").cast("double") *
            sqrt((col("n") - 1).cast("double")))).as("se"))
      .orderBy(col("stratum"))

  /** HALF-LIFE DECAYED COUNTS — recency-weighted key mass with a
    * one-day half-life: `Σ n_day · 2^-(anchor − day)`, the standard
    * "what's hot NOW" readout (trending topics, freshness-weighted
    * source sizes) that a plain total cannot give and a trailing
    * window gives only with a cliff. The half-life is DYADIC on
    * purpose: every weight is an exact power of two, so the whole
    * analytic folds in EXACT integer fixed point — value ×
    * 2^(horizon − age) summed as DECIMAL(38,0) — and hash-verifies
    * cross-engine, where a general λ^age (pow on doubles, not
    * correctly rounded) could not. Ages beyond `horizonDays` truncate
    * to zero: their true weight is < 2^-horizon of a count (far
    * below any decision threshold), and truncation is what keeps the
    * fixed point exact. One double materialization at the very end
    * (a correctly-rounded decimal→double cast + an exact
    * power-of-two division).
    *
    * Scale shape: one partial-aggregable (key, day) count (the
    * shuffle carries key·day cardinality, not events), the anchor day
    * as the documented one-row broadcast append, then ONE
    * partial-aggregable per-key fold — and because the weighted sum
    * is a SUM, the analytic is exactly mergeable across batches (the
    * TrendStore argument: ship (key, day) counts, decay at read). */
  def halfLifeCounts(events: DataFrame, keyCol: Column, dayCol: Column,
      horizonDays: Int = 40): DataFrame = {
    val daily = events.select(keyCol.as("k"),
        datediff(dayCol, to_date(lit("1970-01-01"))).as("d"))
      .where(col("k").isNotNull && col("d").isNotNull)
      .groupBy(col("k"), col("d")).agg(count(lit(1)).as("n"))
    halfLifeFromDaily(daily, horizonDays)
  }

  /** The decay-at-read fold of [[halfLifeCounts]] over an already-
    * aggregated `(k, d, n)` daily frame (`d` = integer day index) —
    * the stage a mergeable store runs on its summed counts (the
    * [[olsFromDaily]] discipline: per-(key, day) counts are the
    * split-additive granularity; the decayed sum is a read-time fold
    * because the anchor moves with every ingest). */
  private[graft] def halfLifeFromDaily(daily: DataFrame,
      horizonDays: Int): DataFrame = {
    require(horizonDays >= 1 && horizonDays <= 62,
      s"horizonDays=$horizonDays must be in [1, 62] (long shift range)")
    val anchor = daily.agg(max(col("d")).as("anchor"))
    val scale = (1L << horizonDays).toDouble
    daily.crossJoin(broadcast(anchor))
      .withColumn("age", col("anchor") - col("d"))
      .groupBy(col("k"))
      .agg(
        sum(col("n")).as("n_events"),
        sum(when(col("age").between(0, horizonDays),
          col("n").cast("decimal(38,0)") *
            expr(s"shiftleft(1L, $horizonDays - age)")
              .cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("fx"))
      .select(col("k"), col("n_events").cast("long").as("n_events"),
        (col("fx").cast("double") / lit(scale)).as("decayed"))
      .orderBy(col("k"))
  }
}
