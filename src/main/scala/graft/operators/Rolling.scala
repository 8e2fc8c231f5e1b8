package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** RUNNING DRAWDOWN — how far each day's total sits below the
    * series' running PEAK: the finance reading applied to any metered
    * feed ("revenue is 35% off its high and has been for three
    * weeks" — a sustained decline [[graft.operators.Drift]]'s
    * day-scale alarms under-report and the CUSUM reports without
    * magnitude). Peak is a running max window; drawdown is
    * `1 − total/peak` ∈ [0, 1].
    *
    * Exactness: daily totals fold DECIMAL ([[Dec]]); the running max
    * of exact decimals is exact; the drawdown is ONE boundary IEEE
    * division (peak > 0 guaranteed wherever a peak exists — a
    * zero-or-negative running peak keeps NULL drawdown: "below the
    * peak" needs a positive peak to mean anything). Scale shape: one
    * partial-aggregable (key, day) rollup, two same-keyed windows
    * (max, and the reader's order) on ONE exchange. */
  def drawdown(df: DataFrame, keyCol: Column, dayCol: Column,
      valueCol: Column): DataFrame = {
    val daily = df
      .select(keyCol.as("key"), dayCol.as("day"), Dec.d2(valueCol).as("v"))
      .groupBy(col("key"), col("day")).agg(sum(col("v")).as("total"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak", max(col("total")).over(w))
      .select(col("key"), col("day"),
        Dec.outD(col("total")).as("total"),
        Dec.outD(col("peak")).as("peak"),
        when(col("peak") > 0,
          lit(1.0) - Dec.outD(col("total")) / Dec.outD(col("peak")))
          .as("drawdown"))
      .orderBy(col("key"), col("day"))
  }

  /** PERIOD-OVER-PERIOD GROWTH — the dashboard staple next to
    * [[movingDailySum]]: per key, each observed day's total against
    * the PREVIOUS OBSERVED day's, with the growth rate and the
    * `day_gap` that keeps gaps honest (a +300% "daily" growth over a
    * 14-day gap is a different fact than over 1 day — densify with
    * [[dailySnapshot]] first if calendar-adjacent comparison is
    * wanted; observed-day lag is the deliberate default because a
    * zero-filled gap would print a meaningless −100%/+∞ pair).
    *
    * Exactness: totals and the numerator difference fold as exact
    * DECIMAL ([[Dec]]); the rate is ONE IEEE division at the
    * boundary; a zero previous total keeps NULL growth (the sign of
    * x/0 is not a reading). Scale shape: one partial-aggregable
    * (key, day) rollup, one key-partitioned lag over the reduced
    * frame. */
  def periodGrowth(df: DataFrame, keyCol: Column, dayCol: Column,
      valueCol: Column): DataFrame = {
    val daily = df
      .select(keyCol.as("key"), dayCol.as("day"), Dec.d2(valueCol).as("v"))
      .groupBy(col("key"), col("day")).agg(sum(col("v")).as("total"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    daily
      .withColumn("prev_total", lag(col("total"), 1).over(w))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .select(col("key"), col("day"),
        Dec.outD(col("total")).as("total"),
        Dec.outD(col("prev_total")).as("prev_total"),
        datediff(col("day"), col("prev_day")).as("day_gap"),
        when(col("prev_total").isNotNull && col("prev_total") =!= 0,
          Dec.outD(col("total") - col("prev_total")) /
            Dec.outD(col("prev_total"))).as("growth"))
      .orderBy(col("key"), col("day"))
  }

  /** DAILY VALUE BANDS — the box-plot-over-time feed every SLO /
    * pricing / payment dashboard draws: per (key, day), count, min,
    * exact quartiles, and max of an INTEGER-VALUED measure (money in
    * cents via the `Dec` rule — the caller converts). The
    * distribution's daily evolution is what a single daily SUM
    * ([[movingDailySum]]) can't show: a mix shift toward small orders
    * and a price cut look identical in the total and completely
    * different in the bands.
    *
    * Exactness: quartiles over integer values interpolate exactly on
    * both engines (the q88 dyadic-on-integers argument). Scale shape:
    * ONE partial-aggregable groupBy(key, day); the exact percentile's
    * per-group multiset is the profile-time cost (the q111 grid is
    * the bounded-state path). NULL values drop. */
  def dailyValueBands(df: DataFrame, keyCol: Column, dayCol: Column,
      centsCol: Column): DataFrame =
    df.select(keyCol.as("key"), dayCol.as("day"), centsCol.as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("key"), col("day"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("min_cents"),
        expr("percentile(v, array(0.25D, 0.5D, 0.75D))").as("__q"),
        max(col("v")).as("max_cents"))
      .select(col("key"), col("day"), col("n"),
        col("min_cents"),
        element_at(col("__q"), 1).as("p25_cents"),
        element_at(col("__q"), 2).as("p50_cents"),
        element_at(col("__q"), 3).as("p75_cents"),
        col("max_cents"))
      .orderBy(col("key"), col("day"))

  /** DAILY CARRY-FORWARD SNAPSHOT — materialize "the value current at
    * end of each day" from a sparse update stream: the feature-store /
    * metrics daily table (q43's as-of answers one lookup; this writes
    * the whole calendar), with gaps filled by last observation carried
    * forward. Every key's series runs from its own first observation
    * to the GLOBAL last observed day, so one snapshot date covers all
    * keys — the join contract a daily consumer needs; `is_filled`
    * marks carried rows so staleness stays visible (the q63 tolerance
    * rule composes on top).
    *
    * Deterministic everywhere: the day's closing observation is the
    * (ts, id)-max (one partial-aggregable struct max — id breaks
    * same-microsecond ties, the q82 pin), money rides DECIMAL(12,2)
    * to the output boundary, and the carry is `last(ignoreNulls)`
    * over a day-ordered key window.
    *
    * Scale shape: ONE corpus-sized partial aggregate reduces to
    * (key, day) closers; the global-last-day window, the calendar
    * explode (bounded by keys × days), and the carry window all run
    * on reduced frames, the latter two sharing the key partitioning. */
  def dailySnapshot(df: DataFrame, keyCol: Column, tsUsCol: Column,
      idCol: Column, valueCol: Column): DataFrame = {
    val obs = df
      .select(keyCol.as("key"),
        to_date(timestamp_micros(tsUsCol)).as("day"),
        tsUsCol.as("ts_us"), idCol.as("id"), Dec.d2(valueCol).as("v"))
      .groupBy(col("key"), col("day"))
      .agg(max(struct(col("ts_us"), col("id"), col("v"))).as("m"))
      .select(col("key"), col("day"), col("m.v").as("obs_v"))
    val grid = obs
      .withColumn("last_day", max(col("day")).over(Window.partitionBy()))
      .groupBy(col("key"), col("last_day"))
      .agg(min(col("day")).as("first_day"))
      .select(col("key"),
        explode(sequence(col("first_day"), col("last_day"))).as("day"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "day"), "left")
      .withColumn("carried", last(col("obs_v"), ignoreNulls = true).over(w))
      .select(col("key"), col("day"),
        Dec.outD(col("carried")).as("value"),
        col("obs_v").isNull.as("is_filled"))
      .orderBy(col("key"), col("day"))
  }

  /** TRENDING RANK SHIFT — which keys are CLIMBING, not just growing:
    * rank keys by exact-decimal value mass in the trailing
    * `windowDays` window vs the window before it, and report the rank
    * delta for the current top `topK`. [[periodGrowth]] reads one
    * key's own trajectory; this reads the LEADERBOARD movement — the
    * "what changed this month" report (new entries carry NULL
    * prev_rank: unranked before, not rank-infinity).
    *
    * Anchored to the data's own clock (`max(day)`, the q85 rule —
    * a wall-clock anchor can't hash-verify or re-run). Ranks are
    * row_number over (value DESC, key ASC) — fully pinned, no
    * engine-dependent dense/tie behavior.
    *
    * Scale shape: ONE corpus-sized conditional partial-aggregable
    * pass folds both period sums per key straight off the scan (no
    * (key, day) pre-aggregate — it is near-corpus-sized for
    * high-cardinality keys and costs more than it saves); the anchor
    * is a separate column-pruned max riding a one-row broadcast
    * scalar append; the two row_number windows sort only the
    * |keys|-row period frames (the [[Cohorts.paretoClasses]]
    * justification), and the final join is |keys|-sized on `key`. */
  def rankShift(df: DataFrame, keyCol: Column, dayCol: Column,
      valueCol: Column, windowDays: Int = 30, topK: Int = 20,
      scope: graft.engine.CacheScope = graft.engine.CacheScope.unmanaged)
      : DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    require(topK >= 1, s"need topK >= 1, got $topK")
    // no (key, day) pre-aggregate: it is near-corpus-sized for
    // high-cardinality keys and both summing into it and caching it
    // cost more than the ONE conditional partial-aggregable pass that
    // folds the two period sums straight off the scan. The anchor is
    // a separate column-pruned max over `day` riding a ONE-ROW
    // broadcast scalar append (q88 shape — never a global window).
    val base = df.select(keyCol.as("key"), dayCol.as("day"),
      Dec.d2(valueCol).as("v"))
    val anchor = base.agg(max(col("day")).as("__anchor"))
    // periods feeds both rank branches — persist the |keys|-row frame
    val periods = scope.persist(base
      .crossJoin(broadcast(anchor))
      .withColumn("age", datediff(col("__anchor"), col("day")))
      .groupBy(col("key"))
      .agg(
        sum(when(col("age") < windowDays, col("v"))).as("cur_v"),
        sum(when(col("age") >= windowDays && col("age") < 2 * windowDays,
          col("v"))).as("prev_v"))
      .where(col("cur_v").isNotNull || col("prev_v").isNotNull))
    val wCur = Window.orderBy(col("cur_v").desc, col("key"))
    val wPrev = Window.orderBy(col("prev_v").desc, col("key"))
    val cur = periods.where(col("cur_v").isNotNull)
      .withColumn("cur_rank", row_number().over(wCur))
      .where(col("cur_rank") <= topK)
      .select(col("key"), col("cur_rank"), col("cur_v"))
    val prev = periods.where(col("prev_v").isNotNull)
      .withColumn("prev_rank", row_number().over(wPrev))
      .select(col("key"), col("prev_rank"), col("prev_v"))
    cur.join(prev, Seq("key"), "left")
      .select(col("key"), col("cur_rank"),
        Dec.outD(col("cur_v")).as("cur_value"),
        col("prev_rank"),
        Dec.outD(col("prev_v")).as("prev_value"),
        (col("prev_rank") - col("cur_rank")).as("rank_gain"))
      .orderBy(col("cur_rank"))
  }

  /** CAUSAL (expanding-window) Z-SCORE — leakage-safe standardization:
    * each row's value scored against the statistics of that key's
    * STRICTLY PRIOR rows only, the feature-engineering discipline that
    * keeps a training feature from reading the future (the temporal
    * twin of [[graft.operators.Sampling.leakageSafeSplit]]'s identity
    * rule). A whole-history z burns lookahead into every early row;
    * the expanding frame `[unbounded preceding, 1 preceding]` never
    * does.
    *
    * Engine-exact: values become integer cents (DECIMAL(38,0)), the
    * window aggregates n, Σx, Σx² are exact-integer and
    * order-independent; the z-score is a FIXED IEEE expression tree
    * over those exact scalars —
    * `(n·x − S) / sqrt(n·Q − S²) · sqrt((n−1)/n)` — so both engines
    * compute identical doubles (correctly-rounded ·, /, sqrt over
    * identical operands). Rows with fewer than `minPrior` prior
    * observations, or zero prior variance, keep NULL z.
    *
    * Scale shape: ONE shuffle on `key`; all three window aggregates
    * share a single frame spec (one physical Window op), ordered by
    * (ts, id) so ties are pinned; output is row-per-input (a feature
    * column, not a report). */
  def causalZScore(df: DataFrame, keyCol: Column, tsUsCol: Column,
      idCol: Column, valueCol: Column, minPrior: Int = 2): DataFrame = {
    require(minPrior >= 2, s"need minPrior >= 2, got $minPrior")
    val dec = DecimalType(38, 0)
    val base = df.select(keyCol.as("key"), tsUsCol.as("ts_us"),
      idCol.as("id"),
      (Dec.d2(valueCol) * 100).cast(dec).as("c"))
    val w = Window.partitionBy(col("key")).orderBy(col("ts_us"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("n_prior", count(col("c")).over(w))
      .withColumn("s", sum(col("c")).over(w))
      .withColumn("q", sum((col("c") * col("c")).cast(dec)).over(w))
      .withColumn("a", (col("n_prior") * col("c") - col("s")).cast("double"))
      .withColumn("b",
        (col("n_prior") * col("q") - col("s") * col("s")).cast("double"))
      .select(col("key"), col("id"), col("n_prior"),
        (col("c").cast("double") / 100.0).as("value"),
        when(col("n_prior") >= minPrior && col("b") > 0,
          col("a") / sqrt(col("b")) *
            sqrt((col("n_prior") - lit(1)).cast("double") /
              col("n_prior").cast("double"))).as("z"))
      .orderBy(col("key"), col("id"))
  }

  /** PRICE-VOLUME-MIX DECOMPOSITION — WHY did revenue move: per key,
    * the change between the trailing window and the one before split
    * into the volume effect `(q₂ − q₁)·p₁` and the price effect
    * `q₂·(p₂ − p₁)` with p_i the realized unit price r_i/q_i — the
    * standard FP&A bridge ([[rankShift]] says WHO moved; this says
    * WHY). The two effects sum to Δrevenue exactly in real
    * arithmetic; in doubles each column is a fixed IEEE tree over
    * exact decimal/integer sums (deterministic), and Δrevenue itself
    * is also emitted EXACTLY from the decimal sums. Keys missing a
    * period, or with zero quantity, keep NULL effects (no unit price
    * exists to decompose against).
    *
    * Scale shape: the [[rankShift]] one-pass conditional fold —
    * ONE corpus scan, a one-row broadcast anchor, a |keys|-row
    * output. */
  def priceVolumeMix(df: DataFrame, keyCol: Column, dayCol: Column,
      qtyCol: Column, revenueCol: Column, windowDays: Int = 30)
      : DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val base = df.select(keyCol.as("key"), dayCol.as("day"),
      qtyCol.cast("long").as("q"), Dec.d2(revenueCol).as("r"))
    val anchor = base.agg(max(col("day")).as("__anchor"))
    val per = base.crossJoin(broadcast(anchor))
      .withColumn("age", datediff(col("__anchor"), col("day")))
      .groupBy(col("key"))
      .agg(
        sum(when(col("age") < windowDays, col("q"))).as("q2"),
        sum(when(col("age") < windowDays, col("r"))).as("r2"),
        sum(when(col("age") >= windowDays && col("age") < 2 * windowDays,
          col("q"))).as("q1"),
        sum(when(col("age") >= windowDays && col("age") < 2 * windowDays,
          col("r"))).as("r1"))
      .where(col("q1").isNotNull || col("q2").isNotNull)
    val p1 = Dec.outD(col("r1")) / col("q1").cast("double")
    val p2 = Dec.outD(col("r2")) / col("q2").cast("double")
    per.select(col("key"),
        col("q1"), Dec.outD(col("r1")).as("r1"),
        col("q2"), Dec.outD(col("r2")).as("r2"),
        Dec.outD(coalesce(col("r2"), lit(0).cast("decimal(12,2)")) -
          coalesce(col("r1"), lit(0).cast("decimal(12,2)")))
          .as("delta_revenue"),
        when(col("q1") > 0 && col("q2") > 0,
          (col("q2") - col("q1")).cast("double") * p1)
          .as("volume_effect"),
        when(col("q1") > 0 && col("q2") > 0,
          col("q2").cast("double") * (p2 - p1)).as("price_effect"))
      .orderBy(col("key"))
  }
}
