package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.CacheScope

/** Distribution-drift monitoring — the pipeline-health signal a corpus
  * or event-ingest team alarms on: "does today's event mix look like
  * yesterday's?". A shifted mix (clicks collapse, errors spike, a
  * source goes dark) is usually the first visible symptom of an
  * upstream breakage that per-row validation can't see.
  *
  * The metric is the L1 distance between consecutive days' event-type
  * distributions, computed EXACTLY in integers: for day pair (a, b)
  * with per-type counts c_a, c_b and totals n_a, n_b,
  *
  *   L1 = Σ_t |c_a(t)/n_a − c_b(t)/n_b|
  *      = Σ_t |c_a(t)·n_b − c_b(t)·n_a| / (n_a·n_b)
  *
  * so `drift_fp` = floor(Σ|…|·2^20 / (n_a·n_b)) by integer division —
  * no doubles anywhere, order-independent, engine-exact (range 0 to
  * 2·2^20). Transcendental divergences (KL, chi-square p-values) are
  * deliberately avoided: for alarming on shift, L1 carries the same
  * signal and replays bit-for-bit on any engine.
  *
  * Scale shape: ONE (day, type) count aggregate over the stream
  * (partial-aggregable), a |days|-sized totals rollup, a day-shifted
  * full join on (day, type) — |days|·|types| rows, nothing
  * corpus-sized — and integer arithmetic. No window, no driver state.
  *
  * Overflow: the cross-products c·np / cp·n and the denominator n·np
  * are computed in DECIMAL(38,0) unconditionally (the cast costs one
  * widening at |days|·|types| rows — nothing), which moves the exact
  * range from the old silent BIGINT wrap at ~3·10^9 events/day·pair
  * out to ~6.9·10^15 events PER DAY (where Σ|c·np−cp·n|·2^20 meets
  * DECIMAL(38)'s 10^38 ceiling). Past THAT bound the metric does not
  * degrade silently either: a raise_error guard on the day totals
  * fails the job with an explicit message — at 6.9·10^15 events/day
  * (~80 GHz sustained) the right response is aggregating upstream,
  * not a wider number. DriftProps pins the decimal path against
  * BigInt arithmetic across the exact range and pins the guard
  * beyond it. */
object Drift {

  /** Per-day drift vs the PREVIOUS day: (day, n_events, drift_fp),
    * for days whose previous day has events; `dayCol` supplies the
    * day, `typeCol` the category. */
  def dailyMixDrift(events: DataFrame, dayCol: Column, typeCol: String)
      : DataFrame =
    mixDriftFromCounts(events.select(dayCol.as("day"), col(typeCol).as("t"))
      .groupBy(col("day"), col("t")).agg(count(lit(1)).as("c")))

  /** Ingest-completeness matrix — [[dailyMixDrift]]'s sibling alarm:
    * drift asks "does today's mix look like yesterday's?", this asks
    * the prior question, "did every stream deliver at all?". Output:
    * one row per (event_type, day) over the observed global day span,
    * INCLUDING the zero-count cells — the zeros ARE the signal (a
    * source that went dark produces no rows to alarm on; only the
    * dense matrix makes absence visible).
    *
    * Scale shape: one partial-aggregable (day, type) count (the only
    * corpus-sized pass), a 1-row span aggregate appended to the
    * |types| frame via `crossJoin(broadcast(...))` — the same ONE-ROW
    * scalar-append shape as bm25's corpus stats (a constant-key
    * equi-join folds to this exact plan anyway; the registry sweep
    * documents it) — then a row-local `explode(sequence(lo, hi))`
    * builds the |days|·|types| expected grid that left-joins the
    * observed counts. Nothing event-sized shuffles twice. */
  def ingestCompleteness(events: DataFrame, dayCol: Column,
      typeCol: String): DataFrame = {
    val b = events.select(dayCol.as("day"), col(typeCol).as("t"))
    val obs = b.groupBy(col("day"), col("t"))
      .agg(count(lit(1)).as("n_events"))
    val span = b.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val expected = b.select(col("t")).distinct()
      .crossJoin(broadcast(span))
      .select(col("t"), explode(sequence(col("lo"), col("hi"))).as("day"))
    expected.join(obs, Seq("day", "t"), "left")
      .na.fill(0L, Seq("n_events"))
      .select(col("t").as("event_type"), col("day"), col("n_events"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Robust per-day volume anomaly — the third monitoring rung
    * ([[dailyMixDrift]] asks "did the mix shift?", [[ingestCompleteness]]
    * "did anything arrive?", this asks "is today's VOLUME for this
    * stream out of line with its own history?"). Score is the
    * median/MAD robust z: (n − median) / MAD per event type — median
    * and MAD, unlike mean/stddev, don't let the anomaly poison its own
    * baseline. Types whose history is constant (MAD 0) score NULL:
    * no dispersion, no scale to judge against.
    *
    * Engine-exactness: medians of integer counts land on the 0.5 grid
    * and MADs of their deviations on the 0.25 grid (exactly
    * representable doubles via the dyadic-interpolation `percentile`,
    * the q45 trick), so the score is ONE IEEE division of two exact
    * dyadic values — portable, no transcendentals.
    *
    * Scale shape: the only corpus-sized pass is the (type, day) count
    * (partial-aggregable), persisted under `scope` because three
    * consumers read it (median agg, MAD agg, output) — without the
    * persist each would re-scan the event stream. Both percentile
    * aggregates and joins run on the |types|·|days| frame; the
    * |types|-row stats broadcast back. */
  def dailyVolumeAnomaly(events: DataFrame, dayCol: Column,
      typeCol: String, scope: CacheScope = CacheScope.unmanaged)
      : DataFrame = {
    val c = scope.persist(
      events.select(dayCol.as("day"), col(typeCol).as("t"))
        .groupBy(col("t"), col("day")).agg(count(lit(1)).as("n_events")))
    val med = c.groupBy(col("t"))
      .agg(expr("percentile(n_events, 0.5D)").as("m"))
    val dev = c.join(broadcast(med), Seq("t"))
      .withColumn("d", abs(col("n_events") - col("m")))
    val mad = dev.groupBy(col("t")).agg(expr("percentile(d, 0.5D)").as("md"))
    dev.join(broadcast(mad), Seq("t"))
      .select(col("t").as("event_type"), col("day"), col("n_events"),
        when(col("md") === 0D, lit(null).cast("double"))
          .otherwise((col("n_events") - col("m")) / col("md")).as("score"))
      .orderBy(col("event_type"), col("day"))
  }

  /** CUSUM CHANGEPOINT — the sustained-shift detector
    * [[dailyVolumeAnomaly]] deliberately is not: a robust z-score
    * flags single outlier DAYS, but a feed whose volume drifts up 20%
    * and stays there never posts one extreme day — it posts many
    * slightly-high ones, and the cumulative sum is what accumulates
    * them. One-sided upper CUSUM per type over daily counts:
    * `S_t = max(0, S_{t-1} + (n_t − μ − slack))` with μ the per-type
    * MEDIAN daily count (robust center, the q83 pair) and `slack` the
    * dead-band; alarm when `S_t > threshold`.
    *
    * The recurrence LOOKS inherently sequential, but it has an exact
    * closed form over prefix sums — `S_t = P_t − min(0, min_{j≤t}
    * P_j)` where `P` is the running sum of the deviations — so two
    * same-keyed windows compute it with NO iteration and ONE
    * exchange. Exactness: a median of integers is an integer or a
    * half, so everything runs DOUBLED (`2n − 2μ − 2·slack` is an
    * exact long), the windows sum/min exact longs, and the reported
    * cusum divides by 2.0 once (an exponent shift).
    *
    * Scale shape: the corpus pass is the (type, day) count
    * (partial-aggregated, persisted — the median and the window path
    * both read it); windows key on the type, partitions of |days|
    * rows. Output: (event_type, day, n_events, cusum, is_alarm),
    * ordered. */
  def cusumChangepoint(events: DataFrame, dayCol: Column,
      typeCol: String, slack: Long = 0L, threshold: Long = 10L,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(slack >= 0 && threshold > 0,
      s"need slack >= 0 and threshold > 0, got $slack/$threshold")
    import org.apache.spark.sql.expressions.Window
    val c = scope.persist(
      events.select(dayCol.as("day"), col(typeCol).as("t"))
        .groupBy(col("t"), col("day")).agg(count(lit(1)).as("n_events")))
    val med = c.groupBy(col("t"))
      .agg(expr("percentile(n_events, 0.5D)").as("m"))
    val w = Window.partitionBy(col("t")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.join(broadcast(med), Seq("t"))
      .withColumn("x", lit(2L) * col("n_events") -
        (lit(2.0) * col("m")).cast("long") - lit(2L * slack))
      .withColumn("pp", sum(col("x")).over(w))
      .withColumn("minpp", min(col("pp")).over(w))
      .withColumn("s2", col("pp") - least(col("minpp"), lit(0L)))
      .select(col("t").as("event_type"), col("day"), col("n_events"),
        (col("s2").cast("double") / lit(2.0)).as("cusum"),
        (col("s2") > lit(2L * threshold)).as("is_alarm"))
      .orderBy(col("event_type"), col("day"))
  }

  /** GRID KOLMOGOROV–SMIRNOV DISTANCE — the CDF-based sibling of
    * [[histogramDrift]]'s L1: `D = max_bin |F_old − F_new|` over the
    * shared dyadic grid. The two alarms disagree usefully: L1 totals
    * mass moved anywhere (many small wiggles add up), KS is the
    * largest CDF gap (one localized shift — a changed clipping bound,
    * a new floor/cap — dominates it even when total moved mass is
    * small), so drift dashboards run both. Distribution-free and
    * log-free by nature, which is why it fits the repo's no-libm
    * discipline where PSI/KL cannot.
    *
    * Exactness: `|cum_old·N_new − cum_new·N_old|` as DECIMAL(38,0)
    * integers (the q112 cross-multiplication), the max an integer
    * max, ONE IEEE division at the end. NULL values are absent from a
    * CDF (dropped); either side empty → NULL distance, and the
    * both-empty case still emits its one contract row (the
    * [[histogramDrift]] ungrouped-fold rule).
    *
    * Scale shape: per-side bin counts partial-aggregate (bounded by
    * range/width); the cumulative windows run over the merged bin
    * frame, totals and the fold ride one-row broadcast appends.
    * Output: ONE row (n_old, n_new, ks_distance). */
  def gridKsDistance(oldDf: DataFrame, newDf: DataFrame,
      valueCol: String, width: Double,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(width > 0 && java.lang.Double.isFinite(width) &&
      (java.lang.Double.doubleToLongBits(width) & 0x000fffffffffffffL) == 0L,
      s"gridKsDistance width must be a power of two, got $width")
    import org.apache.spark.sql.expressions.Window
    val dec = "DECIMAL(19,0)"
    def counts(df: DataFrame, as: String) =
      df.select(col(valueCol).as("v")).where(col("v").isNotNull)
        .groupBy(floor(col("v") / lit(width)).cast("long").as("bin"))
        .agg(count(lit(1)).as(as))
    val a = counts(oldDf, "na")
    val b = counts(newDf, "nb")
    val bins = scope.persist(a.join(b, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb")))
    val tot = bins.agg(coalesce(sum(col("na")), lit(0L)).as("n_old"),
      coalesce(sum(col("nb")), lit(0L)).as("n_new"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fold = bins
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(abs(
        expr(s"CAST(ca AS $dec) * CAST(n_new AS $dec)") -
          expr(s"CAST(cb AS $dec) * CAST(n_old AS $dec)"))).as("num"))
    tot.crossJoin(broadcast(fold))
      .select(col("n_old"), col("n_new"),
        when(col("n_old") > 0 && col("n_new") > 0,
          col("num").cast("double") /
            (col("n_old").cast("double") * col("n_new").cast("double")))
          .as("ks_distance"))
  }

  /** Counts-level entry: `byDay` is pre-aggregated (day, t, c) rows —
    * the form an ingest that already maintains per-type daily counters
    * (or a rollup sink) feeds directly, skipping the event-level
    * aggregate. Same output contract as [[dailyMixDrift]]. */
  def mixDriftFromCounts(byDay: DataFrame): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val totals = byDay.groupBy(col("day")).agg(sum(col("c")).as("n"))
    val prevC = byDay.select(date_add(col("day"), 1).as("day"), col("t"),
      col("c").as("cp"))
    val prevN = totals.select(date_add(col("day"), 1).as("day"),
      col("n").as("np"))
    byDay.join(prevC, Seq("day", "t"), "full")
      .na.fill(0L, Seq("c", "cp"))
      .join(totals, Seq("day")) // inner: drift needs BOTH days' totals
      .join(prevN, Seq("day"))
      .groupBy(col("day"), col("n"), col("np"))
      .agg(sum(abs(col("c").cast(dec38) * col("np") -
        col("cp").cast(dec38) * col("n"))).as("num"))
      .select(col("day"), col("n").as("n_events"),
        when(col("n") > maxExactDayTotal || col("np") > maxExactDayTotal,
          raise_error(format_string(
            "mixDrift: day totals %s/%s exceed the exact range " +
              s"($maxExactDayTotal events/day) — aggregate upstream",
            col("n"), col("np"))).cast("long"))
          .otherwise(
            expr("(num * 1048576) div (CAST(n AS DECIMAL(38,0)) * np)"))
          .as("drift_fp"))
      .orderBy(col("day"))
  }

  /** Largest day total with num·2^20 provably inside DECIMAL(38,0):
    * num ≤ 2·n·np ≤ 2·(6.9·10^15)² and ·2^20 stays under 10^38. */
  val maxExactDayTotal: Long = 6900000000000000L

  /** NUMERIC distribution drift between two corpus slices — the
    * continuous sibling of [[dailyMixDrift]]'s categorical alarm
    * ("has the VALUE distribution shifted?" — loss spikes, price
    * re-denomination, a feed switching units): both sides bucket on
    * the same dyadic equi-width grid ([[Profiling.bucketEntries]]'s
    * exact IEEE-exponent bucketing), then ONE cross-normalized integer
    * L1 over the joined bucket counts — `Σ|c_new·N_old − c_old·N_new|`
    * on DECIMAL(38,0), scaled to the 2^-20 fixed-point grid by one
    * integer division. PSI/KL are deliberately avoided (their `ln` is
    * not engine-portable); L1 carries the alarm signal on exact
    * arithmetic. NULL values land in an accounted sentinel bucket like
    * the histogram itself.
    *
    * Output is ONE row in every case — both sides empty included,
    * where it is (0, 0, 0, NULL): (n_old, n_new, n_buckets, drift_fp),
    * with drift_fp ∈ [0, 2·2^20] and NULL when either side is empty
    * (no distribution to compare). Scale shape: two partial-aggregable
    * bucket counts (each the only pass over its slice), a |buckets|
    * full-outer join on the bucket id, and constant-size folds after. */
  def histogramDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
      width: Double,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def counts(df: DataFrame, side: String) =
      Profiling.bucketEntries(df.select(col(valueCol)),
          Seq(valueCol -> width))
        .groupBy(coalesce(col("bucket"), lit(Long.MinValue)).as("bucket"))
        .agg(count(lit(1)).as(side))
    // the joined bucket frame is |buckets| rows but has TWO consumers
    // (the totals scalar and the term fold) — persist so each slice is
    // scanned once, the dailyVolumeAnomaly discipline
    val joined = scope.persist(counts(oldDf, "c_old")
      .join(counts(newDf, "c_new"), Seq("bucket"), "full")
      .na.fill(0L, Seq("c_old", "c_new")))
    // global (ungrouped) aggregates so BOTH frames are one row even
    // when both slices are empty — a groupBy on the totals would
    // return ZERO rows there, breaking the one-row output contract
    val totals = joined.agg(
      coalesce(sum(col("c_old")), lit(0L)).as("n_old"),
      coalesce(sum(col("c_new")), lit(0L)).as("n_new"))
    val fold = joined.crossJoin(broadcast(totals))
      .agg(count(lit(1)).as("n_buckets"),
        sum(abs(col("c_new").cast(dec38) * col("n_old") -
          col("c_old").cast(dec38) * col("n_new"))).as("num"))
    totals.crossJoin(broadcast(fold))
      .select(col("n_old"), col("n_new"), col("n_buckets"),
        when(col("n_old") > maxExactDayTotal ||
          col("n_new") > maxExactDayTotal,
          raise_error(format_string(
            "histogramDrift: totals %s/%s exceed the exact range " +
              s"($maxExactDayTotal rows/side) — aggregate upstream",
            col("n_old"), col("n_new"))).cast("long"))
          .when(col("n_old") > 0 && col("n_new") > 0,
            expr("(num * 1048576) div (CAST(n_old AS DECIMAL(38,0)) * n_new)"))
          .as("drift_fp"))
  }

  /** DAY-OF-WEEK-CONDITIONED VOLUME ANOMALY — [[dailyVolumeAnomaly]]
    * with the weekly season removed: a feed whose weekend volume is
    * half its weekday volume posts two "anomalies" every week under
    * one pooled baseline, so the robust z is computed against the
    * (type, day-of-week) median/MAD instead. Day-of-week is
    * `days-since-epoch mod 7` — pure integer arithmetic (0 =
    * Thursday, the epoch's weekday; the CONDITIONING only needs a
    * stable 7-class partition, not a locale calendar — the q72
    * no-calendar-functions discipline).
    *
    * Same exactness as q83: medians of integer counts land on dyadic
    * grids, MAD-0 slices score NULL, the score is ONE IEEE division.
    * Scale shape: the one corpus-sized pass is the persisted
    * (type, day) count; baselines are (type, dow)-keyed rollups of
    * that reduced frame, broadcast back. */
  def dowVolumeAnomaly(events: DataFrame, dayCol: Column,
      typeCol: String, scope: CacheScope = CacheScope.unmanaged)
      : DataFrame = {
    val c = scope.persist(
      events.select(dayCol.as("day"), col(typeCol).as("t"))
        .groupBy(col("t"), col("day")).agg(count(lit(1)).as("n_events"))
        .withColumn("dow",
          (datediff(col("day"), to_date(lit("1970-01-01"))) % 7)
            .cast("int")))
    val med = c.groupBy(col("t"), col("dow"))
      .agg(expr("percentile(n_events, 0.5D)").as("m"))
    val dev = c.join(broadcast(med), Seq("t", "dow"))
      .withColumn("d", abs(col("n_events") - col("m")))
    val mad = dev.groupBy(col("t"), col("dow"))
      .agg(expr("percentile(d, 0.5D)").as("md"))
    dev.join(broadcast(mad), Seq("t", "dow"))
      .select(col("t").as("event_type"), col("day"), col("dow"),
        col("n_events"),
        when(col("md") === 0D, lit(null).cast("double"))
          .otherwise((col("n_events") - col("m")) / col("md")).as("score"))
      .orderBy(col("event_type"), col("day"))
  }

  /** PEAK-RATE PROFILE — the capacity-planning readout: per stream,
    * event counts bucketed into fixed time windows (integer
    * `ts_us div bucketUs` — engine-exact, no calendar), then the
    * bucket-count distribution's median, p99-style max, and the
    * peak-to-median burstiness ratio. A stream whose peak minute is
    * 40× its median minute needs a queue, not a bigger average — the
    * number the day-scale monitors (q83/q126/q163) cannot see.
    *
    * Exactness: bucket counts are exact longs, the median interpolates
    * exactly (q88), the ratio is one IEEE division. Scale shape: ONE
    * partial-aggregable (type, bucket) count — bounded by streams ×
    * observed windows — then a per-type fold of that reduced frame. */
  def peakRateProfile(events: DataFrame, tsUsCol: Column,
      typeCol: String, bucketUs: Long = 60L * 1000 * 1000): DataFrame = {
    require(bucketUs > 0, s"need bucketUs > 0, got $bucketUs")
    val c = events
      .select(col(typeCol).as("t"), tsUsCol.cast("long").as("__ts"))
      .select(col("t"), expr(s"__ts div ${bucketUs}L").as("b"))
      .groupBy(col("t"), col("b")).agg(count(lit(1)).as("n"))
    c.groupBy(col("t"))
      .agg(count(lit(1)).as("n_buckets"),
        expr("percentile(n, 0.5D)").as("p50_rate"),
        max(col("n")).as("peak_rate"))
      .select(col("t").as("event_type"), col("n_buckets"),
        col("p50_rate"), col("peak_rate"),
        when(col("p50_rate") > 0,
          col("peak_rate").cast("double") / col("p50_rate"))
          .as("burstiness"))
      .orderBy(col("event_type"))
  }

  /** LABEL PURITY — per group, how label-clean the slice is: row and
    * distinct-label counts, the majority label, and its mass share
    * (`purity`). The routing-health gauge of a multi-feed ingest — a
    * "Spanish" feed whose purity drops below ~0.9 is routing other
    * languages through the wrong curation profile (and q116's
    * mixed-language flags say which DOCS; this says which FEEDS) —
    * and the label-noise pre-flight before any per-label statistic
    * (q98/q107/q114) is trusted.
    *
    * Deterministic everywhere: the majority breaks ties by the
    * lexicographically first label with NULLs FIRST, pinned
    * explicitly on both engines (Spark sorts NULLs first by default,
    * DuckDB last — the one cross-engine ordering trap, so the oracle
    * says `NULLS FIRST` out loud). NULL labels count as a label
    * (absence of a label is itself a routing defect). Purity is one
    * IEEE division of exact counts.
    *
    * Scale shape: ONE partial-aggregable (group, label) count; both
    * windows and the majority filter run on the reduced ≤
    * |groups|·|labels| frame, sharing one group-keyed exchange. */
  def labelPurity(df: DataFrame, groupCol: String, labelCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol).as("g"), col(labelCol).as("l"))
      .agg(count(lit(1)).as("c"))
    val byG = Window.partitionBy(col("g"))
    counts
      .withColumn("rn", row_number().over(
        byG.orderBy(col("c").desc, col("l").asc_nulls_first)))
      .withColumn("n_rows", sum(col("c")).over(byG))
      .withColumn("n_labels", count(lit(1)).over(byG))
      .where(col("rn") === 1)
      .select(col("g").as(groupCol), col("n_rows"), col("n_labels"),
        col("l").as("majority_label"),
        (col("c").cast("double") / col("n_rows").cast("double"))
          .as("purity"))
      .orderBy(col(groupCol))
  }

  /** SEASONAL-NAIVE FORECAST ERROR — how predictable is each stream at
    * the weekly season: per key, the WMAPE of the "same day last week"
    * forecast on daily counts. The monitoring family ([[dailyVolumeAnomaly]],
    * [[dowVolumeAnomaly]], [[cusumChangepoint]]) asks "is today
    * anomalous?"; this asks the prior question "how tight CAN an alarm
    * threshold be?" — a stream whose naive weekly forecast is within
    * 10% supports a tight band, one at 80% needs [[dowVolumeAnomaly]]'s
    * robust conditioning or no day-level alarm at all.
    *
    * WMAPE = Σ|c_t − c_{t−7}| / Σ c_{t−7}, NOT the mean of per-day
    * ratios: a MAPE sums IEEE divisions (order-dependent, and blown up
    * by near-zero days); the weighted form is exact-integer sums with
    * ONE boundary division, engine-portable and scale-stable. Day
    * arithmetic is days-since-epoch ints (the q72 rule); only days
    * with an observed t−7 predecessor score (a missing day is "no
    * forecast", not "forecast zero").
    *
    * Scale shape: ONE corpus-sized partial-aggregable (key, day)
    * count; the t−7 lookup is a self-join of that reduced frame on
    * (key, day−7) — both sides hash on `key`; the rollup is
    * |keys|-row. */
  def seasonalNaiveError(events: DataFrame, keyCol: Column,
      dayCol: Column, lagDays: Int = 7,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(lagDays >= 1, s"need lagDays >= 1, got $lagDays")
    val daily = scope.persist(
      events.select(keyCol.as("key"),
          datediff(dayCol, to_date(lit("1970-01-01"))).as("d"))
        .groupBy(col("key"), col("d")).agg(count(lit(1)).as("n")))
    val cur = daily.select(col("key"), col("d"), col("n"))
    val prior = daily.select(col("key"),
      (col("d") + lagDays).as("d"), col("n").as("n_prior"))
    cur.join(prior, Seq("key", "d"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_days_scored"),
        sum(abs(col("n") - col("n_prior"))).as("abs_err"),
        sum(col("n_prior")).as("base"))
      .select(col("key"), col("n_days_scored"), col("abs_err"),
        col("base"),
        (col("abs_err").cast("double") / col("base").cast("double"))
          .as("wmape"))
      .orderBy(col("key"))
  }

  /** PROFILE DRIFT — the schema-health diff between two corpus
    * snapshots: per column, row/null/distinct counts on BOTH sides
    * plus the null-rate delta and the distinct-count ratio — "did the
    * new crawl break an extractor" answered before any value-level
    * drift test runs ([[histogramDrift]]/[[gridKsDistance]] compare
    * VALUES; this compares the column health [[graft.operators.Profiling.columnProfile]]
    * measures, across time). The derived columns are fixed IEEE trees
    * over exact counts (two divisions and a subtract; a side with
    * zero rows keeps NULL delta, a vanished column keeps NULL ratio).
    *
    * Scale shape: one partial-aggregable all-columns pass per side
    * (the columnProfile shape — |cols| counters in ONE aggregate, the
    * countDistinct expand being the documented profile-time cost);
    * the join stitches two |cols|-row frames. */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame,
      cols: Seq[String]): DataFrame = {
    val o = graft.operators.Profiling.columnProfile(oldDf, cols)
      .select(col("column_name"), col("n_rows").as("n_rows_old"),
        col("n_nulls").as("n_nulls_old"),
        col("n_distinct").as("n_distinct_old"))
    val n = graft.operators.Profiling.columnProfile(newDf, cols)
      .select(col("column_name"), col("n_rows").as("n_rows_new"),
        col("n_nulls").as("n_nulls_new"),
        col("n_distinct").as("n_distinct_new"))
    o.join(n, Seq("column_name"))
      .withColumn("null_rate_delta",
        when(col("n_rows_old") > 0 && col("n_rows_new") > 0,
          col("n_nulls_new").cast("double") /
            col("n_rows_new").cast("double") -
          col("n_nulls_old").cast("double") /
            col("n_rows_old").cast("double")))
      .withColumn("ndv_ratio",
        when(col("n_distinct_old") > 0,
          col("n_distinct_new").cast("double") /
            col("n_distinct_old").cast("double")))
      .select(col("column_name"), col("n_rows_old"), col("n_nulls_old"),
        col("n_distinct_old"), col("n_rows_new"), col("n_nulls_new"),
        col("n_distinct_new"), col("null_rate_delta"), col("ndv_ratio"))
      .orderBy(col("column_name"))
  }
}
