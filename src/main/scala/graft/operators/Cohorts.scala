package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort/funnel analytics over the event stream — the product-side
  * OLAP complement to [[Drift]]'s ingest-health view: `Drift` alarms on
  * "does today's mix look like yesterday's?", these answer "do the
  * users we acquired in week W keep coming back?" (retention) and
  * "how far do users get through an ordered step sequence?" (funnel).
  * Both are the standard warehouse workloads a team running this
  * engine would otherwise ship events OUT to a BI store for.
  *
  * Engine-portability: no calendar functions anywhere. `weekofyear`/
  * `date_trunc('week')` differ across engines in week-start and
  * year-boundary conventions, so the week index is plain integer
  * arithmetic — days-since-epoch `div` 7 — which every engine replays
  * bit-for-bit (the same reasoning that keeps q69 on integer L1
  * instead of KL). Funnel step ordering compares microsecond longs
  * (q34's ns→µs lift), never timestamps.
  *
  * Scale shape (both operators):
  *   - retention: ONE distinct over (user, week) — the only
  *     corpus-sized shuffle, partial-aggregable — then a per-user min
  *     and the matrix rollup, all hash-partitioned on the SAME key
  *     (`user`), so consecutive exchanges reuse the partitioning; the
  *     output is |cohorts|·|offsets| rows, nothing user-sized leaves
  *     the cluster.
  *   - funnel: per-step frames are ≤ |users| rows after their
  *     `groupBy(user)` partial aggregate; every join/groupBy in the
  *     cascade keys on `user`. Depth counting is a CASE over left-join
  *     nullability — no window, no per-user event sort, no driver
  *     state. A step's event filter is pushed to the scan (only that
  *     step's rows are read from a type-partitioned store).
  */
object Cohorts {

  /** Days-since-epoch `div` 7 — the portable week index. */
  private def weekIndex(day: Column): Column =
    call_function("div", datediff(day, to_date(lit("1970-01-01"))), lit(7))

  /** Weekly retention matrix: one row per (cohort_week, week_offset)
    * with the count of cohort users active in that offset week.
    * `cohort_week` is the user's FIRST active week (the acquisition
    * cohort); offset 0 rows carry each cohort's size. Counts are
    * exact distinct users — (user, week) is deduplicated first, and
    * within one user a week maps to exactly one (cohort, offset) cell,
    * so the final rollup needs no second distinct. */
  def retentionMatrix(events: DataFrame, userCol: String, dayCol: Column)
      : DataFrame = {
    val uw = events
      .select(col(userCol).as("u"), dayCol.as("day"))
      .select(col("u"), weekIndex(col("day")).as("w"))
      .distinct()
    // cohort week via an unordered window-min over the DISTINCT frame —
    // not a groupBy+self-join, which would scan and re-distinct the
    // event stream twice (the window's input is |active user-weeks|
    // rows, already 'events'-to-'uw' reduced; its only cost is one
    // hash exchange on u over that reduced frame)
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    uw.withColumn("cohort_week", min(col("w")).over(byUser))
      .groupBy(col("cohort_week"),
        (col("w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Ordered-step funnel: how many users completed exactly `d` of the
    * `steps` sequence IN ORDER (each step strictly after the user's
    * earliest completion of the previous one — the standard
    * first-touch funnel). Output: (funnel_depth, step, n_users), one
    * row per depth 0..steps.length present in the data; `step` names
    * the deepest step reached ("(none)" at depth 0). Depths with no
    * users produce no row (counts-only output hash-verifies).
    *
    * Semantics note: "strictly after" (`>`, not `>=`) means a
    * same-microsecond view+click pair does NOT advance the funnel —
    * the deliberate choice, since equal-timestamp ordering would
    * otherwise be engine-dependent tie-breaking. */
  /** Per-user strictly-after step completion times `(u, t0..t{n-1})`
    * over the distinct-user universe — the cascade shared by
    * [[funnel]] (depth census) and [[funnelTiming]] (step deltas). */
  private def funnelTimes(events: DataFrame, userCol: String,
      tsUsCol: Column, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnel: steps must be non-empty and distinct, got $steps")
    val e = events.select(col(userCol).as("u"), tsUsCol.as("ts_us"),
      col(typeCol).as("t"))
    // t_i = min event time of step i strictly after t_{i-1}; ≤|users| rows.
    val stepTimes: Seq[DataFrame] = steps.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (step, i)) =>
        val matched = acc.lastOption match {
          case None => e.where(col("t") === step)
          case Some(prev) =>
            e.where(col("t") === step)
              .join(prev.select(col("u"), col(s"t${i - 1}")), Seq("u"))
              .where(col("ts_us") > col(s"t${i - 1}"))
        }
        acc :+ matched.groupBy(col("u")).agg(min(col("ts_us")).as(s"t$i"))
      }
    stepTimes.zipWithIndex.foldLeft(e.select(col("u")).distinct()) {
      case (df, (st, i)) =>
        df.join(st.select(col("u"), col(s"t$i")), Seq("u"), "left")
    }
  }

  def funnel(events: DataFrame, userCol: String, tsUsCol: Column,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val joined = funnelTimes(events, userCol, tsUsCol, typeCol, steps)
    // forward fold so the DEEPEST step's branch is the outermost `when`
    // (each later step wraps the earlier chain as its `otherwise`)
    val depth = steps.indices.foldLeft(lit(0)) { (els, i) =>
      when(col(s"t$i").isNotNull, lit(i + 1)).otherwise(els)
    }
    val stepName = steps.indices.foldLeft(lit("(none)")) { (els, i) =>
      when(col(s"t$i").isNotNull, lit(steps(i))).otherwise(els)
    }
    joined
      .select(depth.cast("int").as("funnel_depth"), stepName.as("step"))
      .groupBy(col("funnel_depth"), col("step"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("funnel_depth"))
  }

  /** User growth curve — the other product-analytics staple next to
    * [[retentionMatrix]]: per day, distinct active users (DAU), users
    * seen for the FIRST time that day, and the cumulative distinct
    * user count. The cumulative column is NOT a running distinct over
    * events (quadratic re-scan, or a giant distinct-state window) —
    * "distinct users ever, as of day d" ≡ "users whose first day ≤ d",
    * so it reduces to a running SUM of the new-user counts.
    *
    * Scale shape: two corpus-sized aggregates, both
    * partial-aggregable — the (day, user) distinct behind DAU and the
    * per-user min(day) behind first-seen — then day-keyed rollups and
    * one running-sum window over the \|days\|-row frame (bounded by
    * the calendar, not the corpus; the single-partition window is ~
    * hundreds of rows). All counts integer-exact. */
  def growthCurve(events: DataFrame, userCol: String, dayCol: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = events.select(dayCol.as("day"), col(userCol).as("u"))
    val dau = b.groupBy(col("day"))
      .agg(countDistinct(col("u")).as("dau"))
    val newu = b.groupBy(col("u")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(newu, Seq("day"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  /** Trailing `windowDays`-day distinct active users per observed day
    * (WAU/MAU when windowDays = 7/28) — the sliding-DISTINCT problem a
    * RANGE window can't do at scale (distinct state per frame position
    * re-scans the window per day). The contribution-interval trick
    * makes it a plain aggregate: a user active on day d is "window
    * active" on exactly the days [d, d+windowDays−1], so explode each
    * distinct (user, day) into the days it covers, re-distinct, and
    * count per day — two partial-aggregable distincts with a bounded
    * ×windowDays blowup of the ALREADY-REDUCED (user, day) frame, the
    * corpus itself never re-scanned. Output days are the observed
    * event days (coverage past the last event day is truncated, not
    * reported as ghost days). */
  def slidingActiveUsers(events: DataFrame, userCol: String,
      dayCol: Column, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val b = events.select(dayCol.as("day"), col(userCol).as("u")).distinct()
    val cov = b.select(col("u"),
        explode(sequence(col("day"),
          date_add(col("day"), windowDays - 1))).as("day"))
      .distinct()
    b.select(col("day")).distinct()
      .join(cov, Seq("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("active_users"))
      .orderBy(col("day"))
  }

  /** RFM SEGMENTATION — the classic customer-value grid (Recency /
    * Frequency / Monetary): fold each user's activity to three
    * metrics, quartile-bin each against the population, and code the
    * segment — the table a retention team reads to pick who gets the
    * win-back campaign (stale-but-valuable) vs the upsell
    * (recent-and-frequent). Bins are 0..3 against the exact
    * 25/50/75 percentiles, LOW to HIGH in the metric's raw order
    * (recency_us is a timestamp, so bin 3 = most RECENT; the caller
    * reads r_bin directionally); `segment = r·100 + f·10 + m`.
    *
    * Exactness: all three metrics are exact integers — recency an
    * epoch-µs max, frequency a count, monetary in CENTS (each row's
    * DECIMAL(12,2)·100 truncated to long — the [[graft.engine.Dec]]
    * money rule, no float accumulation) — so the interpolated
    * percentile thresholds are engine-exact (the q88 dyadic-on-
    * integers argument) and the `<=` bin boundaries cannot flip.
    *
    * Scale shape: ONE partial-aggregated per-user pass; the 1-row
    * threshold triple rides a broadcast scalar-append (q88's shape);
    * binning is a row-local CASE. */
  def rfmSegments(events: DataFrame, userCol: String, tsUsCol: String,
      valueCol: String): DataFrame = {
    val p = events.groupBy(col(userCol))
      .agg(max(col(tsUsCol)).as("recency_us"),
        count(lit(1)).as("frequency"),
        sum((graft.engine.Dec.d2(col(valueCol)) * lit(100))
          .cast("long")).as("monetary_cents"))
    val th = p.agg(
      expr("percentile(recency_us, array(0.25D, 0.5D, 0.75D))").as("qr"),
      expr("percentile(frequency, array(0.25D, 0.5D, 0.75D))").as("qf"),
      expr("percentile(monetary_cents, array(0.25D, 0.5D, 0.75D))")
        .as("qm"))
    def bin(c: Column, q: Column) =
      when(c <= element_at(q, 1), 0)
        .when(c <= element_at(q, 2), 1)
        .when(c <= element_at(q, 3), 2)
        .otherwise(3)
    p.crossJoin(broadcast(th))
      .select(col(userCol), col("recency_us"), col("frequency"),
        col("monetary_cents"),
        bin(col("recency_us"), col("qr")).cast("int").as("r_bin"),
        bin(col("frequency"), col("qf")).cast("int").as("f_bin"),
        bin(col("monetary_cents"), col("qm")).cast("int").as("m_bin"))
      .withColumn("segment",
        (col("r_bin") * 100 + col("f_bin") * 10 + col("m_bin"))
          .cast("int"))
      .orderBy(col(userCol))
  }

  /** EVENT TRANSITION MATRIX — the first-order Markov view of user
    * behavior: for every ordered in-session pair of consecutive
    * events per user, count (from_type → to_type) and the conditional
    * share `P(to | from)`. The product questions this one table
    * answers: what follows an error (rage-quit vs retry), which step
    * precedes purchase (the de-facto funnel the q73 spec didn't
    * declare), and whether a release shifted the graph (diff two
    * matrices — |types|² rows — instead of two event stores).
    *
    * Determinism: each user's stream orders by (time, event id) — the
    * id tiebreak pins simultaneous events, so `lag` is reproducible
    * on both engines; first events have no predecessor and drop
    * (transitions, not visits, are the subject). The share divides
    * exact counts once, windowed over the ≤ |types|² aggregate.
    *
    * Scale shape: ONE hash exchange on the user + per-user sort (the
    * honest cost of sequence order — q34's sessionize shape); the
    * transition rollup partial-aggregates to ≤ |types|² counters and
    * the share window runs over that aggregate, never the stream. */
  def transitionMatrix(events: DataFrame, userCol: String,
      timeCol: String, typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(timeCol), col(idCol))
    val paired = events
      .select(col(userCol), col(timeCol), col(typeCol), col(idCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(perUser))
      .where(col("__prev").isNotNull)
    paired
      .groupBy(col("__prev").as("from_type"),
        col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(
          Window.partitionBy(col("from_type"))).cast("double"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** INTER-EVENT GAP PROFILE — per event type, the distribution of
    * microsecond gaps between a user's CONSECUTIVE events of that
    * type: the cadence table behind every "how often do users do X"
    * question — retention-period choice, sessionize-gap calibration
    * (q34's 30-min threshold should come FROM this table, not
    * folklore), and push-frequency tuning. Quartiles over exact
    * integer µs make the interpolation engine-exact (the q88
    * dyadic-on-integers argument: p·(n−1) for quarter points has a
    * dyadic fractional part, and the interpolated value between two
    * longs is one exact IEEE expression both engines share).
    *
    * Scale shape: ONE (user, type)-keyed exchange + sort feeds the
    * lag (the [[transitionMatrix]] shape; (ts, event id) ordering pins
    * simultaneous events); everything after runs on the gap frame. The
    * exact `percentile` holds a value multiset per type — the honest
    * cost at profile time; a 100 TB monitor swaps in
    * [[Profiling.gridPercentile]]'s bounded-state bins (the q111
    * trade). First events carry no gap and drop (gaps are the
    * subject). */
  def interEventGaps(events: DataFrame, userCol: String,
      tsUsCol: String, idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col(tsUsCol), col(idCol))
    events
      .select(col(typeCol).as("event_type"),
        (col(tsUsCol) - lag(col(tsUsCol), 1).over(w)).as("gap"))
      .where(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_us"),
        expr("percentile(gap, array(0.25D, 0.5D, 0.75D))").as("__q"),
        max(col("gap")).as("max_gap_us"))
      .select(col("event_type"), col("n_gaps"), col("min_gap_us"),
        element_at(col("__q"), 1).as("p25_us"),
        element_at(col("__q"), 2).as("p50_us"),
        element_at(col("__q"), 3).as("p75_us"),
        col("max_gap_us"))
      .orderBy(col("event_type"))
  }

  /** FUNNEL STEP TIMING — the companion reading to [[funnel]]'s depth
    * census: per consecutive step pair, HOW LONG converting users took
    * (min / quartiles / max of `t_i − t_{i−1}` in exact integer µs) —
    * the number that separates "users drop at checkout" from "users
    * take three days at checkout", and the empirical input to any
    * attribution-window choice (q118's 24 h should come from this
    * table). Quartiles over integer µs interpolate exactly (the q88
    * dyadic-on-integers argument); deltas are strictly positive by the
    * cascade's strictly-after rule.
    *
    * Scale shape: the shared [[funnelTimes]] cascade (per-step
    * ≤ |users|-row partial aggregates, all keyed on `u`), then a
    * bounded (steps−1)-way union of delta frames and one small
    * grouped fold; the exact percentile's multiset state is the
    * profile-time cost (the q137/q111 trade). */
  def funnelTiming(events: DataFrame, userCol: String, tsUsCol: Column,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2,
      s"funnelTiming needs at least two steps, got $steps")
    val joined = funnelTimes(events, userCol, tsUsCol, typeCol, steps)
    val deltas = steps.indices.drop(1).map { i =>
      joined.where(col(s"t${i - 1}").isNotNull && col(s"t$i").isNotNull)
        .select(lit(i).as("step_idx"),
          lit(steps(i - 1)).as("step_from"), lit(steps(i)).as("step_to"),
          (col(s"t$i") - col(s"t${i - 1}")).as("gap"))
    }.reduce(_ unionByName _)
    deltas.groupBy(col("step_idx"), col("step_from"), col("step_to"))
      .agg(count(lit(1)).as("n_users"),
        min(col("gap")).as("min_us"),
        expr("percentile(gap, array(0.25D, 0.5D, 0.75D))").as("__q"),
        max(col("gap")).as("max_us"))
      .select(col("step_idx").cast("int").as("step_idx"),
        col("step_from"), col("step_to"), col("n_users"),
        col("min_us"),
        element_at(col("__q"), 1).as("p25_us"),
        element_at(col("__q"), 2).as("p50_us"),
        element_at(col("__q"), 3).as("p75_us"),
        col("max_us"))
      .orderBy(col("step_idx"))
  }

  /** PARETO / ABC CLASSIFICATION — the 80/15/5 inventory-analytics
    * staple: rank keys by value mass, classify by CUMULATIVE share
    * (A carries the first `aShare`, B to `bShare`, C the tail) — the
    * table that decides which brands get premium treatment and which
    * SKUs get end-of-lifed, and (in corpus terms) which sources
    * deserve per-source curation budgets. Exactness: per-key values
    * fold as exact DECIMAL ([[graft.engine.Dec]]), the cumulative is
    * exact decimal, and the share is ONE boundary IEEE division whose
    * `<=` class cuts cannot flip engines; ties rank by (value desc,
    * key) — pinned.
    *
    * Scale shape: ONE partial-aggregable groupBy reduces the facts to
    * |keys| rows; the rank/cumulative windows sort only that reduced
    * frame (dimension-sized — brands, sources, SKUs; the q65/q136
    * argument).
    *
    * Contract: `valueCol` is RAW money (scale ≤ 2) — the Dec rule
    * re-rounds to cents, so a pre-multiplied higher-scale product
    * would be silently double-rounded here; compute derived revenue
    * upstream at the scale you mean and pass the rounded column. */
  def paretoClasses(facts: DataFrame, keyCol: Column, valueCol: Column,
      aShare: Double = 0.8, bShare: Double = 0.95): DataFrame = {
    require(0 < aShare && aShare < bShare && bShare < 1,
      s"need 0 < aShare < bShare < 1, got $aShare/$bShare")
    import org.apache.spark.sql.expressions.Window
    val byKey = facts
      .select(keyCol.as("key"), graft.engine.Dec.d2(valueCol).as("v"))
      .groupBy(col("key")).agg(sum(col("v")).as("value"))
    val w = Window.orderBy(col("value").desc, col("key"))
    byKey
      .withColumn("rank", row_number().over(w))
      .withColumn("cum", sum(col("value")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("value")).over(Window.partitionBy()))
      .withColumn("cum_share", graft.engine.Dec.outD(col("cum")) /
        graft.engine.Dec.outD(col("total")))
      .select(col("key"), graft.engine.Dec.outD(col("value")).as("value"),
        col("rank"), col("cum_share"),
        when(col("cum_share") <= aShare, "A")
          .when(col("cum_share") <= bShare, "B")
          .otherwise("C").as("abc_class"))
      .orderBy(col("rank"))
  }

  /** COHORT REVENUE (LTV) CURVE — the money reading of
    * [[retentionMatrix]]: per acquisition cohort (a user's first
    * active week) and week offset, revenue, CUMULATIVE revenue, and
    * cumulative revenue per cohort user — the lifetime-value curve a
    * growth team reads to decide what a new user is worth. Cohort
    * membership comes from ALL activity; the caller chooses what
    * counts as revenue by shaping `valueCol` (the q150 query zeroes
    * non-purchase events), so acquisition and monetization stay
    * decoupled.
    *
    * Exactness: money folds DECIMAL(12,2) end-to-end ([[graft.engine
    * .Dec]]) including the cumulative window — the running sum is
    * exact decimal, cast to DOUBLE only at the boundary; LTV is one
    * IEEE division. Offsets are DENSE (0..global-last-week per
    * cohort, zero-filled): a cumulative at calendar week w must exist
    * even when that week sold nothing.
    *
    * Scale shape: per-user week folds are partial-aggregable and all
    * key on `u`; the dense grid explodes the |cohorts|-row frame
    * against the ONE-ROW global max week (the documented broadcast
    * scalar-append); the cumulative window runs per cohort over the
    * |cohorts|·|weeks| frame. */
  def cohortRevenue(events: DataFrame, userCol: String, dayCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = events.select(col(userCol).as("u"), weekIndex(dayCol).as("w"),
      graft.engine.Dec.d2(valueCol).as("v"))
    val ch = b.groupBy(col("u")).agg(min(col("w")).as("cohort_week"))
    val sz = ch.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    val mw = b.agg(max(col("w")).as("mw"))
    val dense = sz.crossJoin(broadcast(mw))
      .select(col("cohort_week"), col("cohort_users"),
        explode(sequence(lit(0L), col("mw") - col("cohort_week")))
          .as("week_offset"))
    val rev = b.join(ch, Seq("u"))
      .groupBy(col("cohort_week"),
        (col("w") - col("cohort_week")).as("week_offset"))
      .agg(sum(col("v")).as("rev"))
    val zero = graft.engine.Dec.d2(lit(0))
    val wdw = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(rev, Seq("cohort_week", "week_offset"), "left")
      .withColumn("r", coalesce(col("rev"), zero))
      .withColumn("cum", sum(col("r")).over(wdw))
      .select(col("cohort_week"), col("week_offset"), col("cohort_users"),
        graft.engine.Dec.outD(col("r")).as("revenue"),
        graft.engine.Dec.outD(col("cum")).as("cum_revenue"),
        (graft.engine.Dec.outD(col("cum")) /
          col("cohort_users").cast("double")).as("ltv_per_user"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** SESSION CO-OCCURRENCE LIFT — market-basket analysis with the
    * session as the basket: which event-type pairs appear in the SAME
    * session beyond chance, `lift = n_ab·N / (n_a·n_b)` over session
    * counts — the product-analytics reading of q97's collocation lift
    * (there the unit is adjacent tokens; here co-presence in one
    * sitting), and the feature-correlation table behind "users who do
    * X in a session also do Y". Sessions are q34's gap rule verbatim
    * (same two windows, one user-keyed exchange); co-presence is SET
    * semantics (a session doing X five times counts once), so the
    * session frame is a (user, session, type) DISTINCT. Log-free and
    * fixed-point for the same reason as q97: the lift RANKING is
    * log-invariant, and the 2^-20 integral division of DECIMAL(38,0)
    * counts is engine-exact. `minSupport` keeps one-off pairs (whose
    * lift is spuriously maximal) out — the q97 hygiene.
    *
    * Scale shape: ONE user-keyed exchange sessionizes; the distinct
    * (user, session, type) frame is persisted and read by all
    * consumers; the pair self-join keys on the SESSION with fan-out
    * bounded by distinct types per session (≤ |types| — event
    * vocabularies are small by nature, the q91 bounded-fan-out
    * argument); type counts are a |types|-row broadcast and the
    * session total rides the documented ONE-ROW scalar-append. */
  def sessionCooccurrence(events: DataFrame, userCol: String,
      tsUsCol: String, idCol: String, typeCol: String,
      gapUs: Long = 30L * 60 * 1000 * 1000, minSupport: Long = 2L,
      scope: graft.engine.CacheScope = graft.engine.CacheScope.unmanaged)
      : DataFrame = {
    require(gapUs > 0 && minSupport >= 1,
      s"need gapUs > 0 and minSupport >= 1, got $gapUs/$minSupport")
    import org.apache.spark.sql.expressions.Window
    val dec = "DECIMAL(38,0)"
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsUsCol), col(idCol))
    val newSess = when(lag(col(tsUsCol), 1).over(byUser).isNull
      || col(tsUsCol) - lag(col(tsUsCol), 1).over(byUser) > gapUs, 1)
      .otherwise(0)
    val st = scope.persist(events
      .withColumn("__ns", newSess)
      .withColumn("__sid", sum(col("__ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(userCol).as("u"), col("__sid").as("sid"),
        col(typeCol).as("t"))
      .distinct())
    val nTot = st.select(col("u"), col("sid")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val typeCnt = st.groupBy(col("t")).agg(count(lit(1)).as("c"))
    st.select(col("u"), col("sid"), col("t").as("ta"))
      .join(st.select(col("u"), col("sid"), col("t").as("tb")),
        Seq("u", "sid"))
      .where(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
      .join(broadcast(typeCnt.select(col("t").as("ta"),
        col("c").as("n_a"))), Seq("ta"))
      .join(broadcast(typeCnt.select(col("t").as("tb"),
        col("c").as("n_b"))), Seq("tb"))
      .crossJoin(broadcast(nTot))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        expr(s"((CAST(n_ab AS $dec) * 1048576) * n_sessions) " +
          s"div (CAST(n_a AS $dec) * n_b)").as("lift_fp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** STICKINESS (DAU/WAU) — the engagement ratio product teams track
    * daily: of the users active in the trailing `windowDays` window,
    * what fraction showed up TODAY. Composes [[growthCurve]]'s DAU
    * with [[slidingActiveUsers]]' contribution-interval WAU (a user
    * active on d is window-active on [d, d+w−1] — never a per-frame
    * sliding distinct) and divides: one IEEE division of exact counts
    * per day. DAU ≤ WAU by construction, so the ratio lives in (0, 1].
    *
    * Scale shape: ONE corpus-sized (day, user) distinct — persisted,
    * it feeds both arms — then day-keyed rollups; the coverage explode
    * is a bounded ×windowDays blowup of the REDUCED frame. Ghost days
    * (in some user's window but with no events) drop at the inner join
    * with the DAU arm: stickiness on a day with no activity is not a
    * reading, and observed-days-only is [[slidingActiveUsers]]'
    * documented contract too. */
  def stickiness(events: DataFrame, userCol: String, dayCol: Column,
      windowDays: Int = 7,
      scope: graft.engine.CacheScope = graft.engine.CacheScope.unmanaged)
      : DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val b = scope.persist(
      events.select(dayCol.as("day"), col(userCol).as("u")).distinct())
    val dau = b.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = b.select(col("u"),
        explode(sequence(col("day"),
          date_add(col("day"), windowDays - 1))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
      .orderBy(col("day"))
  }

  /** ACTIVITY STREAKS — the gaps-and-islands readout [[stickiness]]'s
    * ratio can't show: per user, runs of CONSECUTIVE active days (a
    * 7-day streak and 7 scattered days both read DAU 7; only the
    * streak predicts habit). Classic island detection: on the distinct
    * (user, day) frame ordered by day, `day − row_number()` is
    * constant within a consecutive run — pure integer arithmetic every
    * engine replays exactly (days-since-epoch ints, the q72 rule; no
    * calendar functions).
    *
    * Output per user: total active days, number of streaks, the
    * longest streak, and its start date — ties between equal-length
    * streaks pinned to the EARLIEST start (windowed max + filter +
    * min, never an engine-dependent arg-max).
    *
    * Scale shape: ONE corpus-sized shuffle (the partial-aggregable
    * (user, day) distinct), then every window and groupBy keys on
    * `user` over the reduced frame — the row_number window, the
    * island rollup, the per-user summary all reuse the same hash
    * partitioning; output is |users| rows. */
  def activityStreaks(events: DataFrame, userCol: String, dayCol: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val epoch = to_date(lit("1970-01-01"))
    val days = events
      .select(col(userCol).as("user"),
        datediff(dayCol, epoch).as("d"))
      .distinct()
    val wOrd = Window.partitionBy(col("user")).orderBy(col("d"))
    val streaks = days
      .withColumn("island", col("d") - row_number().over(wOrd))
      .groupBy(col("user"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("d")).as("start_d"))
    val wU = Window.partitionBy(col("user"))
    streaks
      .withColumn("active_days", sum(col("len")).over(wU))
      .withColumn("n_streaks", count(lit(1)).over(wU))
      .withColumn("mx", max(col("len")).over(wU))
      .where(col("len") === col("mx"))
      .groupBy(col("user"))
      .agg(max(col("active_days")).as("active_days"),
        max(col("n_streaks")).as("n_streaks"),
        max(col("mx")).as("max_streak"),
        min(col("start_d")).as("__s"))
      .select(col("user"), col("active_days"), col("n_streaks"),
        col("max_streak"),
        date_add(epoch, col("__s").cast("int")).as("max_streak_start"))
      .orderBy(col("user"))
  }

  /** TRANSITION PAGERANK — random-surfer importance of event types
    * over the [[transitionMatrix]] graph, in FIXED-POINT integer
    * arithmetic so every engine replays it bit-for-bit (a float
    * power iteration sums IEEE products in engine-dependent order —
    * the q97/q165 fixed-point rule applied to an ITERATIVE
    * computation). Ranks live at scale 2⁴⁰; one iteration is
    *
    *   r′(j) = (15·2⁴⁰ div 100) div N
    *         + (85 · Σ_i (r(i)·n_ij div n_i)) div 100
    *
    * — every term an integer, every div a floor. Per-term flooring
    * costs < N·2⁻⁴⁰ relative mass per iteration (documented
    * truncation, the price of exactness). Nodes with no OUTGOING
    * transitions leak their damped mass (the "leaky" variant — rank
    * ORDER is what the readout is for); nodes with no incoming
    * transitions keep the teleport base.
    *
    * Scale shape: ONE corpus-sized user-keyed window pass builds the
    * edge counts (the [[transitionMatrix]] shape) plus one
    * column-pruned distinct for the node set; the `iters` power
    * iterations then join |types|²-bounded edges with |types|-row
    * rank frames — K-scale work, corpus-size-independent (the
    * Packing.prefix rule). The node count is ONE small driver job on
    * the reduced node frame, never a hidden corpus count. */
  def transitionPageRank(events: DataFrame, userCol: String,
      timeCol: String, typeCol: String, idCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 16, s"need 1 <= iters <= 16, got $iters")
    import org.apache.spark.sql.expressions.Window
    val SCALE = 1L << 40
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(timeCol), col(idCol))
    val paired = events
      .select(col(userCol), col(timeCol), col(typeCol), col(idCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(perUser))
      .where(col("__prev").isNotNull)
    val edges = paired
      .groupBy(col("__prev").as("src"), col(typeCol).as("dst"))
      .agg(count(lit(1)).as("n"))
    val outTot = edges.groupBy(col("src")).agg(sum(col("n")).as("n_src"))
    val ew = edges.join(outTot, Seq("src"))
    val nodes = events.select(col(typeCol).as("t")).distinct()
    val nNodes = nodes.count() // |types|-row frame — K-scale job
    require(nNodes > 0, "transitionPageRank needs at least one event type")
    val base = ((SCALE * 15L) / 100L) / nNodes
    val dec = "DECIMAL(38,0)"
    var rank = nodes.withColumn("r", lit(SCALE / nNodes))
    for (_ <- 1 to iters) {
      val inMass = ew
        .join(rank.withColumnRenamed("t", "src"), Seq("src"))
        .select(col("dst").as("t"),
          expr(s"(CAST(r AS $dec) * n) div n_src").as("c"))
        .groupBy(col("t")).agg(sum(col("c")).as("__m"))
      rank = nodes.join(inMass, Seq("t"), "left")
        .select(col("t"),
          (lit(base) +
            expr("(85 * coalesce(__m, CAST(0 AS BIGINT))) div 100"))
            .as("r"))
    }
    rank.select(col("t").as("event_type"), col("r").as("rank_fp"),
        (col("r").cast("double") / SCALE.toDouble).as("rank"))
      .orderBy(col("rank_fp").desc, col("event_type"))
  }

  /** TRANSITION PREDICTABILITY — how deterministic is each state's
    * outflow: per from-type, the MAJORITY-BASELINE accuracy (share of
    * transitions going to the single most common successor). The
    * number that tells a modeling team whether a sequence model can
    * beat a lookup table ("view→click 92% of the time" needs no
    * model), and the eval-side reading of [[transitionMatrix]]'s
    * probabilities. Ties for the top successor pin to the
    * lexicographically smallest to-type (row_number, never an
    * engine-dependent arg-max); the hit rate is ONE division of exact
    * counts.
    *
    * Scale shape: the [[transitionMatrix]] corpus pass (one
    * user-keyed window), then a \|types\|²-bounded rank window and
    * rollup. */
  def transitionPredictability(events: DataFrame, userCol: String,
      timeCol: String, typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(timeCol), col(idCol))
    val edges = events
      .select(col(userCol), col(timeCol), col(typeCol), col(idCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(perUser))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"),
        col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wRank = Window.partitionBy(col("from_type"))
      .orderBy(col("n").desc, col("to_type"))
    val wTot = Window.partitionBy(col("from_type"))
    edges
      .withColumn("n_transitions", sum(col("n")).over(wTot))
      .withColumn("__r", row_number().over(wRank))
      .where(col("__r") === 1)
      .select(col("from_type"), col("n_transitions"),
        col("to_type").as("top_to_type"), col("n").as("n_top"),
        (col("n").cast("double") / col("n_transitions").cast("double"))
          .as("hit_rate"))
      .orderBy(col("from_type"))
  }

  /** EVENT TRIGRAM MINING — the 3-step sequential patterns
    * [[transitionMatrix]]'s first-order pairs can't see (a→b→c and
    * a→b→d share every transition yet are different funnels): per
    * user-ordered stream, consecutive type triples counted with a
    * support floor and their share of all triples — funnel DISCOVERY,
    * where [[funnel]] measures a funnel someone already named. Ties
    * pinned (count DESC, trigram ASC).
    *
    * Scale shape: ONE user-keyed window (two lags share the frame),
    * one partial-aggregable trigram count bounded by \|types\|³, a
    * one-row total append. */
  def eventTrigrams(events: DataFrame, userCol: String,
      timeCol: String, typeCol: String, idCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"need minCount >= 1, got $minCount")
    import org.apache.spark.sql.expressions.Window
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(timeCol), col(idCol))
    val tri = events
      .select(col(userCol), col(timeCol), col(typeCol), col(idCol))
      .withColumn("__p1", lag(col(typeCol), 1).over(perUser))
      .withColumn("__p2", lag(col(typeCol), 2).over(perUser))
      .where(col("__p2").isNotNull)
      .select(concat_ws(" > ", col("__p2"), col("__p1"),
        col(typeCol)).as("trigram"))
      .groupBy(col("trigram")).agg(count(lit(1)).as("n"))
    val total = tri.agg(sum(col("n")).as("__t"))
    tri.where(col("n") >= minCount)
      .crossJoin(broadcast(total))
      .select(col("trigram"), col("n"),
        (col("n").cast("double") / col("__t").cast("double"))
          .as("share"))
      .orderBy(col("n").desc, col("trigram"))
  }

  /** DAILY NEXT-DAY RETENTION — the day-granular habit trend under
    * [[retentionMatrix]]'s weekly cohorts: per day, the share of that
    * day's actives who return the VERY NEXT day. The matrix answers
    * "do week-W users come back"; this answers "did yesterday's
    * change move D1 retention" — the launch-day readout. The last
    * observed day drops (its next day hasn't happened; a 0% row
    * there would be a lie, not a measurement).
    *
    * Scale shape: ONE partial-aggregable (user, day) distinct, a
    * self-join shifted by one day on the SAME (day, user) key, a
    * day-keyed rollup; the max-day guard is a global window over the
    * \|days\|-row frame. Exact counts, one division. */
  def dailyRetention(events: DataFrame, userCol: String, dayCol: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = events.select(dayCol.as("day"), col(userCol).as("u"))
      .distinct()
    val nxt = b.select(date_sub(col("day"), 1).as("day"), col("u"),
      lit(1L).as("__r"))
    b.join(nxt, Seq("day", "u"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        coalesce(sum(col("__r")), lit(0L)).as("n_retained"))
      .withColumn("__mx", max(col("day")).over(Window.partitionBy()))
      .where(col("day") < col("__mx"))
      .select(col("day"), col("n_active"), col("n_retained"),
        (col("n_retained").cast("double") /
          col("n_active").cast("double")).as("d1_retention"))
      .orderBy(col("day"))
  }

  /** A/B CONVERSION Z-TEST — the experiment readout: users split
    * deterministically into two arms by the portable id hash (the
    * [[graft.operators.Sampling.pctBucket]] family — no rand(), the
    * assignment reproduces on every engine and rerun), each arm's
    * conversion rate (did the user ever emit `convertType`), and the
    * two-proportion z statistic under the pooled-rate null. |z| ≳ 2
    * is the conventional "this difference is probably real".
    *
    * Engine-exact: arm sizes and conversions are exact counts; the
    * rates and z are ONE fixed IEEE tree over those four integers
    * (pooled p̂, the variance product, one sqrt, one division) —
    * identical on both engines; a zero-variance denominator keeps
    * NULL z. User ids must be NUMERIC (a non-numeric id casts to
    * NULL arm and is excluded from both arms); negative ids are
    * handled — the arm hash is pmod-guarded, so every numeric id
    * lands in arm 0 or 1. Scale shape: ONE per-user
    * partial-aggregable fold, then ONE conditional 1-row rollup (no
    * arm join — an EMPTY arm still yields the single output row,
    * with NULL rate and NULL z, instead of vanishing; counts are
    * non-null 0 even on fully-empty input). Output: one row with
    * both arms' stats and z. */
  def abConversionZ(events: DataFrame, userCol: String,
      typeCol: String, convertType: String): DataFrame = {
    val P = 1000000007L
    val perUser = events
      .select(col(userCol).as("u"), col(typeCol).as("t"))
      .groupBy(col("u"))
      .agg(max(when(col("t") === convertType, 1L).otherwise(0L))
        .as("conv"))
      .withColumn("arm",
        (pmod(col("u"), lit(P)) * lit(2654435761L) % P + lit(12345L))
          % P % 2)
    // coalesce: a global sum over ZERO rows is NULL, but an empty ARM
    // already reports count 0 — the fully-empty-input row must agree
    // (callers read the counts as non-null longs)
    perUser
      .agg(
        coalesce(sum(when(col("arm") === 0, 1L).otherwise(0L)), lit(0L))
          .as("n_a"),
        coalesce(sum(when(col("arm") === 0, col("conv")).otherwise(0L)),
          lit(0L)).as("k_a"),
        coalesce(sum(when(col("arm") === 1, 1L).otherwise(0L)), lit(0L))
          .as("n_b"),
        coalesce(sum(when(col("arm") === 1, col("conv")).otherwise(0L)),
          lit(0L)).as("k_b"))
      .select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
        when(col("n_a") > 0,
          col("k_a").cast("double") / col("n_a").cast("double"))
          .as("rate_a"),
        when(col("n_b") > 0,
          col("k_b").cast("double") / col("n_b").cast("double"))
          .as("rate_b"))
      .withColumn("z", {
        val p = (col("k_a") + col("k_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")
        val se = sqrt(p * (lit(1.0) - p) *
          (lit(1.0) / col("n_a").cast("double") +
           lit(1.0) / col("n_b").cast("double")))
        when(col("n_a") > 0 && col("n_b") > 0 && se > 0.0,
          (col("rate_a") - col("rate_b")) / se)
      })
  }

  /** DISCRETE-TIME SURVIVAL HAZARD TABLE — the retention family's
    * missing statistical form ([[retentionCohorts]] reports period
    * survival shares, [[dailyRetention]] the D1 point): per lifetime
    * day `t`, how many users were STILL AT RISK and what fraction
    * churned exactly then — the discrete Kaplan–Meier input, with
    * right-censoring done properly (a user still active at the
    * observation edge is NOT a churn at their last day; they exit the
    * risk set as censored, which a naive "lifetime = last − first"
    * rollup silently gets wrong).
    *
    * Definitions: anchor = the data's own max day (the q85 rule);
    * churned iff `last_day ≤ anchor − inactivityDays`; event time =
    * `last − first` for churned, censor time = `anchor − first`
    * otherwise; at-risk(t) = users whose exit time ≥ t (the standard
    * convention that keeps same-day censors in the risk set).
    *
    * Deliberately emitted as the HAZARD TABLE, not the KM curve: the
    * survival curve is a cumulative PRODUCT of rationals with no
    * engine-exact representation (the BM25 log lesson, multiplicative
    * edition) — the hazard column is the curve's sufficient
    * statistic, and `hazard_fp` is one exact fixed-point division per
    * row.
    *
    * Scale shape: one partial-aggregated per-user fold, a ONE-ROW
    * anchor scalar-append, a fold to |distinct lifetimes| keys, and a
    * suffix-sum window over that TINY frame (aggregated-rank
    * discipline). */
  def discreteHazard(events: DataFrame, userCol: String, tsCol: Column,
      inactivityDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(inactivityDays >= 1, s"need inactivityDays >= 1")
    val epoch = to_date(lit("1970-01-01"))
    val perUser = events
      .select(col(userCol).as("user"),
        datediff(to_date(tsCol), epoch).cast("long").as("d"))
      .where(col("user").isNotNull && col("d").isNotNull)
      .groupBy(col("user"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val anchor = perUser.agg(max(col("last_d")).as("__anchor"))
    val labeled = perUser.crossJoin(broadcast(anchor))
      .withColumn("churned",
        col("last_d") <= col("__anchor") - inactivityDays)
      .withColumn("t",
        when(col("churned"), col("last_d") - col("first_d"))
          .otherwise(col("__anchor") - col("first_d")))
    val byT = labeled.groupBy(col("t"))
      .agg(count(lit(1)).as("__n_exit"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("n_churned"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(0, Window.unboundedFollowing)
    byT.withColumn("n_at_risk", sum(col("__n_exit")).over(w))
      .select(col("t").as("t_days"), col("n_at_risk"),
        col("n_churned"),
        expr("(n_churned * 1048576) div n_at_risk").as("hazard_fp"))
      .orderBy(col("t_days"))
  }
}
