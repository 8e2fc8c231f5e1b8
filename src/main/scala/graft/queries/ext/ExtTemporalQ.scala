package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** [[Ext]] family: temporal/trend/cohort readouts over events and orders — queries q72, q73, q81, q86, q87, q122, q128, q137, q138, q139, q149, q150, q151, q152, q157, q161, q164, q169, q170, q172, q177, q181, q183, q184, q191, q194, q196, q201, q202, q204, q205, q215.
  * Split from the monolithic Ext.scala in round 12
  * (pure relocation; helpers live in [[ExtHelpers]]). */
private[queries] trait ExtTemporalQ { self: ExtHelpers =>
  // ---------------------------------------------------------------- q72
  /** q72 — weekly retention cohort matrix over the event stream: for
    * each acquisition cohort (a user's FIRST active week), how many of
    * its users were active again k weeks later. The product-analytics
    * staple (every BI export job exists to answer this); here it runs
    * where the events already live. Week = days-since-epoch div 7 —
    * NO weekofyear/date_trunc('week'): week-start and year-boundary
    * conventions differ across engines, integer day arithmetic
    * doesn't. One corpus-sized distinct on (user, week); everything
    * after is |users| rows hash-partitioned on the same key. */
  val q72: Q = Q(
    "q72_retention_cohorts",
    (s, d) =>
      Cohorts.retentionMatrix(
        eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH uw AS (
        SELECT DISTINCT user_id AS u,
          (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS w
        FROM events),
      ch AS (SELECT u, min(w) AS cohort_week FROM uw GROUP BY u)
      SELECT cohort_week, w - cohort_week AS week_offset,
        count(*) AS n_active
      FROM uw JOIN ch USING (u)
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  // ---------------------------------------------------------------- q73
  /** q73 — ordered-step conversion funnel (view → click → purchase):
    * users counted at the DEEPEST step reached, each step strictly
    * after the user's earliest completion of the previous one.
    * Strictly-after (`>`) is deliberate: a same-microsecond pair must
    * not advance the funnel, because equal-timestamp ordering would be
    * engine-dependent tie-breaking (the q34 lesson applied to
    * cross-event causality). Cascade of ≤|users|-row per-step min
    * aggregates, all keyed on user — no window, no event sort. */
  val q73: Q = Q(
    "q73_conversion_funnel",
    (s, d) =>
      Cohorts.funnel(eventsUs(s, d), "user_id",
        col("ts_us"), "event_type",
        Seq("view", "click", "purchase")),
    Some("""
      WITH e AS (
        SELECT user_id AS u, event_type AS t,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events),
      s0 AS (SELECT u, min(ts_us) AS t0 FROM e WHERE t = 'view' GROUP BY u),
      s1 AS (SELECT e.u, min(ts_us) AS t1
             FROM e JOIN s0 ON e.u = s0.u AND e.ts_us > s0.t0
             WHERE t = 'click' GROUP BY e.u),
      s2 AS (SELECT e.u, min(ts_us) AS t2
             FROM e JOIN s1 ON e.u = s1.u AND e.ts_us > s1.t1
             WHERE t = 'purchase' GROUP BY e.u),
      depth AS (
        SELECT CAST(CASE WHEN t2 IS NOT NULL THEN 3
                         WHEN t1 IS NOT NULL THEN 2
                         WHEN t0 IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS funnel_depth,
          CASE WHEN t2 IS NOT NULL THEN 'purchase'
               WHEN t1 IS NOT NULL THEN 'click'
               WHEN t0 IS NOT NULL THEN 'view'
               ELSE '(none)' END AS step
        FROM (SELECT DISTINCT u FROM e) u0
        LEFT JOIN s0 USING (u) LEFT JOIN s1 USING (u) LEFT JOIN s2 USING (u))
      SELECT funnel_depth, step, count(*) AS n_users
      FROM depth GROUP BY 1, 2 ORDER BY 1
    """.trim))

  // ---------------------------------------------------------------- q81
  /** q81 — trailing 7-day moving revenue per nation: the RANGE-frame
    * window surface (value distance, not row count — missing days must
    * NOT stretch the window). The window sees only the |nations|·|days|
    * daily-total frame; money is exact decimal end-to-end and the
    * frame axis is integer days-since-epoch, both engine-portable. */
  val q81: Q = Q(
    "q81_moving_revenue",
    (s, d) => {
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
      Rolling.movingDailySum(j, col("n_name"),
          col("o_orderdate").cast("date"), col("o_totalprice"), 7)
        .select(col("key").as("nation"), col("day"),
          col("total").as("rev"), col("moving").as("rev_7d"))
        .orderBy(col("nation"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS day,
          SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT nation, day, CAST(rev AS DOUBLE) AS rev,
        CAST(SUM(rev) OVER (PARTITION BY nation
          ORDER BY day - DATE '1970-01-01'
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
      FROM daily ORDER BY nation, day
    """.trim))

  // ---------------------------------------------------------------- q86
  /** q86 — user growth curve: per day, DAU, first-seen users, and the
    * cumulative distinct user count as a running SUM of first-seens
    * ("distinct ever as of d" ≡ "first day ≤ d" — never a running
    * distinct over events). The running window is \|days\|-row
    * bounded. */
  val q86: Q = Q(
    "q86_growth_curve",
    (s, d) =>
      Cohorts.growthCurve(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH b AS (
        SELECT CAST(ts AS DATE) AS day, user_id AS u FROM events),
      dau AS (SELECT day, count(DISTINCT u) AS dau FROM b GROUP BY 1),
      f AS (SELECT u, min(day) AS day FROM b GROUP BY 1),
      nu AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
      SELECT dau.day AS day, CAST(dau.dau AS BIGINT) AS dau,
        CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
        CAST(sum(COALESCE(nu.new_users, 0)) OVER (ORDER BY dau.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_users
      FROM dau LEFT JOIN nu ON dau.day = nu.day
      ORDER BY dau.day
    """.trim))

  // ---------------------------------------------------------------- q87
  /** q87 — trailing 7-day distinct active users (WAU) per observed
    * day, by the contribution-interval trick: explode each distinct
    * (user, day) into the `windowDays` days it covers, re-distinct,
    * count — a sliding DISTINCT as two partial-aggregable passes with
    * a bounded ×7 blowup of the reduced frame, never per-frame window
    * state. */
  val q87: Q = Q(
    "q87_sliding_wau",
    (s, d) =>
      Cohorts.slidingActiveUsers(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us"))), windowDays = 7),
    Some("""
      WITH b AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        FROM events),
      cov AS (
        SELECT DISTINCT u, unnest(generate_series(day,
          day + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE AS day
        FROM b),
      days AS (SELECT DISTINCT day FROM b)
      SELECT days.day AS day, CAST(count(*) AS BIGINT) AS active_users
      FROM days JOIN cov ON days.day = cov.day
      GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q122
  /** q122 — event transition matrix ([[Cohorts.transitionMatrix]]):
    * the first-order Markov view of the event stream — per
    * (from_type, to_type), consecutive-pair counts and `P(to|from)`.
    * One user-keyed exchange + sort (the q34 sessionize shape), then
    * everything runs on the ≤ |types|² aggregate; the (ts, event_id)
    * tiebreak pins simultaneous events on both engines. */
  val q122: Q = Q(
    "q122_transition_matrix",
    (s, d) =>
      Cohorts.transitionMatrix(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id"),
    Some("""
      WITH o AS (
        SELECT user_id, event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      c AS (
        SELECT prev AS from_type, event_type AS to_type,
          CAST(count(*) AS BIGINT) n
        FROM o WHERE prev IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(n AS DOUBLE) /
          CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      FROM c ORDER BY from_type, to_type
    """.trim))

  // --------------------------------------------------------------- q128
  /** q128 — RFM segmentation ([[Cohorts.rfmSegments]]) over purchase
    * events: per-user recency/frequency/monetary folded in one pass,
    * quartile-binned against exact integer percentiles (µs, counts,
    * CENTS — the Dec money rule, no float accumulation), segment =
    * r·100 + f·10 + m. One-row thresholds on the q88 broadcast
    * scalar-append shape. */
  val q128: Q = Q(
    "q128_rfm_segments",
    (s, d) =>
      Cohorts.rfmSegments(
        eventsUs(s, d).where(col("event_type") === "purchase"),
        "user_id", "ts_us", "value"),
    Some("""
      WITH p AS (
        SELECT user_id,
          CAST(max(epoch_us(ts)) AS BIGINT) recency_us,
          CAST(count(*) AS BIGINT) frequency,
          CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
            AS BIGINT) monetary_cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      t AS (
        SELECT quantile_cont(recency_us, [0.25, 0.5, 0.75]) qr,
          quantile_cont(frequency, [0.25, 0.5, 0.75]) qf,
          quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) qm
        FROM p),
      b AS (
        SELECT user_id, recency_us, frequency, monetary_cents,
          CAST(CASE WHEN recency_us <= qr[1] THEN 0
            WHEN recency_us <= qr[2] THEN 1
            WHEN recency_us <= qr[3] THEN 2 ELSE 3 END AS INT) r_bin,
          CAST(CASE WHEN frequency <= qf[1] THEN 0
            WHEN frequency <= qf[2] THEN 1
            WHEN frequency <= qf[3] THEN 2 ELSE 3 END AS INT) f_bin,
          CAST(CASE WHEN monetary_cents <= qm[1] THEN 0
            WHEN monetary_cents <= qm[2] THEN 1
            WHEN monetary_cents <= qm[3] THEN 2 ELSE 3 END AS INT) m_bin
        FROM p CROSS JOIN t)
      SELECT user_id, recency_us, frequency, monetary_cents,
        r_bin, f_bin, m_bin,
        CAST(r_bin * 100 + f_bin * 10 + m_bin AS INT) AS segment
      FROM b ORDER BY user_id
    """.trim))

  // --------------------------------------------------------------- q137
  /** q137 — inter-event gap profile ([[Cohorts.interEventGaps]]): per
    * event type, quartiles of a user's consecutive same-type gaps in
    * exact integer µs — the cadence table that calibrates q34's
    * session gap and any retention-period choice. One (user, type)
    * exchange; dyadic-on-integers quartile interpolation. */
  val q137: Q = Q(
    "q137_interevent_gaps",
    (s, d) =>
      Cohorts.interEventGaps(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type"),
    Some("""
      WITH o AS (
        SELECT event_type,
          epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type
            ORDER BY epoch_us(ts), event_id) AS gap
        FROM events)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        CAST(min(gap) AS BIGINT) AS min_gap_us,
        quantile_cont(gap, 0.25) AS p25_us,
        quantile_cont(gap, 0.5) AS p50_us,
        quantile_cont(gap, 0.75) AS p75_us,
        CAST(max(gap) AS BIGINT) AS max_gap_us
      FROM o WHERE gap IS NOT NULL
      GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q138
  /** q138 — stickiness (DAU/WAU) ([[Cohorts.stickiness]]): per
    * observed day, the fraction of trailing-7-day actives who showed
    * up that day — q86's DAU over q87's contribution-interval WAU,
    * one IEEE division of exact counts. */
  val q138: Q = Q(
    "q138_stickiness",
    (s, d) =>
      Cohorts.stickiness(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us"))), windowDays = 7),
    Some("""
      WITH b AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        FROM events),
      dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM b GROUP BY 1),
      cov AS (
        SELECT DISTINCT u, unnest(generate_series(day,
          day + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE AS day
        FROM b),
      wau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS wau FROM cov GROUP BY 1)
      SELECT dau.day AS day, dau, wau,
        CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
      FROM dau JOIN wau ON dau.day = wau.day
      ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q139
  /** q139 — session co-occurrence lift ([[Cohorts.sessionCooccurrence]]):
    * market-basket over q34's sessions — event-type pairs co-present
    * in one sitting beyond chance, q97's log-free fixed-point lift
    * with sessions as the documents; set semantics per session,
    * minSupport hygiene. */
  val q139: Q = Q(
    "q139_session_cooccurrence",
    (s, d) =>
      Cohorts.sessionCooccurrence(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type"),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          event_type
        FROM events),
      flagged AS (
        SELECT user_id, event_id, ts_us, event_type,
          CASE WHEN lag(ts_us) OVER w IS NULL
                 OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
               ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      st AS (
        SELECT DISTINCT user_id AS u,
          SUM(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS sid,
          event_type AS t
        FROM flagged),
      ns AS (
        SELECT count(*) AS n FROM (SELECT DISTINCT u, sid FROM st) q),
      tc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM st GROUP BY 1),
      p AS (
        SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS n_ab
        FROM st a JOIN st b ON a.u = b.u AND a.sid = b.sid AND a.t < b.t
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT ta AS type_a, tb AS type_b, n_ab, ca.c AS n_a, cb.c AS n_b,
        CAST(((n_ab * 1048576) * n) // (ca.c * cb.c) AS BIGINT)
          AS lift_fp
      FROM p
      JOIN tc ca ON ca.t = p.ta
      JOIN tc cb ON cb.t = p.tb
      CROSS JOIN ns
      ORDER BY 1, 2
    """.trim))

  // --------------------------------------------------------------- q149
  /** q149 — daily carry-forward snapshot ([[Rolling.dailySnapshot]]):
    * the value current at end of each day per event type, gaps filled
    * by last observation carried forward — the feature-store daily
    * table (q43 answers one as-of lookup; this writes the calendar);
    * `is_filled` keeps staleness visible. */
  val q149: Q = Q(
    "q149_daily_snapshot",
    (s, d) =>
      Rolling.dailySnapshot(eventsUs(s, d), col("event_type"),
        col("ts_us"), col("event_id"), col("value")),
    Some("""
      WITH o AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
          CAST(value AS DECIMAL(12,2)) AS v
        FROM events),
      lastv AS (
        SELECT key, day, v AS obs_v FROM (
          SELECT key, day, v, row_number() OVER (
            PARTITION BY key, day
            ORDER BY ts_us DESC, event_id DESC) AS rn
          FROM o) t
        WHERE rn = 1),
      g AS (
        SELECT key, unnest(generate_series(first_day, last_day,
          INTERVAL 1 DAY))::DATE AS day
        FROM (
          SELECT key, min(day) AS first_day,
            (SELECT max(day) FROM lastv) AS last_day
          FROM lastv GROUP BY 1) t),
      f AS (
        SELECT g.key, g.day, lastv.obs_v
        FROM g LEFT JOIN lastv ON g.key = lastv.key AND g.day = lastv.day)
      SELECT key, day,
        CAST(last_value(obs_v IGNORE NULLS) OVER (
          PARTITION BY key ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS value,
        obs_v IS NULL AS is_filled
      FROM f ORDER BY key, day
    """.trim))

  // --------------------------------------------------------------- q150
  /** q150 — cohort revenue / LTV curve ([[Cohorts.cohortRevenue]]):
    * per acquisition cohort and week offset, purchase revenue,
    * exact-decimal cumulative, and LTV per cohort user — cohorts from
    * ALL activity, revenue from purchase events only (the decoupling
    * the operator's valueCol contract exists for); dense zero-filled
    * offsets to the global last week. */
  val q150: Q = Q(
    "q150_cohort_ltv",
    (s, d) =>
      Cohorts.cohortRevenue(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us"))),
        when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))),
    Some("""
      WITH b AS (
        SELECT user_id AS u,
          (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS w,
          CAST(CASE WHEN event_type = 'purchase' THEN value
            ELSE 0 END AS DECIMAL(12,2)) AS v
        FROM events),
      ch AS (SELECT u, min(w) AS cohort_week FROM b GROUP BY 1),
      sz AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
        FROM ch GROUP BY 1),
      mw AS (SELECT max(w) AS mw FROM b),
      dense AS (
        SELECT cohort_week, cohort_users,
          unnest(generate_series(0, mw - cohort_week)) AS week_offset
        FROM sz CROSS JOIN mw),
      rev AS (
        SELECT cohort_week, w - cohort_week AS week_offset,
          sum(v) AS rev
        FROM b JOIN ch USING (u) GROUP BY 1, 2)
      SELECT d.cohort_week, d.week_offset, d.cohort_users,
        CAST(coalesce(rev, 0) AS DOUBLE) AS revenue,
        CAST(sum(coalesce(rev, 0)) OVER (
          PARTITION BY d.cohort_week ORDER BY d.week_offset
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue,
        CAST(sum(coalesce(rev, 0)) OVER (
          PARTITION BY d.cohort_week ORDER BY d.week_offset
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
          CAST(d.cohort_users AS DOUBLE) AS ltv_per_user
      FROM dense d
      LEFT JOIN rev ON d.cohort_week = rev.cohort_week
        AND d.week_offset = rev.week_offset
      ORDER BY d.cohort_week, d.week_offset
    """.trim))

  // --------------------------------------------------------------- q151
  /** q151 — daily value bands ([[Rolling.dailyValueBands]]): per
    * (event type, day), count/min/quartiles/max of the event value in
    * exact cents — the box-plot-over-time a daily SUM can't show (mix
    * shift vs price cut). Dyadic-on-integers quartiles. */
  val q151: Q = Q(
    "q151_daily_value_bands",
    (s, d) =>
      Rolling.dailyValueBands(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))),
        (Dec.d2(col("value")) * 100).cast("long")),
    Some("""
      WITH b AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day,
          CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL)
      SELECT key, day, CAST(count(*) AS BIGINT) AS n,
        CAST(min(v) AS BIGINT) AS min_cents,
        quantile_cont(v, 0.25) AS p25_cents,
        quantile_cont(v, 0.5) AS p50_cents,
        quantile_cont(v, 0.75) AS p75_cents,
        CAST(max(v) AS BIGINT) AS max_cents
      FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  // --------------------------------------------------------------- q152
  /** q152 — funnel step timing ([[Cohorts.funnelTiming]]): per
    * consecutive step pair, how long converting users took (exact µs
    * quartiles over the shared strictly-after cascade) — "drop at
    * checkout" vs "slow at checkout", and the empirical input to
    * q118's attribution-window choice. */
  val q152: Q = Q(
    "q152_funnel_timing",
    (s, d) =>
      Cohorts.funnelTiming(eventsUs(s, d), "user_id", col("ts_us"),
        "event_type", Seq("view", "click", "purchase")),
    Some("""
      WITH e AS (
        SELECT user_id AS u, event_type AS t,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events),
      s0 AS (SELECT u, min(ts_us) AS t0 FROM e WHERE t = 'view' GROUP BY u),
      s1 AS (SELECT e.u, min(ts_us) AS t1
             FROM e JOIN s0 ON e.u = s0.u AND e.ts_us > s0.t0
             WHERE t = 'click' GROUP BY e.u),
      s2 AS (SELECT e.u, min(ts_us) AS t2
             FROM e JOIN s1 ON e.u = s1.u AND e.ts_us > s1.t1
             WHERE t = 'purchase' GROUP BY e.u),
      d AS (
        SELECT 1 AS step_idx, 'view' AS step_from, 'click' AS step_to,
          t1 - t0 AS gap
        FROM s0 JOIN s1 USING (u)
        UNION ALL
        SELECT 2, 'click', 'purchase', t2 - t1
        FROM s1 JOIN s2 USING (u))
      SELECT CAST(step_idx AS INT) AS step_idx, step_from, step_to,
        CAST(count(*) AS BIGINT) AS n_users,
        CAST(min(gap) AS BIGINT) AS min_us,
        quantile_cont(gap, 0.25) AS p25_us,
        quantile_cont(gap, 0.5) AS p50_us,
        quantile_cont(gap, 0.75) AS p75_us,
        CAST(max(gap) AS BIGINT) AS max_us
      FROM d GROUP BY 1, 2, 3 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q157
  /** q157 — period-over-period growth ([[Rolling.periodGrowth]]): per
    * event type, each observed day's value total vs the previous
    * observed day, growth rate and day_gap — the dashboard staple
    * with gaps kept honest; exact decimal totals, one IEEE division
    * at the boundary. */
  val q157: Q = Q(
    "q157_period_growth",
    (s, d) =>
      Rolling.periodGrowth(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))), col("value")),
    Some("""
      WITH daily AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day,
          sum(CAST(value AS DECIMAL(12,2))) AS total
        FROM events GROUP BY 1, 2),
      l AS (
        SELECT key, day, total,
          lag(total) OVER w AS prev_total,
          lag(day) OVER w AS prev_day
        FROM daily WINDOW w AS (PARTITION BY key ORDER BY day))
      SELECT key, day, CAST(total AS DOUBLE) AS total,
        CAST(prev_total AS DOUBLE) AS prev_total,
        CAST(day - prev_day AS INT) AS day_gap,
        CASE WHEN prev_total IS NOT NULL AND prev_total <> 0 THEN
          CAST(total - prev_total AS DOUBLE) / CAST(prev_total AS DOUBLE)
        END AS growth
      FROM l ORDER BY key, day
    """.trim))

  // --------------------------------------------------------------- q161
  /** q161 — Pareto / ABC classification ([[Cohorts.paretoClasses]]):
    * brands ranked by exact-decimal revenue mass, classed by
    * cumulative share (A ≤ 0.8, B ≤ 0.95, C the tail) — which brands
    * get premium treatment, which SKUs get end-of-lifed; windows sort
    * only the |brands|-row reduced frame. */
  val q161: Q = Q(
    "q161_abc_classes",
    (s, d) =>
      Cohorts.paretoClasses(
        Tables.lineitem(s, d).join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey")),
        col("p_brand"), col("l_extendedprice")),
    Some("""
      WITH byk AS (
        SELECT p_brand AS key,
          sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS value
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1),
      r AS (
        SELECT key, value,
          CAST(row_number() OVER w AS INT) AS rank,
          sum(value) OVER (w ROWS UNBOUNDED PRECEDING) AS cum,
          sum(value) OVER () AS total
        FROM byk WINDOW w AS (ORDER BY value DESC, key))
      SELECT key, CAST(value AS DOUBLE) AS value, rank,
        CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
        CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
          THEN 'A'
          WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95
          THEN 'B' ELSE 'C' END AS abc_class
      FROM r ORDER BY rank
    """.trim))

  // --------------------------------------------------------------- q164
  /** q164 — running drawdown ([[Rolling.drawdown]]): per event type,
    * each day's value total against the running peak — sustained
    * decline WITH magnitude (CUSUM alarms, this sizes); exact decimal
    * peak, one boundary division. */
  val q164: Q = Q(
    "q164_drawdown",
    (s, d) =>
      Rolling.drawdown(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))), col("value")),
    Some("""
      WITH daily AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day,
          sum(CAST(value AS DECIMAL(12,2))) AS total
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT key, day, total,
          max(total) OVER (PARTITION BY key ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS peak
        FROM daily)
      SELECT key, day, CAST(total AS DOUBLE) AS total,
        CAST(peak AS DOUBLE) AS peak,
        CASE WHEN peak > 0 THEN
          1.0e0 - CAST(total AS DOUBLE) / CAST(peak AS DOUBLE)
        END AS drawdown
      FROM p ORDER BY key, day
    """.trim))

  // --------------------------------------------------------------- q169
  /** q169 — activity streaks ([[Cohorts.activityStreaks]]): per user,
    * runs of consecutive active days via gaps-and-islands (day −
    * row_number is constant within a run — pure integer arithmetic);
    * longest-streak ties pinned to the earliest start. The habit
    * signal q138's DAU/WAU ratio can't see. */
  val q169: Q = Q(
    "q169_activity_streaks",
    (s, d) =>
      Cohorts.activityStreaks(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id AS u,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d
        FROM events),
      isl AS (
        SELECT u, d,
          d - row_number() OVER (PARTITION BY u ORDER BY d) AS island
        FROM days),
      st AS (
        SELECT u, island, CAST(count(*) AS BIGINT) AS len,
          min(d) AS start_d
        FROM isl GROUP BY 1, 2),
      fl AS (
        SELECT u, len, start_d,
          sum(len) OVER (PARTITION BY u) AS active_days,
          count(*) OVER (PARTITION BY u) AS n_streaks,
          max(len) OVER (PARTITION BY u) AS mx
        FROM st)
      SELECT u AS "user",
        CAST(max(active_days) AS BIGINT) AS active_days,
        CAST(max(n_streaks) AS BIGINT) AS n_streaks,
        CAST(max(mx) AS BIGINT) AS max_streak,
        DATE '1970-01-01' + CAST(min(start_d) AS INTEGER)
          AS max_streak_start
      FROM fl WHERE len = mx GROUP BY u ORDER BY u
    """.trim))

  // --------------------------------------------------------------- q170
  /** q170 — trending rank shift ([[Rolling.rankShift]]): the
    * leaderboard movement report — parts ranked by exact-decimal
    * revenue in the trailing 30 shipping days vs the 30 before,
    * rank delta for the current top 20; anchored to the data's own
    * clock, ranks pinned by (value DESC, key ASC) row_number. */
  val q170: Q = Q(
    "q170_rank_shift",
    (s, d) =>
      Rolling.rankShift(Tables.lineitem(s, d), col("l_partkey"),
        to_date(col("l_shipdate")), col("l_extendedprice"),
        windowDays = 30, topK = 20),
    Some("""
      WITH daily AS (
        SELECT l_partkey AS key, CAST(l_shipdate AS DATE) AS day,
          sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS total
        FROM lineitem GROUP BY 1, 2),
      aged AS (
        SELECT key, total,
          (max(day) OVER ()) - day AS age
        FROM daily),
      periods AS (
        SELECT key,
          sum(CASE WHEN age < 30 THEN total END) AS cur_v,
          sum(CASE WHEN age >= 30 AND age < 60 THEN total END) AS prev_v
        FROM aged GROUP BY 1),
      cur AS (
        SELECT key, cur_v,
          row_number() OVER (ORDER BY cur_v DESC, key) AS cur_rank
        FROM periods WHERE cur_v IS NOT NULL
        QUALIFY cur_rank <= 20),
      prev AS (
        SELECT key, prev_v,
          row_number() OVER (ORDER BY prev_v DESC, key) AS prev_rank
        FROM periods WHERE prev_v IS NOT NULL)
      SELECT cur.key AS key, CAST(cur_rank AS INTEGER) AS cur_rank,
        CAST(cur_v AS DOUBLE) AS cur_value,
        CAST(prev_rank AS INTEGER) AS prev_rank,
        CAST(prev_v AS DOUBLE) AS prev_value,
        CAST(prev_rank - cur_rank AS INTEGER) AS rank_gain
      FROM cur LEFT JOIN prev ON cur.key = prev.key
      ORDER BY cur_rank
    """.trim))

  // --------------------------------------------------------------- q172
  /** q172 — causal expanding z-score ([[Rolling.causalZScore]]):
    * leakage-safe standardization — each event's value scored against
    * its user's STRICTLY PRIOR history only (the training feature
    * that never reads the future); exact-integer window sums, the
    * z a fixed IEEE expression tree over exact scalars. */
  val q172: Q = Q(
    "q172_causal_zscore",
    (s, d) =>
      Rolling.causalZScore(eventsUs(s, d), col("user_id"),
        col("ts_us"), col("event_id"), col("value")),
    Some("""
      WITH base AS (
        SELECT user_id AS key, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          event_id AS id,
          CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) AS c
        FROM events),
      w AS (
        SELECT key, id, c,
          count(c) OVER win AS n_prior,
          sum(c) OVER win AS s,
          sum(c * c) OVER win AS q
        FROM base
        WINDOW win AS (PARTITION BY key ORDER BY ts_us, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT key, id, CAST(n_prior AS BIGINT) AS n_prior,
        CAST(c AS DOUBLE) / 100.0 AS value,
        CASE WHEN n_prior >= 2
          AND CAST(n_prior * q - s * s AS DOUBLE) > 0 THEN
          CAST(n_prior * c - s AS DOUBLE)
            / sqrt(CAST(n_prior * q - s * s AS DOUBLE))
            * sqrt(CAST(n_prior - 1 AS DOUBLE) / CAST(n_prior AS DOUBLE))
        END AS z
      FROM w ORDER BY key, id
    """.trim))

  // --------------------------------------------------------------- q177
  /** q177 — event-type PageRank ([[Cohorts.transitionPageRank]]):
    * random-surfer importance over the q122 transition graph in
    * fixed-point 2⁴⁰ integer arithmetic — every product, sum and
    * floor-div engine-exact, so even an ITERATIVE analytic sits under
    * the oracle gate (a float power iteration could not hash-verify);
    * 3 iterations, damping 0.85, leaky dangling mass (documented). */
  val q177: Q = Q(
    "q177_type_pagerank",
    (s, d) =>
      Cohorts.transitionPageRank(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id", iters = 3),
    Some(s"""
      WITH tr AS (
        SELECT event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      e AS (
        SELECT prev AS src, event_type AS dst,
          CAST(count(*) AS BIGINT) AS n
        FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
      ot AS (SELECT src, sum(n) AS n_src FROM e GROUP BY 1),
      ew AS (SELECT e.src, e.dst, e.n, ot.n_src FROM e JOIN ot USING (src)),
      nodes AS (SELECT DISTINCT event_type AS t FROM events),
      nn AS (SELECT count(*) AS n FROM nodes),
      r0 AS (SELECT t, 1099511627776 // (SELECT n FROM nn) AS r
             FROM nodes),
      ${prIter("r0", "r1").trim},
      ${prIter("r1", "r2").trim},
      ${prIter("r2", "r3").trim}
      SELECT t AS event_type, CAST(r AS BIGINT) AS rank_fp,
        CAST(r AS DOUBLE) / 1099511627776.0 AS rank
      FROM r3 ORDER BY rank_fp DESC, event_type
    """.trim))

  // --------------------------------------------------------------- q181
  /** q181 — transition predictability
    * ([[Cohorts.transitionPredictability]]): per from-type, the
    * majority-baseline accuracy — the share of transitions going to
    * the single most common successor; "does a sequence model beat a
    * lookup table" as a measured number, ties pinned to the smallest
    * to-type. */
  val q181: Q = Q(
    "q181_transition_predictability",
    (s, d) =>
      Cohorts.transitionPredictability(Tables.events(s, d), "user_id",
        "ts", "event_type", "event_id"),
    Some("""
      WITH tr AS (
        SELECT event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      e AS (
        SELECT prev AS from_type, event_type AS to_type,
          CAST(count(*) AS BIGINT) AS n
        FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
      r AS (
        SELECT from_type, to_type, n,
          CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
            AS n_transitions,
          row_number() OVER (PARTITION BY from_type
            ORDER BY n DESC, to_type) AS rr
        FROM e)
      SELECT from_type, n_transitions, to_type AS top_to_type,
        n AS n_top,
        CAST(n AS DOUBLE) / CAST(n_transitions AS DOUBLE) AS hit_rate
      FROM r WHERE rr = 1 ORDER BY from_type
    """.trim))

  // --------------------------------------------------------------- q183
  /** q183 — OLS daily trend ([[Trend.olsTrend]]): least-squares
    * counts/day slope per stream from the five classical sums — one
    * partial-aggregable pass, exact-integer sums, ONE boundary
    * division; the cheap rung under q184's robust estimator. */
  val q183: Q = Q(
    "q183_ols_trend",
    (s, d) =>
      Trend.olsTrend(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH daily AS (
        SELECT event_type AS key,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d,
          CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      a AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_days,
          sum(CAST(d AS HUGEINT)) AS sx, sum(CAST(c AS HUGEINT)) AS sy,
          sum(CAST(d AS HUGEINT) * c) AS sxy,
          sum(CAST(d AS HUGEINT) * d) AS sxx
        FROM daily GROUP BY 1)
      SELECT key, n_days,
        CASE WHEN n_days >= 2 THEN
          CAST(n_days * sxy - sx * sy AS DOUBLE)
            / CAST(n_days * sxx - sx * sx AS DOUBLE)
        END AS slope
      FROM a ORDER BY key
    """.trim))

  // --------------------------------------------------------------- q184
  /** q184 — robust trend ([[Trend.theilSenTrend]]): Theil–Sen median
    * slope + Mann–Kendall S per stream — the outlier-proof reading
    * of q183's fit; pairwise over the calendar-bounded daily frame
    * (the documented profile-time cost), each slope one IEEE division
    * of exact ints, the sign-sum exact-integer. */
  val q184: Q = Q(
    "q184_robust_trend",
    (s, d) =>
      Trend.theilSenTrend(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH daily AS (
        SELECT event_type AS key,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d,
          CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT a.key AS key,
          CAST(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
            ELSE 0 END AS BIGINT) AS sgn,
          CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
            AS slope
        FROM daily a JOIN daily b ON a.key = b.key AND a.d < b.d),
      st AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(sum(sgn) AS BIGINT) AS mk_s,
          quantile_cont(slope, 0.5) AS sen_slope
        FROM p GROUP BY 1),
      nd AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1)
      SELECT nd.key AS key, n_days,
        CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
        CAST(coalesce(mk_s, 0) AS BIGINT) AS mk_s, sen_slope
      FROM nd LEFT JOIN st USING (key) ORDER BY key
    """.trim))

  // --------------------------------------------------------------- q191
  /** q191 — lag-7 autocorrelation ([[Trend.lagAutocorrelation]]):
    * per stream, the Pearson r between each day's count and the count
    * a week earlier — the seasonality STRENGTH behind q173's WMAPE
    * and q163's dow conditioning; six exact sums, one fixed IEEE
    * tree, zero variance keeps NULL. */
  val q191: Q = Q(
    "q191_lag_autocorrelation",
    (s, d) =>
      Trend.lagAutocorrelation(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))), lagDays = 7),
    Some("""
      WITH daily AS (
        SELECT event_type AS key,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d,
          CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      j AS (
        SELECT cur.key AS key, p.c AS x, cur.c AS y
        FROM daily cur JOIN daily p
          ON cur.key = p.key AND cur.d = p.d + 7),
      a AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_days,
          sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
          sum(CAST(x AS HUGEINT) * y) AS sxy,
          sum(CAST(x AS HUGEINT) * x) AS sxx,
          sum(CAST(y AS HUGEINT) * y) AS syy
        FROM j GROUP BY 1)
      SELECT key, n_days,
        CASE WHEN n_days >= 2 AND n_days * sxx - sx * sx > 0
          AND n_days * syy - sy * sy > 0 THEN
          CAST(n_days * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)))
        END AS autocorr
      FROM a ORDER BY key
    """.trim))

  // --------------------------------------------------------------- q194
  /** q194 — event trigram mining ([[Cohorts.eventTrigrams]]): 3-step
    * sequential patterns with support floor and share — funnel
    * DISCOVERY where q73 measures a named funnel; one user-keyed
    * window, |types|³-bounded counts, pinned ties. */
  val q194: Q = Q(
    "q194_event_trigrams",
    (s, d) =>
      Cohorts.eventTrigrams(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id", minCount = 5L),
    Some("""
      WITH o AS (
        SELECT event_type,
          lag(event_type, 1) OVER w AS p1,
          lag(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      tri AS (
        SELECT p2 || ' > ' || p1 || ' > ' || event_type AS trigram,
          CAST(count(*) AS BIGINT) AS n
        FROM o WHERE p2 IS NOT NULL GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM tri)
      SELECT trigram, n,
        CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) AS share
      FROM tri, t WHERE n >= 5
      ORDER BY n DESC, trigram
    """.trim))

  // --------------------------------------------------------------- q196
  /** q196 — daily next-day retention ([[Cohorts.dailyRetention]]):
    * per day, the share of actives returning the very next day — the
    * D1 launch-day readout under q72's weekly matrix; the last
    * observed day drops (its next day hasn't happened). */
  val q196: Q = Q(
    "q196_daily_retention",
    (s, d) =>
      Cohorts.dailyRetention(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH b AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        FROM events),
      nxt AS (
        SELECT day - INTERVAL 1 DAY AS day, u, 1 AS r FROM b),
      j AS (
        SELECT b.day AS day, CAST(count(*) AS BIGINT) AS n_active,
          CAST(coalesce(sum(r), 0) AS BIGINT) AS n_retained
        FROM b LEFT JOIN nxt ON b.day = nxt.day AND b.u = nxt.u
        GROUP BY 1),
      mx AS (SELECT max(day) AS m FROM b)
      SELECT day, n_active, n_retained,
        CAST(n_retained AS DOUBLE) / CAST(n_active AS DOUBLE)
          AS d1_retention
      FROM j, mx WHERE day < m ORDER BY day
    """.trim))

  // --------------------------------------------------------------- q201
  /** q201 — stratum mean ± SE ([[Trend.stratumMeanSE]]): per
    * language, mean doc length with its standard error — the survey
    * estimator that gives small-stratum stats an honest error bar;
    * exact sums, one division, one fixed sqrt tree. */
  val q201: Q = Q(
    "q201_stratum_mean_se",
    (s, d) =>
      Trend.stratumMeanSE(Tables.documents(s, d), col("lang"),
        col("n_chars")),
    Some("""
      WITH a AS (
        SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n,
          sum(CAST(n_chars AS HUGEINT)) AS s,
          sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
        FROM documents WHERE n_chars IS NOT NULL GROUP BY 1)
      SELECT stratum, n,
        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        CASE WHEN n >= 2 AND n * q - s * s >= 0 THEN
          sqrt(CAST(n * q - s * s AS DOUBLE))
            / (CAST(n AS DOUBLE) * sqrt(CAST(n - 1 AS DOUBLE)))
        END AS se
      FROM a ORDER BY stratum
    """.trim))

  // --------------------------------------------------------------- q202
  /** q202 — metric correlation ([[Trend.groupCorrelation]]): per
    * order priority, Pearson r between line quantity and discount
    * cents — q191's six-sum machinery off the time axis; exact-int
    * sums, one fixed IEEE tree. */
  val q202: Q = Q(
    "q202_metric_correlation",
    (s, d) =>
      Trend.groupCorrelation(
        Tables.lineitem(s, d).join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey")),
        col("o_orderpriority"),
        col("l_quantity").cast("long"),
        (Dec.d2(col("l_discount")) * 100).cast("long")),
    Some("""
      WITH b AS (
        SELECT o_orderpriority AS key,
          CAST(l_quantity AS BIGINT) AS x,
          CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
      a AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n,
          sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
          sum(CAST(x AS HUGEINT) * y) AS sxy,
          sum(CAST(x AS HUGEINT) * x) AS sxx,
          sum(CAST(y AS HUGEINT) * y) AS syy
        FROM b GROUP BY 1)
      SELECT key, n,
        CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
          AND n * syy - sy * sy > 0 THEN
          CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        END AS r
      FROM a ORDER BY key
    """.trim))

  // --------------------------------------------------------------- q204
  /** q204 — A/B conversion z-test ([[Cohorts.abConversionZ]]): users
    * hash-split into two arms (no rand(); the assignment reproduces
    * everywhere), purchase conversion per arm, the two-proportion z
    * under the pooled null — |z| ≳ 2 says the difference is probably
    * real; on a hash split of ONE population it should hover near 0
    * (the A/A sanity reading). */
  val q204: Q = Q(
    "q204_ab_conversion_z",
    (s, d) =>
      Cohorts.abConversionZ(Tables.events(s, d), "user_id",
        "event_type", "purchase"),
    Some(s"""
      WITH pu AS (
        SELECT user_id AS u,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS conv
        FROM events GROUP BY 1),
      arm AS (
        SELECT ((u % $P) * 2654435761 % $P + 12345) % $P % 2 AS arm,
          conv
        FROM pu),
      st AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(conv) AS BIGINT) AS k
        FROM arm GROUP BY 1),
      ab AS (
        SELECT
          (SELECT n FROM st WHERE arm = 0) AS n_a,
          (SELECT k FROM st WHERE arm = 0) AS k_a,
          (SELECT n FROM st WHERE arm = 1) AS n_b,
          (SELECT k FROM st WHERE arm = 1) AS k_b),
      r AS (
        SELECT n_a, k_a, n_b, k_b,
          CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
          CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
          CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p
        FROM ab),
      r2 AS (
        SELECT *, sqrt(p * (1.0e0 - p) *
          (1.0e0 / CAST(n_a AS DOUBLE) + 1.0e0 / CAST(n_b AS DOUBLE)))
          AS se
        FROM r)
      SELECT n_a, k_a, n_b, k_b, rate_a, rate_b,
        CASE WHEN se > 0 THEN (rate_a - rate_b) / se END AS z
      FROM r2
    """.trim))

  // --------------------------------------------------------------- q205
  /** q205 — price-volume-mix bridge ([[Rolling.priceVolumeMix]]): per
    * order priority, the revenue change between trailing 30-day
    * windows split into volume and price effects — q170 says WHO
    * moved, this says WHY; exact decimal Δrevenue, fixed-tree
    * effects, NULL where no unit price exists. */
  val q205: Q = Q(
    "q205_price_volume_mix",
    (s, d) =>
      Rolling.priceVolumeMix(
        Tables.lineitem(s, d).join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey")),
        col("o_orderpriority"), to_date(col("l_shipdate")),
        col("l_quantity"), col("l_extendedprice"), windowDays = 30),
    Some("""
      WITH base AS (
        SELECT o_orderpriority AS key, CAST(l_shipdate AS DATE) AS day,
          CAST(l_quantity AS BIGINT) AS q,
          CAST(l_extendedprice AS DECIMAL(12,2)) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      a AS (SELECT max(day) AS anchor FROM base),
      per AS (
        SELECT key,
          sum(CASE WHEN anchor - day < 30 THEN q END) AS q2,
          sum(CASE WHEN anchor - day < 30 THEN r END) AS r2,
          sum(CASE WHEN anchor - day >= 30 AND anchor - day < 60
            THEN q END) AS q1,
          sum(CASE WHEN anchor - day >= 30 AND anchor - day < 60
            THEN r END) AS r1
        FROM base, a GROUP BY 1
        HAVING q1 IS NOT NULL OR q2 IS NOT NULL)
      SELECT key, CAST(q1 AS BIGINT) AS q1, CAST(r1 AS DOUBLE) AS r1,
        CAST(q2 AS BIGINT) AS q2, CAST(r2 AS DOUBLE) AS r2,
        CAST(coalesce(r2, CAST(0 AS DECIMAL(12,2)))
          - coalesce(r1, CAST(0 AS DECIMAL(12,2))) AS DOUBLE)
          AS delta_revenue,
        CASE WHEN q1 > 0 AND q2 > 0 THEN
          CAST(q2 - q1 AS DOUBLE)
            * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
        END AS volume_effect,
        CASE WHEN q1 > 0 AND q2 > 0 THEN
          CAST(q2 AS DOUBLE)
            * (CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
               - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
        END AS price_effect
      FROM per ORDER BY key
    """.trim))

  // --------------------------------------------------------------- q215
  /** q215 — half-life decayed counts ([[Trend.halfLifeCounts]]): per
    * event type, total mass and the recency-weighted mass
    * `Σ n_day · 2^-(anchor − day)` — the "what's hot NOW" readout.
    * The dyadic half-life makes every weight an exact power of two,
    * so the fold runs in exact integer fixed point (DECIMAL ×
    * 1 << (40 − age)) and hash-verifies where a pow-based decay
    * could not; the oracle replays the same shifts with HUGEINT. */
  val q215: Q = Q(
    "q215_half_life_counts",
    (s, d) =>
      Trend.halfLifeCounts(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))), horizonDays = 40)
        .withColumnRenamed("k", "event_type"),
    Some("""
      WITH c AS (
        SELECT event_type AS k, CAST(ts AS DATE) AS day,
          CAST(count(*) AS BIGINT) AS n
        FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2),
      a AS (SELECT max(day) AS anchor FROM c),
      f AS (SELECT k, n, (anchor - day) AS age FROM c, a)
      SELECT k AS event_type,
        CAST(sum(n) AS BIGINT) AS n_events,
        CAST(sum(CASE WHEN age BETWEEN 0 AND 40 THEN
            CAST(n AS HUGEINT) * (1::BIGINT << (40 - age))
          ELSE 0 END) AS DOUBLE) / 1099511627776.0 AS decayed
      FROM f GROUP BY k ORDER BY k
    """.trim))

  // --------------------------------------------------------------- q242
  /** q242 — discrete survival hazard ([[Cohorts.discreteHazard]]):
    * per lifetime day, users still at risk and the fraction churning
    * exactly then, with right-censoring at the data's own max day
    * (1-day inactivity on this 30-day dense fixture, where a 7-day
    * rule censors literally everyone) — the Kaplan–Meier input
    * emitted as the
    * hazard table (the KM curve itself is a cumulative product with
    * no engine-exact form; the hazard column is its sufficient
    * statistic, one exact fixed-point division per row). */
  val q242: Q = Q(
    "q242_survival_hazard",
    (s, d) =>
      Cohorts.discreteHazard(Tables.events(s, d), "user_id", col("ts"),
        inactivityDays = 1),
    Some("""
      WITH e AS (
        SELECT user_id AS u,
          CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
            AS BIGINT) AS d
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      pu AS (SELECT u, min(d) AS fd, max(d) AS ld FROM e GROUP BY 1),
      a AS (SELECT max(ld) AS anchor FROM pu),
      lab AS (
        SELECT u, fd, ld, (ld <= anchor - 1) AS churned,
          CASE WHEN ld <= anchor - 1 THEN ld - fd
               ELSE anchor - fd END AS t
        FROM pu CROSS JOIN a),
      bt AS (
        SELECT t, CAST(count(*) AS BIGINT) AS n_exit,
          CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
            AS n_churned
        FROM lab GROUP BY 1)
      SELECT t AS t_days,
        CAST(sum(n_exit) OVER (ORDER BY t
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
          AS n_at_risk,
        n_churned,
        CAST((n_churned * 1048576) // (sum(n_exit) OVER (ORDER BY t
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          AS BIGINT) AS hazard_fp
      FROM bt ORDER BY t_days
    """.trim))
}
