package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics the q72/q73 oracle fixtures can't be trusted to exercise:
  * cohort assignment at week boundaries, funnel steps arriving OUT of
  * order (a click before any view must not count), and the pinned
  * strictly-after tie rule (same-microsecond pairs don't advance). */
class CohortsSpec extends SparkSpec {

  import spark.implicits._

  test("retentionMatrix: cohort = first active week, offsets count distinct users") {
    // week index: 1970-01-01 is day 0 → week 0; 1970-01-08 is day 7 → week 1
    val events = Seq(
      (1L, "1970-01-01"), (1L, "1970-01-02"),   // u1 week 0, twice (dedup)
      (1L, "1970-01-08"),                        // u1 week 1
      (2L, "1970-01-08"), (2L, "1970-01-22"),    // u2 cohort week 1, offset 2
      (3L, "1970-01-07")                         // u3 day 6 → still week 0
    ).toDF("user_id", "d").select(col("user_id"), to_date(col("d")).as("d"))

    val m = Cohorts.retentionMatrix(events, "user_id", col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq == Seq(
      (0L, 0L, 2L),   // u1 + u3 acquired week 0 (u1's two day-0 events dedup)
      (0L, 1L, 1L),   // u1 back in week 1
      (1L, 0L, 1L),   // u2 acquired week 1
      (1L, 2L, 1L)))  // u2 back two weeks later
  }

  test("funnel: out-of-order and tied steps do not advance") {
    val events = Seq(
      // u1: full ordered funnel
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: click BEFORE its only view — depth stops at view
      (2L, 20L, "click"), (2L, 30L, "view"),
      // u3: click at the SAME microsecond as the view — strictly-after
      // rule says not advanced; later purchase can't fire without click
      (3L, 10L, "view"), (3L, 10L, "click"), (3L, 40L, "purchase"),
      // u4: no funnel steps at all
      (4L, 10L, "error")
    ).toDF("user_id", "ts_us", "event_type")

    val f = Cohorts.funnel(events, "user_id", col("ts_us"), "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(f == Seq(
      (0, "(none)", 1L),   // u4
      (1, "view", 2L),     // u2, u3
      (3, "purchase", 1L)))// u1
  }

  test("funnel: a later view can restart the chain for a previously-early click") {
    // u5's first view at 30 is AFTER its click at 20 — but a second
    // click at 40 follows the view, so the funnel completes through
    // click. Earliest-completion semantics: t_view = 30, t_click = 40.
    val events = Seq(
      (5L, 20L, "click"), (5L, 30L, "view"), (5L, 40L, "click")
    ).toDF("user_id", "ts_us", "event_type")
    val f = Cohorts.funnel(events, "user_id", col("ts_us"), "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(f == Seq((2, "click", 1L)))
  }

  test("funnel rejects duplicate or empty step lists") {
    val df = Seq((1L, 1L, "view")).toDF("user_id", "ts_us", "event_type")
    intercept[IllegalArgumentException] {
      Cohorts.funnel(df, "user_id", col("ts_us"), "event_type",
        Seq("view", "view"))
    }
    intercept[IllegalArgumentException] {
      Cohorts.funnel(df, "user_id", col("ts_us"), "event_type", Nil)
    }
  }

  test("growthCurve: cumulative distinct = running sum of first-seens") {
    val events = Seq(
      (1L, "2024-06-01"), (1L, "2024-06-01"),  // u1 twice day 1 (dedup)
      (2L, "2024-06-01"),
      (1L, "2024-06-02"), (3L, "2024-06-02"),
      (3L, "2024-06-04")                        // gap day 3; no new users
    ).toDF("user_id", "d").select(col("user_id"), to_date(col("d")).as("d"))
    val out = Cohorts.growthCurve(events, "user_id", col("d"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      ("2024-06-01", 2L, 2L, 2L),
      ("2024-06-02", 2L, 1L, 3L),
      ("2024-06-04", 1L, 0L, 3L)))
  }

  test("slidingActiveUsers: 7-day coverage, observed days only") {
    val events = Seq(
      (1L, "2024-07-01"), (1L, "2024-07-01"),  // u1 dup same day
      (2L, "2024-07-01"),
      (2L, "2024-07-08"),                       // u1's 07-01 does NOT reach 07-08
      (3L, "2024-07-09")
    ).toDF("user_id", "d").select(col("user_id"), to_date(col("d")).as("d"))
    val out = Cohorts.slidingActiveUsers(events, "user_id", col("d"), 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(out.toSeq == Seq(
      ("2024-07-01", 2L),  // u1 + u2
      ("2024-07-08", 1L),  // only u2's 07-08 — day 1 coverage ended 07-07
      ("2024-07-09", 2L))) // u2 (via 07-08) + u3; no ghost days past 07-09
  }

  test("rfmSegments: exact integer quartile bins by hand; cents " +
    "truncate exactly; constant metric bins everyone 0") {
    val s = spark; import s.implicits._
    // 4 users, one purchase each: recency 1..4, value 1.00..4.00 —
    // quartiles of {1,2,3,4} interpolate to 1.75/2.5/3.25, so bins
    // are 0,1,2,3; frequency is constant 1 → everyone bins 0
    val ev = Seq(
      (1L, 1L, 1.00), (2L, 2L, 2.00), (3L, 3L, 3.00), (4L, 4L, 4.00))
      .toDF("user_id", "ts_us", "value")
    val out = Cohorts.rfmSegments(ev, "user_id", "ts_us", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getInt(7)))).toMap
    assert(out(1L) == ((100L, 0, 0, 0, 0)))
    assert(out(2L) == ((200L, 1, 0, 1, 101)))
    assert(out(3L) == ((300L, 2, 0, 2, 202)))
    assert(out(4L) == ((400L, 3, 0, 3, 303)))
  }

  test("transitionMatrix: per-user consecutive pairs; id pins " +
    "simultaneous events; first events drop; shares condition on from") {
    val s = spark; import s.implicits._
    // u1: a→b→b ; u2: a→c plus a SIMULTANEOUS pair at t=1 where the
    // event_id order (10 then 11) decides a→c, not c→a
    val events = Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "b", 3L),
      (2L, 1L, "a", 10L), (2L, 1L, "c", 11L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Cohorts.transitionMatrix(events, "user_id", "ts",
      "event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // transitions: u1 a→b, b→b; u2 a→c (id-ordered). From 'a': 2
    // total → p = .5 each; from 'b': 1 total → p = 1.
    assert(out == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "b") -> ((1L, 1.0))))
  }

  test("interEventGaps: same-type consecutive gaps per user; ties pinned " +
    "by id; single-occurrence streams carry no gap") {
    // u1/A: 0,10,30 → gaps 10,20; u2/A: 50,50 (ids pin order) → gap 0;
    // u2/A: 55 → gap 5; u1/B: one event → no gap, B absent
    val events = Seq(
      (1L, "A", 0L, 1L), (1L, "A", 10L, 2L), (1L, "A", 30L, 3L),
      (2L, "A", 50L, 4L), (2L, "A", 50L, 5L), (2L, "A", 55L, 6L),
      (1L, "B", 7L, 7L)
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val out = Cohorts.interEventGaps(events, "user_id", "ts_us",
      "event_id", "event_type").collect()
    assert(out.length == 1)
    val r = out(0)
    // gaps {0, 5, 10, 20}: p·(n−1) = 0.75, 1.5, 2.25 → 3.75, 7.5, 12.5
    assert(r.getString(0) == "A" && r.getLong(1) == 4L)
    assert(r.getLong(2) == 0L && r.getLong(6) == 20L)
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) ==
      ((3.75, 7.5, 12.5)))
  }

  test("sessionCooccurrence: co-presence is set semantics, the gap splits " +
    "baskets, minSupport drops one-off pairs, lift is exact fixed-point") {
    // u1 session 1: A,B,A (A counted once) — {A,B}; a >30-min gap then
    // {A,C}. u2: {A,B}. u3: {D} (lonely type, pairs with nothing).
    val g = 30L * 60 * 1000 * 1000
    val events = Seq(
      (1L, 0L, "A", 1L), (1L, 10L, "B", 2L), (1L, 20L, "A", 3L),
      (1L, 20L + g + 1, "A", 4L), (1L, 30L + g + 1, "C", 5L),
      (2L, 0L, "A", 6L), (2L, 5L, "B", 7L),
      (3L, 0L, "D", 8L)
    ).toDF("user_id", "ts_us", "event_type", "event_id")
      .select(col("user_id"), col("ts_us"), col("event_type"),
        col("event_id"))
    // N=4 sessions; n_A=3, n_B=2, n_C=1, n_D=1; pairs (A,B):2, (A,C):1
    val sup2 = Cohorts.sessionCooccurrence(events, "user_id", "ts_us",
      "event_id", "event_type").collect()
    assert(sup2.length == 1)
    val r = sup2(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("A", "B", 2L, 3L, 2L)))
    // lift = 2·4/(3·2) = 4/3 → floor(4·2^20/3) = 1398101
    assert(r.getLong(5) == 1398101L)
    val sup1 = Cohorts.sessionCooccurrence(events, "user_id", "ts_us",
      "event_id", "event_type", minSupport = 1L).collect()
    assert(sup1.map(x => (x.getString(0), x.getString(1))).toSet ==
      Set(("A", "B"), ("A", "C")))
  }

  test("paretoClasses: cumulative-share classes by hand; ties rank by " +
    "key; boundary values stay in the lower class") {
    // values: a=80, b=15, c=4, d=1 (total 100): cum shares .80/.95/
    // .99/1.0 → A, B (both AT their boundaries — <= keeps them), C, C
    val df = Seq(("a", 80.0), ("b", 15.0), ("c", 4.0), ("d", 1.0))
      .toDF("k", "v")
    val out = Cohorts.paretoClasses(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(2), r.getDouble(3), r.getString(4)))).toMap
    assert(out("a") == ((1, 0.8, "A")))
    assert(out("b") == ((2, 0.95, "B")))
    assert(out("c") == ((3, 0.99, "C")))
    assert(out("d") == ((4, 1.0, "C")))
  }

  test("funnelTiming: deltas only for converting users, exact quartile " +
    "interpolation, strictly-positive gaps") {
    val events = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 50L, "purchase"),
      (2L, 0L, "view"), (2L, 40L, "click"),
      (3L, 5L, "click") // click with no prior view — no delta anywhere
    ).toDF("user_id", "ts_us", "event_type")
    val out = Cohorts.funnelTiming(events, "user_id", col("ts_us"),
      "event_type", Seq("view", "click", "purchase")).collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7), r.getLong(8)))).toMap
    // view→click gaps {10, 40}: p·1 = .25/.5/.75 → 17.5 / 25 / 32.5
    assert(out(("view", "click")) ==
      ((2L, 10L, 17.5, 25.0, 32.5, 40L)))
    assert(out(("click", "purchase")) ==
      ((1L, 30L, 30.0, 30.0, 30.0, 30L)))
  }

  test("cohortRevenue: dense zero-filled offsets, exact decimal " +
    "cumulative, LTV per cohort user; cohorts from all activity") {
    // weeks: 1970-01-01 = week 0, +7d = week 1, +14d = week 2
    val ev = Seq(
      (1L, "1970-01-01", 10.0, "purchase"),  // u1 cohort 0, rev wk 0
      (1L, "1970-01-15", 5.0, "purchase"),   // u1 rev wk 2
      (2L, "1970-01-01", 99.0, "view"),      // u2 cohort 0, no revenue
      (3L, "1970-01-08", 1.0, "purchase")    // u3 cohort 1, rev wk 1
    ).toDF("user_id", "d", "value", "event_type")
      .select(col("user_id"), to_date(col("d")).as("d"), col("value"),
        col("event_type"))
    val out = Cohorts.cohortRevenue(ev, "user_id", col("d"),
      when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(0.0)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out == Map(
      (0L, 0L) -> ((2L, 10.0, 10.0, 5.0)),
      (0L, 1L) -> ((2L, 0.0, 10.0, 5.0)),
      (0L, 2L) -> ((2L, 5.0, 15.0, 7.5)),
      (1L, 0L) -> ((1L, 1.0, 1.0, 1.0)),
      (1L, 1L) -> ((1L, 0.0, 1.0, 1.0))))
  }

  test("stickiness: DAU over trailing-window actives; observed days only") {
    val events = Seq(
      (1L, "2020-01-01"), (2L, "2020-01-01"), (1L, "2020-01-01"),
      (1L, "2020-01-05")
    ).toDF("user_id", "d").select(col("user_id"), to_date(col("d")).as("d"))
    val out = Cohorts.stickiness(events, "user_id", col("d"), 7)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 01-01: dau 2 (u1 dedup), wau 2 → 1.0; 01-05: dau 1, wau 2
    // (u1+u2 active within the trailing 7 days) → 0.5; ghost days
    // 01-02..01-04 (inside windows, no events) are absent
    assert(out == Map(
      "2020-01-01" -> ((2L, 2L, 1.0)),
      "2020-01-05" -> ((1L, 2L, 0.5))))
  }

  test("activityStreaks: islands split on gaps; same-day dups dedup; " +
    "equal-length streak tie takes the EARLIEST start") {
    val events = Seq(
      // u1: 3-day streak, isolated day, 2-day streak (6 active days)
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-02"),
      (1L, "2024-01-03"), (1L, "2024-01-05"),
      (1L, "2024-01-10"), (1L, "2024-01-11"),
      // u2: one day only
      (2L, "2024-02-01"),
      // u3: two 2-day streaks — the tie must resolve to the first
      (3L, "2024-03-01"), (3L, "2024-03-02"),
      (3L, "2024-03-10"), (3L, "2024-03-11")
    ).toDF("user_id", "d").select(col("user_id"), to_date(col("d")).as("d"))
    val out = Cohorts.activityStreaks(events, "user_id", col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDate(4).toString))
    assert(out.toSeq == Seq(
      (1L, 6L, 3L, 3L, "2024-01-01"),
      (2L, 1L, 1L, 1L, "2024-02-01"),
      (3L, 4L, 2L, 2L, "2024-03-01")))
  }

  test("transitionPageRank: hand-replayed fixed-point iterations on " +
    "A->B; terminal node leaks damped mass; deterministic re-run") {
    val ev = Seq((1L, 10L, "A", 1L), (1L, 20L, "B", 2L))
      .toDF("user_id", "ts", "t", "id")
    val out = Cohorts.transitionPageRank(ev, "user_id", "ts", "t", "id",
      iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // SCALE = 2^40; N = 2: r0 = 549755813888 each;
    // base = ((SCALE*15)//100)//2 = 82463372083
    // r1(A) = base (no in-edges); r1(B) = base + (85*r0(A))//100
    // r2(B) = base + (85*base)//100 = 82463372083 + 70093866270
    // r3(B) = r2(B) (A's rank is base from r1 on)
    assert(out.toSeq == Seq(
      ("B", 82463372083L + 70093866270L), ("A", 82463372083L)))
    // leaky variant: B is terminal, total mass < SCALE
    assert(out.map(_._2).sum < (1L << 40))
    val again = Cohorts.transitionPageRank(ev, "user_id", "ts", "t",
      "id", iters = 3).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == again.toSeq)
  }

  test("transitionPredictability: majority successor share; ties pin " +
    "to the smallest to-type") {
    val ev = Seq(
      // u1: a→b, b→a, a→b ; u2: a→c ; u3: b→c
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "a", 3L),
      (1L, 4L, "b", 4L),
      (2L, 1L, "a", 5L), (2L, 2L, "c", 6L),
      (3L, 1L, "b", 7L), (3L, 2L, "c", 8L)
    ).toDF("user_id", "ts", "t", "id")
    val out = Cohorts.transitionPredictability(ev, "user_id", "ts",
      "t", "id").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // from a: b,b,c → top b 2/3; from b: a,c once each → tie → 'a'
    assert(out("a") == ((3L, "b", 2L, 2.0 / 3)))
    assert(out("b") == ((2L, "a", 1L, 0.5)))
  }

  test("eventTrigrams: consecutive triples per user; support floor; " +
    "share of ALL triples (pre-floor)") {
    val ev = Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "c", 3L),
      (1L, 4L, "a", 4L), (1L, 5L, "b", 5L), (1L, 6L, "c", 6L),
      (2L, 1L, "a", 7L), (2L, 2L, "b", 8L), (2L, 3L, "c", 9L)
    ).toDF("user_id", "ts", "t", "id")
    // u1 triples: abc, bca, cab, abc; u2: abc → abc×3, bca, cab (5)
    val out = Cohorts.eventTrigrams(ev, "user_id", "ts", "t", "id",
      minCount = 3L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a > b > c", 3L, 3.0 / 5)))
  }

  test("dailyRetention: next-day returners over actives; the last " +
    "observed day drops") {
    val ev = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-01"),
      (1L, "2024-01-02"), (2L, "2024-01-02"),
      (1L, "2024-01-04")                          // gap day 3
    ).toDF("user_id", "d").select(col("user_id"), to_date(col("d")).as("d"))
    val out = Cohorts.dailyRetention(ev, "user_id", col("d")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // 01-01: 3 active, 2 back on 01-02; 01-02: 2 active, 0 back on
    // 01-03 (u1's 01-04 return is NOT next-day); 01-04 = max day drops
    assert(out.toSeq == Seq(
      ("2024-01-01", 3L, 2L, 2.0 / 3),
      ("2024-01-02", 2L, 0L, 0.0)))
  }

  test("abConversionZ: arm assignment replays the portable hash; " +
    "counts and the z formula verify against a scala replay") {
    val P = 1000000007L
    def arm(u: Long) = (((u % P) * 2654435761L % P + 12345L) % P % 2).toInt
    val users = (1L to 40L)
    val ev = users.flatMap { u =>
      val base = Seq((u, "view"))
      if (u % 3 == 0) base :+ ((u, "purchase")) else base
    }.toDF("user_id", "event_type")
    val r = Cohorts.abConversionZ(ev, "user_id", "event_type",
      "purchase").collect()(0)
    val a = users.filter(arm(_) == 0); val b = users.filter(arm(_) == 1)
    val ka = a.count(_ % 3 == 0).toLong; val kb = b.count(_ % 3 == 0).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((a.size.toLong, ka, b.size.toLong, kb)))
    val (ra, rb) = (ka.toDouble / a.size, kb.toDouble / b.size)
    val p = (ka + kb).toDouble / (a.size + b.size)
    val se = math.sqrt(p * (1.0 - p) * (1.0 / a.size + 1.0 / b.size))
    assert(math.abs(r.getDouble(6) - (ra - rb) / se) < 1e-12)
  }

  test("abConversionZ: negative ids land in an arm (pmod guard) and " +
    "an empty arm still yields one row with NULL rate and z") {
    // negative ids: plain % would read arm -1 and drop the user
    val neg = Seq((-1L, "view"), (-2L, "purchase"), (-3L, "view"),
      (7L, "view")).toDF("user_id", "event_type")
    val rn = Cohorts.abConversionZ(neg, "user_id", "event_type",
      "purchase").collect()(0)
    assert(rn.getLong(0) + rn.getLong(2) == 4L,
      s"all 4 users must land in an arm: $rn")
    // one user → one arm populated, the other empty: the readout is
    // still ONE row, empty-arm rate and z NULL (not zero rows)
    val one = Seq((5L, "purchase")).toDF("user_id", "event_type")
    val out = Cohorts.abConversionZ(one, "user_id", "event_type",
      "purchase").collect()
    assert(out.length == 1)
    val r1 = out(0)
    assert(r1.getLong(0) + r1.getLong(2) == 1L)
    assert(r1.isNullAt(6), "z must be NULL with an empty arm")
    assert(r1.isNullAt(4) || r1.isNullAt(5),
      "the empty arm's rate must be NULL")
  }

  test("abConversionZ: fully EMPTY input still reports non-null zero " +
    "counts (ADVICE r13) — getLong never throws") {
    val none = Seq.empty[(Long, String)].toDF("user_id", "event_type")
    val out = Cohorts.abConversionZ(none, "user_id", "event_type",
      "purchase").collect()
    assert(out.length == 1)
    val r = out(0)
    // a global sum over zero rows is NULL unless coalesced; the
    // empty-input row must agree with the empty-ARM convention (0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((0L, 0L, 0L, 0L)))
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("discreteHazard: right-censoring at the observation edge — " +
    "active-at-edge users exit as censored, not as churn") {
    val s = spark; import s.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-${day + 1}%02d 12:00:00")
    // u1 spans days 0-2 (churned, t=2); u2 spans 0-10 (active at the
    // edge: censored at t=10); u3 appears only on day 10 (censored,
    // t=0 — at risk on day 0 but NOT a churn there)
    val ev = (Seq((1L, 0), (1L, 2), (2L, 0), (2L, 10), (3L, 10)))
      .map { case (u, d) => (u, ts(d)) }.toDF("user_id", "ts")
    val out = Cohorts.discreteHazard(ev, "user_id", col("ts"),
      inactivityDays = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val M = 1L << 20
    assert(out == Map(
      0L -> ((3L, 0L, 0L)),       // u3 censored at 0: risk 3, no churn
      2L -> ((2L, 1L, M / 2)),    // u1 churns with 2 still at risk
      10L -> ((1L, 0L, 0L))))     // u2 censored at the edge
  }
}
