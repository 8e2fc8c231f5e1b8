package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed moving sums (bulk correctness is the q81 DuckDB
  * oracle gate): the RANGE-vs-ROWS distinction — the one thing this
  * operator exists for — and pre-aggregation of same-day rows. */
class RollingSpec extends SparkSpec {

  private def run(rows: Seq[(String, String, Double)]) = {
    val s = spark; import s.implicits._
    val df = rows.toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    Rolling.movingDailySum(df, col("k"), col("d"), col("v"), 7)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  test("RANGE frame: missing days do NOT stretch the window") {
    val out = run(Seq(
      ("x", "2024-01-01", 10.00),
      ("x", "2024-01-02", 1.50),
      ("x", "2024-01-03", 2.25),
      ("x", "2024-01-10", 4.00),
      ("y", "2024-01-02", 7.00)))
    assert(out == Seq(
      ("x", "2024-01-01", 10.00, 10.00),
      ("x", "2024-01-02", 1.50, 11.50),
      ("x", "2024-01-03", 2.25, 13.75),
      // a 7-ROW frame would still include 01-01..03 here; the 7-DAY
      // frame [01-04, 01-10] holds only the day itself
      ("x", "2024-01-10", 4.00, 4.00),
      // keys are isolated partitions
      ("y", "2024-01-02", 7.00, 7.00)))
  }

  test("same-day rows pre-aggregate; boundary day 7-back is included") {
    val out = run(Seq(
      ("x", "2024-03-01", 1.25),
      ("x", "2024-03-01", 2.50),
      ("x", "2024-03-07", 4.00),  // exactly windowDays-1 = 6 days later
      ("x", "2024-03-08", 8.00))) // 03-01 just fell out
    assert(out == Seq(
      ("x", "2024-03-01", 3.75, 3.75),
      ("x", "2024-03-07", 4.00, 7.75),
      ("x", "2024-03-08", 8.00, 12.00)))
  }

  test("drawdown: running peak holds through the trough; day at the " +
    "peak reads 0; non-positive peak keeps NULL") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("A", "2024-01-01", 100.0), ("A", "2024-01-02", 80.0),
      ("A", "2024-01-03", 120.0), ("A", "2024-01-04", 60.0),
      ("B", "2024-01-01", -5.0)
    ).toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val out = Rolling.drawdown(df, col("k"), col("d"), col("v"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(out(("A", "2024-01-01")) == ((100.0, 0.0)))
    assert(out(("A", "2024-01-02")) == ((100.0, 1.0 - 80.0 / 100.0)))
    assert(out(("A", "2024-01-03")) == ((120.0, 0.0)))
    assert(out(("A", "2024-01-04")) == ((120.0, 0.5)))
    assert(out(("B", "2024-01-01")) == ((-5.0, null)))
  }

  test("periodGrowth: observed-day lag with honest day_gap; zero " +
    "previous keeps NULL growth; first day has no reading") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("A", "2024-01-01", 10.0), ("A", "2024-01-02", 20.0),
      ("A", "2024-01-05", 10.0),
      ("B", "2024-01-01", 0.0), ("B", "2024-01-02", 5.0)
    ).toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val out = Rolling.periodGrowth(df, col("k"), col("d"), col("v"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((if (r.isNullAt(4)) null else r.getInt(4),
          if (r.isNullAt(5)) null else r.getDouble(5)))).toMap
    assert(out(("A", "2024-01-01")) == ((null, null)))
    assert(out(("A", "2024-01-02")) == ((1, 1.0)))
    assert(out(("A", "2024-01-05")) == ((3, -0.5)))
    assert(out(("B", "2024-01-02")) == ((1, null))) // prev total 0
  }

  test("dailyValueBands: exact quartiles on integer cents; NULLs drop") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("A", "2024-01-01", Option(100L)), ("A", "2024-01-01", Option(200L)),
      ("A", "2024-01-01", Option(300L)), ("A", "2024-01-01", Option(400L)),
      ("A", "2024-01-01", None),
      ("A", "2024-01-02", Option(5L))
    ).toDF("k", "d", "cents").withColumn("d", col("d").cast("date"))
    val out = Rolling.dailyValueBands(df, col("k"), col("d"), col("cents"))
      .collect().map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7)))).toMap
    // {100,200,300,400}: p·3 = .75/1.5/2.25 → 175 / 250 / 325
    assert(out("2024-01-01") == ((4L, 100L, 175.0, 250.0, 325.0, 400L)))
    assert(out("2024-01-02") == ((1L, 5L, 5.0, 5.0, 5.0, 5L)))
  }

  test("dailySnapshot: the day's closer wins by (ts, id), gaps carry " +
    "forward to the GLOBAL last day, fills are flagged") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // type A, day 1: two events — ts 20 closes the day at 2.00
      ("A", "2024-01-01T00:00:10", 1L, 1.00),
      ("A", "2024-01-01T00:00:20", 2L, 2.00),
      ("A", "2024-01-03T00:00:00", 3L, 5.00),
      // type B observed only on day 2 — must carry to day 3 (global)
      ("B", "2024-01-02T00:00:00", 4L, 3.00)
    ).toDF("k", "t", "id", "v")
      .select(col("k"),
        unix_micros(to_timestamp(col("t"))).as("ts_us"),
        col("id"), col("v"))
    val out = Rolling.dailySnapshot(ev, col("k"), col("ts_us"),
      col("id"), col("v")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out == Map(
      ("A", "2024-01-01") -> ((2.0, false)),
      ("A", "2024-01-02") -> ((2.0, true)),
      ("A", "2024-01-03") -> ((5.0, false)),
      ("B", "2024-01-02") -> ((3.0, false)),
      ("B", "2024-01-03") -> ((3.0, true))))
  }

  test("rankShift: windows age from the data's max day; new entries " +
    "keep NULL prev_rank; keys outside the current window drop") {
    val s = spark; import s.implicits._
    // anchor = 2024-01-10; cur = {09,10}, prev = {07,08} (windowDays 2)
    val df = Seq(
      ("a", "2024-01-10", 10.00), ("a", "2024-01-07", 1.00),
      ("b", "2024-01-09", 5.00), ("b", "2024-01-08", 20.00),
      ("c", "2024-01-07", 3.00),                    // prev only
      ("d", "2024-01-09", 1.00)                     // cur only, rank 3
    ).toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val out = Rolling.rankShift(df, col("k"), col("d"), col("v"),
      windowDays = 2, topK = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        Option(r.get(3)), Option(r.get(5))))
    // prev ranks: b 20.00 → 1, c 3.00 → 2, a 1.00 → 3
    assert(out.toSeq == Seq(
      ("a", 1, 10.00, Some(3), Some(2)),
      ("b", 2, 5.00, Some(1), Some(-1))))
  }

  test("causalZScore: stats read STRICTLY PRIOR rows; short or " +
    "zero-variance history keeps NULL z") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("x", 10L, 1L, 1.00), ("x", 20L, 2L, 2.00),
      ("x", 30L, 3L, 3.00), ("x", 40L, 4L, 4.00),
      // y: constant history → zero variance → NULL forever
      ("y", 10L, 5L, 7.00), ("y", 20L, 6L, 7.00), ("y", 30L, 7L, 7.00)
    ).toDF("k", "ts_us", "id", "v")
    val out = Rolling.causalZScore(df, col("k"), col("ts_us"),
      col("id"), col("v")).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1L) == ((0L, 1.00, None)))          // no history
    assert(out(2L) == ((1L, 2.00, None)))          // below minPrior
    // priors {1,2}: mean 1.5, sample std ≈ 0.7071 → z ≈ 2.1213
    val z3 = out(3L)._3.get
    assert(out(3L)._1 == 2L && math.abs(z3 - 2.1213203435596424) < 1e-12)
    // priors {1,2,3}: mean 2, std 1 → z = 2 exactly
    val z4 = out(4L)._3.get
    assert(math.abs(z4 - 2.0) < 1e-12)
    assert(out(6L)._3.isEmpty && out(7L)._3.isEmpty) // zero variance
  }

  test("priceVolumeMix: the bridge decomposes by hand; a missing " +
    "period keeps NULL effects but the exact delta") {
    val s16 = spark; import s16.implicits._
    // anchor = 2024-03-01. current window: 12 units for 132.00
    // (p2 = 11); prior window: 10 units for 100.00 (p1 = 10).
    val rows =
      Seq.fill(2)(("X", "2024-02-28", 6L, 66.00)) ++      // current
      Seq.fill(2)(("X", "2024-01-20", 5L, 50.00)) ++      // prior
      Seq(("NEW", "2024-03-01", 3L, 30.00))               // current only
    val df = rows.toDF("k", "d", "q", "r")
      .withColumn("d", col("d").cast("date"))
    val out = Rolling.priceVolumeMix(df, col("k"), col("d"), col("q"),
      col("r"), windowDays = 30).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = out("X")
    assert((x.getLong(1), x.getDouble(2), x.getLong(3),
      x.getDouble(4)) == ((10L, 100.0, 12L, 132.0)))
    assert(x.getDouble(5) == 32.0)            // exact decimal delta
    assert(x.getDouble(6) == 20.0)            // (12-10)·10
    assert(x.getDouble(7) == 12.0)            // 12·(11-10)
    val n = out("NEW")
    assert(n.isNullAt(1) && n.getDouble(5) == 30.0 &&
      n.isNullAt(6) && n.isNullAt(7))
  }
}
