package graft.operators

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, to_date}
import org.apache.spark.sql.types.{DateType, StringType, StructField, StructType}

import graft.SparkSpec

/** Hand-computed L1 drift on crafted day mixes (bulk correctness is
  * the q69 DuckDB oracle gate). */
class DriftSpec extends SparkSpec {

  private def events(rows: (String, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (d, t) => Row(Date.valueOf(d), t) }.asJava,
      StructType(Seq(StructField("day0", DateType),
        StructField("t0", StringType))))
  }

  test("exact L1 on the 2^-20 grid; boundary days absent") {
    // day1: 2 view + 2 click; day2: 4 view  -> L1 = 1 exactly
    // day3: 1 view + 1 click + 1 error vs day2 -> L1 = 4/3
    val e = events(
      Seq.fill(2)("2024-01-01" -> "view") ++
        Seq.fill(2)("2024-01-01" -> "click") ++
        Seq.fill(4)("2024-01-02" -> "view") ++
        Seq("2024-01-03" -> "view", "2024-01-03" -> "click",
          "2024-01-03" -> "error"): _*)
    val out = Drift.dailyMixDrift(e, col("day0"), "t0").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-02", 4L, 1048576L),          // L1 = 1 -> 2^20
      ("2024-01-03", 3L, 1398101L)))         // floor(4/3 * 2^20)
  }

  test("identical consecutive mixes drift zero; gap days drop out") {
    val e = events(
      Seq("2024-02-01" -> "view", "2024-02-01" -> "click",
        "2024-02-02" -> "view", "2024-02-02" -> "click",
        // 2024-02-03 has no events; 02-04 has no previous day
        "2024-02-04" -> "view"): _*)
    val out = Drift.dailyMixDrift(e, col("day0"), "t0").collect()
      .map(r => (r.getDate(0).toString, r.getLong(2)))
    assert(out.toSeq == Seq("2024-02-02" -> 0L))
  }

  test("volume anomaly: median/MAD robust z, dyadic halves, MAD-0 nulls") {
    // a: counts [1,2,3,4,9] -> median 3, devs [2,1,0,1,6], MAD 1,
    //    scores [-2,-1,0,1,6] — the spike (9) does not poison its own
    //    baseline the way mean/stddev would
    // b: constant [2,2] -> MAD 0 -> NULL scores
    // c: counts [1,2] -> median 1.5, devs [.5,.5], MAD .5 -> [-1, 1]
    //    (the dyadic-interpolation path)
    val days = Seq("2024-05-01", "2024-05-02", "2024-05-03",
      "2024-05-04", "2024-05-05")
    val rows =
      Seq(1, 2, 3, 4, 9).zip(days).flatMap { case (n, d) =>
        Seq.fill(n)(d -> "a") } ++
      Seq("2024-05-01" -> "b", "2024-05-01" -> "b",
        "2024-05-02" -> "b", "2024-05-02" -> "b") ++
      Seq("2024-05-01" -> "c", "2024-05-02" -> "c", "2024-05-02" -> "c")
    val out = Drift.dailyVolumeAnomaly(events(rows: _*), col("day0"), "t0")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", "2024-05-01", 1L, -2.0), ("a", "2024-05-02", 2L, -1.0),
      ("a", "2024-05-03", 3L, 0.0), ("a", "2024-05-04", 4L, 1.0),
      ("a", "2024-05-05", 9L, 6.0),
      ("b", "2024-05-01", 2L, null), ("b", "2024-05-02", 2L, null),
      ("c", "2024-05-01", 1L, -1.0), ("c", "2024-05-02", 2L, 1.0)))
  }

  test("ingest completeness fills the full day x type grid with zeros") {
    // span is 01..04 (global min/max); click goes dark on 02-04,
    // view misses 02-02 and 02-03, error appears only on 02-03.
    val e = events(
      Seq("2024-02-01" -> "view", "2024-02-01" -> "click",
        "2024-02-02" -> "click", "2024-02-03" -> "click",
        "2024-02-03" -> "error", "2024-02-04" -> "view"): _*)
    val out = Drift.ingestCompleteness(e, col("day0"), "t0").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(out.toSeq == Seq(
      ("click", "2024-02-01", 1L), ("click", "2024-02-02", 1L),
      ("click", "2024-02-03", 1L), ("click", "2024-02-04", 0L),
      ("error", "2024-02-01", 0L), ("error", "2024-02-02", 0L),
      ("error", "2024-02-03", 1L), ("error", "2024-02-04", 0L),
      ("view", "2024-02-01", 1L), ("view", "2024-02-02", 0L),
      ("view", "2024-02-03", 0L), ("view", "2024-02-04", 1L)))
  }

  test("histogramDrift: hand-computed L1; identical slices drift 0; NULL bucketed") {
    val s = spark; import s.implicits._
    // width 2: old = {0:2, 1:1}, new = {0:1, 2:2} (values 4,5 -> b=2)
    // N_old=3 N_new=3; L1 = |1*3-2*3| + |0*3-1*3| + |2*3-0*3| = 12
    // drift_fp = 12 * 2^20 div 9 = 1398101
    val oldDf = Seq(0.5, 1.0, 2.0).toDF("v")
    val newDf = Seq(1.5, 4.0, 5.0).toDF("v")
    val row = Drift.histogramDrift(oldDf, newDf, "v", 2.0).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((3L, 3L, 3L, 12L * 1048576 / 9)))
    // identical slices: exact zero
    val same = Drift.histogramDrift(oldDf, oldDf, "v", 2.0).collect().head
    assert(same.getLong(3) == 0L)
    // NULLs land in the accounted sentinel bucket, not dropped
    val withNull = Seq(Some(0.5), None).toDF("v")
    val nb = Drift.histogramDrift(withNull, withNull, "v", 2.0)
      .collect().head
    assert(nb.getLong(0) == 2L && nb.getLong(2) == 2L && nb.getLong(3) == 0L)
    // an empty side yields NULL drift, never a divide-by-zero
    val empty = Seq.empty[Double].toDF("v")
    val e = Drift.histogramDrift(oldDf, empty, "v", 2.0).collect().head
    assert(e.isNullAt(3) && e.getLong(1) == 0L)
    // BOTH sides empty still honors the one-row contract: (0,0,0,NULL)
    // — a grouped fold here would return zero rows and break
    // collect().head callers exactly like this one
    val both = Drift.histogramDrift(empty, empty, "v", 2.0).collect()
    assert(both.length == 1, s"expected one row, got ${both.length}")
    assert((both.head.getLong(0), both.head.getLong(1),
      both.head.getLong(2), both.head.isNullAt(3)) == ((0L, 0L, 0L, true)))
  }

  test("histogramDrift: symmetric in its sides and invariant to uniform scale") {
    val s = spark; import s.implicits._
    val a = Seq(0.5, 1.0, 2.0, 7.5, 7.9).toDF("v")
    val b = Seq(1.5, 4.0, 5.0, 0.1).toDF("v")
    def fp(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame) =
      Drift.histogramDrift(x, y, "v", 2.0).collect().head.getLong(3)
    // the L1 term and its normalizer are both symmetric
    assert(fp(a, b) == fp(b, a))
    // replicating every row of ONE side k-fold changes nothing: the
    // cross-normalization divides the multiplicity back out — drift
    // measures SHAPE, not volume (volume is q83's alarm)
    val a3 = a.unionAll(a).unionAll(a)
    assert(fp(a3, b) == fp(a, b))
  }

  test("cusumChangepoint: the prefix-sum closed form replays the " +
    "max(0, S+x) recurrence by hand; sustained shift alarms, the " +
    "pre-shift days don't") {
    val s = spark; import s.implicits._
    // one type, 6 days: counts 5,5,5 then 8,8,8 — median 6.5.
    // x = 2n-13: -3,-3,-3,+3,+3,+3; S = 0,0,0,1.5,3,4.5
    val ev = Seq(5, 5, 5, 8, 8, 8).zipWithIndex.flatMap {
      case (n, d) => Seq.fill(n)((java.sql.Date.valueOf(
        f"2024-01-${d + 1}%02d"), "t"))
    }.toDF("day", "event_type")
    val out = Drift.cusumChangepoint(ev, col("day"), "event_type",
      slack = 0L, threshold = 2L).collect()
      .map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("2024-01-01") == ((5L, 0.0, false)))
    assert(out("2024-01-03") == ((5L, 0.0, false)))
    assert(out("2024-01-04") == ((8L, 1.5, false))) // accumulating
    assert(out("2024-01-05") == ((8L, 3.0, true)))  // > threshold 2
    assert(out("2024-01-06") == ((8L, 4.5, true)))
  }

  test("gridKsDistance: disjoint distributions score 1; empty sides " +
    "keep the one-row NULL contract") {
    val s = spark; import s.implicits._
    val a = Seq(0.1, 0.3).toDF("value")
    val b = Seq(0.6, 0.9).toDF("value")
    val r = Drift.gridKsDistance(a, b, "value", 0.25).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2)) ==
      ((2L, 2L, 1.0)))
    // identical distributions → 0
    val same = Drift.gridKsDistance(a, a, "value", 0.25).collect()(0)
    assert(same.getDouble(2) == 0.0)
    // one side empty → NULL distance, row still emitted
    val empty = a.where("value > 99")
    val e1 = Drift.gridKsDistance(a, empty, "value", 0.25).collect()
    assert(e1.length == 1 && e1(0).getLong(1) == 0L && e1(0).isNullAt(2))
    val e2 = Drift.gridKsDistance(empty, empty, "value", 0.25).collect()
    assert(e2.length == 1 && e2(0).isNullAt(2))
  }

  test("dowVolumeAnomaly: a weekly season scores clean under its own " +
    "dow baseline; a genuine break in one weekday class flags") {
    val s = spark; import s.implicits._
    // thursdays (epoch dow 0) carry ~10 events, fridays exactly 2 —
    // a POOLED median would flag every friday; the per-dow baseline
    // scores constant fridays NULL (MAD 0) and only the broken
    // thursday large. thu counts {9, 10, 11, 20}: median 10.5,
    // MAD 1.0 → scores −1.5 / −0.5 / 0.5 / 9.5
    val rows =
      Seq.fill(9)(("t", "1970-01-01")) ++
      Seq.fill(10)(("t", "1970-01-08")) ++
      Seq.fill(11)(("t", "1970-01-15")) ++
      Seq.fill(20)(("t", "1970-01-22")) ++             // the break
      Seq("1970-01-02", "1970-01-09", "1970-01-16").flatMap(d =>
        Seq.fill(2)(("t", d)))                         // fridays
    val df = rows.toDF("event_type", "d")
      .select(col("event_type"), to_date(col("d")).as("d"))
    val out = Drift.dowVolumeAnomaly(df, col("d"), "event_type")
      .collect().map(r => r.getDate(1).toString ->
        (if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(out("1970-01-02") == null && out("1970-01-09") == null)
    assert(out("1970-01-22") == 9.5 && out("1970-01-01") == -1.5)
  }

  test("peakRateProfile: integer buckets, exact median, burstiness by " +
    "hand; a steady stream scores 1") {
    val s = spark; import s.implicits._
    // bursty: minute buckets carry {1, 1, 10} events → median 1,
    // peak 10; steady: {2, 2} → burstiness 1.0
    val m = 60L * 1000 * 1000
    val rows =
      Seq(0L * m, 1L * m) ++ Seq.fill(10)(2L * m) :+ (0L * m + 5L)
    val df = (rows.map(("bursty", _)) ++
      Seq(("steady", 0L), ("steady", 1L), ("steady", m), ("steady", m + 9)))
      .toDF("event_type", "ts_us")
    val out = Drift.peakRateProfile(df, col("ts_us"), "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out("bursty") == ((3L, 2.0, 10L, 5.0)))
    assert(out("steady") == ((2L, 2.0, 2L, 1.0)))
  }

  test("labelPurity: majority with pinned ties (label asc, NULL first); " +
    "NULL labels count as a label") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("clean", Option("es")), ("clean", Option("es")),
      ("clean", Option("en")),
      ("tied", Option("en")), ("tied", Option("es")),       // tie → "en"
      ("nully", None), ("nully", None), ("nully", Option("de"))
    ).toDF("src", "lang")
    val out = Drift.labelPurity(df, "src", "lang").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3),
          r.getDouble(4)))).toMap
    assert(out("clean") == ((3L, 2L, "es", 2.0 / 3)))
    assert(out("tied") == ((2L, 2L, "en", 0.5)))
    assert(out("nully") == ((3L, 2L, null, 2.0 / 3)))
  }

  test("seasonalNaiveError: only days with an observed t-7 predecessor " +
    "score; WMAPE is sum|err| over sum(base), not a mean of ratios") {
    val s = spark; import s.implicits._
    def day(n: Int) = f"2024-01-$n%02d"
    val rows =
      Seq.fill(2)(("A", day(1))) ++ Seq.fill(3)(("A", day(2))) ++
      Seq.fill(4)(("A", day(8))) ++ Seq.fill(3)(("A", day(9))) ++
      Seq.fill(1)(("A", day(10))) ++                // day 3 unobserved
      Seq.fill(5)(("B", day(1)))                    // B: nothing scores
    val df = rows.toDF("t", "d")
      .select(col("t"), to_date(col("d")).as("d"))
    val out = Drift.seasonalNaiveError(df, col("t"), col("d"), 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // A: day8 vs day1 (|4-2|=2, base 2), day9 vs day2 (0, base 3);
    // day10 has no day-3 forecast → excluded, not treated as zero
    assert(out == Map("A" -> ((2L, 2L, 5L, 0.4))))
  }

  test("profileDrift: null-rate delta and ndv ratio from exact counts; " +
    "an all-null old column keeps NULL ratio") {
    val s3 = spark; import s3.implicits._
    val oldDf = Seq(
      (Option("en"), Option.empty[String]), (Option("en"), None),
      (Option.empty[String], None), (Option("fr"), None)
    ).toDF("lang", "tag")
    val newDf = Seq(
      (Option.empty[String], Option("x")), (None, Option("x")),
      (Option("en"), Option("y")), (Option("en"), Option("y")),
      (Option("en"), Option("y")), (Option("de"), Option("y"))
    ).toDF("lang", "tag")
    val out = Drift.profileDrift(oldDf, newDf, Seq("lang", "tag"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6),
          Option(r.get(7)).map(_.asInstanceOf[Double]),
          Option(r.get(8)).map(_.asInstanceOf[Double])))).toMap
    // lang: old (4 rows, 1 null, 2 ndv), new (6 rows, 2 null, 2 ndv)
    assert(out("lang") == ((4L, 1L, 2L, 6L, 2L, 2L,
      Some(2.0 / 6 - 1.0 / 4), Some(1.0))))
    // tag was ALL NULL in old: ndv_old = 0 -> NULL ratio, delta real
    assert(out("tag") == ((4L, 4L, 0L, 6L, 0L, 2L,
      Some(0.0 - 1.0), None)))
  }
}
