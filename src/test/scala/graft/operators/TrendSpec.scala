package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed trend fits (bulk correctness is the q183/q184 DuckDB
  * oracle gate): the exact OLS slope, Theil–Sen's robustness to the
  * spike that drags the least-squares fit, and the single-day NULLs. */
class TrendSpec extends SparkSpec {

  import spark.implicits._

  private def ev(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)((key, f"2024-01-${d + 1}%02d"))
    }

  private def frame(rows: Seq[(String, String)]) =
    rows.toDF("t", "d").select(col("t"), to_date(col("d")).as("d"))

  test("olsTrend: exact slope on a clean ramp; the spike drags it; " +
    "single-day keys keep NULL") {
    val df = frame(ev("up", Seq(1, 2, 3, 4, 5)) ++
      ev("spike", Seq(1, 1, 1, 1, 100)) ++ ev("one", Seq(7)))
    val out = Trend.olsTrend(df, col("t"), col("d")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(out("up") == ((5L, Some(1.0))))
    // (5·406 − 10·104) / (5·30 − 100) = 990/50
    assert(out("spike") == ((5L, Some(19.8))))
    assert(out("one") == ((1L, None)))
  }

  test("theilSenTrend: the median slope shrugs off the spike OLS " +
    "chases; Mann–Kendall S counts signed pairs") {
    val df = frame(ev("up", Seq(1, 2, 3, 4, 5)) ++
      ev("spike", Seq(1, 1, 1, 1, 100)) ++ ev("one", Seq(7)))
    val out = Trend.theilSenTrend(df, col("t"), col("d")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // clean ramp: every pairwise slope is 1
    assert(out("up") == ((5L, 10L, 10L, Some(1.0))))
    // spike: 6 zero slopes among the flat days outvote the 4 spike
    // slopes — median 0 where OLS read 19.8; S = +4
    assert(out("spike") == ((5L, 10L, 4L, Some(0.0))))
    assert(out("one") == ((1L, 0L, 0L, None)))
  }

  test("lagAutocorrelation: a linear lagged relation reads r = 1, an " +
    "alternating one r = -1, a constant NULL") {
    val df = frame(ev("lin", Seq(1, 2, 3)) ++
      ev("alt", Seq(1, 2, 1, 2)) ++ ev("const", Seq(3, 3, 3)))
    val out = Trend.lagAutocorrelation(df, col("t"), col("d"),
      lagDays = 1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(out("lin")._1 == 2L &&
      math.abs(out("lin")._2.get - 1.0) < 1e-12)
    assert(math.abs(out("alt")._2.get - (-1.0)) < 1e-12)
    assert(out("const")._2.isEmpty) // zero variance
  }

  test("stratumMeanSE: hand-computed mean and SE; singleton strata " +
    "keep NULL SE") {
    val s14 = spark; import s14.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 7L))
      .toDF("g", "v")
    val out = Trend.stratumMeanSE(df, col("g"), col("v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // a: mean 2, sample var 1, se = 1/sqrt(3)
    assert(out("a")._1 == 3L && out("a")._2 == 2.0)
    assert(math.abs(out("a")._3.get - 1.0 / math.sqrt(3.0)) < 1e-12)
    assert(out("b") == ((1L, 7.0, None)))
  }

  test("stratumMeanSE: IntegerType values above 46340 do not wrap — " +
    "operands cast to DECIMAL before the square") {
    val s16 = spark; import s16.implicits._
    // 50000² = 2.5e9 overflows Int; pre-fix the sum of squares wrapped
    val df = Seq(("a", 50000), ("a", 50000), ("a", 50002))
      .toDF("g", "v")
    val out = Trend.stratumMeanSE(df, col("g"), col("v")).collect()(0)
    val vals = Seq(50000.0, 50000.0, 50002.0)
    val mean = vals.sum / 3
    val sVar = vals.map(v => (v - mean) * (v - mean)).sum / 2
    assert(out.getDouble(2) == mean)
    assert(math.abs(out.getDouble(3) - math.sqrt(sVar / 3)) < 1e-9)
  }

  test("groupCorrelation: LongType products above 2^63 do not wrap — " +
    "exact r = 1 on a 3.1e9-scale linear pair") {
    val s17 = spark; import s17.implicits._
    // x·y ≈ 9.6e18 > Long.MaxValue: pre-fix the product wrapped
    val base = 3100000000L
    val df = Seq(("g", base, base), ("g", base + 1, base + 1),
      ("g", base + 2, base + 2)).toDF("g", "x", "y")
    val out = Trend.groupCorrelation(df, col("g"), col("x"), col("y"))
      .collect()(0)
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-9,
      s"r must be exactly 1 on a linear pair, got ${out.get(2)}")
  }

  test("groupCorrelation: perfect linear r = 1, inverse r = -1, " +
    "constant side NULL") {
    val s15 = spark; import s15.implicits._
    val df = Seq(
      ("lin", 1L, 10L), ("lin", 2L, 20L), ("lin", 3L, 30L),
      ("inv", 1L, 3L), ("inv", 2L, 2L), ("inv", 3L, 1L),
      ("flat", 1L, 5L), ("flat", 2L, 5L)
    ).toDF("g", "x", "y")
    val out = Trend.groupCorrelation(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(math.abs(out("lin").get - 1.0) < 1e-12)
    assert(math.abs(out("inv").get - (-1.0)) < 1e-12)
    assert(out("flat").isEmpty)
  }
}
