package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed SCD2 interval builds (bulk correctness is the q82
  * DuckDB oracle gate): collapse, open tail, tie ordering, and the
  * NULL-state edge the rn=1 guard exists for. */
class ScdSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark; import s.implicits._
    val df = rows.toDF("u", "ts", "id", "v")
    Scd.intervals(df, col("u"), col("ts"), col("id"), col("v"))
      .orderBy(col("key"), col("valid_from"), col("tie"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2),
        r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toSeq
  }

  test("consecutive equal values collapse; latest interval stays open") {
    val out = run(Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "B"), (1L, 50L, 5L, "A")))
    assert(out == Seq(
      (1L, 1L, "A", 10L, 30L),
      (1L, 3L, "B", 30L, 50L),
      (1L, 5L, "A", 50L, -1L)))
  }

  test("dwellByValue: closed reigns only, integer mean") {
    val s = spark; import s.implicits._
    val df = Seq(
      // user 1: A[10,30) B[30,50) A[50,open-censored)
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "B"), (1L, 50L, 5L, "A"),
      // user 2: A[5,12) B[12,open) -> A dwell 7
      (2L, 5L, 6L, "A"), (2L, 12L, 7L, "B")).toDF("u", "ts", "id", "v")
    val out = Scd.dwellByValue(df, col("u"), col("ts"), col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // A: dwells {20, 7} -> total 27, mean 27 div 2 = 13 (integer floor)
    assert(out == Seq(("A", 2L, 27L, 13L), ("B", 1L, 20L, 20L)))
  }

  test("equal timestamps order by the tie id; NULL is a real state") {
    val out = run(Seq(
      // user 2: two changes in the same microsecond — id order decides
      (2L, 100L, 6L, "B"), (2L, 100L, 5L, "A"),
      // user 3: opening NULL state (the lag-can't-see-it edge), then a
      // NULL continuation that must collapse, then a real change
      (3L, 10L, 7L, null), (3L, 20L, 8L, null), (3L, 30L, 9L, "C")))
    assert(out == Seq(
      (2L, 5L, "A", 100L, 100L),
      (2L, 6L, "B", 100L, -1L),
      (3L, 7L, null, 10L, 30L),
      (3L, 9L, "C", 30L, -1L)))
  }
}
