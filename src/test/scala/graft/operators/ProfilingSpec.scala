package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Column-profile semantics (q62's operator). */
class ProfilingSpec extends SparkSpec {

  private def frame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(
        Row(1L, "a"), Row(2L, "a"), Row(3L, null), Row(null, "b")).asJava,
      StructType(Seq(StructField("k", LongType),
        StructField("s", StringType))))
  }

  test("counts nulls and distincts per column; distinct excludes null") {
    val out = Profiling.columnProfile(frame, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("k") == ((4L, 1L, 3L)))
    assert(out("s") == ((4L, 1L, 2L)))
  }

  test("unknown column fails loudly") {
    intercept[IllegalArgumentException] {
      Profiling.columnProfile(frame, Seq("nope"))
    }
  }

  test("histogram: dyadic buckets, NULL bucket accounted, every row counted") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, Long)](
      (0.0, 1L), (7.9, 2L), (8.0, 3L), (16.1, 4L), (null, 5L), (-0.5, 6L)
    ).toDF("v", "id")
    val h = Profiling.histogram(df, Seq("v" -> 8.0)).collect()
      .map(r => (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(3))).toSeq
    // -0.5 → bucket -1 (floor, not truncate); 8.0 lands in bucket 1
    assert(h == Seq((None, 1L), (Some(-1L), 1L), (Some(0L), 2L),
      (Some(1L), 1L), (Some(2L), 1L)))
    assert(h.map(_._2).sum == df.count())
  }

  test("histogram rejects non-dyadic widths and unknown columns") {
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Profiling.histogram(df, Seq("a" -> 10.0))   // not a power of two
    }
    intercept[IllegalArgumentException] {
      Profiling.histogram(df, Seq("nope" -> 8.0))
    }
    intercept[IllegalArgumentException] {
      Profiling.histogram(df, Seq("a" -> 0.0))
    }
  }

  test("column names with quotes, backticks, and dots profile safely") {
    import scala.jdk.CollectionConverters._
    val nasty = "o'brien.`col"
    val df = spark.createDataFrame(
      Seq(Row(1L, "x"), Row(null, "x"), Row(3L, "y")).asJava,
      StructType(Seq(StructField(nasty, LongType),
        StructField("plain", StringType))))
    val out = Profiling.columnProfile(df, Seq(nasty, "plain")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(nasty) == ((3L, 1L, 2L)))
    assert(out("plain") == ((3L, 0L, 2L)))
  }

  test("equiDepthHistogram: quartile splits by hand, NULLs in bucket -1") {
    import scala.jdk.CollectionConverters._
    // values 1..8: p25/p50/p75 = 2.75/4.5/6.25 (dyadic interpolation
    // over integers — exact), so buckets hold {1,2} {3,4} {5,6} {7,8}
    val df = spark.createDataFrame(
      ((1L to 8L).map(v => Row(v: java.lang.Long)) :+ Row(null)).asJava,
      StructType(Seq(StructField("v", LongType))))
    val out = Profiling.equiDepthHistogram(df, Seq("v")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("v", -1, 1L), ("v", 0, 2L), ("v", 1, 2L), ("v", 2, 2L),
      ("v", 3, 2L)))
  }
}
