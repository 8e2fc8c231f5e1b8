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
}
