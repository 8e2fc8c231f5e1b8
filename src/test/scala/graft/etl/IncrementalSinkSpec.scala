package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Insert-if-absent sink semantics (SURVEY §2.1 S6, §2.9;
  * load.py:20-68): bootstrap, incremental append, idempotence, the
  * never-update rule, and null-PK retention.
  */
class IncrementalSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("pk", IntegerType, nullable = true),
    StructField("v", StringType)))

  private def df(rows: Row*) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), schema)

  private def freshSink() = new IncrementalSink(
    spark, Files.createTempDirectory("graft_sink").toString)

  test("first load bootstraps the table; re-run inserts 0 (idempotence)") {
    val sink = freshSink()
    val day1 = df(Row(1, "a"), Row(2, "b"))
    assert(sink.appendOnlyNew(day1, "t", "pk") == (2L, 0L))
    // the reference's run-twice property (load.py:53-57): 0 inserted
    assert(sink.appendOnlyNew(day1, "t", "pk") == (0L, 2L))
    assert(sink.read("t").count() == 2)
  }

  test("incremental append: only new PKs land; re-sent rows are IGNORED, never updated") {
    val sink = freshSink()
    sink.appendOnlyNew(df(Row(1, "original"), Row(2, "b")), "t", "pk")
    val day2 = df(Row(1, "CHANGED"), Row(3, "c"))
    assert(sink.appendOnlyNew(day2, "t", "pk") == (1L, 1L))
    val out = sink.read("t").collect().map(r => r.getInt(0) -> r.getString(1))
      .toMap
    assert(out == Map(1 -> "original", 2 -> "b", 3 -> "c")) // no update path
  }

  test("null-PK rows are kept by the anti-join (pandas ~isin parity)") {
    val sink = freshSink()
    sink.appendOnlyNew(df(Row(1, "a"), Row(null, "n1")), "t", "pk")
    val (ins, _) = sink.appendOnlyNew(df(Row(null, "n2")), "t", "pk")
    assert(ins == 1L) // null never equi-matches → inserted again
  }

  test("loadStar loads FK-ordered and accounts per table") {
    val sink = freshSink()
    val tables = StarSchema.loadOrder.map { t =>
      t -> df(Row(1, t)).withColumnRenamed("pk", StarSchema.primaryKeys(t))
    }.toMap
    val acct = sink.loadStar(tables)
    assert(acct.keySet == StarSchema.loadOrder.toSet)
    assert(acct.values.forall(_ == (1L, 0L)))
    assert(sink.loadStar(tables).values.forall(_ == (0L, 1L)))
  }

  test("overwrite is the full-refresh bootstrap (DDL-reset analog)") {
    val sink = freshSink()
    sink.appendOnlyNew(df(Row(1, "a"), Row(2, "b")), "t", "pk")
    sink.overwrite(df(Row(9, "z")), "t")
    assert(sink.read("t").collect().map(_.getInt(0)).toSeq == Seq(9))
  }
}
