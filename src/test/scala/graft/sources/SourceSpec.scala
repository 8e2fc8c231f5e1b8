package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The non-parquet scan sources (SURVEY §2.1 S1/S2 stand-ins): the
  * whole-document JSON array mode (NOT NDJSON — the reference loads one
  * JSON doc, extract.py:120-123), CSV with and without schema, and the
  * driver-side ordered-rows seam.
  */
class SourceSpec extends SparkSpec {

  test("JsonArraySource: one multiLine JSON array, accented column intact") {
    val p = Files.createTempFile("graft_src", ".json")
    Files.write(p,
      """[{"IDCLIENTE": 1, "categoría": "A"},
        | {"IDCLIENTE": 2, "categoría": "B"}]""".stripMargin.getBytes(UTF_8))
    val df = JsonArraySource(p.toString).load(spark)
    assert(df.count() == 2)
    assert(df.columns.contains("categoría")) // non-ASCII name (SURVEY §1.2)
    assert(df.select("IDCLIENTE").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("JsonArraySource honors an explicit schema") {
    val p = Files.createTempFile("graft_src", ".json")
    Files.write(p, """[{"a": 1, "b": "x"}]""".getBytes(UTF_8))
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val df = JsonArraySource(p.toString, Some(schema)).load(spark)
    assert(df.schema == schema)
    assert(df.collect().head.getInt(0) == 1)
  }

  test("CsvSource: header mode reads names, schema pins types") {
    val p = Files.createTempFile("graft_src", ".csv")
    Files.write(p, "id,name\n1,aa\n2,bb\n".getBytes(UTF_8))
    val inferred = CsvSource(p.toString).load(spark)
    assert(inferred.columns.toSeq == Seq("id", "name"))
    assert(inferred.count() == 2)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val typed = CsvSource(p.toString, header = true, Some(schema)).load(spark)
    assert(typed.schema == schema)
  }

  test("OrcSource round-trips with pushdown-capable scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    val df = spark.range(100).toDF("id")
    df.write.orc(dir)
    val back = OrcSource(dir).load(spark)
    assert(back.count() == 100)
    val pruned = back.where(org.apache.spark.sql.functions.col("id") < 10)
    assert(pruned.queryExecution.executedPlan.toString()
      .contains("PushedFilters"), "filter should reach the ORC scan")
    assert(pruned.count() == 10)
  }

  test("InlineRowsSource preserves driver-side row order per partition") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val rows = (0 until 100).map(Row(_))
    val out = InlineRowsSource(rows, schema).load(spark)
      .collect().map(_.getInt(0)).toSeq
    assert(out == (0 until 100)) // parallelize keeps element order
  }
}
