package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the parity semantics the DuckDB oracle can't exercise on the
  * clean testdata: anti-join behavior on dirty in-memory rows (nulls,
  * orphans) and the SQL-text path's equivalence to the DataFrame chain.
  */
class ParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

  test("J2 anti-join orphan detection: finds orphans, excludes nulls") {
    import org.apache.spark.sql.functions._
    val factSchema = StructType(Seq(
      StructField("id_tipo_trx", IntegerType, nullable = true)))
    val dimSchema = StructType(Seq(
      StructField("id_tipo_trx", IntegerType, nullable = false),
      StructField("descripcion_tipo", StringType)))
    val fact = df(factSchema,
      Row(1), Row(2), Row(2), Row(99), Row(null), Row(77))
    val dim = df(dimSchema, Row(1, "a"), Row(2, "b"), Row(3, "c"))
    // the q5 shape: distinct fact keys, not-null, anti-joined vs the dim
    val orphans = fact.select(col("id_tipo_trx")).distinct()
      .join(dim, Seq("id_tipo_trx"), "left_anti")
      .where(col("id_tipo_trx").isNotNull)
      .orderBy(col("id_tipo_trx"))
      .collect().map(_.getInt(0)).toSeq
    assert(orphans == Seq(77, 99))
  }

  test("P9/J3 anti-join keeps null-PK rows (pandas ~isin parity)") {
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(
      StructField("pk", IntegerType, nullable = true),
      StructField("v", StringType)))
    val incoming = df(schema, Row(1, "x"), Row(2, "y"), Row(null, "z"))
    val existing = df(schema, Row(1, "old"), Row(null, "old"))
    val fresh = incoming
      .join(existing.select(col("pk")), Seq("pk"), "left_anti")
      .collect().map(_.getString(1)).toSet
    // 1 is dropped (already loaded); 2 is new; the null-PK row is KEPT —
    // null never equi-matches, same as pandas ~isin (SURVEY §2.2 P9)
    assert(fresh == Set("y", "z"))
  }

  test("q15 (spark.sql text) ≡ q9 (DataFrame chain) row-for-row") {
    val viaSql = Parity.q15.run(spark, sf).collect().toSeq
    val viaDf = Parity.q9.run(spark, sf).collect().toSeq
    assert(viaSql == viaDf)
  }
}
