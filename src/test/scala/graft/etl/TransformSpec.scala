package graft.etl

import org.apache.spark.SparkException
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Transform business rules on the dirty fixture (SURVEY §2.2-2.6):
  * coerce-vs-strict cast parity, RI repair, keep-first dedup, and the
  * preserved duplicate-key join blowup.
  */
class TransformSpec extends SparkSpec {

  import EtlFixture._

  private lazy val tables = {
    val (sedesRaw, tiposRaw) = VariosSplitter.split(spark, variosRows)
    Transform.transformData(
      clientes = sources(spark).clientes.load(spark),
      transaccionesRaw = sources(spark).transacciones.load(spark),
      sedesRaw = sedesRaw,
      tiposRaw = tiposRaw,
      recomendados = sources(spark).recomendados.load(spark),
      recomendadosOrderCol = "ord")
  }

  test("cleanDimKey drops null and non-numeric keys (P7/P8/F3)") {
    val sedes = tables("dim_sedes").orderBy("id_sede").collect()
    assert(sedes.map(r => r.getInt(0) -> r.getString(1)).toSeq ==
      Seq(1 -> "Sede Centro", 2 -> "Sede Norte"))
  }

  test("riRepair synthesizes dummy rows for orphan fact keys (J2+U1)") {
    val tipos = tables("dim_tipo_transaccion").orderBy("id_tipo_trx")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
    assert(tipos == Seq(
      99 -> "Tipo Desconocido (Sistema)",
      100 -> "Prestamo",
      101 -> "Pago"))
  }

  test("dim_distribuidores keeps the FIRST row per key in file order (A2)") {
    val dist = tables("dim_distribuidores").orderBy("id_distribuidor")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
    assert(dist == Seq(
      10 -> "Distribuidora Norte",
      20 -> "Distribuidora Sur", // BIS (ord 2) lost to ord 1
      30 -> "Distribuidora Este"))
  }

  test("dim_clientes: left-join enrichment preserves duplicate-key blowup (J1)") {
    // the raw TRANSFORM build (no dedup order) keeps the blowup — the
    // reference's transform.py:82-106 behavior
    val raw = Transform.buildDimClientes(
      EtlFixture.sources(spark).clientes.load(spark),
      EtlFixture.sources(spark).recomendados.load(spark))
    assert(raw.count() == 6) // 5 base rows + 1 extra from duplicate IDCLIENTE=2
    assert(raw.where(col("id_cliente") === 2).count() == 2)

    // the LOAD-path build (transformData) collapses it keep-FIRST in
    // JSON file order: the warehouse PK (ddl:22) forbids the duplicate,
    // so ord=1's telefono survives and ord=2's loses
    val cli = tables("dim_clientes")
    assert(cli.count() == 5)
    val c2 = cli.where(col("id_cliente") === 2).collect()
    assert(c2.length == 1)
    assert(c2.head.getLong(c2.head.fieldIndex("telefono")) == 5551002L)
    // client 9 exists only in the JSON → no base row for it
    assert(cli.where(col("id_cliente") === 9).count() == 0)
    // F2 coerce: 'not-a-date'/'junk' → null dates
    assert(cli.where(col("id_cliente") === 2).select("fecha_primera_trx")
      .collect().forall(_.isNullAt(0)))
    val c4 = cli.where(col("id_cliente") === 4).select("fecha_afiliacion")
      .collect()
    assert(c4.forall(_.isNullAt(0)))
  }

  test("duplicate id_cliente in the BASE sheet fails the load path loudly") {
    // keep-first is only defined for JOIN multiplicity (ord orders it);
    // a base duplicate has no order — collapsing it would pick a
    // shuffle-dependent survivor and mask the PK violation the
    // reference's warehouse rejects
    import org.apache.spark.sql.Row
    val dupBase = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "2024-01-10", "2024-02-01"),
        Row(1, "2024-03-03", "2024-04-04")), 2),
      StarSchema.rawClientes)
    val recomendados = EtlFixture.sources(spark).recomendados.load(spark)
    val e = intercept[Exception] {
      Transform.buildDimClientes(dupBase, recomendados,
        dedupOrderCol = Some("ord")).collect()
    }
    assert(e.getMessage.contains("duplicate id_cliente")
      || Option(e.getCause).exists(_.getMessage.contains("duplicate id_cliente")))
    // the raw transform build (None) still tolerates it for inspection
    assert(Transform.buildDimClientes(dupBase, recomendados).count() == 2)
  }

  test("buildFact: coerce casts null junk, keeps all rows (F1/F4)") {
    val fct = tables("fct_transacciones")
    assert(fct.count() == 5)
    // junk timestamp → null (F1)
    val f1003 = fct.where(col("id_trx") === 1003).select("fecha_trx").collect()
    assert(f1003.head.isNullAt(0))
    // junk id_cliente → null (coerce site)
    val f1005 = fct.where(col("id_trx") === 1005).select("id_cliente").collect()
    assert(f1005.head.isNullAt(0))
    // decimal money carried exactly
    val m = fct.agg(sum(col("monto"))).collect().head.getDecimal(0)
    assert(m == new java.math.BigDecimal("4650.75"))
  }

  test("buildFact FAILS on junk id_tipo_trx — strict astype(int) parity (F3)") {
    val dirty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", "2025-06-10", "not-an-int", "1001", "10.00", "1.00", "1")), 1),
      StarSchema.rawTransacciones)
    val e = intercept[Exception] {
      Transform.buildFact(dirty).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists {
      case s: SparkException => s.getMessage.contains("id_tipo_trx")
      case t => t.getMessage != null && t.getMessage.contains("id_tipo_trx")
    })
  }

  test("buildFact FAILS on null id_tipo_trx too") {
    val dirty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", "2025-06-10", null, "1001", "10.00", "1.00", "1")), 1),
      StarSchema.rawTransacciones)
    assertThrows[Exception](Transform.buildFact(dirty).collect())
  }
}
