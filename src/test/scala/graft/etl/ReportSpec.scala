package graft.etl

import java.time.LocalDate

import graft.SparkSpec

/** The report path over the fixture star (bot_ventas.py:38-107):
  * day-vs-MTD metrics, distributor performance (including the
  * preserved duplicate-client join blowup), and the formatted message.
  */
class ReportSpec extends SparkSpec {

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

  private val cut = LocalDate.parse("2025-06-14")

  test("metrics: diaria vs acumulado_mes over the month-to-cut window (A3)") {
    val r = Report.metrics(tables("fct_transacciones"), cut).collect().head
    // cut-day rows: 1002 (2000.00) + 1004 (750.00); MTD additionally 1001
    // (1500.50); 1003 has null fecha (excluded), 1005 is past the cut
    assert(r.getDecimal(0) == new java.math.BigDecimal("2750.00"))
    assert(r.getDecimal(1) == new java.math.BigDecimal("4250.50"))
  }

  test("distributorPerformance: coalesce bucket + duplicate-client blowup (A4/J4)") {
    val rows = Report.distributorPerformance(
      tables("fct_transacciones"), tables("dim_clientes"),
      tables("dim_distribuidores"), cut)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).toString).toSeq
    // client 2's duplicate JSON row collapsed on the load path (the
    // warehouse PK forbids it — the report reads the STAR, and the
    // reference's Postgres star can never hold the blowup either), so
    // its 2000.00 trx counts ONCE under Distribuidora Sur; client 5 has
    // no distributor → 'Venta Directa'
    assert(rows == Seq(
      "Distribuidora Sur" -> "2000.00",
      "Venta Directa" -> "750.00"))
  }

  test("formatMessage: Spanish date, currency format, per-distributor lines (F8/F9)") {
    val metricsRow = Report.metrics(tables("fct_transacciones"), cut)
      .collect().head
    val dist = Report.distributorPerformance(
      tables("fct_transacciones"), tables("dim_clientes"),
      tables("dim_distribuidores"), cut).collect().toSeq
    val msg = Report.formatMessage(metricsRow, dist, cut, Some("http://dash"))
    assert(msg.contains("FECHA DE CORTE: 14 JUN, 2025"))
    assert(msg.contains("PRÉSTAMOS DEL DÍA: $2,750.00"))
    assert(msg.contains("ACUMULADO MENSUAL: $4,250.50"))
    assert(msg.contains("- Distribuidora Sur: $2,000.00"))
    assert(msg.contains("- Venta Directa: $750.00"))
    assert(msg.contains("[CONSULTAR DASHBOARD COMPLETO](http://dash)"))
    // no configured URL → no footer (S7: the link is deployment config)
    val bare = Report.formatMessage(metricsRow, dist, cut, None)
    assert(!bare.contains("CONSULTAR DASHBOARD"))
    assert(bare.contains("- Venta Directa: $750.00"))
  }
}
