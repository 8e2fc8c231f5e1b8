package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.etl.VariosSplitter.RawRow
import graft.sources.{ExcelSource, InlineRowsSource, Xlsx, XlsxFixtures}

/** The reference's ACTUAL input modality end-to-end: one xlsx workbook
  * (headered Clientes + Transacciones, headerless sentinel-split
  * Varios — extract.py:143-149) through ExcelSource/Xlsx into the full
  * pipeline; must land on the same star the in-memory fixture produces.
  */
class EtlFromXlsxSpec extends SparkSpec {

  test("xlsx workbook → ExcelSource → EtlJob produces the fixture star") {
    def s(rows: Seq[org.apache.spark.sql.Row]): Seq[Seq[String]] =
      rows.map(_.toSeq.map(v => if (v == null) null else v.toString))

    val workbook = XlsxFixtures.writeWorkbook(Seq(
      "Clientes" -> (Seq(Seq("IDCLIENTE", "fechaafiliacion", "fechaprimertrx"))
        ++ s(EtlFixture.clientesRows)),
      "Transacciones" -> (Seq(Seq("c0", "c1", "c2", "c3", "c4", "c5", "c6"))
        ++ s(EtlFixture.transaccionesRows)),
      "Varios" -> EtlFixture.variosRows.map(r =>
        Seq(r.c0.orNull, r.c1.orNull))))
    val wb = workbook.toString

    val variosRows = Xlsx.readSheet(wb, "Varios")
      .map(r => RawRow(r.head, r(1)))
    val sources = EtlJob.Sources(
      clientes = ExcelSource(wb, "Clientes"),
      transacciones = ExcelSource(wb, "Transacciones"),
      varios = variosRows,
      recomendados = InlineRowsSource(EtlFixture.recomendadosRows,
        EtlFixture.recomendadosSchema),
      recomendadosOrderCol = "ord")

    val sink = new IncrementalSink(spark,
      Files.createTempDirectory("graft_wh_xlsx").toString)
    val acct = EtlJob.run(spark, sources, sink)
    assert(acct == Map(
      "dim_sedes" -> (2L, 0L),
      "dim_tipo_transaccion" -> (3L, 0L),
      "dim_distribuidores" -> (3L, 0L),
      "dim_clientes" -> (6L, 0L),
      "fct_transacciones" -> (5L, 0L)))
    // spot-check typed content survived the all-string sheet path
    val fct = sink.read("fct_transacciones")
    assert(fct.select("monto").collect()
      .map(_.getDecimal(0)).map(_.doubleValue).sum == 4650.75)
  }
}
