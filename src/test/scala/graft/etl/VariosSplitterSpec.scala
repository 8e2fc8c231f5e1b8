package graft.etl

import graft.SparkSpec
import graft.etl.VariosSplitter.RawRow

/** The sentinel-split 3-branch logic (SURVEY §2.2 P1/P2; FIXTURES §A3). */
class VariosSplitterSpec extends SparkSpec {

  private def row(a: String, b: String) = RawRow(Option(a), Option(b))

  test("normal: two sentinels split into sedes and tipos") {
    val rows = Seq(
      row("ID", "NOMBRE"),
      row("1", "Sede Centro"), row("2", "Sede Norte"),
      row("ID", "DESCRIPCION"),
      row("10", "Prestamo"), row("11", "Pago"), row("12", "Ajuste"))
    val (sedes, tipos) = VariosSplitter.split(spark, rows)
    assert(sedes.columns.toSeq == Seq("id_sede", "nombre_sede"))
    assert(tipos.columns.toSeq == Seq("id_tipo_trx", "descripcion_tipo"))
    assert(sedes.collect().map(_.getString(0)).toSeq == Seq("1", "2"))
    assert(tipos.collect().map(_.getString(0)).toSeq == Seq("10", "11", "12"))
  }

  test("single sentinel at row 0: everything is sedes, tipos empty") {
    val rows = Seq(row("ID", "NOMBRE"), row("1", "A"), row("2", "B"))
    val (sedes, tipos) = VariosSplitter.split(spark, rows)
    assert(sedes.count() == 2)
    assert(tipos.count() == 0)
    assert(tipos.columns.toSeq == Seq("id_tipo_trx", "descripcion_tipo"))
  }

  test("single sentinel mid-file: before is sedes, after is tipos") {
    val rows = Seq(row("1", "A"), row("2", "B"),
      row("ID", "DESC"), row("10", "X"))
    val (sedes, tipos) = VariosSplitter.split(spark, rows)
    assert(sedes.collect().map(_.getString(0)).toSeq == Seq("1", "2"))
    assert(tipos.collect().map(_.getString(0)).toSeq == Seq("10"))
  }

  test("zero sentinels: both empty with correct schemas") {
    val rows = Seq(row("1", "A"), row("2", "B"))
    val (sedes, tipos) = VariosSplitter.split(spark, rows)
    assert(sedes.count() == 0 && tipos.count() == 0)
    assert(sedes.columns.toSeq == Seq("id_sede", "nombre_sede"))
  }

  test("sentinel match is exact-cell, first column only") {
    val rows = Seq(
      row("ID", "h"), row("IDX", "not a sentinel"), row("3", "ID"),
      row("ID", "h2"), row("7", "t"))
    val (sedes, tipos) = VariosSplitter.split(spark, rows)
    assert(sedes.collect().map(_.getString(0)).toSeq == Seq("IDX", "3"))
    assert(tipos.collect().map(_.getString(0)).toSeq == Seq("7"))
  }
}
