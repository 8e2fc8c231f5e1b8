package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.etl.VariosSplitter

/** The JDK-only xlsx reader against a spec-conformant OOXML workbook
  * built in-test: shared strings, inline strings, numeric cells, SPARSE
  * rows (skipped cells placed by reference), a headered sheet and the
  * reference's headerless sentinel-split Varios sheet end-to-end into
  * the splitter.
  */
class XlsxSpec extends SparkSpec {

  private def writeXlsx(): String = {
    val path = Files.createTempFile("graft_test", ".xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    val ns = "xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\""
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?>
         |<workbook $ns xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>
         |<sheet name="Clientes" sheetId="1" r:id="rId1"/>
         |<sheet name="Varios" sheetId="2" r:id="rId2"/>
         |</sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?>
         |<sst $ns count="4" uniqueCount="4">
         |<si><t>IDCLIENTE</t></si><si><t>fechaafiliacion</t></si>
         |<si><t>2024-01-10</t></si><si><t>ID</t></si>
         |</sst>""".stripMargin)
    // Clientes: headered; row 2 has a SPARSE gap (no B cell) + number
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?>
         |<worksheet $ns><sheetData>
         |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
         |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>2</v></c></row>
         |<row r="3"><c r="A3"><v>2</v></c></row>
         |</sheetData></worksheet>""".stripMargin)
    // Varios: headerless, sentinel rows via shared + inline strings
    put("xl/worksheets/sheet2.xml",
      s"""<?xml version="1.0"?>
         |<worksheet $ns><sheetData>
         |<row r="1"><c r="A1" t="s"><v>3</v></c><c r="B1" t="inlineStr"><is><t>NOMBRE</t></is></c></row>
         |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>Sede Centro</t></is></c></row>
         |<row r="3"><c r="A3" t="inlineStr"><is><t>ID</t></is></c><c r="B3" t="inlineStr"><is><t>DESC</t></is></c></row>
         |<row r="4"><c r="A4"><v>100</v></c><c r="B4" t="inlineStr"><is><t>Prestamo</t></is></c></row>
         |</sheetData></worksheet>""".stripMargin)
    zos.close()
    path.toString
  }

  test("readSheet: shared/inline/numeric cells, sparse rows padded by ref") {
    val rows = Xlsx.readSheet(writeXlsx(), "Clientes")
    assert(rows == Seq(
      Seq(Some("IDCLIENTE"), Some("fechaafiliacion")),
      Seq(Some("1"), Some("2024-01-10")),
      Seq(Some("2"), None))) // sparse B3 padded
  }

  test("ExcelSource headered: row 0 becomes column names") {
    val df = ExcelSource(writeXlsx(), "Clientes", header = true).load(spark)
    assert(df.columns.toSeq == Seq("IDCLIENTE", "fechaafiliacion"))
    assert(df.count() == 2)
  }

  test("ExcelSource headerless Varios feeds the sentinel splitter end-to-end") {
    val df = ExcelSource(writeXlsx(), "Varios", header = false).load(spark)
    assert(df.columns.toSeq == Seq("c0", "c1"))
    val raw = df.collect().map(r =>
      VariosSplitter.RawRow(Option(r.getString(0)), Option(r.getString(1))))
      .toSeq
    val (sedes, tipos) = VariosSplitter.split(spark, raw)
    // two sentinels ("ID" rows 1 and 3): between = sedes, after = tipos
    assert(sedes.collect().map(_.getString(0)).toSeq == Seq("1"))
    assert(tipos.collect().map(_.getString(0)).toSeq == Seq("100"))
  }

  test("missing sheet fails loudly") {
    assertThrows[RuntimeException](Xlsx.readSheet(writeXlsx(), "Nope"))
  }

  test("date-serial cells decode to ISO; pre-1900 serials stay raw") {
    val serial = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1899, 12, 30),
      java.time.LocalDate.parse("2024-01-10"))
    val wb = XlsxFixtures.writeWorkbook(Seq("F" -> Seq(
      Seq("d", "dt", "old", "dur"),
      Seq(XlsxFixtures.DateSerial + serial,          // built-in fmt 14
        XlsxFixtures.DateTimeSerial + s"$serial.25", // custom fmt, 6:00 am
        XlsxFixtures.DateSerial + "59",              // phantom-day zone
        XlsxFixtures.ElapsedSerial + "62.5"))))      // [h]:mm:ss duration
    val rows = Xlsx.readSheet(wb.toString, "F")
    assert(rows(1) == Seq(Some("2024-01-10"),
      Some("2024-01-10 06:00:00"), Some("59"),
      Some("62.5"))) // elapsed-duration style is NOT a date: raw serial
  }

  test("1904-system workbooks decode against the 1904-01-01 epoch: the " +
    "same calendar date round-trips from either system's serial") {
    val date = java.time.LocalDate.parse("2024-01-10")
    val s1900 = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1899, 12, 30), date)
    val s1904 = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1904, 1, 1), date)
    assert(s1900 - s1904 == 1462L) // the ~4-year silent shift at stake
    val wb1900 = XlsxFixtures.writeWorkbook(Seq("F" -> Seq(
      Seq(XlsxFixtures.DateSerial + s1900))))
    val wb1904 = XlsxFixtures.writeWorkbook(Seq("F" -> Seq(
      Seq(XlsxFixtures.DateSerial + s1904))), date1904 = true)
    assert(Xlsx.readSheet(wb1900.toString, "F") ==
      Seq(Seq(Some("2024-01-10"))))
    assert(Xlsx.readSheet(wb1904.toString, "F") ==
      Seq(Seq(Some("2024-01-10"))))
    // 1904 system has no phantom day: small serials decode from 0
    val wbSmall = XlsxFixtures.writeWorkbook(Seq("F" -> Seq(
      Seq(XlsxFixtures.DateSerial + "0", XlsxFixtures.DateSerial + "59"))),
      date1904 = true)
    assert(Xlsx.readSheet(wbSmall.toString, "F") ==
      Seq(Seq(Some("1904-01-01"), Some("1904-02-29"))))
  }

  test("percent/currency-styled numerics return RAW stored values (openpyxl parity)") {
    // Excel stores 15% as 0.15 and formats only the DISPLAY; openpyxl's
    // cell.value (the reference's reader, extract.py:100) returns the
    // stored number for every non-date format. Dates are the one format
    // family where the stored value (a serial) is not the logical value
    // — which is exactly the one family the reader decodes. So raw
    // pass-through here is behavioral parity, not a gap.
    val wb = XlsxFixtures.writeWorkbook(Seq("F" -> Seq(
      Seq("pct", "ccy"),
      Seq(XlsxFixtures.Percent + "0.15", XlsxFixtures.Currency + "1234.5"))))
    val rows = Xlsx.readSheet(wb.toString, "F")
    assert(rows(1) == Seq(Some("0.15"), Some("1234.5")))
  }

  test("namespace-PREFIXED worksheet parts parse identically (x:row etc.)") {
    // some writers prefix the main spreadsheetml namespace; literal tag
    // matching would silently return zero rows for these
    val path = Files.createTempFile("graft_test_ns", ".xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<x:workbook xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<x:sheets><x:sheet name="S" sheetId="1" r:id="rId1"/></x:sheets>
        |</x:workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<x:worksheet xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><x:sheetData>
        |<x:row r="1"><x:c r="A1" t="inlineStr"><x:is><x:t>hello</x:t></x:is></x:c><x:c r="B1"><x:v>7</x:v></x:c></x:row>
        |</x:sheetData></x:worksheet>""".stripMargin)
    zos.close()
    assert(Xlsx.readSheet(path.toString, "S") ==
      Seq(Seq(Some("hello"), Some("7"))))
  }
}
