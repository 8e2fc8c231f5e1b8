package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Test-side OOXML workbook writer: every cell as an inline string
  * (spec-conformant; the reader's shared-string / numeric paths are
  * covered separately in XlsxSpec) — EXCEPT cells marked
  * `@serial:<num>` / `@serialdt:<num>`, written as NUMERIC cells styled
  * with a date format (built-in id 14 / a custom datetime format), the
  * way real writers store date-typed cells. */
object XlsxFixtures {

  /** Marker prefix: a date-styled numeric cell (built-in numFmtId 14). */
  val DateSerial = "@serial:"
  /** Marker prefix: a datetime-styled numeric cell (custom numFmt). */
  val DateTimeSerial = "@serialdt:"
  /** Marker prefix: an ELAPSED-duration-styled numeric cell
    * ([h]:mm:ss) — must NOT decode as a date. */
  val ElapsedSerial = "@elapsed:"
  /** Marker prefix: a percent-styled numeric cell (built-in numFmtId 9,
    * "0%") — must come back as the RAW stored fraction, openpyxl
    * parity. */
  val Percent = "@pct:"
  /** Marker prefix: a currency-styled numeric cell (custom "$"#,##0.00)
    * — raw number back, openpyxl parity. */
  val Currency = "@ccy:"

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Write a workbook with the given sheets (name → rows of cells;
    * null cells skipped). `date1904 = true` stamps
    * `workbookPr/@date1904` — the mac-Excel 1904 serial epoch.
    * Returns the file path. */
  def writeWorkbook(sheets: Seq[(String, Seq[Seq[String]])],
      date1904: Boolean = false): Path = {
    val path = Files.createTempFile("graft_wb", ".xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    val ns = "xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\""
    val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val wbPr = if (date1904) """<workbookPr date1904="1"/>""" else ""
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook $ns xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">$wbPr<sheets>$sheetTags</sheets></workbook>""")
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""")
    // style 1 = built-in date (numFmtId 14), style 2 = custom datetime,
    // style 3 = elapsed duration (NOT a date), style 4 = built-in
    // percent (id 9), style 5 = custom currency — the last two must
    // pass through as raw numbers
    put("xl/styles.xml",
      s"""<?xml version="1.0"?><styleSheet $ns><numFmts count="3"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd\\ hh:mm:ss"/><numFmt numFmtId="165" formatCode="[h]:mm:ss"/><numFmt numFmtId="166" formatCode="&quot;$$&quot;#,##0.00"/></numFmts><cellXfs count="6"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="164" applyNumberFormat="1"/><xf numFmtId="165" applyNumberFormat="1"/><xf numFmtId="9" applyNumberFormat="1"/><xf numFmtId="166" applyNumberFormat="1"/></cellXfs></styleSheet>""")
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      val colName = "ABCDEFGHIJ"
      val body = rows.zipWithIndex.map { case (cells, r) =>
        val cs = cells.zipWithIndex.collect {
          case (v, c) if v != null =>
            val ref = s"${colName(c)}${r + 1}"
            if (v.startsWith(DateSerial))
              s"""<c r="$ref" s="1"><v>${v.stripPrefix(DateSerial)}</v></c>"""
            else if (v.startsWith(DateTimeSerial))
              s"""<c r="$ref" s="2"><v>${v.stripPrefix(DateTimeSerial)}</v></c>"""
            else if (v.startsWith(ElapsedSerial))
              s"""<c r="$ref" s="3"><v>${v.stripPrefix(ElapsedSerial)}</v></c>"""
            else if (v.startsWith(Percent))
              s"""<c r="$ref" s="4"><v>${v.stripPrefix(Percent)}</v></c>"""
            else if (v.startsWith(Currency))
              s"""<c r="$ref" s="5"><v>${v.stripPrefix(Currency)}</v></c>"""
            else
              s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
        }.mkString
        s"""<row r="${r + 1}">$cs</row>"""
      }.mkString
      put(s"xl/worksheets/sheet${i + 1}.xml",
        s"""<?xml version="1.0"?><worksheet $ns><sheetData>$body</sheetData></worksheet>""")
    }
    zos.close()
    path
  }
}
