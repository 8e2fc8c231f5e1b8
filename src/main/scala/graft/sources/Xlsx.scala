package graft.sources

import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element

/** Minimal driver-side XLSX sheet reader (SURVEY §2.1 S1;
  * /root/reference/src/extract.py:85-105 reads named sheets, `:148`
  * headerless). OOXML is a zip of XML and the JDK ships both readers,
  * so no POI dependency is needed for the catalog-scale sheets the
  * reference consumes (KB control data, parsed on the driver — SURVEY
  * §7.1 M3; big data never arrives as xlsx).
  *
  * Supported: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula-string cells (`t="str"`), raw numeric
  * text, sparse rows (cells placed by their `r="B3"` reference so
  * positional consumption P3 stays correct), headerless mode, and
  * DATE-SERIAL decoding: a numeric cell whose style resolves to a date
  * number format (built-in ids 14-22/45-47, or a custom format whose
  * code carries date tokens) is decoded to an ISO string — real-world
  * workbooks store dates as serials, which openpyxl hands the reference
  * as datetime objects (extract.py:100) and pandas re-parses
  * (transform.py:114-117); without decoding, downstream F1/F2 try-casts
  * would silently null every date column of a styled workbook.
  *
  * BOTH Excel date systems are honored, matching openpyxl (the
  * reference's reader resolves the epoch per workbook): the default
  * 1900 system decodes serials >= 61 (1900-03-01 onward, past the
  * 1900 leap-year phantom day) against day 0 = 1899-12-30, while a
  * workbook whose `xl/workbook.xml` carries `workbookPr/@date1904`
  * (mac-Excel heritage) decodes serials >= 0 against day 0 =
  * 1904-01-01 — that system has no phantom day, so no exclusion zone.
  * Ignoring the flag would silently shift every date ~4 years
  * (1462 days). Time = the day fraction rounded to the second; whole
  * days print `yyyy-MM-dd`, otherwise `yyyy-MM-dd HH:mm:ss`.
  * Pre-1900-03-01 serials in the 1900 system stay raw text (ambiguous
  * under the phantom day; out of scope for the reference's data). All
  * other cell values come back as raw STRINGS — the transform owns
  * typing via its coerce/strict casts (transform.py:61-64,113-124),
  * exactly as it does for every other source.
  *
  * Non-date number formats (percent, currency, thousands separators,
  * arbitrary custom codes) deliberately pass through as the RAW stored
  * number: Excel stores 15% as 0.15 and the format only changes the
  * DISPLAY string, and openpyxl's `cell.value` — the reference's reader
  * — likewise returns the stored number for every non-date style. Dates
  * are the single format family where the stored value (a serial) is
  * not the logical value, hence the single special case above. XlsxSpec
  * pins the percent/currency pass-through.
  */
object Xlsx {

  /** Rows of the named sheet, padded to uniform width; None = empty
    * cell. Row order is file order (sentinel splitting depends on it). */
  def readSheet(path: String, sheetName: String): Seq[Seq[Option[String]]] = {
    val zip = new ZipFile(path)
    try {
      def parse(entry: String) = {
        val e = zip.getEntry(entry)
        require(e != null, s"xlsx missing $entry")
        val dbf = DocumentBuilderFactory.newInstance()
        // namespace-aware: spec-valid workbooks may PREFIX the main
        // namespace (<x:row>), which literal-tag matching silently
        // misses (empty sheet, no error) — match on local name instead
        dbf.setNamespaceAware(true)
        // XXE/entity-expansion hardening: a workbook is UNTRUSTED input
        // to the ETL driver; forbid DOCTYPE (and thus external/nested
        // entities) outright — OOXML needs none of it
        dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl",
          true)
        dbf.setExpandEntityReferences(false)
        dbf.newDocumentBuilder().parse(zip.getInputStream(e))
      }
      def elems(doc: org.w3c.dom.Document, tag: String): Seq[Element] = {
        val nl = doc.getElementsByTagNameNS("*", tag)
        (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      }
      def elemsIn(e: Element, tag: String): Seq[Element] = {
        val nl = e.getElementsByTagNameNS("*", tag)
        (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      }
      val relNs =
        "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

      // sheet name -> r:id -> worksheet part path
      val wb = parse("xl/workbook.xml")
      // Excel date system: workbookPr/@date1904 switches the serial
      // epoch to 1904-01-01 (mac-Excel heritage; openpyxl honors it at
      // extract.py:100's layer) — missing/false/0 means the 1900 system
      val date1904 = elems(wb, "workbookPr").headOption.exists { e =>
        val v = e.getAttribute("date1904")
        v == "1" || v.equalsIgnoreCase("true")
      }
      val rid = elems(wb, "sheet")
        .find(_.getAttribute("name") == sheetName)
        .map(s => Option(s.getAttributeNS(relNs, "id")).filter(_.nonEmpty)
          .getOrElse(s.getAttribute("r:id")))
        .getOrElse(sys.error(s"sheet '$sheetName' not found in $path"))
      val rels = parse("xl/_rels/workbook.xml.rels")
      val target = elems(rels, "Relationship")
        .find(_.getAttribute("Id") == rid)
        .map(_.getAttribute("Target"))
        .getOrElse(sys.error(s"no relationship for $rid"))
      val sheetPath =
        if (target.startsWith("/")) target.drop(1) else s"xl/$target"

      val shared: IndexedSeq[String] =
        if (zip.getEntry("xl/sharedStrings.xml") == null) IndexedSeq.empty
        else elems(parse("xl/sharedStrings.xml"), "si").map(_.getTextContent)
          .toIndexedSeq

      def colIndex(ref: String): Int =
        ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

      // style indices (the cell `s` attribute) whose number format is a
      // date format — built-in ids 14-22/45-47, or a custom <numFmt>
      // whose code still has date tokens after stripping [sections],
      // "quoted text" and \-escapes (the tokens y/m/d/h/s only survive
      // that stripping in date formats)
      val dateStyles: Set[Int] =
        if (zip.getEntry("xl/styles.xml") == null) Set.empty
        else {
          val doc = parse("xl/styles.xml")
          val custom = elems(doc, "numFmt").map(e =>
            e.getAttribute("numFmtId").toInt -> e.getAttribute("formatCode"))
            .toMap
          def isDateFmt(id: Int): Boolean =
            (id >= 14 && id <= 22) || (id >= 45 && id <= 47) ||
              custom.get(id).exists { code =>
                // ELAPSED-duration formats carry the token itself in
                // brackets ([h]:mm:ss, [mm]:ss) — their serials are
                // durations, not instants; decoding one as a date would
                // fabricate a timestamp, so they are NOT dates here and
                // pass through as raw numbers
                val elapsed =
                  "\\[[hmsHMS]+\\]".r.findFirstIn(code).isDefined
                val bare = code.replaceAll("\\[[^\\]]*\\]", "")
                  .replaceAll("\"[^\"]*\"", "").replaceAll("\\\\.", "")
                !elapsed && bare.exists(ch => "ymdhsYMDHS".indexOf(ch.toInt) >= 0)
              }
          elems(doc, "cellXfs").headOption.map(e => elemsIn(e, "xf"))
            .getOrElse(Seq.empty).zipWithIndex.collect {
              case (xf, i) if xf.getAttribute("numFmtId").nonEmpty &&
                isDateFmt(xf.getAttribute("numFmtId").toInt) => i
            }.toSet
        }

      // serial -> ISO string. 1900 system: day 0 = 1899-12-30 (the
      // offset that absorbs Excel's phantom 1900-02-29 for serials
      // >= 61). 1904 system: day 0 = 1904-01-01, valid from serial 0
      // (no phantom day).
      val epochDay =
        if (date1904) java.time.LocalDate.of(1904, 1, 1)
        else java.time.LocalDate.of(1899, 12, 30)
      val minSerial = if (date1904) 0.0 else 61.0
      def serialToIso(serial: Double): String = {
        val days = math.floor(serial).toLong
        val secs = math.round((serial - days) * 86400.0)
        val dt = epochDay.atStartOfDay.plusDays(days).plusSeconds(secs)
        if (dt.toLocalTime == java.time.LocalTime.MIDNIGHT)
          dt.toLocalDate.toString
        else dt.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
      }

      def cellValue(c: Element): Option[String] = {
        def child(tag: String): Option[Element] = elemsIn(c, tag).headOption
        c.getAttribute("t") match {
          case "s" => child("v").map(v => shared(v.getTextContent.trim.toInt))
          case "inlineStr" => child("is").map(_.getTextContent)
          case "str" => child("v").map(_.getTextContent) // formula strings
          case _ => // untyped = numeric (or bool); date-styled → decode
            child("v").map(_.getTextContent).map { v =>
              val s = c.getAttribute("s")
              if (s.nonEmpty && s.forall(_.isDigit) &&
                  dateStyles.contains(s.toInt))
                v.trim.toDoubleOption.filter(_ >= minSerial).map(serialToIso)
                  .getOrElse(v)
              else v
            }
        }
      }

      val rows = ArrayBuffer.empty[ArrayBuffer[Option[String]]]
      elems(parse(sheetPath), "row").foreach { r =>
        val cells = ArrayBuffer.empty[Option[String]]
        val nl = r.getElementsByTagNameNS("*", "c")
        (0 until nl.getLength).foreach { i =>
          val c = nl.item(i).asInstanceOf[Element]
          val idx =
            if (c.getAttribute("r").nonEmpty) colIndex(c.getAttribute("r"))
            else cells.length
          while (cells.length <= idx) cells += None
          cells(idx) = cellValue(c).map(_.trim).filter(_.nonEmpty)
        }
        rows += cells
      }
      val width = if (rows.isEmpty) 0 else rows.map(_.length).max
      rows.map(r => r.padTo(width, None).toSeq).toSeq
    } finally zip.close()
  }
}

/** Excel sheet scan behind the Source trait (S1, extract.py:143-149).
  * `header = true` uses row 0 as column names (extract.py:143's mode);
  * `header = false` yields positional `c0..cN` columns — the
  * reference's `header=None` Varios mode (extract.py:148). All columns
  * are StringType; typing belongs to the transform's casts. */
final case class ExcelSource(path: String, sheetName: String,
    header: Boolean = true) extends Source {
  def load(spark: SparkSession): DataFrame = {
    val rows = Xlsx.readSheet(path, sheetName)
    val (names, data) =
      if (header && rows.nonEmpty)
        (rows.head.zipWithIndex.map { case (h, i) => h.getOrElse(s"c$i") },
          rows.tail)
      else
        (rows.headOption.map(_.indices.map(i => s"c$i").toSeq)
          .getOrElse(Seq.empty), rows)
    val schema = StructType(names.map(StructField(_, StringType)))
    InlineRowsSource(data.map(r => Row(r.map(_.orNull): _*)), schema)
      .load(spark)
  }
}
