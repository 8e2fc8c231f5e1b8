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
  * positional consumption P3 stays correct), headerless mode. Cell
  * values come back as raw STRINGS — the transform owns typing via its
  * coerce/strict casts (transform.py:61-64,113-124), exactly as it does
  * for every other source. Not supported (documented): Excel
  * date-serial decoding and styles — the reference's date columns are
  * re-parsed downstream by F1/F2 try-casts anyway.
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

      def cellValue(c: Element): Option[String] = {
        def child(tag: String): Option[Element] = elemsIn(c, tag).headOption
        c.getAttribute("t") match {
          case "s" => child("v").map(v => shared(v.getTextContent.trim.toInt))
          case "inlineStr" => child("is").map(_.getTextContent)
          case _ => child("v").map(_.getTextContent) // "str", numbers, bools
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
