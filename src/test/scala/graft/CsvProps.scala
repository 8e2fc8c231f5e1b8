package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-trip property for the hand-rolled character-stream CSV parser:
  * serialize arbitrary cell content with pandas-`to_csv` quoting rules
  * (quote a field iff it contains a comma, a quote, or a line break;
  * double the quotes) and require `Main.csvRows` to recover the exact
  * rows — including embedded newlines, CRLF, and adversarial
  * quote-runs. A generated-input property catches the parser states a
  * handful of example tests never visit.
  */
object CsvProps extends Properties("csvRows") {

  private val cellChar: Gen[Char] = Gen.frequency(
    (8, Gen.alphaNumChar),
    (2, Gen.oneOf(',', '"', '\n', ' ')),
    (1, Gen.oneOf('\r', '\t', 'ñ', 'í')))

  private val cell: Gen[String] = Gen.listOf(cellChar).map(_.mkString)

  // a single-field row whose field is "" serializes to an empty line,
  // which the reader (like pandas) skips — exclude that one ambiguous
  // shape from the round-trip domain
  private val row: Gen[List[String]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, cell))
      .suchThat(r => !(r.lengthCompare(1) == 0 && r.head.isEmpty))

  private val rowsGen: Gen[List[List[String]]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, row))

  private def writeField(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  property("pandas-quoted serialization round-trips exactly") =
    forAll(rowsGen) { rows =>
      val text = rows.map(_.map(writeField).mkString(",")).mkString("\n")
      Main.csvRows(text) == rows.map(_.toSeq)
    }

  property("CRLF row separators parse like LF") =
    forAll(rowsGen) { rows =>
      val text = rows.map(_.map(writeField).mkString(",")).mkString("\r\n")
      Main.csvRows(text) == rows.map(_.toSeq)
    }
}
