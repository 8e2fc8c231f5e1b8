package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-side CSV parser for the Varios sheet must honor standard
  * quoting — pandas `to_csv` (the reference's converter) quotes any
  * field containing a comma, a quote, OR A NEWLINE, and the parser
  * tracks quote state across line breaks (the r3 advisory: a
  * line-splitting reader shears such rows into malformed halves).
  */
class CsvFieldSpec extends AnyFunSuite {

  test("bare fields split on commas; rows on newlines") {
    assert(Main.csvRows("1,Sede Centro\n2,Sede Norte") ==
      Seq(Seq("1", "Sede Centro"), Seq("2", "Sede Norte")))
    assert(Main.csvRows("solo") == Seq(Seq("solo")))
  }

  test("quoted field may contain commas") {
    assert(Main.csvRows("\"Sede Centro, Anexo\",tail") ==
      Seq(Seq("Sede Centro, Anexo", "tail")))
  }

  test("doubled quotes unescape inside a quoted field") {
    assert(Main.csvRows("\"di \"\"maria\"\"\",x") ==
      Seq(Seq("di \"maria\"", "x")))
  }

  test("quoted field may contain embedded newlines (pandas to_csv)") {
    assert(Main.csvRows("1,\"Sede\nCentro\"\n2,Norte") ==
      Seq(Seq("1", "Sede\nCentro"), Seq("2", "Norte")))
    // CRLF row breaks, LF inside quotes
    assert(Main.csvRows("a,\"x\ny\"\r\nb,z") ==
      Seq(Seq("a", "x\ny"), Seq("b", "z")))
  }

  test("empty quoted field and trailing newline round-trip") {
    assert(Main.csvRows("\"\",b\n") == Seq(Seq("", "b")))
  }

  test("empty line yields a 1-empty-cell row; ',' yields a 2-cell row") {
    // callers (readVarios) skip the former but must KEEP the latter —
    // pandas to_csv writes a blank sheet row as ',', and the xlsx path
    // of the same sheet keeps it too (sentinel split is order-sensitive)
    assert(Main.csvRows("a,b\n\n,\nc,d") ==
      Seq(Seq("a", "b"), Seq(""), Seq("", ""), Seq("c", "d")))
  }

  test("unterminated quote fails loudly instead of swallowing the tail") {
    val e = intercept[IllegalArgumentException](Main.csvRows("1,\"oops"))
    assert(e.getMessage.contains("unterminated"))
  }
}
