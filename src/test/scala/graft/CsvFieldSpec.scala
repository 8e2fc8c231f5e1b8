package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-side 2-column CSV split for the Varios sheet must honor
  * standard quoting — pandas `to_csv` (the reference's converter)
  * quotes any field containing a comma.
  */
class CsvFieldSpec extends AnyFunSuite {

  test("bare fields split on the first comma") {
    assert(Main.csvField("1,Sede Centro") == ("1", ",Sede Centro"))
    assert(Main.csvField("solo") == ("solo", ""))
  }

  test("quoted field may contain commas") {
    val (v, rest) = Main.csvField("\"Sede Centro, Anexo\",tail")
    assert(v == "Sede Centro, Anexo")
    assert(rest == ",tail")
  }

  test("doubled quotes unescape inside a quoted field") {
    val (v, _) = Main.csvField("\"di \"\"maria\"\"\",x")
    assert(v == "di \"maria\"")
  }

  test("unterminated quote consumes to end of line (no crash)") {
    val (v, rest) = Main.csvField("\"oops")
    assert(v == "oops" && rest == "")
  }
}
