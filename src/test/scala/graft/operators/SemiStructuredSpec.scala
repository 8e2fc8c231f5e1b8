package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JSON schema-on-read semantics (q109's operator): extraction is
  * total — missing field, wrong type, malformed payload and NULL all
  * yield NULL, never an error (a poison payload must not kill a
  * scan) — and the per-group stats count presence separately from
  * rows.
  */
class SemiStructuredSpec extends SparkSpec {

  import spark.implicits._

  test("extractLong: valid, missing, non-numeric, malformed, null") {
    val df = Seq(
      (1L, """{"k": 42}"""),
      (2L, """{"other": 7}"""),
      (3L, """{"k": "notanumber"}"""),
      (4L, """{broken"""),
      (5L, null: String))
      .toDF("id", "props")
    val got = df.select(col("id"),
      SemiStructured.extractLong(col("props"), "k").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).contains(42L))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
    assert(got(4L).isEmpty)
    assert(got(5L).isEmpty)
  }

  test("jsonFieldStats: presence vs rows; all-absent group has NULL sum/mean") {
    val df = Seq(
      ("a", """{"k": 10}"""), ("a", """{"k": 20}"""), ("a", """{}"""),
      ("b", """{"x": 1}"""), ("b", null: String))
      .toDF("grp", "props")
    val out = SemiStructured.jsonFieldStats(df, "props", "k", "grp")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L) // rows, present
    assert(a.getLong(3) == 30L)                      // exact sum
    assert(a.getDouble(4) == 15.0)                   // mean over PRESENT
    val b = out("b")
    assert(b.getLong(1) == 2L && b.getLong(2) == 0L)
    assert(b.isNullAt(3) && b.isNullAt(4)) // no values → NULL, not 0
  }

  test("jsonFieldTopK: missing payloads are the NULL census row; ties " +
    "break count desc then value asc NULLS FIRST; k truncates") {
    val df = Seq(
      ("g", """{"k": 1}"""), ("g", """{"k": 1}"""), ("g", """{"k": 1}"""),
      ("g", """{"k": 2}"""), ("g", """{"k": 2}"""),
      ("g", "not json"), ("g", """{"other": 9}"""), // two NULL rows
      ("g", """{"k": 3}""")
    ).toDF("t", "props")
    val out = SemiStructured.jsonFieldTopK(df, "props", "k", "t", k = 2)
      .collect().map(r => (r.getInt(3),
        if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2)))
    // 1×3 ranks first; the n=2 tie between value 2 and NULL goes to
    // NULL (asc nulls first); value 3 (n=1) is cut by k=2
    assert(out.toSeq == Seq((1, 1L, 3L), (2, null, 2L)))
  }
}
