package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rule-audit semantics (q104's operator) on hand fixtures: NULL
  * predicates count as violations (the 3VL trap), the FK audit counts
  * orphans AND null keys, and the report arithmetic is exact.
  */
class RulesSpec extends SparkSpec {

  import spark.implicits._

  test("audit: NULL predicate is a violation; counts by hand") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "O"), (2L, -1.0, "F"), (3L, null, "P"),
      (4L, 5.0, "X"), (5L, 0.0, null))
      .toDF("id", "value", "status")
    val out = Rules.audit(df, Seq(
      Rules.Rule("value_positive", col("value") > 0),
      Rules.Rule("status_domain", col("status").isin("O", "F", "P"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // value_positive: -1 fails, NULL fails, 0 fails → 3 of 5
    assert(out("value_positive") == ((5L, 3L, 0.6)))
    // status_domain: X fails, NULL fails → 2 of 5
    assert(out("status_domain") == ((5L, 2L, 0.4)))
  }

  test("audit rejects duplicate rule names and empty rule sets") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Rules.audit(df, Seq(Rules.Rule("r", col("a") > 0),
        Rules.Rule("r", col("b") > 0)))
    }
    intercept[IllegalArgumentException] { Rules.audit(df, Seq.empty) }
  }

  test("refAudit: orphan keys AND null keys violate; matches don't") {
    val child = Seq[java.lang.Long](1L, 1L, 2L, 9L, null)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Rules.refAudit(child, "fk", parent, "pk", "fk_check")
      .collect().head
    assert(r.getString(0) == "fk_check")
    assert(r.getLong(1) == 5L) // n_rows
    assert(r.getLong(2) == 2L) // 9 (orphan) + null
    assert(r.getDouble(3) == 0.4)
  }

  test("refAudit: duplicate parent keys do not inflate the child count") {
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pk") // dup parents
    val r = Rules.refAudit(child, "fk", parent, "pk", "fk").collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L)
  }

  test("fdAudit: only multi-valued determinants report; NULL rhs is a " +
    "distinct assertion; NULL lhs is one determinant") {
    val df = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", 1L), ("a", 2L),   // violated: {1, 2} over 3 rows
      ("b", 1L), ("b", 1L),              // clean — absent
      ("c", null), ("c", 1L),            // violated: {NULL, 1}
      ("d", null),                       // clean — one (NULL) value
      (null, 1L), (null, 2L))            // violated NULL determinant
      .toDF("k", "v")
    val rows = Rules.fdAudit(df, "k", "v").collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set("a", "c", null))
    assert(rows("a") == ((2L, 3L)))
    assert(rows("c") == ((2L, 2L)))
    assert(rows(null) == ((2L, 2L)))
  }

  test("stalenessAudit: recency anchored to the data's last activity; " +
    "never-active items are stale but counted") {
    val dim = Seq((1L, "X"), (2L, "X"), (3L, "X"), (4L, "Y"))
      .toDF("id", "brand")
    // global last activity = 2024-12-31; item 1 recent (10 days),
    // item 2 ancient (2 years), item 3 never active, item 4 IS the
    // anchor
    val facts = Seq(
      (1L, "2024-12-21"), (2L, "2022-12-31"), (4L, "2024-12-31")
    ).toDF("fid", "t").select(col("fid"), to_timestamp(col("t")).as("t"))
    val out = Rules.stalenessAudit(dim, "id", "brand", facts, "fid",
      col("t"), horizonDays = 365).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out("X") == ((3L, 2L, 1L, 2.0 / 3)))
    assert(out("Y") == ((1L, 1L, 1L, 0.0)))
  }

  test("factReconciliation: exact matches drop; vanished details rank " +
    "by the full header value; fixed point is integer cents") {
    val s10 = spark; import s10.implicits._
    import org.apache.spark.sql.functions.col
    val parents = Seq((1L, 10.00), (2L, 10.00), (3L, 5.00))
      .toDF("k", "v")
    val details = Seq((1L, 4.00), (1L, 6.00), (2L, 7.00))
      .toDF("k", "v")
    val out = Rules.factReconciliation(parents, "k", col("v"),
      details, "k", col("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      // key 3: no details at all — diff = full 5.00, rel = 2^20
      (3L, 5.00, None, 5.00, 1048576L),
      // key 2: 3.00 short; (300·2^20) div 1000 = 314572
      (2L, 10.00, Some(7.00), 3.00, 314572L)))
  }
}
