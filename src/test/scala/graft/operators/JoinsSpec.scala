package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for [[Joins]] — the as-of and interval joins.
  *
  * The equivalence tests compare against the NAIVE formulations (per-key
  * history explosion + max-filter; filtered cross join) on fixture data:
  * the naive plans are the semantics, the operators are the scale
  * rewrites, and the two must agree row-for-row.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // -------------------------------------------------------------- as-of

  private def leftDf: DataFrame = Seq(
    (1L, "a", 100L), // exact-tie with right r2
    (2L, "a", 150L), // between r2 and r3
    (3L, "a", 10L),  // before any right row
    (4L, "b", 500L), // key with no right rows at all
    (5L, "a", 400L)  // after the last right row
  ).toDF("lid", "k", "t")

  private def rightDf: DataFrame = Seq(
    ("a", 50L, 7L), ("a", 100L, 8L), ("a", 200L, 9L)
  ).toDF("k", "t", "rv")

  test("asOf inclusive: ties match, gaps carry the latest earlier row") {
    val got = Joins.asOf(leftDf, rightDf, "k", "t")
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(8L), 2L -> Some(8L), 3L -> None,
      4L -> None, 5L -> Some(9L)))
  }

  test("asOf strict: an equal-timestamp right row is NOT visible") {
    val got = Joins.asOf(leftDf, rightDf, "k", "t", inclusive = false)
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(7L)) // 100 excluded, falls back to 50
    assert(got(2L) === Some(8L)) // unaffected: 100 < 150 either way
  }

  test("asOf forward inclusive: ties match, gaps carry the nearest later row") {
    val got = Joins.asOf(leftDf, rightDf, "k", "t", forward = true)
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(8L),  // exact tie visible
      2L -> Some(9L),  // next row after 150 is 200
      3L -> Some(7L),  // earliest right row
      4L -> None,      // key with no right rows
      5L -> None))     // after the last right row — nothing follows
  }

  test("asOf forward strict: an equal-timestamp right row is NOT visible") {
    val got = Joins.asOf(leftDf, rightDf, "k", "t",
      inclusive = false, forward = true)
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(9L)) // 100 excluded, next is 200
    assert(got(3L) === Some(7L)) // unaffected: 10 < 50 either way
  }

  test("asOf: null key / null time on either side never matches") {
    val l = Seq((1L, Option("a"), Option(100L)),
      (2L, Option.empty[String], Option(100L)),
      (3L, Option("a"), Option.empty[Long])).toDF("lid", "k", "t")
    val r = Seq((Option("a"), Option(60L), 7L),
      (Option.empty[String], Option(50L), 66L), // null-key right row
      (Option("a"), Option.empty[Long], 77L))   // null-time right row
      .toDF("k", "t", "rv")
    val got = Joins.asOf(l, r, "k", "t")
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(7L), 2L -> None, 3L -> None))
  }

  test("asOf: every left row survives exactly once (left-outer cardinality)") {
    val out = Joins.asOf(leftDf, rightDf, "k", "t")
    assert(out.count() === leftDf.count())
    assert(out.select("lid").distinct().count() === leftDf.count())
  }

  test("asOf ≡ naive history-explosion formulation on the events fixture") {
    val e0 = graft.engine.Tables.events(spark, sf)
    val e = e0.select(col("event_id"), col("user_id"), col("event_type"),
      graft.engine.Tables.tsUs(e0).as("ts_us"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = e.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("view_event_id"))
      .withColumn("view_ts_us", col("ts_us"))
    val got = Joins.asOf(purchases, views, "user_id", "ts_us")
      .select("event_id", "view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    // naive: explode each purchase against its whole view history, keep
    // the latest — the O(history) plan asOf exists to avoid
    val naive = purchases.as("p")
      .join(views.select(col("user_id").as("vu"),
          col("view_ts_us"), col("view_event_id")),
        col("p.user_id") === col("vu") && col("p.ts_us") >= col("view_ts_us"),
        "left")
      .withColumn("rn", row_number().over(Window.partitionBy(col("p.event_id"))
        .orderBy(col("view_ts_us").desc_nulls_last)))
      .where(col("rn") === 1)
      .select("p.event_id", "view_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === naive)
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  // ----------------------------------------------------------- interval

  private def intervalsDf: DataFrame = Seq(
    (10L, 0L, 100L), (11L, 95L, 105L), (12L, 300L, 300L), // point-interval
    (13L, 50L, 40L) // inverted: dropped
  ).toDF("iid", "s", "e")

  private def pointsDf: DataFrame = Seq(
    (1L, 0L), (2L, 100L), (3L, 101L), (4L, 300L), (5L, 299L), (6L, 45L)
  ).toDF("pid", "t")

  private val expectedPairs = Set((10L, 1L), (10L, 2L), (10L, 6L),
    (11L, 2L), (11L, 3L), (12L, 4L))

  test("intervalJoin: exact containment, inclusive bounds, inverted dropped") {
    val got = Joins.intervalJoin(intervalsDf, "s", "e", pointsDf, "t", 64L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got === expectedPairs)
  }

  test("intervalJoin: result is bucket-width invariant") {
    for (w <- Seq(1L, 7L, 100L, 1000000L)) {
      val got = Joins.intervalJoin(intervalsDf, "s", "e", pointsDf, "t", w)
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      assert(got === expectedPairs, s"bucketWidth=$w")
    }
  }

  test("intervalJoin: negative time axis (trunc-div coverage holds)") {
    val iv = Seq((1L, -25L, -5L)).toDF("iid", "s", "e")
    val pts = Seq((1L, -25L), (2L, -10L), (3L, -5L), (4L, -26L), (5L, 0L))
      .toDF("pid", "t")
    val got = Joins.intervalJoin(iv, "s", "e", pts, "t", 10L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (1L, 3L)))
  }

  test("intervalJoin ≡ naive inequality join on the events fixture") {
    val e0 = graft.engine.Tables.events(spark, sf)
    val e = e0.select(col("event_id"),
      graft.engine.Tables.tsUs(e0).as("ts_us"), col("value"))
    val windows = e.orderBy(col("value").desc, col("event_id")).limit(20)
      .select(col("event_id").as("wid"),
        (col("ts_us") - 600000000L).as("w_start"),
        (col("ts_us") + 600000000L).as("w_end"))
    val got = Joins.intervalJoin(windows, "w_start", "w_end", e, "ts_us",
      bucketWidth = 1200000000L)
      .select("wid", "event_id").as[(Long, Long)].collect().toSet
    val naive = windows.join(e,
      col("ts_us").between(col("w_start"), col("w_end")))
      .select("wid", "event_id").as[(Long, Long)].collect().toSet
    assert(got === naive && got.nonEmpty)
  }

  test("asOfWithin: stale matches null out, fresh ones identical to asOf") {
    import spark.implicits._
    val probes = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L))
      .toDF("pid", "key", "t")
    val updates = Seq((10L, 90L, 7L), (10L, 200L, 8L))
      .toDF("key", "t", "rv")
    val out = Joins.asOfWithin(probes, updates, "key", "t",
      tolerance = 60L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L) == Some(7L)) // 100-90=10 <= 60: fresh
    assert(out(2L) == Some(8L)) // 250-200=50 <= 60: fresh
    assert(out(3L) == None) // key 20: no update at all
    val strictTol = Joins.asOfWithin(probes, updates, "key", "t",
      tolerance = 5L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // the latest at-or-before row exists but is too old -> nulled
    assert(strictTol(1L) == None && strictTol(2L) == None)
  }
}
