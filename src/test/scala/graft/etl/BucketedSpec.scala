package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Pins the whole point of [[Bucketed]]: two tables co-located on the
  * join key plan their join WITHOUT any shuffle exchange (and without
  * re-sorting — the on-disk sort order satisfies the merge), and a
  * key-aggregate over one bucketed table plans without an exchange.
  * Results stay identical to the plain-parquet plans. */
class BucketedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("co-located join: no Exchange, no per-side Sort; result ≡ the " +
    "unbucketed join") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketed.coLocate(li, "b_lineitem", "l_orderkey", buckets = 8)
    Bucketed.coLocate(ord, "b_orders", "l_orderkey", buckets = 8)
    assert(Bucketed.bucketsOf(spark, "b_lineitem").contains(8))
    assert(Bucketed.bucketsOf(spark, "b_orders").contains(8))

    // bucketed joins need the broadcast path OFF to show the SMJ shape
    // (at fixture SF everything broadcasts; at 100 TB nothing does —
    // the exchange-free SMJ is the plan the layout exists to buy)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def plan() = Bucketed.table(spark, "b_lineitem")
        .join(Bucketed.table(spark, "b_orders"), Seq("l_orderkey"))
      val p = plan().queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), p)
      // THE payoff: no shuffle on either side — the on-disk hash
      // layout satisfies the join's distribution requirement
      assert(!p.contains("Exchange"),
        s"co-located join must not shuffle:\n$p")
      assert(p.contains("Bucketed: true"), p)

      // the residual Sort above each scan is PER-BUCKET (no exchange
      // feeds it) — and it too disappears when the sorted-scan flag
      // is on (off by default since 3.0 because proving one-file-per-
      // bucket lists files at planning time; coLocate guarantees the
      // one-file layout, so turning it on is sound here)
      withSQLConf(
        "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
        val ps = plan().queryExecution.executedPlan.toString()
        assert(!ps.contains("Exchange"), ps)
        assert(!ps.contains("Sort ["),
          s"one-file-per-bucket sorted scan must satisfy the merge:\n$ps")
      }

      val expected = li.join(ord, Seq("l_orderkey")).count()
      assert(plan().count() == expected)
    }
  }

  test("key-aggregate over a bucketed table: no Exchange; result ≡ " +
    "the plain aggregate") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    Bucketed.coLocate(li, "b_lineitem_agg", "l_orderkey", buckets = 8)
    val agg = Bucketed.table(spark, "b_lineitem_agg")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    val p = agg.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"),
      s"bucketed aggregate must not shuffle:\n$p")
    val expected = li.groupBy(col("l_orderkey")).count().count()
    assert(agg.count() == expected)
  }

  test("coLocate self-heals an orphaned managed-table directory left " +
    "by a previous session (in-memory catalog forgot, filesystem did " +
    "not — CTAS would refuse with LOCATION_ALREADY_EXISTS)") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val orphan = java.nio.file.Paths.get(wh, "b_orphan")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("junk"), "debris")
    assert(!spark.catalog.tableExists("b_orphan"))
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    Bucketed.coLocate(li, "b_orphan", "l_orderkey", buckets = 4)
    assert(Bucketed.bucketsOf(spark, "b_orphan").contains(4))
    assert(Bucketed.table(spark, "b_orphan").count() == li.count())
  }

  test("coLocate refuses an absent bucket key and non-positive counts") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    intercept[IllegalArgumentException] {
      Bucketed.coLocate(li, "b_bad", "nope", buckets = 8)
    }
    intercept[IllegalArgumentException] {
      Bucketed.coLocate(li, "b_bad", "l_orderkey", buckets = 0)
    }
  }

  private def withSQLConf[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
