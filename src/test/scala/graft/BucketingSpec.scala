package graft

import org.apache.spark.sql.functions._

/** Bucketing is the co-located-join story for repeated big-big joins
  * (SURVEY intro: "bucketing for co-located joins"): two tables
  * bucketed+sorted on the join key join WITHOUT any Exchange — at
  * 100 TB that's the difference between re-shuffling the fact on every
  * query and shuffling it once at write time. This spec pins the
  * plan shape so the capability is demonstrated, not assumed.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed+sorted tables join with ZERO exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      graft.engine.Tables.orders(spark, "/root/testdata/sf0.001")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bkt_orders")
      graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bkt_lineitem")

      val joined = spark.table("bkt_lineitem")
        .join(spark.table("bkt_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
