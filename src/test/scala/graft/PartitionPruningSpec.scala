package graft

import org.apache.spark.sql.functions._

/** Partition pruning is the other half of the 100 TB layout story
  * (BucketingSpec pins the join half): a date-partitioned fact must
  * let a day predicate eliminate directories BEFORE any IO, not filter
  * rows after reading them. This spec writes the events fixture
  * day-partitioned (the layout TESTDATA.md calls out for the fact at
  * scale), queries one day, and pins (a) the predicate lands in the
  * scan's PartitionFilters and exactly ONE of the ~30 day partitions
  * is read, and (b) DYNAMIC partition pruning fires when the day
  * arrives through a dimension join instead of a literal — the
  * star-schema shape. Two deliberate requirements baked in:
  * static-metrics assertion runs with AQE off (query stages hide the
  * executed scan node), and the DPP dimension is FILE-backed with a
  * selective predicate — a driver-local Seq constant-folds to a
  * LocalRelation, which DPP correctly refuses to prune from. */
class PartitionPruningSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_pp_events").toString
    val e0 = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
    e0.withColumn("day", to_date(graft.engine.Tables.eventTime(e0)))
      .write.partitionBy("day").mode("overwrite").parquet(d)
    d
  }

  test("a literal day predicate prunes to one partition before IO") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.read.parquet(dir)
        .where(col("day") === "2024-01-05")
        .agg(count(lit(1)).as("n"))
      assert(q.collect().head.getLong(0) > 0)
      val scans = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
      val scanStr = scans.head.toString()
      assert(scanStr.contains("PartitionFilters") &&
        scanStr.contains("2024-01-05"),
        s"day predicate did not reach PartitionFilters:\n$scanStr")
      val (files, parts) = (scans.head.metrics("numFiles").value,
        scans.head.metrics("numPartitions").value)
      assert(parts == 1L && files >= 1L,
        s"expected 1 pruned partition, read $parts partitions / $files files")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("dynamic partition pruning fires for a dimension-driven day filter") {
    import spark.implicits._
    val dimDir = java.nio.file.Files
      .createTempDirectory("graft_pp_dim").toString
    Seq((java.sql.Date.valueOf("2024-01-05"), "incident"),
      (java.sql.Date.valueOf("2024-01-09"), "normal"))
      .toDF("day", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("tag") === "incident")
    val q = spark.read.parquet(dir)
      .join(broadcast(dim), Seq("day"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic pruning subquery in:\n$plan")
    assert(q.collect().head.getLong(0) > 0)
  }
}
