package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables
import graft.operators.Joins

/** The streaming as-of enrichment must equal the batch as-of join over
  * a one-batch drain (exactness inside a micro-batch), carry state
  * across micro-batches, and stay conservative for late probes. */
class AsOfStreamSpec extends SparkSpec {

  test("streaming enrichment ≡ batch Joins.asOf over drained events") {
    val srcP = Files.createTempDirectory("graft_asof_p").toString
    val srcU = Files.createTempDirectory("graft_asof_u").toString
    val ckpt = Files.createTempDirectory("graft_asof_ckpt").toString

    val e0 = Tables.events(spark, "/root/testdata/sf0.001")
    val e = e0
      .select(col("event_id"), col("user_id"), col("event_type"),
        Tables.tsUs(e0).as("ts_us"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("key"),
        col("ts_us"))
    // one update per (key, ts): the batch determinism contract
    val views = e.where(col("event_type") === "view")
      .groupBy(col("user_id").as("key"), col("ts_us"))
      .agg(max(col("event_id")).as("rv"))
    purchases.coalesce(1).write.mode("append").parquet(srcP)
    views.coalesce(1).write.mode("append").parquet(srcU)

    AsOfStream.enriched(
      spark.readStream.schema("pid LONG, key LONG, ts_us LONG").parquet(srcP),
      spark.readStream.schema("key LONG, ts_us LONG, rv LONG").parquet(srcU))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("asof_enriched")
      .start()
      .awaitTermination()
    val streamed = spark.table("asof_enriched")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

    val batch = Joins.asOf(purchases,
      views.withColumn("view_ts_us", col("ts_us"))
        .select(col("key"), col("ts_us"), col("rv"), col("view_ts_us")),
      "key", "ts_us")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

    assert(streamed.nonEmpty &&
      streamed.exists(_._2.isDefined) && streamed.exists(_._2.isEmpty))
    assert(streamed == batch,
      s"onlyStreamed=${(streamed -- batch).take(4)} " +
        s"onlyBatch=${(batch -- streamed).take(4)}")
  }

  test("state carries across micro-batches; late probes stay unmatched") {
    val srcP = Files.createTempDirectory("graft_asof_p2").toString
    val srcU = Files.createTempDirectory("graft_asof_u2").toString
    val ckpt = Files.createTempDirectory("graft_asof_ckpt2").toString
    import spark.implicits._
    def writeP(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("pid", "key", "ts_us").coalesce(1)
        .write.mode("append").parquet(srcP)
    def writeU(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("key", "ts_us", "rv").coalesce(1)
        .write.mode("append").parquet(srcU)

    // batch 1: update only (key 1 @ t=100 -> rv 7)
    writeU(Seq((1L, 100L, 7L)))
    writeP(Seq((99L, 2L, 10L))) // key 2: no updates ever
    Thread.sleep(1100) // distinct mtimes → deterministic batch order
    // batch 2: probe after the state (matched from carried state),
    // probe BEFORE the state's version (late → conservatively unmatched)
    writeP(Seq((1L, 1L, 200L), (2L, 1L, 50L)))

    AsOfStream.enriched(
      spark.readStream.schema("pid LONG, key LONG, ts_us LONG")
        .option("maxFilesPerTrigger", 1).parquet(srcP),
      spark.readStream.schema("key LONG, ts_us LONG, rv LONG")
        .option("maxFilesPerTrigger", 1).parquet(srcU))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("asof_xbatch")
      .start()
      .awaitTermination()
    val got = spark.table("asof_xbatch")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got == Map(
      99L -> ((None, None)),          // keyless-in-updates probe
      1L -> ((Some(100L), Some(7L))), // matched from carried state
      2L -> ((None, None))))          // late probe: never a too-new match
  }
}
