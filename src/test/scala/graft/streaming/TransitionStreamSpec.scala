package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables
import graft.operators.Cohorts

/** The constant-state streaming transition extractor must emit exactly
  * the consecutive pairs the batch lag operator computes — including
  * ACROSS micro-batch boundaries, where the carried last-event state
  * does the work the batch window does with full history. The drain is
  * split at the median timestamp so every user's events arrive in
  * event-time order across batches (the module's documented ordering
  * contract), making the equivalence deterministic however the drain
  * is further micro-batched. */
class TransitionStreamSpec extends SparkSpec {

  test("streaming transitions ≡ the batch transition matrix over " +
    "time-split drained batches") {
    val srcDir = Files.createTempDirectory("graft_trans_src").toString
    val ckpt = Files.createTempDirectory("graft_trans_ckpt").toString

    val ev0 = Tables.events(spark, "/root/testdata/sf0.001")
    val ev = ev0.select(col("user_id").cast("long").as("user_id"),
      Tables.tsUs(ev0).as("ts_us"),
      col("event_id").cast("long").as("event_id"),
      col("event_type"))
    // two arrival waves split at the median ts: per-user event-time
    // order holds across the batch boundary BY CONSTRUCTION, so the
    // carried state must stitch the boundary pairs exactly
    val cut = ev.agg(expr("percentile(ts_us, 0.5D)")).head().getDouble(0)
    ev.where(col("ts_us") <= cut)
      .coalesce(1).write.mode("append").parquet(srcDir)
    ev.where(col("ts_us") > cut)
      .coalesce(1).write.mode("append").parquet(srcDir)

    val streamIn = spark.readStream
      .schema("user_id LONG, ts_us LONG, event_id LONG, event_type STRING")
      .parquet(srcDir)
    TransitionStream.transitions(streamIn)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("transitions")
      .start()
      .awaitTermination()
    val streamed = spark.table("transitions")
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    val batch = Cohorts.transitionMatrix(ev, "user_id", "ts_us",
      "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch)
    assert(streamed.values.sum > 0L)
  }
}
