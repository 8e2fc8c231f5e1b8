package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables
import graft.operators.Cohorts

/** The constant-state streaming funnel must reproduce the batch
  * cascade's depth census — including ACROSS micro-batch boundaries,
  * where the carried per-step completion times do the work the batch
  * does with full history. The drain splits at the median timestamp so
  * per-user event-time order holds across the boundary (the module's
  * documented ordering contract); a chain whose steps straddle the
  * split must be stitched by the carried state. */
class FunnelStreamSpec extends SparkSpec {

  private val steps = Seq("view", "click", "purchase")

  test("streamed completions fold to the batch funnel's depth census " +
    "over time-split drained batches") {
    val srcDir = Files.createTempDirectory("graft_funnel_src").toString
    val ckpt = Files.createTempDirectory("graft_funnel_ckpt").toString

    val ev0 = Tables.events(spark, "/root/testdata/sf0.001")
    val ev = ev0.select(col("user_id").cast("long").as("user_id"),
      Tables.tsUs(ev0).as("ts_us"),
      col("event_id").cast("long").as("event_id"),
      col("event_type"))
    val cut = ev.agg(expr("percentile(ts_us, 0.5D)")).head().getDouble(0)
    ev.where(col("ts_us") <= cut)
      .coalesce(1).write.mode("append").parquet(srcDir)
    ev.where(col("ts_us") > cut)
      .coalesce(1).write.mode("append").parquet(srcDir)

    val streamIn = spark.readStream
      .schema("user_id LONG, ts_us LONG, event_id LONG, event_type STRING")
      .parquet(srcDir)
    FunnelStream.completions(streamIn, steps)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("funnel_completions")
      .start()
      .awaitTermination()
    val comp = spark.table("funnel_completions")

    // at most one completion per (user, step) — the append-only
    // finality contract
    assert(comp.groupBy("user_id", "step_idx").count()
      .where(col("count") > 1).isEmpty)

    // depth census from the emitted completions + the user universe
    val deepest = comp.groupBy("user_id")
      .agg(max(col("step_idx")).as("max_idx"))
    val nUsers = ev.select("user_id").distinct().count()
    val byDepth = deepest.groupBy(col("max_idx")).count().collect()
      .map(r => (r.getInt(0) + 1) -> r.getLong(1)).toMap
    val streamedCensus = (0 to steps.size).map { d =>
      d -> (if (d == 0) nUsers - byDepth.values.sum
            else byDepth.getOrElse(d, 0L))
    }.filter(_._2 > 0).toMap

    val batch = Cohorts.funnel(ev, "user_id", col("ts_us"),
      "event_type", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

    assert(streamedCensus == batch,
      s"streamed $streamedCensus vs batch $batch")
  }
}
