package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables

/** The streaming windowed rollup must produce exactly what the batch
  * plan produces over the same (drained) data — the plan-only property
  * that makes one transform serve both execution modes.
  */
class EventRollupSpec extends SparkSpec {

  test("nanosToTimestamp is exact integer µs (no double-mantissa loss)") {
    // synthesize epoch-nanos longs from the fixture's (encoding-
    // adaptive) µs so the exactness property is pinned regardless of
    // how the parquet stores ts
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val mismatches = e
      .select(Tables.tsUs(e).as("us"))
      .select(
        unix_micros(EventRollup.nanosToTimestamp(col("us") * 1000L))
          .as("via_fn"),
        col("us").as("exact"))
      .where(col("via_fn") =!= col("exact"))
      .count()
    assert(mismatches == 0)
  }

  test("streaming AvailableNow windowed rollup ≡ batch over same events") {
    val srcDir = Files.createTempDirectory("graft_roll_src").toString
    val ckpt = Files.createTempDirectory("graft_roll_ckpt").toString

    val events0 = Tables.events(spark, "/root/testdata/sf0.001")
    val events = events0
      .withColumn("event_time", Tables.eventTime(events0))
    events.coalesce(1).write.mode("append").parquet(srcDir)

    val streamIn = spark.readStream
      .schema(events.schema).parquet(srcDir)
    EventRollup.windowedCounts(streamIn, "event_time", "event_type")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .format("memory").queryName("rollup")
      .start()
      .awaitTermination()

    val streamed = spark.table("rollup")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    val batch = EventRollup.windowedCounts(events, "event_time", "event_type")
      .orderBy("window_start", "event_type")
      .collect().toSeq

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
