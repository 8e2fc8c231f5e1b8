package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.engine.Tables
import graft.etl.IncrementalSink

/** The streaming incremental load over the `events` fixture: each
  * AvailableNow invocation drains newly-landed files; overlapping
  * re-sends are dropped by the sink anti-join (SURVEY §2.9 semantics:
  * insert-if-absent, never update, idempotent re-runs).
  */
class IncrementalStreamSpec extends SparkSpec {

  test("AvailableNow drains new files; overlapping PKs are not re-inserted") {
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val checkpoint = Files.createTempDirectory("graft_stream_ckpt").toString
    val warehouse = Files.createTempDirectory("graft_stream_wh").toString
    val sink = new IncrementalSink(spark, warehouse)

    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val schema = events.schema

    def run(): Unit =
      IncrementalStream.loadAvailableNow(spark, srcDir, schema, sink,
        "events", "event_id", checkpoint).awaitTermination()

    // day 1: events 0-99 land as one file
    events.where(col("event_id") < 100)
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(sink.read("events").count() == 100)

    // day 2: a second file lands with a 50-row overlap (re-sent rows)
    events.where(col("event_id") >= 50 && col("event_id") < 150)
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val loaded = sink.read("events")
    assert(loaded.count() == 150) // 50 re-sent PKs ignored, 50 new inserted
    assert(loaded.select("event_id").distinct().count() == 150)

    // day 3: nothing new landed → the drain is a no-op
    run()
    assert(sink.read("events").count() == 150)
  }
}
