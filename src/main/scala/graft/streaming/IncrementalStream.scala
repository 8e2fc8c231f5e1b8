package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.IncrementalSink

/** Structured-Streaming expression of the reference's incremental batch
  * (SURVEY.md §2.9): the daily cron + insert-if-absent load
  * (etl_pipeline.yml:5-6 + load.py:20-68) is, in Spark terms, a file
  * stream processed with `Trigger.AvailableNow` — each invocation
  * drains whatever files have landed since the last checkpoint, then
  * stops, exactly the scheduled-batch cadence.
  *
  * Dedup design: the only-new-PKs rule runs as the SAME anti-join the
  * batch sink uses, inside `foreachBatch` — NOT as streaming
  * `dropDuplicates` state. A state store keyed by every PK ever seen
  * grows with the full history (unbounded at 100 TB); the sink
  * anti-join recomputes "already loaded" from the sink itself, which is
  * restart-safe, exactly-once-ish per PK, and identical to the batch
  * path's semantics (never update, re-sent rows ignored). The
  * checkpoint tracks file offsets only — constant-size state.
  */
object IncrementalStream {

  /** Drain all unprocessed files under `srcDir` into the sink table,
    * insert-if-absent on `pkCol`; returns the started query (call
    * `awaitTermination()` — AvailableNow stops by itself). Within a
    * micro-batch, duplicate PKs collapse arbitrarily (`dropDuplicates`)
    * — cross-batch, the first-loaded row wins, like the reference. */
  def loadAvailableNow(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      sink: IncrementalSink,
      table: String,
      pkCol: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.appendOnlyNew(batch.dropDuplicates(pkCol), table, pkCol)
        ()
      }
      .start()
}
