package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables

/** The custom-state streaming sessionizer must produce exactly the
  * sessions q34's batch lag+running-sum idiom computes over the same
  * drained events. Per-user sentinel events far past the last real
  * event close every real session through the DATA path, so the
  * assertion is deterministic regardless of how the drain is
  * micro-batched (the timeout path is exercised separately only for
  * state cleanup, not required for emission here).
  */
class SessionizeStreamSpec extends SparkSpec {

  private val gapUs = 30L * 60 * 1000 * 1000

  test("streaming sessions ≡ batch sessionization over drained events") {
    val srcDir = Files.createTempDirectory("graft_sess_src").toString
    val ckpt = Files.createTempDirectory("graft_sess_ckpt").toString

    val ev0 = Tables.events(spark, "/root/testdata/sf0.001")
    val ev = ev0
      .select(col("user_id").cast("long").as("user_id"),
        Tables.tsUs(ev0).as("ts_us"))
    ev.coalesce(1).write.mode("append").parquet(srcDir)
    // sentinels: one event per user at a SINGLE flush instant 10 gaps
    // past the globally last real event — closes every user's final
    // session on the data path. The instant must be uniform: per-user
    // sentinel times would let the watermark (driven by the latest
    // sentinel) fire the TIMEOUT path for earlier users' sentinel
    // sessions and emit them too
    val flushTs = ev.agg(max("ts_us")).head().getLong(0) + 10L * gapUs
    ev.select("user_id").distinct()
      .withColumn("ts_us", lit(flushTs))
      .coalesce(1).write.mode("append").parquet(srcDir)

    val streamIn = spark.readStream
      .schema("user_id LONG, ts_us LONG").parquet(srcDir)
    SessionizeStream.sessions(streamIn, gapUs)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("sessions")
      .start()
      .awaitTermination()
    val streamed = spark.table("sessions")
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    // batch oracle: q34's lag + running-sum sessionization (real events
    // only — sentinels exist to flush the stream, not to be sessions)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val batch = ev
      .withColumn("new_sess",
        when(lag(col("ts_us"), 1).over(byUser).isNull
          || col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    assert(streamed.nonEmpty)
    val onlyS = streamed -- batch
    val onlyB = batch -- streamed
    assert(streamed == batch,
      s"onlyStreamed(${onlyS.size})=${onlyS.toSeq.sortBy(_._2).take(4)} " +
        s"onlyBatch(${onlyB.size})=${onlyB.toSeq.sortBy(_._2).take(4)}")
  }

  test("watermark timeout closes a silent user's session without new data") {
    val srcDir = Files.createTempDirectory("graft_sess_to_src").toString
    val ckpt = Files.createTempDirectory("graft_sess_to_ckpt").toString
    val t0 = 1700000000000000L // µs
    def write(rows: Seq[(Long, Long)]): Unit = {
      import spark.implicits._
      rows.toDF("user_id", "ts_us").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    // batch 1: user 1 has a 2-event session; user 2 a 1-event session
    write(Seq((1L, t0), (1L, t0 + 60L * 1000 * 1000), (2L, t0)))
    Thread.sleep(1100) // distinct mtimes → deterministic file order
    // batch 2: only user 1 speaks again, far past the gap — user 2's
    // session can only close via the EVENT-TIME TIMEOUT as the
    // watermark sweeps past its end + gap
    write(Seq((1L, t0 + 100L * gapUs)))

    val streamIn = spark.readStream
      .schema("user_id LONG, ts_us LONG")
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    SessionizeStream.sessions(streamIn, gapUs)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("sessions_to")
      .start()
      .awaitTermination()
    val got = spark.table("sessions_to")
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // user 1's first session closed by its own later event (data path);
    // user 2's by timeout; user 1's final session is still open → absent
    assert(got == Set(
      (1L, t0, t0 + 60L * 1000 * 1000, 2L),
      (2L, t0, t0, 1L)))
  }
}
