package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables
import graft.operators.Joins

/** The streaming attribution join must equal the batch interval join
  * over a one-batch drain and match pairs across micro-batches. */
class AttributionStreamSpec extends SparkSpec {

  test("streaming attribution ≡ batch intervalJoin over drained events") {
    val windowUs = 14_400_000_000L // 4 h: the fixture's click cadence
    val srcI = Files.createTempDirectory("graft_attr_i").toString
    val srcC = Files.createTempDirectory("graft_attr_c").toString
    val ckpt = Files.createTempDirectory("graft_attr_ckpt").toString

    val e0 = Tables.events(spark, "/root/testdata/sf0.001")
    val e = e0
      .select(col("event_id"), col("user_id"), col("event_type"),
        Tables.tsUs(e0).as("ts_us"))
    val imps = e.where(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts_us").as("imp_ts_us"))
    val clks = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts_us").as("click_ts_us"))
    imps.coalesce(1).write.mode("append").parquet(srcI)
    clks.coalesce(1).write.mode("append").parquet(srcC)

    AttributionStream.attributed(
      spark.readStream.schema("imp_id LONG, imp_user LONG, imp_ts_us LONG")
        .parquet(srcI),
      spark.readStream
        .schema("click_id LONG, click_user LONG, click_ts_us LONG")
        .parquet(srcC),
      windowUs)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("attributed")
      .start()
      .awaitTermination()
    val streamed = spark.table("attributed")
      .select("imp_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = Joins.intervalJoin(
      imps.withColumn("win_end_us", col("imp_ts_us") + lit(windowUs)),
      "imp_ts_us", "win_end_us",
      clks.where(col("click_user").isNotNull), "click_ts_us",
      bucketWidth = 3_600_000_000L)
      .where(col("imp_user") === col("click_user"))
      .select("imp_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed.nonEmpty, "fixture produced no attributed pairs")
    assert(streamed == batch,
      s"onlyStreamed=${(streamed -- batch).take(4)} " +
        s"onlyBatch=${(batch -- streamed).take(4)}")
  }

  test("pairs match across micro-batches within the delay horizon") {
    val windowUs = 2_000_000L
    val srcI = Files.createTempDirectory("graft_attr_i2").toString
    val srcC = Files.createTempDirectory("graft_attr_c2").toString
    val ckpt = Files.createTempDirectory("graft_attr_ckpt2").toString
    import spark.implicits._

    // batch 1: impression only; batch 2: its click, inside the window
    Seq((10L, 1L, 1_000_000L)).toDF("imp_id", "imp_user", "imp_ts_us")
      .coalesce(1).write.mode("append").parquet(srcI)
    Seq((90L, 9L, 1L)).toDF("click_id", "click_user", "click_ts_us")
      .coalesce(1).write.mode("append").parquet(srcC) // no-match seed
    Thread.sleep(1100) // distinct mtimes → deterministic batch order
    Seq((20L, 1L, 1_500_000L)).toDF("click_id", "click_user",
      "click_ts_us").coalesce(1).write.mode("append").parquet(srcC)

    def drain(): Unit =
      AttributionStream.attributed(
        spark.readStream.schema("imp_id LONG, imp_user LONG, imp_ts_us LONG")
          .parquet(srcI),
        spark.readStream
          .schema("click_id LONG, click_user LONG, click_ts_us LONG")
          .parquet(srcC),
        windowUs)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .option("maxFilesPerTrigger", "1")
        .outputMode("append")
        .format("memory").queryName("attributed2")
        .start()
        .awaitTermination()

    drain()
    val pairs = spark.table("attributed2")
      .select("imp_id", "click_id", "delay_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((10L, 20L, 500_000L)),
      s"got $pairs")
  }

  test("sub-millisecond delay reaches the watermark untruncated") {
    import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Long)].toDF()
      .toDF("imp_id", "imp_user", "imp_ts_us")
    val clks = MemoryStream[(Long, Long, Long)].toDF()
      .toDF("click_id", "click_user", "click_ts_us")
    val plan = AttributionStream
      .attributed(imps, clks, windowUs = 10L, delayUs = 500L)
      .queryExecution.analyzed
    val delays = plan.collect {
      case w: EventTimeWatermark => w.delay.microseconds }
    assert(delays.size == 2 && delays.forall(_ == 500L),
      delays.toString + "\n" + plan.treeString)
    intercept[IllegalArgumentException] {
      AttributionStream.attributed(imps, clks, windowUs = 10L,
        delayUs = -1L)
    }
  }
}
