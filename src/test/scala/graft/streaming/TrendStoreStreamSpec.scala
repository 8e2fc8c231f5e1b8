package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables
import graft.etl.TrendStore
import graft.operators.Trend

/** The LIVE form of the mergeable trend store — the LshIndexStream
  * rule: no wrapper module, the production pattern is `readStream →
  * foreachBatch { store.ingest }` verbatim, pinned here. The exact
  * SUM-merge (SketchStoreSpec) is what makes it safe: however
  * AvailableNow slices the landed events — even splitting one day's
  * mass across micro-batches — the read-time fit equals the one-shot
  * OLS over everything landed, bit for bit. */
class TrendStoreStreamSpec extends SparkSpec {

  test("drained landings fit EXACTLY the one-shot slopes, day splits " +
    "and all; an empty drain changes nothing") {
    val srcDir = Files.createTempDirectory("graft_trs_src").toString
    val ckpt = Files.createTempDirectory("graft_trs_ckpt").toString
    val storeDir = Files.createTempDirectory("graft_trs_store")
      .toString + "/store"
    val store = new TrendStore(spark, storeDir)
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("ts").cast("date").as("day"))

    def run(): Unit = spark.readStream
      .schema(events.schema).parquet(srcDir)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.ingest(batch, "event_type", "day")
        ()
      }
      .start().awaitTermination()

    // three landings whose cut (mid-January) splits days across
    // batches — the non-additive-five-sums hazard the (key, day)
    // grain is built for
    for ((lo, hi) <- Seq(("2024-01-01", "2024-01-11"),
        ("2024-01-11", "2024-01-21"), ("2024-01-21", "2024-03-01"))) {
      events.where(col("day") >= lo && col("day") < hi)
        .coalesce(1).write.mode("append").parquet(srcDir)
      run()
    }

    def fit(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    val oneShot = fit(Trend.olsTrend(events, col("event_type"),
      col("day")))
    assert(oneShot.nonEmpty && oneShot.values.exists(_._2.isDefined))
    assert(fit(store.slopes) == oneShot)

    val rowsBefore = spark.read.parquet(storeDir).count()
    run() // nothing new landed
    assert(spark.read.parquet(storeDir).count() == rowsBefore)
    assert(fit(store.slopes) == oneShot)

    // the q215 decay-at-read fold over the same landings: however the
    // drains sliced the days, the dyadic fixed point over SUMmed
    // counts equals the one-shot half-life analytic bit for bit
    def decayMap(df: DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val oneShotDecay = decayMap(Trend.halfLifeCounts(events,
      col("event_type"), col("day")))
    assert(oneShotDecay.nonEmpty &&
      oneShotDecay.values.exists(_._2 > 0.0))
    assert(decayMap(store.decayed()) == oneShotDecay)
  }
}
