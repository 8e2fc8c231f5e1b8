package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables
import graft.etl.LshIndex
import graft.operators.Dedup

/** The LIVE form of the incremental LSH index — deliberately NOT a
  * wrapper module (the r10 verdict's rule for pure-delegation
  * streaming twins): the production pattern is `readStream →
  * foreachBatch { idx.probeAndRecord }` verbatim, and THIS spec is
  * where that composition is pinned. Batch-split invariance
  * (LshIndexSpec) is what makes it safe: however AvailableNow slices
  * the landed files into micro-batches, the union of emitted
  * candidate pairs is EXACTLY the one-shot banding over everything
  * landed, and a drain with nothing new appends nothing. */
class LshIndexStreamSpec extends SparkSpec {

  test("drained id-ordered landings == one-shot banding; empty drain is a no-op") {
    val srcDir = Files.createTempDirectory("graft_lshs_src").toString
    val outDir = Files.createTempDirectory("graft_lshs_out").toString + "/pairs"
    val ckpt = Files.createTempDirectory("graft_lshs_ckpt").toString
    val storeDir = Files.createTempDirectory("graft_lshs_store").toString + "/store"
    val idx = new LshIndex(spark, storeDir)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))

    def run(): Unit = spark.readStream
      .schema(docs.schema).parquet(srcDir)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        idx.probeAndRecord(batch, "doc_id", "text")
          .write.mode(SaveMode.Append).parquet(outDir)
        ()
      }
      .start().awaitTermination()

    for ((lo, hi) <- Seq((0L, 150L), (150L, 300L), (300L, 10000L))) {
      docs.where(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("append").parquet(srcDir)
      run()
    }

    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.bandSignatures(docs, "doc_id", "text")
    val oneShot = sigs
      .select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("band"),
        col("sig")), Seq("band", "sig"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneShot.nonEmpty, "fixture lost its near-dup candidates")
    assert(streamed == oneShot)

    // nothing new landed → the drain emits nothing
    run()
    assert(spark.read.parquet(outDir).count() == streamed.size)
  }
}
