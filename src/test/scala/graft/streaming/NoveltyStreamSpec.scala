package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.engine.Tables
import graft.etl.NoveltyStore
import graft.operators.TextAnalysis

/** The streaming novelty twin over the `documents` fixture: three
  * id-ordered file landings drained separately must produce EXACTLY
  * the one-shot noveltyDecay scores over the whole corpus — the
  * store's batch-split invariance surfaced through the stream — and a
  * re-drain with nothing new landed is a no-op.
  */
class NoveltyStreamSpec extends SparkSpec {

  test("drained id-ordered landings == one-shot noveltyDecay; empty drain is a no-op") {
    val srcDir = Files.createTempDirectory("graft_nov_src").toString
    val outDir = Files.createTempDirectory("graft_nov_out").toString + "/scores"
    val checkpoint = Files.createTempDirectory("graft_nov_ckpt").toString
    val storeDir = Files.createTempDirectory("graft_nov_store").toString + "/store"
    val store = new NoveltyStore(spark, storeDir)

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))

    def run(): Unit =
      NoveltyStream.scoreAvailableNow(spark, srcDir, docs.schema, store,
        "doc_id", "text", outDir, checkpoint).awaitTermination()

    // three landings in id order — the arrival pattern a live ingest
    // with monotonic ids produces
    for ((lo, hi) <- Seq((0L, 150L), (150L, 300L), (300L, 10000L))) {
      docs.where(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("append").parquet(srcDir)
      run()
    }

    val streamed = spark.read.parquet(outDir)
      .withColumnRenamed("n_seen", "n_seen_before")
      .orderBy("doc_id").collect().toSeq
    val oneShot = TextAnalysis.noveltyDecay(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(streamed.size == oneShot.size)
    assert(streamed == oneShot)

    // nothing new landed → the drain appends nothing
    run()
    assert(spark.read.parquet(outDir).count() == oneShot.size)
  }
}
