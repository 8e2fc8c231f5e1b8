package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Sketch

/** The streaming-twin contract: drained-and-folded sketches equal the
  * batch kmvSketch over everything delivered, across checkpointed
  * drains, and a re-delivered (all-seen) batch emits NOTHING — the
  * no-op the idempotent min-merge buys. */
class KmvStreamSpec extends SparkSpec {

  private val K = 16

  // parquet sink: the memory sink cannot recover a checkpoint, and
  // the accumulating emission log IS the documented file-sink
  // contract `latest` folds
  private def drain(src: String, ckpt: String, out: String): Unit =
    KmvStream.sketch(
      spark.readStream.schema("src STRING, text STRING").parquet(src),
      "src", "text", K)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("parquet")
      .start(out)
      .awaitTermination()

  private def write(src: String, rows: Seq[(String, String)]): Unit = {
    val s = spark; import s.implicits._
    rows.toDF("src", "text").coalesce(1)
      .write.mode("append").parquet(src)
  }

  private val b1 = Seq(
    ("g1", "alpha beta gamma delta epsilon"),
    ("g2", "alpha beta gamma delta epsilon"))
  private val b2 = Seq(
    ("g1", "zeta eta theta iota kappa lambda"),
    ("g2", "upsilon phi chi psi omega alpha"))

  test("drained latest-version fold equals the batch sketch across " +
    "checkpointed drains") {
    val s = spark; import s.implicits._
    val src = Files.createTempDirectory("graft_kmvs_src").toString
    val ckpt = Files.createTempDirectory("graft_kmvs_ck").toString
    val out = Files.createTempDirectory("graft_kmvs_out").toString
    write(src, b1)
    drain(src, ckpt, out)
    write(src, b2)
    drain(src, ckpt, out)
    val emitted = spark.read.parquet(out)
    val live = KmvStream.latest(emitted).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = Sketch
      .kmvSketch((b1 ++ b2).toDF("src", "text"), "src", "text", K)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(live == batch)
    // the second drain really advanced versions (new content arrived)
    assert(emitted.selectExpr("max(version)").collect()
      .head.getLong(0) == 2L)
  }

  test("a re-delivered all-seen batch emits nothing") {
    val src = Files.createTempDirectory("graft_kmvs_src2").toString
    val ckpt = Files.createTempDirectory("graft_kmvs_ck2").toString
    val out = Files.createTempDirectory("graft_kmvs_out2").toString
    write(src, b1)
    drain(src, ckpt, out)
    val afterFirst = spark.read.parquet(out).count()
    write(src, b1) // same rows again — every hash already in state
    drain(src, ckpt, out)
    assert(afterFirst > 0)
    assert(spark.read.parquet(out).count() == afterFirst,
      "an all-seen batch must not re-emit the sketch")
  }
}
