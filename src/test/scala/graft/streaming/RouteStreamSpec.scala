package graft.streaming

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Multimodal

/** Pins [[RouteStream.routed]] + the `stream-route` CLI core: the
  * streamed routing decision is IDENTICAL to the q263 batch sniff on
  * the drained input (zero state, row-local — nothing to drift), the
  * partitioned sink lands every payload under its sniffed modality
  * including the `unknown` quarantine, and a checkpoint restart
  * processes ONLY newly-arrived files. */
class RouteStreamSpec extends SparkSpec {

  test("stream-route: drained tree == batch sniff per row; unknown " +
    "quarantined with agree=false; restart drains only new files") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_route").toString
    val s2 = spark; import s2.implicits._
    def lake(ids: Seq[Long]) = {
      val docs = ids.toDF("doc_id")
      Multimodal.encodeGradientImageFixture(
          docs.where(col("doc_id") % 6 === 0), "doc_id").toDF()
        .unionByName(Multimodal.encodeWaveformFixture(
          docs.where(col("doc_id") % 6 === 1), "doc_id").toDF())
        .unionByName(Multimodal.encodeVideoFixture(
          docs.where(col("doc_id") % 6 === 2), "doc_id").toDF())
        .unionByName(Multimodal.encodeMjpegFixture(
          docs.where(col("doc_id") % 6 === 3), "doc_id").toDF())
        // the r17 families: GIFs route image/gif; ISO-brand payloads
        // (all DECLARED video/mp4) brand-dispatch to audio/mp4,
        // image/heic|heif|avif, or video/mp4 in-stream
        .unionByName(Multimodal.encodeGifFixture(
          docs.where(col("doc_id") % 6 === 4), "doc_id").toDF())
        .unionByName(Multimodal.encodeIsoBrandFixture(
          docs.where(col("doc_id") % 6 === 5), "doc_id").toDF())
        .withColumn("ts_us",
          org.apache.spark.sql.functions.lit(1700000000000000L) +
            col("doc_id") * 1000000L)
    }
    val in = s"$base/in"
    lake(0L until 20L).write.parquet(in)
    val c1 = graft.Main.runStreamRoute(spark, in, s"$base/out", s"$base/ckpt")
    assert(c1.values.sum == 20L)
    // id 3: MJPEG AVI with the RIFF magic zeroed -> unknown quarantine
    assert(c1.getOrElse("unknown", 0L) >= 1L)
    // the streamed decision per row == the batch sniff (q263's column)
    val want = spark.read.parquet(in)
      .select(col("doc_id"), col("mime").as("declared"),
        Multimodal.sniffModality(col("payload")).as("sniffed"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val got = spark.read.parquet(s"$base/out")
      .select(col("doc_id"), col("declared"), col("sniffed"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == want)
    // agree is exactly declared == sniffed; unknown rows never agree
    val agreeBad = spark.read.parquet(s"$base/out")
      .where((col("declared") === col("sniffed")) =!= col("agree"))
      .count()
    assert(agreeBad == 0)
    assert(spark.read.parquet(s"$base/out")
      .where(col("modality") === "unknown" && col("agree")).count() == 0)
    // payloads survive routing byte-for-byte (the sink carries them)
    val okPayloads = spark.read.parquet(s"$base/out")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.sha2(col("payload"), 256)
          .as("h"))
      .join(spark.read.parquet(in).select(col("doc_id"),
        org.apache.spark.sql.functions.sha2(col("payload"), 256)
          .as("h2")), Seq("doc_id"))
      .where(col("h") =!= col("h2")).count()
    assert(okPayloads == 0)
    // restart: append 10 new ids as new files; only they drain
    lake(20L until 30L).write.mode("append").parquet(in)
    val c2 = graft.Main.runStreamRoute(spark, in, s"$base/out", s"$base/ckpt")
    assert(c2.values.sum == 30L, s"cumulative counts after drain 2: $c2")
    assert(spark.read.parquet(s"$base/out").count() == 30L)
    assert(spark.read.parquet(s"$base/out")
      .select(col("doc_id")).distinct().count() == 30L,
      "restart must not re-route already-drained files")
  }
}
