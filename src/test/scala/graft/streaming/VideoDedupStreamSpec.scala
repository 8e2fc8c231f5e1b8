package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Multimodal

/** Pins [[VideoDedupStream.uniqueVideos]]: frame-sequence-keyed dedup
  * within the watermark horizon — a REMUXED copy (same frames,
  * different container bytes) collapses, corrupt containers pass
  * through undeduped with ok = 0, and state evicts past the watermark
  * (the bounded-state trade, as MediaDedupStreamSpec). */
class VideoDedupStreamSpec extends SparkSpec {

  private def payload(id: Long): Array[Byte] = {
    val s = spark; import s.implicits._
    Multimodal.encodeMjpegFixture(Seq(id).toDF("doc_id"), "doc_id")
      .collect()(0).payload
  }

  /** A remux of `p`: the avih µs-per-frame field rewritten — frame
    * bytes untouched, container bytes different. */
  private def remux(p: Array[Byte]): Array[Byte] = {
    val out = p.clone()
    out(32) = 0x35.toByte; out(33) = 0x82.toByte // 40000 -> 33333
    out
  }

  private def t(s: Long): Long = 1700000000000000L + s * 1000000L

  test("remuxed duplicate within the horizon dropped (different " +
    "bytes, same frame sequence); corrupt containers pass with ok=0; " +
    "eviction past the watermark re-admits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p0 = payload(0L)
    val p0r = remux(p0)
    assert(!java.util.Arrays.equals(p0, p0r), "remux must change bytes")
    assert(VideoDedupStream.sequenceKey(p0) ==
      VideoDedupStream.sequenceKey(p0r),
      "remux must preserve the frame-sequence key")
    // id 3: RIFF magic zeroed (corrupt container family)
    val corrupt = payload(3L)
    val in = MemoryStream[VideoDedupStream.TimedMedia]
    val q = VideoDedupStream.uniqueVideos(in.toDF(), "10 seconds")
      .writeStream.format("memory").queryName("uniqvid")
      .outputMode(OutputMode.Append).start()
    try {
      def rows: Seq[(Long, Long)] = spark.table("uniqvid")
        .select("doc_id", "ok").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      in.addData(
        VideoDedupStream.TimedMedia(1L, t(0), p0),
        VideoDedupStream.TimedMedia(2L, t(1), p0r), // remuxed dup
        VideoDedupStream.TimedMedia(3L, t(0), corrupt))
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L)))

      // within the horizon: another copy drops
      in.addData(VideoDedupStream.TimedMedia(4L, t(2), p0r))
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L)))

      // far-future event sweeps the watermark past the old key —
      // state evicted, the same video re-admits (bounded-state trade;
      // full history lives in VideoFpStore)
      in.addData(VideoDedupStream.TimedMedia(5L, t(100), payload(14L)))
      q.processAllAvailable()
      in.addData(VideoDedupStream.TimedMedia(6L, t(101), p0))
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L), (5L, 1L), (6L, 1L)))
    } finally q.stop()
  }
}
