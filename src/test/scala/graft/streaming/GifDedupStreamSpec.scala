package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Multimodal

/** Pins [[GifDedupStream.uniqueGifs]]: frame-sequence-keyed dedup
  * within the watermark horizon — a RE-WRAPPED copy (same frames,
  * different container bytes) collapses, corrupt payloads pass
  * through undeduped with ok = 0, and state evicts past the
  * watermark (the bounded-state trade, as VideoDedupStreamSpec). */
class GifDedupStreamSpec extends SparkSpec {

  private def payload(id: Long): Array[Byte] = {
    val s = spark; import s.implicits._
    Multimodal.encodeGifFixture(Seq(id).toDF("doc_id"), "doc_id")
      .collect()(0).payload
  }

  /** A re-wrap of `p`: the logical-screen descriptor's aspect-ratio
    * byte rewritten — frame pixels untouched, container bytes
    * different. */
  private def rewrap(p: Array[Byte]): Array[Byte] = {
    val out = p.clone()
    out(12) = 49 // pixel aspect ratio: 0 (unset) -> 49
    out
  }

  private def t(s: Long): Long = 1700000000000000L + s * 1000000L

  test("re-wrapped duplicate within the horizon dropped (different " +
    "bytes, same frame sequence); corrupt payloads pass with ok=0; " +
    "eviction past the watermark re-admits") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val p0 = payload(2L) // g=2: an ANIMATED (3-frame) gif
    val p0r = rewrap(p0)
    assert(!java.util.Arrays.equals(p0, p0r), "rewrap must change bytes")
    assert(GifDedupStream.sequenceKey(p0) ==
      GifDedupStream.sequenceKey(p0r),
      "rewrap must preserve the frame-sequence key")
    // id 3: GIF magic zeroed (corrupt family)
    val corrupt = payload(3L)
    assert(GifDedupStream.sequenceKey(corrupt).isEmpty)
    val in = MemoryStream[VideoDedupStream.TimedMedia]
    val q = GifDedupStream.uniqueGifs(in.toDF(), "10 seconds")
      .writeStream.format("memory").queryName("uniqgif")
      .outputMode(OutputMode.Append).start()
    try {
      def rows: Seq[(Long, Long)] = spark.table("uniqgif")
        .select("doc_id", "ok").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      in.addData(
        VideoDedupStream.TimedMedia(1L, t(0), p0),
        VideoDedupStream.TimedMedia(2L, t(1), p0r), // re-wrapped dup
        VideoDedupStream.TimedMedia(3L, t(0), corrupt))
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L)))

      // within the horizon: another copy drops
      in.addData(VideoDedupStream.TimedMedia(4L, t(2), p0r))
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L)))

      // far-future event sweeps the watermark past the old key —
      // state evicted, the same gif re-admits (bounded-state trade;
      // full history lives in GifFpStore)
      in.addData(VideoDedupStream.TimedMedia(5L, t(100), payload(12L)))
      q.processAllAvailable()
      in.addData(VideoDedupStream.TimedMedia(6L, t(101), p0))
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L), (5L, 1L), (6L, 1L)))
    } finally q.stop()
  }

  test("a static and an animated gif sharing frame 0 stay DISTINCT " +
    "keys (n_frames is part of the state key)") {
    val static = payload(12L) // g=0: 1 frame, v=1 tweak on frame 0
    val anim = payload(50L)   // g=2: 3 frames (50%10=0 — intact)
    val ks = GifDedupStream.sequenceKey(static)
    val ka = GifDedupStream.sequenceKey(anim)
    assert(ks.nonEmpty && ka.nonEmpty && ks != ka)
    assert(ks.get._2 == 1L && ka.get._2 == 3L)
  }
}
