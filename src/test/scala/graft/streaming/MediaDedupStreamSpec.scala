package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Multimodal

/** Pins [[MediaDedupStream.uniqueImages]]: perceptual (dHash-keyed)
  * dedup within the watermark horizon — re-ENCODED copies of one
  * image collapse, corrupt payloads pass through undeduped with
  * ok = 0, and state evicts past the watermark (the bounded-state
  * trade, as DedupStreamSpec). */
class MediaDedupStreamSpec extends SparkSpec {

  // fixture payloads by id: same id % 25 and same (id/25) % 2 ⇒ the
  // SAME dHash even when encoded bytes differ (block sizes vary with
  // id % 3 / id % 2 — a true perceptual collapse, not a byte match)
  private def payload(id: Long): Array[Byte] = {
    val s = spark; import s.implicits._
    Multimodal.encodeGradientImageFixture(Seq(id).toDF("doc_id"),
      "doc_id").collect()(0).payload
  }

  private def t(s: Long): Long = 1700000000000000L + s * 1000000L

  test("perceptual duplicate within the horizon dropped (different " +
    "bytes, same dHash); corrupt rows pass with ok=0; eviction past " +
    "the watermark re-admits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // ids 2 and 52: 2 % 25 == 52 % 25 == 2, (2/25)%2 == (52/25)%2 == 0,
    // but block sizes differ (2%3=2 vs 52%3=1) — different PNG bytes,
    // identical dHash. id 13: corrupt family (3 mod 10).
    val p2 = payload(2L)
    val p52 = payload(52L)
    assert(!java.util.Arrays.equals(p2, p52), "fixture bytes must differ")
    assert(Multimodal.dhash64(p2) == Multimodal.dhash64(p52))
    val in = MemoryStream[MediaDedupStream.TimedMedia]
    val q = MediaDedupStream.uniqueImages(in.toDF(), "10 seconds")
      .writeStream.format("memory").queryName("uniqimg")
      .outputMode(OutputMode.Append).start()
    try {
      def rows: Seq[(Long, Long)] = spark.table("uniqimg")
        .select("doc_id", "ok").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      in.addData(
        MediaDedupStream.TimedMedia(1L, t(0), p2),
        MediaDedupStream.TimedMedia(2L, t(1), p52), // perceptual dup
        MediaDedupStream.TimedMedia(3L, t(0), payload(13L))) // corrupt
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L)))

      // within the horizon: another copy drops
      in.addData(MediaDedupStream.TimedMedia(4L, t(2), p2))
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L)))

      // far-future event sweeps the watermark past the old hash —
      // state evicted, the same image re-admits (bounded-state trade;
      // full history lives in DhashStore)
      in.addData(MediaDedupStream.TimedMedia(5L, t(100), payload(7L)))
      q.processAllAvailable()
      in.addData(MediaDedupStream.TimedMedia(6L, t(101), p52))
      q.processAllAvailable()
      assert(rows == Seq((1L, 1L), (3L, 0L), (5L, 1L), (6L, 1L)))
    } finally q.stop()
  }
}
