package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Streaming GIF dedup — [[VideoDedupStream]]'s sibling on the second
  * multi-frame coding (20th stream twin): drop re-arrivals of
  * perceptually-identical GIFs as they stream in, keyed by an
  * order-sensitive 64-bit fold of the per-frame dHashes. A RE-WRAPPED
  * copy — same frames, different container metadata (screen
  * descriptor fields, extension blocks) — collapses onto the
  * original, which byte identity can never see; static GIFs
  * degenerate to single-image dHash identity.
  *
  * State discipline — [[VideoDedupStream]]'s argument verbatim:
  * `dropDuplicatesWithinWatermark` on (fold, frame count) bounds the
  * state to 16 bytes per distinct sequence within `delay`; FULL
  * -history dedup belongs to [[graft.etl.GifFpStore]] (the
  * `gif-ingest` CLI pairs with this stream exactly as VideoFpStore
  * pairs with VideoDedupStream); NEAR-dup sequence matching stays
  * batch (q285 reads the store). Corrupt payloads pass through
  * undeduped with `ok = 0`; a frame below the dHash grid folds a
  * position-salted sentinel, so two copies degraded at the same
  * position still collapse. */
object GifDedupStream {

  /** The order-sensitive FNV-style fold of a GIF's frame dHashes — a
    * pure function of the frame CONTENT stream (container metadata
    * never enters). Exposed for the spec's batch twin. */
  def sequenceKey(payload: Array[Byte]): Option[(Long, Long)] =
    Multimodal.gifFrames(payload).map { frames =>
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < frames.size) {
        val fp = Multimodal.dhashImage(frames(i))
          .getOrElse(0x9e3779b97f4a7c15L ^ i.toLong)
        h = (h ^ fp) * 0x100000001b3L + i
        i += 1
      }
      (h, frames.size.toLong)
    }

  /** First arrival per frame-sequence key within the watermark
    * horizon. `media` must be a STREAMING frame with (doc_id, ts_us,
    * payload); output (doc_id, ts, ok, seq_fp, n_frames) keeps
    * corrupt payloads (ok = 0) undeduped. */
  def uniqueGifs(media: DataFrame, delay: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val keyed = media
      .select(col("doc_id").cast("long").as("doc_id"),
        col("ts_us").cast("long").as("ts_us"), col("payload"))
      .as[VideoDedupStream.TimedMedia](
        VideoDedupStream.timedMediaEnc)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          sequenceKey(r.payload) match {
            case Some((h, n)) =>
              VideoDedupStream.SequencedMedia(r.doc_id, r.ts_us, 1L,
                Some(h), n)
            case None =>
              VideoDedupStream.SequencedMedia(r.doc_id, r.ts_us, 0L,
                None, 0L)
          }
        }
      }(VideoDedupStream.sequencedMediaEnc)
      .toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delay)
    val okRows = keyed.where(col("ok") === 1L)
      .dropDuplicatesWithinWatermark("seq_fp", "n_frames")
    okRows.unionByName(keyed.where(col("ok") === 0L))
      .select(col("doc_id"), col("ts"), col("ok"), col("seq_fp"),
        col("n_frames"))
  }
}
