package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Streaming VIDEO dedup — [[MediaDedupStream]]'s sequence sibling
  * (19th stream twin): drop re-arrivals of perceptually-identical
  * MJPEG videos as they stream in, keyed by an order-sensitive 64-bit
  * fold of the per-frame dHashes. A REMUXED copy — same frames,
  * different container metadata (header fields, index layout), the
  * video analogue of an image re-encode — collapses onto the original,
  * which byte identity can never see.
  *
  * State discipline — [[DedupStream]]'s argument verbatim:
  * `dropDuplicatesWithinWatermark` bounds the state to the watermark
  * horizon (16 bytes per distinct sequence seen within `delay` — the
  * fold plus the frame count, so a fold collision between
  * different-length videos cannot merge them), the
  * right tool for re-fetch/retry bursts; FULL-history dedup belongs to
  * the stored frame fingerprints ([[graft.etl.VideoFpStore]] — the
  * `videofp-ingest` CLI pairs with this stream exactly as DhashStore
  * pairs with MediaDedupStream). NEAR-dup sequence matching (Hamming
  * tolerance, prefix-chaining across frame counts) deliberately stays
  * batch: the aligned verify needs per-position candidate lists the
  * state store cannot bound — q278/q279 read the store instead.
  *
  * The walk + frame decode runs row-locally in the stream
  * (mapPartitions, the batch decoder unchanged). Corrupt CONTAINERS
  * pass through undeduped with `ok = 0` (no sequence to key by;
  * dropping them would hide ingest faults). A corrupt FRAME inside a
  * decodable container folds a position-salted sentinel into the key,
  * so two copies corrupt at the same position still collapse while a
  * clean copy stays distinct. */
object VideoDedupStream {

  /** One streamed media row with event time (micros since epoch). */
  final case class TimedMedia(doc_id: Long, ts_us: Long,
      payload: Array[Byte])

  final case class SequencedMedia(doc_id: Long, ts_us: Long, ok: Long,
      seq_fp: Option[Long], n_frames: Long)

  implicit val timedMediaEnc: Encoder[TimedMedia] =
    Encoders.product[TimedMedia]
  implicit val sequencedMediaEnc: Encoder[SequencedMedia] =
    Encoders.product[SequencedMedia]

  /** The order-sensitive FNV-style fold of a video's frame dHashes —
    * a pure function of the frame CONTENT stream (container metadata
    * never enters). Exposed for the spec's batch twin. */
  def sequenceKey(payload: Array[Byte]): Option[(Long, Long)] =
    Multimodal.aviFrameRanges(payload).map { ranges =>
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < ranges.size) {
        val (o, s) = ranges(i)
        val frame = java.util.Arrays.copyOfRange(
          payload, o.toInt, (o + s).toInt)
        val fp = Multimodal.dhash64(frame)
          .getOrElse(0x9e3779b97f4a7c15L ^ i.toLong)
        h = (h ^ fp) * 0x100000001b3L + i
        i += 1
      }
      (h, ranges.size.toLong)
    }

  /** First arrival per frame-sequence key within the watermark
    * horizon. `media` must be a STREAMING frame with (doc_id, ts_us,
    * payload); output (doc_id, ts, ok, seq_fp, n_frames) keeps
    * corrupt containers (ok = 0) undeduped. */
  def uniqueVideos(media: DataFrame, delay: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val keyed = media
      .select(col("doc_id").cast("long").as("doc_id"),
        col("ts_us").cast("long").as("ts_us"), col("payload"))
      .as[TimedMedia]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          sequenceKey(r.payload) match {
            case Some((h, n)) =>
              SequencedMedia(r.doc_id, r.ts_us, 1L, Some(h), n)
            case None =>
              SequencedMedia(r.doc_id, r.ts_us, 0L, None, 0L)
          }
        }
      }
      .toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delay)
    // key = (fold, frame count): the 64-bit fold alone would silently
    // merge two distinct videos colliding on it within the horizon —
    // n_frames (already computed, 8 bytes more state per key) cuts the
    // collision surface to same-length sequences
    val okRows = keyed.where(col("ok") === 1L)
      .dropDuplicatesWithinWatermark("seq_fp", "n_frames")
    okRows.unionByName(keyed.where(col("ok") === 0L))
      .select(col("doc_id"), col("ts"), col("ok"), col("seq_fp"),
        col("n_frames"))
  }
}
