package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Streaming IMAGE dedup — the multimodal twin of [[DedupStream]]
  * (17th stream twin): drop re-arrivals of perceptually-identical
  * images as they stream in, keyed by the 64-bit dHash
  * ([[Multimodal.dhash64]] — so re-ENCODED copies of one image
  * collapse, not just byte-identical ones; the exact-fp rung of the
  * q255 family).
  *
  * State discipline — [[DedupStream]]'s argument verbatim:
  * `dropDuplicatesWithinWatermark` bounds the state to the watermark
  * horizon (8 bytes per distinct hash seen within `delay`), which is
  * the right tool for the re-fetch/retry bursts streaming media
  * ingestion actually produces; FULL-history dedup belongs to the
  * stored fingerprints ([[graft.etl.DhashStore]] — the ingest CLI
  * pairs with this stream exactly as the LSH store pairs with the
  * text stream). NEAR-dup (Hamming > 0) deliberately stays batch:
  * dropping on a chunk-bucket match without the verify step would
  * over-drop, and verifying in-stream needs the per-bucket candidate
  * lists the state store cannot bound — q255/q261 read the store
  * instead.
  *
  * The decode runs row-locally in the stream (mapPartitions, the
  * batch decoder unchanged); corrupt payloads pass through UNDEDUPED
  * with `ok = 0` (they carry no hash to key by, and silently dropping
  * them would hide ingest faults from the health accounting). */
object MediaDedupStream {

  /** One streamed media row with event time (micros since epoch). */
  final case class TimedMedia(doc_id: Long, ts_us: Long,
      payload: Array[Byte])

  final case class HashedMedia(doc_id: Long, ts_us: Long, ok: Long,
      fp: Option[Long])

  implicit val timedMediaEnc: Encoder[TimedMedia] =
    Encoders.product[TimedMedia]
  implicit val hashedMediaEnc: Encoder[HashedMedia] =
    Encoders.product[HashedMedia]

  /** First arrival per dHash within the watermark horizon. `media`
    * must be a STREAMING frame with (doc_id, ts_us, payload); output
    * (doc_id, ts, ok, fp) keeps corrupt rows (ok = 0) undeduped. */
  def uniqueImages(media: DataFrame, delay: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media
      .select(col("doc_id").cast("long").as("doc_id"),
        col("ts_us").cast("long").as("ts_us"), col("payload"))
      .as[TimedMedia]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val fp = Multimodal.dhash64(r.payload)
          HashedMedia(r.doc_id, r.ts_us, if (fp.isDefined) 1L else 0L, fp)
        }
      }
      .toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delay)
    val okRows = hashed.where(col("ok") === 1L)
      .dropDuplicatesWithinWatermark("fp")
    okRows.unionByName(hashed.where(col("ok") === 0L))
      .select(col("doc_id"), col("ts"), col("ok"), col("fp"))
  }
}
