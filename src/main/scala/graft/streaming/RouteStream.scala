package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Streaming MODALITY ROUTER — the q263 router as a stream stage
  * (18th stream twin): as binary payloads arrive from a crawler or
  * object-store feed, sniff each one's container from MAGIC BYTES
  * ([[Multimodal.sniffModality]] — declared mimes lie) and emit the
  * routing decision + lake-health columns, so a `partitionBy(modality)`
  * file sink lands every payload in its modality's directory — the
  * stream-side front door of [[graft.etl.MediaPipeline]]'s routed
  * tree, exactly as [[CurateStream]] fronts the text funnel.
  *
  * State discipline: ZERO state — the sniff is a row-local pure byte
  * comparison (the same codegen-friendly Column expression the batch
  * router runs), so the stream needs no watermark, no store, and is
  * trivially exactly-once under a file sink's transactional commit.
  * Unroutable payloads (`modality = unknown`) are NOT dropped: they
  * land in their own partition with `agree = false` — the stream-side
  * quarantine a health monitor reads, matching the batch funnel's
  * unroutable accounting. Dedup of the routed stream belongs to
  * [[MediaDedupStream]]; full-history state to the stores. */
object RouteStream {

  /** Route a (streaming or batch) media frame: doc_id, ts_us, mime,
    * payload → + (ts, declared, sniffed, modality, agree), payload
    * carried through for the per-modality sink. Pure row-local
    * projection — safe under any output mode, no watermark needed. */
  def routed(media: DataFrame): DataFrame =
    media
      .select(col("doc_id").cast("long").as("doc_id"),
        timestamp_micros(col("ts_us").cast("long")).as("ts"),
        col("mime").as("declared"), col("payload"))
      .withColumn("sniffed", Multimodal.sniffModality(col("payload")))
      .withColumn("modality", split(col("sniffed"), "/").getItem(0))
      .withColumn("agree", col("declared") === col("sniffed"))
}
