package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the streaming twin of
  * [[graft.operators.Dedup.exact]] (SURVEY.md §2.9 + §2.11): drop
  * re-arrivals of byte-identical documents as they stream in, keyed by
  * content hash.
  *
  * State discipline (the same argument IncrementalStream makes for
  * PKs, inverted): plain streaming `dropDuplicates` on a content key
  * holds every hash EVER seen — unbounded state at corpus scale.
  * `dropDuplicatesWithinWatermark` bounds the state to the watermark
  * horizon: a duplicate arriving within `delay` of the original is
  * dropped, and the hash's state is evicted once the watermark passes
  * it. That is exactly the right tool for the duplicate bursts
  * streaming ingestion actually produces (crawler re-fetches, retry
  * storms, at-least-once upstreams — seconds-to-hours apart), while
  * FULL-history dedup stays where unbounded lookups belong: the batch
  * [[graft.operators.Dedup.exact]] pass or the sink's anti-join, which
  * read the stored corpus instead of holding it in a state store.
  * A duplicate arriving after eviction passes through — by design, and
  * DedupStreamSpec pins both sides of that contract.
  */
object DedupStream {

  /** First arrival per content hash within the watermark horizon.
    * `docs` must be a STREAMING frame with event-time column `tsCol`;
    * output carries the input columns plus `content_hash`. */
  def uniqueDocs(docs: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    docs
      .withColumn("content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
}
