package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.NoveltyStore

/** Streaming corpus-novelty scoring — the streaming twin of
  * [[graft.etl.NoveltyStore]] (q70), completing the batch/stream
  * pairing the rest of the surface maintains (SURVEY §2.9 discipline
  * applied to curation): documents land as files, each drain scores
  * the new arrivals against every shingle seen by all prior batches,
  * then records this batch's new shingles.
  *
  * State design — why `foreachBatch` + the persisted store, NOT
  * `flatMapGroupsWithState` over shingle-hash state: the seen set is
  * the corpus's distinct shingle VOCABULARY — it only ever grows, so a
  * streaming state store holding it is unbounded state (the exact
  * argument [[IncrementalStream]] makes for PK dedup, and
  * [[DedupStream]] dodges with a watermark horizon — but novelty has
  * no horizon: a shingle first seen a year ago still makes today's
  * copy non-novel). The parquet store keeps the vocabulary where
  * unbounded lookups belong — in storage, hash-partitioned — and the
  * per-batch score is the same equi-join + left_anti append the batch
  * twin runs, so drained-stream scores are IDENTICAL to the one-shot
  * batch scores on id-ordered arrivals (NoveltyStore's batch-split
  * invariance, pinned by NoveltyStreamSpec against
  * [[graft.operators.TextAnalysis.noveltyDecay]]). The checkpoint
  * tracks file offsets only — constant-size streaming state.
  *
  * Failure honesty (inherited from the store, not hidden by the
  * stream): a drain that dies between the store's job commit and the
  * output write will, on retry, score that batch's shingles as
  * already-seen (the store's documented re-ingest detector); a drain
  * that dies MID-append leaves no `_SUCCESS` and the next drain fails
  * loudly rather than scoring against partial state. */
object NoveltyStream {

  /** Drain all unprocessed files under `srcDir`, score each micro-batch
    * through `store`, append scores to `outDir`; returns the started
    * query (call `awaitTermination()` — AvailableNow stops by itself).
    * Output rows: (doc_id, n_shingles, n_seen, seen_fp), one per
    * scored doc with >= 3 tokens, like the batch twin. */
  def scoreAvailableNow(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      store: NoveltyStore,
      idCol: String,
      textCol: String,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.scoreAndRecord(batch, idCol, textCol)
          .write.mode(SaveMode.Append).parquet(outDir)
        ()
      }
      .start()
}
