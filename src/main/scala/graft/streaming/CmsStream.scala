package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Sketch

/** Streaming count-min sketch — the live twin of
  * [[graft.operators.Sketch.cmBuild]] (q80), maintaining the d×w
  * counter grid as occurrences arrive (the heavy-hitter monitor over
  * a token/URL/key stream).
  *
  * Like [[HistogramStream]]'s counters and [[HllStream]]'s registers,
  * the sketch's state is BOUNDED BY CONSTRUCTION: depth·width counter
  * rows, independent of throughput or vocabulary — exactly what a
  * streaming aggregation holds. CMS merges by SUM (each counter is a
  * plain count), so accumulation across drains is the idempotent-free
  * cousin of HLL's max-merge: re-delivered files DO re-count (exactly
  *-once file tracking is the checkpoint's job, and Structured
  * Streaming's file source provides it), which is why the spec pins
  * accumulation across checkpointed drains rather than replay
  * immunity. The bucket transform is PLAN-ONLY and shared with batch,
  * so both modes bucket identically by construction; estimates read
  * the materialized grid with the batch-side
  * [[graft.operators.Sketch.cmEstimate]].
  */
object CmsStream {

  /** Cumulative (r, b, cnt) counter grid over a (streaming or batch)
    * occurrence frame carrying `hashCol` — run with
    * `outputMode("complete")` or `update`. Width metadata is stamped
    * like the batch build so mismatched-width probes fail fast. */
  def counterGrid(hashes: DataFrame, hashCol: String,
      width: Int = 1024): DataFrame =
    Sketch.cmBuild(hashes, hashCol, width)
}
