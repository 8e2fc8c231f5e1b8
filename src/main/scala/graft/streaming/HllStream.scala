package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Sketch

/** Streaming distinct-count registers — the live twin of
  * [[graft.operators.Sketch.hllDistinct]] (q89), watching per-group
  * cardinality (distinct users, distinct source domains) as events
  * arrive.
  *
  * HLL is THE streamable sketch: its state is ≤ m register rows per
  * group — bounded by construction like [[HistogramStream]]'s
  * counters, never corpus-shaped like the novelty store's vocabulary
  * ([[NoveltyStream]]'s storage argument) — and the register update
  * is a keyed `max`: associative, commutative, IDEMPOTENT. A
  * streaming aggregation holds exactly that state, re-delivered rows
  * can never move a register, and two independently-built register
  * tables merge by the same max — the multi-stream union story at
  * scale.
  *
  * Structured Streaming allows one aggregation per query, so the
  * stream materializes REGISTERS (run with `outputMode("complete")`
  * or `update`); the consumer folds them to estimates with
  * [[graft.operators.Sketch.hllEstimateFromRegisters]] at read time —
  * a ≤ m·|groups|-row batch fold. The register transform is PLAN-ONLY
  * and shared with batch, so both modes bucket identically by
  * construction.
  */
object HllStream {

  /** Cumulative (group, bucket, mj) HLL registers over a (streaming
    * or batch) frame carrying a non-negative BIGINT `hashCol` with
    * `hash < m·2^wBits` — see [[Sketch.hllRegisters]]. */
  def registers(df: DataFrame, groupCol: String, hashCol: String,
      m: Int = 256, wBits: Int = 52): DataFrame =
    Sketch.hllRegisters(df, groupCol, hashCol, m, wBits)
}
