package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Streaming value histograms — the live twin of
  * [[graft.operators.Profiling.histogram]] (q74), watching a column's
  * distribution drift as data arrives (the ingest-monitor view: a
  * price column whose bucket mass shifts overnight is the histogram
  * form of the q69 drift alarm).
  *
  * Unlike the novelty store (whose seen-set grows with the corpus and
  * therefore lives in storage — [[NoveltyStream]]'s argument), a
  * histogram's state is BOUNDED BY CONSTRUCTION: |columns|·|buckets|
  * counter rows, independent of how many events flow through. That is
  * exactly the state a Structured Streaming aggregation is built to
  * hold, so this twin is the idiomatic readStream → groupBy → count
  * shape with no watermark needed (the counters are cumulative over
  * the stream's lifetime, like [[EventRollup]] windows but without an
  * event-time axis to expire on). The transform is PLAN-ONLY and built
  * on the same `bucketEntries` the batch operator uses, so both modes
  * bucket identically by construction; dyadic-width validation fails
  * at plan time, before any stream starts.
  *
  * Output ordering: none — a streaming aggregation cannot sort until
  * the sink (complete-mode consumers sort the materialized table; the
  * batch twin orders because it CAN). */
object HistogramStream {

  /** Cumulative (column_name, bucket, bucket_lo, n_rows) counters over
    * a (streaming or batch) frame. Run with `outputMode("complete")`
    * or `update` — counters revise as rows arrive. */
  def bucketCounts(df: DataFrame, widths: Seq[(String, Double)])
      : DataFrame =
    Profiling.bucketEntries(df, widths)
      .groupBy(col("column_name"), col("bucket"), col("bucket_lo"))
      .agg(count(lit(1)).as("n_rows"))
}
