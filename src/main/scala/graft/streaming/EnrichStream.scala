package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment — the remaining join mode in the streaming
  * matrix (file-source incremental, windowed rollup, custom-state
  * sessionize/as-of, watermark-bounded dedup, stream-stream interval
  * join are all covered elsewhere): an unbounded document stream
  * joined against a SMALL STATIC dimension (per-language curation
  * priors: sampling weight + quality floor). Spark re-plans the static
  * side per micro-batch and broadcasts it — no state store at all,
  * which is exactly why a dimension lookup should be a stream-static
  * join and never a stream-stream one.
  *
  * Left join keeps unknown-language docs flowing (nulls mark "no
  * prior"), the same no-silent-drop stance as the batch funnel's
  * gates.
  */
object EnrichStream {

  /** Attach `priors` (lang, weight, min_quality) to a streaming docs
    * frame by language. Works unchanged on batch frames drained via
    * `Trigger.AvailableNow`. */
  def withLangPriors(docs: DataFrame, priors: DataFrame): DataFrame =
    docs.join(broadcast(priors), Seq("lang"), "left")
}
