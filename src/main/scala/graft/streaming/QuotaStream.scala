package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-stratum token-budget quota — the admission control a
  * live ingestion pipeline puts in front of a training corpus ("stop
  * taking English web text once it has its 500 M tokens"), and the
  * sequential sibling of the batch mixer (q41): the batch operator
  * decides membership by hash so any engine can replay it; a stream
  * must decide at ARRIVAL time, so the rule here is first-come
  * admission — admit a document iff its stratum's admitted-token total
  * plus its own tokens stays within the cap.
  *
  * That rule is deliberately NOT a window cumsum: a document that
  * overflows the cap is skipped, and a later smaller document can
  * still be admitted (a cumulative-sum-then-filter formulation charges
  * skipped documents against the budget and under-fills it —
  * QuotaStreamSpec pins the skip-then-admit case).
  *
  * State per stratum is ONE long (tokens admitted so far) — constant
  * forever, hash-partitioned; strata without a cap pass through
  * unmetered but still tallied. Within a micro-batch, rows are folded
  * in doc_id order so a one-batch drain is deterministic and
  * engine-replayable; across batches, admission order is arrival
  * order — the inherent stream/batch divergence, same stance as
  * [[AsOfStream]].
  */
object QuotaStream {

  final case class Doc(stratum: String, doc_id: Long, n_tokens: Long)

  /** One admitted document; `consumed_after` is the stratum's running
    * admitted-token total including this document. */
  final case class Admitted(stratum: String, doc_id: Long,
      n_tokens: Long, consumed_after: Long)

  /** Admit `docs` (stratum, doc_id, n_tokens) under per-stratum token
    * caps. Works unchanged on batch frames (and is its own batch
    * reference: a one-batch drain IS the greedy doc_id-order fill). */
  def admitted(docs: DataFrame, caps: Map[String, Long])
      : Dataset[Admitted] = {
    require(caps.values.forall(_ >= 0), s"negative caps in $caps")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("stratum").cast("string").as("stratum"),
        col("doc_id").cast("long").as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"))
      .as[Doc]
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (stratum: String, rows: Iterator[Doc], st: GroupState[Long]) =>
          var consumed = st.getOption.getOrElse(0L)
          val cap = caps.get(stratum)
          val out = rows.toArray.sortBy(_.doc_id).flatMap { d =>
            val admit = cap.forall(c => consumed + d.n_tokens <= c)
            if (admit) {
              consumed += d.n_tokens
              Some(Admitted(stratum, d.doc_id, d.n_tokens, consumed))
            } else None
          }
          st.update(consumed)
          out.iterator
      }
  }
}
