package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Streaming per-modality BYTE-budget quota — q304's arrival-time
  * sibling (r19) and the [[QuotaStream]] shape on media: the admission
  * control a live ingestion pipeline puts in front of a multimodal
  * corpus ("stop taking video once it has its 10 TB"). The batch
  * mixer ([[graft.operators.Sampling.mixToByteBudget]]) decides
  * membership by id hash against KNOWN per-modality masses so any
  * engine can replay it; a stream must decide at ARRIVAL time, so the
  * rule here is first-come admission — admit a payload iff its
  * modality's admitted-byte total plus its own octet length stays
  * within the cap.
  *
  * Strata are the ROUTER's sniffed modality (magic bytes — crawler
  * mimes lie, the q263 rule), computed row-locally before the state
  * fold; cost is `octet_length(payload)` — payloads are METERED, never
  * decoded, and never enter the state store (the 16-byte decision-row
  * discipline: only (modality, doc_id, n_bytes) crosses into the
  * stateful fold). Skip-then-admit, NOT a window cumsum: an
  * overflowing payload is skipped and a later smaller one still
  * admits (the [[QuotaStream]] under-fill argument, pinned by its
  * spec). State per modality is ONE long — constant forever.
  *
  * UNMAPPED strata admit NOTHING by default (r20, the r19 advice
  * finding): [[QuotaStream]]'s generic contract passes capless
  * strata unmetered — fine for token quotas a caller states
  * exhaustively — but for ADMISSION CONTROL that default is
  * backwards, because `unknown` is where corrupt-magic payloads
  * sniff to, and a caller who forgets `caps("unknown") = 0` would
  * be flooded by junk. Here quota-zero-for-the-unstated is the
  * default (the batch MIXTURE's rule: no weight, no bytes);
  * `admitUnmapped = true` opts back into the tally-through
  * behavior for callers genuinely metering only some modalities.
  * Within a micro-batch rows fold in doc_id order so a one-batch
  * drain is deterministic and engine-replayable; across batches
  * admission order is arrival order — the inherent stream/batch
  * divergence, the [[AsOfStream]] stance.
  */
object MediaQuotaStream {

  /** One admitted payload; `consumed_after` is the modality's running
    * admitted-byte total including this one. */
  final case class Admitted(modality: String, doc_id: Long,
      n_bytes: Long, consumed_after: Long)

  /** Admit `media` (doc_id, payload, …) under per-modality byte caps.
    * Works unchanged on batch frames (a one-batch drain IS the greedy
    * doc_id-order fill). The state machinery is [[QuotaStream]]'s —
    * one fold, two bindings. Modalities absent from `caps` admit
    * nothing unless `admitUnmapped` — the drop is a stateless
    * row-local filter BEFORE the fold (equivalent to cap 0: neither
    * admits, neither moves state), so junk strata cost no state
    * entries either. */
  def admitted(media: DataFrame, caps: Map[String, Long],
      admitUnmapped: Boolean = false): Dataset[Admitted] = {
    val spark = media.sparkSession
    import spark.implicits._
    val metered = media.select(
      split(Multimodal.sniffModality(col("payload")), "/")
        .getItem(0).as("stratum"),
      col("doc_id").cast("long").as("doc_id"),
      octet_length(col("payload")).cast("long").as("n_tokens"))
    val gated =
      if (admitUnmapped) metered
      else metered.where(col("stratum")
        .isin(caps.keys.toSeq.map(x => x: Any): _*))
    QuotaStream.admitted(gated, caps)
      .map(a => Admitted(a.stratum, a.doc_id, a.n_tokens,
        a.consumed_after))
  }
}
