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
  * spec). State per modality is ONE long — constant forever;
  * modalities without a cap pass unmetered but tallied (admission
  * control semantics — the batch MIXTURE's quota-zero-drops rule is
  * expressed here as an explicit `cap = 0`, which admits nothing).
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
    * one fold, two bindings. */
  def admitted(media: DataFrame, caps: Map[String, Long])
      : Dataset[Admitted] = {
    val spark = media.sparkSession
    import spark.implicits._
    QuotaStream.admitted(
      media.select(
        split(Multimodal.sniffModality(col("payload")), "/")
          .getItem(0).as("stratum"),
        col("doc_id").cast("long").as("doc_id"),
        octet_length(col("payload")).cast("long").as("n_tokens")),
      caps)
      .map(a => Admitted(a.stratum, a.doc_id, a.n_tokens,
        a.consumed_after))
  }
}
