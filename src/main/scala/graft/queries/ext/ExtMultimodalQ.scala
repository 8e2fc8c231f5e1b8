package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** [[Ext]] family: multimodal binary-column plumbing and decode — queries q26.
  * Split from the monolithic Ext.scala in round 12
  * (pure relocation; helpers live in [[ExtHelpers]]). */
private[queries] trait ExtMultimodalQ { self: ExtHelpers =>
  // ---------------------------------------------------------------- q26
  /** q26 uses [[Multimodal.featureCols]] — the columnar twin of the
    * typed `decodeFeatures` path; MultimodalSpec pins the two equal so
    * the stub formulas cannot drift between the copies. */
  val q26: Q = Q(
    "q26_multimodal_meta",
    (s, d) => {
      val media = Multimodal.mediaFrame(Tables.documents(s, d),
        "doc_id", "text")
      media.select(
        Seq(col("doc_id"), col("uri"), col("mime"),
          sha2(decode(col("payload"), "UTF-8"), 256).as("fingerprint")) ++
          Multimodal.featureCols(col("doc_id"), col("payload")): _*)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
          ('memory://docs/' || CAST(doc_id AS VARCHAR)) AS uri,
          CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
            WHEN 2 THEN 'video/mp4' ELSE 'text/plain' END AS mime,
          encode(text) AS payload
        FROM documents)
      SELECT doc_id, uri, mime,
        CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        sha256(decode(payload)) AS fingerprint,
        CAST(16 + (octet_length(payload) % 1024) AS BIGINT) AS frame_w,
        CAST(16 + ((octet_length(payload) * 31) % 768) AS BIGINT) AS frame_h,
        CAST(1 + (doc_id % 30) AS BIGINT) AS n_frames
      FROM m ORDER BY doc_id
    """.trim))

}
