package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Incremental image-fingerprint store — the MULTIMODAL member of the
  * incremental-dedup-state family (LshIndex/WinnowIndex hold text
  * near-dup state; this holds the q255/q261 dHash state): a live
  * media pipeline decodes each arriving batch ONCE, appends the
  * 8-byte fingerprints, and answers every dedup question (pairs,
  * clusters, canonical picks) from the stored |docs|-row fingerprint
  * frame — the payload bytes are never re-read, which at 100 TB of
  * media is the entire point (the decode is ~10⁶× the byte mass of
  * the hash).
  *
  * Merge law: the dHash is a PURE function of the payload, so
  * re-delivered batches append duplicate (doc_id, fp) rows that the
  * read-side distinct folds away — at-least-once safe, the
  * [[KmvStore]]/HLL side of the store family (the counter stores
  * double-count; this cannot move). Docs are immutable by contract
  * (content-addressed ids — a re-encoded variant arrives under a new
  * id and correctly lands in the same cluster BY HASH, not by id);
  * corrupt payloads are never stored (ok = 0 rows drop at decode, the
  * q255 contract).
  *
  * Scale shape: each ingest is one mapPartitions decode pass over the
  * batch (payloads stay where the scan runs; 16 bytes per row cross
  * into the store), reads are distinct-then-cluster over the stored
  * frame via [[Dedup.fingerprintClusters]]'s |F|-node component
  * propagation. [[compact]] folds the per-ingest appends through the
  * shared verified-swap [[ParquetStore]] discipline.
  */
final class DhashStore(spark: SparkSession, storeDir: String) {

  private def storeExists: Boolean =
    ParquetStore.gatedExists(spark, storeDir, "dhash store")

  /** Decode one media batch and append its fingerprints. Returns the
    * number of DECODABLE rows appended (corrupt rows drop, never
    * fail — the decoder totality contract). */
  def ingest(media: Dataset[Multimodal.MediaRecord]): Long = {
    val fps = Multimodal.imageDhash(media).toDF()
      .where(col("ok") === 1L)
      .select(col("doc_id"), col("dhash").as("fp"))
    // Persist the 16-byte/row fingerprint frame so the batch is
    // decoded exactly once: count materializes the cache, the append
    // reads it back — without this, count + write each re-run the
    // mapPartitions ImageIO pass (the 2x-decode cost q255 persists
    // to avoid).
    fps.persist()
    try {
      val n = fps.count()
      fps.write.mode(SaveMode.Append).parquet(storeDir)
      n
    } finally fps.unpersist()
  }

  /** The stored fingerprint frame, re-delivery folded: one
    * (doc_id, fp) row per doc. */
  def fingerprints: DataFrame =
    if (storeExists) spark.read.parquet(storeDir).distinct()
    else spark.range(0).select(col("id").as("doc_id"), col("id").as("fp"))

  /** q255's readout over the STORE: Hamming-≤ pairs with zero payload
    * access. */
  def pairs(maxHamming: Int = 3, bits: Int = 64): DataFrame =
    Dedup.fingerprintPairs(fingerprints, "doc_id", "fp", maxHamming, bits)

  /** q261's readout over the STORE: near-dup components + canonical
    * picks (the KEEP/DROP list), zero payload access. */
  def clusters(maxHamming: Int = 3, bits: Int = 64): DataFrame =
    Dedup.fingerprintClusters(fingerprints, "doc_id", "fp",
      maxHamming, bits)

  /** Fold the per-ingest appends into the distinct frame via the
    * shared verified swap. Returns (files before, files after). */
  def compact(targetFileBytes: Long = 128L << 20): (Long, Long) =
    ParquetStore.compact(spark, storeDir, fingerprints, targetFileBytes)
}
