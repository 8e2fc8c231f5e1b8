package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Incremental image-fingerprint store — the IMAGE binding of the
  * [[FingerprintStore]] family (LshIndex/WinnowIndex hold text
  * near-dup state; this holds the q255/q261 dHash state). A
  * re-encoded variant of an image arrives under a new id and
  * correctly lands in the same cluster BY HASH, not by id; corrupt
  * payloads are never stored (ok = 0 rows drop at decode, the q255
  * contract). All merge/scale/compact discipline is the shared
  * family contract — see [[FingerprintStore]]. */
final class DhashStore(spark: SparkSession, storeDir: String)
    extends FingerprintStore(spark, storeDir, "dhash store") {
  protected def fingerprintFrame(
      media: Dataset[Multimodal.MediaRecord]): DataFrame =
    Multimodal.imageDhash(media).toDF()
      .where(col("ok") === 1L)
      .select(col("doc_id"), col("dhash").as("fp"))
}
