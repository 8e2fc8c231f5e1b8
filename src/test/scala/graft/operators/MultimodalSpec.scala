package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Pins the two multimodal decode paths to each other (ADVICE r2): the
  * typed `mapPartitions` decode (the shape a real codec binding needs)
  * and the columnar `featureCols` metadata path (what q26's oracle
  * checks) must produce identical features for every document.
  */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("decodeFeatures (typed mapPartitions) ≡ featureCols (columnar)") {
    val media = Multimodal.mediaFrame(Tables.documents(spark, sf),
      "doc_id", "text")

    val typed = Multimodal.decodeFeatures(
        media.as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc))
      .toDF()
      .select("doc_id", "mime", "n_bytes", "frame_w", "frame_h", "n_frames")
      .orderBy("doc_id")
      .collect().toSeq

    val columnar = media
      .select(Seq(col("doc_id"), col("mime")) ++
        Multimodal.featureCols(col("doc_id"), col("payload")): _*)
      .orderBy("doc_id")
      .collect().toSeq

    assert(typed.nonEmpty)
    assert(typed == columnar)
  }

  test("metadata-only plan prunes the payload encode entirely") {
    val media = Multimodal.mediaFrame(Tables.documents(spark, sf),
      "doc_id", "text")
    val metaOnly = media.select(col("doc_id"), col("mime"))
    // column pruning must eliminate the payload construction (encode of
    // the text column) from a metadata-only plan — at 100 TB this is
    // the difference between reading bytes and reading a catalog
    val plan = metaOnly.queryExecution.optimizedPlan.toString()
    assert(!plan.contains("encode("), s"payload not pruned:\n$plan")
    assert(metaOnly.count() == 500)
  }
}
