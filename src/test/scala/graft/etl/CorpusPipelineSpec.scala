package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The curation funnel end-to-end over the sf0.001 documents fixture:
  * stage counts form a monotone funnel, outputs are readable, and the
  * curated text is actually redacted and packed consistently. */
class CorpusPipelineSpec extends SparkSpec {

  test("curate: monotone funnel, consistent outputs, scope fully released") {
    val out = Files.createTempDirectory("graft_corpus").toString
    // scope-managed persist() caches must return to baseline.
    // localCheckpoint RDDs (q31's lineage cuts) are excluded: their
    // lifetime is GC-driven via the ContextCleaner, not scope-driven —
    // the funnel's result frames may still reference the last one.
    def caches: Int = spark.sparkContext.getPersistentRDDs.values
      .count(!_.toString.contains("localCheckpoint"))
    val before = caches
    val s = CorpusPipeline.curate(spark,
      "/root/testdata/sf0.001/documents.parquet", out)
    assert(caches == before, "curate leaked persisted intermediates")

    assert(s.raw > 0)
    assert(s.raw >= s.afterExact && s.afterExact >= s.afterNearDup &&
      s.afterNearDup >= s.afterQuality)
    assert(s.afterNearDup < s.raw, "fixture contains known near-dups")
    assert(s.packs > 0)

    val clean = spark.read.parquet(s"$out/clean")
    assert(clean.count() == s.afterQuality)
    // redaction ran: no raw emails survive in curated text
    assert(clean.where(col("text").rlike(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}")).isEmpty)

    val packs = spark.read.parquet(s"$out/packs")
    assert(packs.count() == s.afterQuality) // one offset row per doc
    // offsets are the prefix sum of token counts in doc_id order
    val rows = packs.orderBy("doc_id")
      .select("n_tokens", "global_offset").collect()
    val expected = rows.map(_.getInt(0).toLong)
      .scanLeft(0L)(_ + _).init
    assert(rows.map(_.getLong(1)).toSeq == expected.toSeq)
  }
}
