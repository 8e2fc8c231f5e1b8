package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables

/** Stream-static enrichment ≡ the batch join over a drained stream;
  * unknown languages keep flowing with null priors. */
class EnrichStreamSpec extends SparkSpec {

  test("drained stream-static join equals the batch join; left keeps unknowns") {
    val src = Files.createTempDirectory("graft_enrich_src").toString
    val ckpt = Files.createTempDirectory("graft_enrich_ckpt").toString
    import spark.implicits._

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"))
    docs.coalesce(1).write.mode("append").parquet(src)
    // deliberately missing some fixture langs -> null priors downstream
    val priors = Seq(("en", 0.5, 0.2), ("es", 0.25, 0.3))
      .toDF("lang", "weight", "min_quality")

    EnrichStream.withLangPriors(
      spark.readStream.schema("doc_id LONG, lang STRING").parquet(src),
      priors)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("enriched_docs")
      .start()
      .awaitTermination()
    val streamed = spark.table("enriched_docs").collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

    val batch = EnrichStream.withLangPriors(docs, priors).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

    assert(streamed == batch)
    assert(streamed.exists(_._2.isDefined) && streamed.exists(_._2.isEmpty),
      "fixture should hit both known and unknown languages")
    assert(streamed.size == docs.count())
  }
}
