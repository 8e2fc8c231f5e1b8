package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.Tables
import graft.functions.TextHash

/** First-come token-quota semantics: greedy doc_id-order fill within a
  * batch, state carry across batches, and the skip-then-admit case a
  * cumsum formulation gets wrong. */
class QuotaStreamSpec extends SparkSpec {

  test("one-batch drain is the greedy doc_id-order fill; totals within caps") {
    val src = Files.createTempDirectory("graft_quota_src").toString
    val ckpt = Files.createTempDirectory("graft_quota_ckpt").toString
    val caps = Map("en" -> 3000L, "es" -> 1000L, "de" -> 0L)

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("lang").as("stratum"), col("doc_id"),
        size(TextHash.tokens(col("text"))).cast("long").as("n_tokens"))
    docs.coalesce(1).write.mode("append").parquet(src)

    QuotaStream.admitted(
      spark.readStream
        .schema("stratum STRING, doc_id LONG, n_tokens LONG").parquet(src),
      caps)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("quota_admitted")
      .start()
      .awaitTermination()
    val streamed = spark.table("quota_admitted").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // greedy reference fold, per stratum in doc_id order
    val all = docs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = all.groupBy(_._1).toSeq.flatMap { case (s, ds) =>
      var consumed = 0L
      ds.sortBy(_._2).toSeq.flatMap { d =>
        val ok = caps.get(s).forall(c => consumed + d._3 <= c)
        if (ok) { consumed += d._3; Some(d) } else None
      }
    }.toSet
    assert(streamed == expected)
    // caps respected; zero-cap stratum admits nothing; uncapped flow
    val perStratum = streamed.groupBy(_._1)
      .map { case (s, ds) => s -> ds.map(_._3).sum }
    caps.foreach { case (s, c) =>
      assert(perStratum.getOrElse(s, 0L) <= c, s"$s over cap")
    }
    assert(!streamed.exists(_._1 == "de"))
    val uncapped = all.filterNot(d => caps.contains(d._1)).toSet
    assert(uncapped.subsetOf(streamed), "uncapped strata must pass whole")
  }

  test("state carries across batches; skipped doc frees room for a later one") {
    val src = Files.createTempDirectory("graft_quota_src2").toString
    val ckpt = Files.createTempDirectory("graft_quota_ckpt2").toString
    import spark.implicits._
    def write(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("stratum", "doc_id", "n_tokens").coalesce(1)
        .write.mode("append").parquet(src)

    write(Seq(("en", 1L, 80L))) // batch 1: consumes 80 of cap 100
    Thread.sleep(1100)
    // batch 2: doc 2 (30 tokens) would overflow -> skipped; doc 3 (15)
    // still fits — the case a cumsum-then-filter charges wrongly
    write(Seq(("en", 2L, 30L), ("en", 3L, 15L)))

    def drain(): Unit =
      QuotaStream.admitted(
        spark.readStream
          .schema("stratum STRING, doc_id LONG, n_tokens LONG")
          .parquet(src),
        Map("en" -> 100L))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .option("maxFilesPerTrigger", "1")
        .outputMode("append")
        .format("memory").queryName("quota_admitted2")
        .start()
        .awaitTermination()

    drain()
    val got = spark.table("quota_admitted2").collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(got == Set((1L, 80L), (3L, 95L)), s"got $got")
  }
}
