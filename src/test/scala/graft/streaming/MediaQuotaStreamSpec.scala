package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Multimodal

/** q304's arrival-time sibling: per-modality BYTE quotas with
  * router-sniffed strata — greedy doc_id-order fill within a batch,
  * state carry across batches, the skip-then-admit case a cumsum
  * formulation gets wrong, and drained admissions ≡ the batch quota
  * fill on the drained lake. */
class MediaQuotaStreamSpec extends SparkSpec {

  private def lake(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    // the mixed media fixture: stills / WAVs / MP4s + corrupt rows
    // (sniff → unknown), so the router strata are genuinely exercised
    Multimodal.encodeIsoMetaFixture(ids.toDF("doc_id"), "doc_id").toDF()
  }

  test("one-batch drain is the greedy doc_id-order byte fill per " +
    "sniffed modality ≡ the batch quota on the drained lake; " +
    "zero-cap modality admits nothing; unknown rows tally unmetered") {
    val src = Files.createTempDirectory("graft_mq_src").toString
    val ckpt = Files.createTempDirectory("graft_mq_ckpt").toString
    val caps = Map("image" -> 600L, "audio" -> 300L, "video" -> 0L)
    lake(0L until 60L).coalesce(1).write.mode("append").parquet(src)

    MediaQuotaStream.admitted(
      spark.readStream
        .schema("doc_id LONG, uri STRING, mime STRING, payload BINARY")
        .parquet(src),
      caps, admitUnmapped = true)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .format("memory").queryName("mq_admitted")
      .start()
      .awaitTermination()
    val streamed = spark.table("mq_admitted").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // batch reference: the SAME operator over the drained lake (its
    // own batch contract), and a driver-side greedy fold
    val all = spark.read.parquet(src)
      .select(
        split(Multimodal.sniffModality(col("payload")), "/")
          .getItem(0).as("m"),
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = all.groupBy(_._1).toSeq.flatMap { case (m, ds) =>
      var consumed = 0L
      ds.sortBy(_._2).toSeq.flatMap { d =>
        val ok = caps.get(m).forall(c => consumed + d._3 <= c)
        if (ok) { consumed += d._3; Some(d) } else None
      }
    }.toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
    // caps respected in BYTES; zero-cap video admits nothing;
    // unknown (corrupted-magic) rows pass unmetered but tallied
    val perModality = streamed.groupBy(_._1)
      .map { case (m, ds) => m -> ds.map(_._3).sum }
    caps.foreach { case (m, c) =>
      assert(perModality.getOrElse(m, 0L) <= c, s"$m over cap") }
    assert(!streamed.exists(_._1 == "video"))
    assert(streamed.exists(_._1 == "unknown"),
      "corrupt rows must route to the unmetered unknown stratum")
    // the quota must actually skip something (byte caps bind)
    assert(streamed.size < all.length)

    // DEFAULT policy (r20 advice): unmapped strata admit NOTHING —
    // the same lake WITHOUT admitUnmapped drops every corrupt-magic
    // `unknown` row, and the mapped strata are byte-identical (the
    // gate is a pre-fold filter, so it cannot shift admission order)
    val dflt = MediaQuotaStream.admitted(
        spark.read.parquet(src), caps)
      .collect().map(a => (a.modality, a.doc_id, a.n_bytes)).toSet
    assert(!dflt.exists(_._1 == "unknown"),
      "default must drop unmapped (unknown) strata")
    assert(dflt == streamed.filter(t => caps.contains(t._1)),
      "mapped strata must be unaffected by the unmapped-drop gate")
  }

  test("state carries across batches; a skipped payload frees room " +
    "for a later smaller one (never a cumsum)") {
    val src = Files.createTempDirectory("graft_mq_src2").toString
    val ckpt = Files.createTempDirectory("graft_mq_ckpt2").toString
    val s = spark; import s.implicits._
    // the clip-waveform fixture's WAV sizes differ by id (5 + id%3
    // energy windows): id 0 and 6 are the small shape, id 1 the
    // bigger one — exactly the skip-then-admit staging a cumsum
    // charges wrongly
    def audio(ids: Seq[Long]) = Multimodal
      .encodeClipWaveformFixture(ids.toDF("doc_id"), "doc_id").toDF()
    def bytesOf(id: Long): Long = audio(Seq(id))
      .select(octet_length(col("payload")).cast("long"))
      .collect().head.getLong(0)
    val (b0, b1, b6) = (bytesOf(0L), bytesOf(1L), bytesOf(6L))
    assert(b6 < b1, "fixture shape: id 6 must be smaller than id 1")
    assert(b0 == b6)
    audio(Seq(0L)).coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    // batch 2: doc 1 (bigger) overflows the remaining room -> skipped;
    // doc 6 (smaller) still fits
    audio(Seq(1L, 6L)).coalesce(1).write.mode("append").parquet(src)
    val cap = b0 + b6
    MediaQuotaStream.admitted(
      spark.readStream
        .schema("doc_id LONG, uri STRING, mime STRING, payload BINARY")
        .parquet(src),
      Map("audio" -> cap))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .option("maxFilesPerTrigger", "1")
      .outputMode("append")
      .format("memory").queryName("mq_admitted2")
      .start()
      .awaitTermination()
    val got = spark.table("mq_admitted2")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(got == Set((0L, b0), (6L, b0 + b6)), s"got $got")
  }
}
