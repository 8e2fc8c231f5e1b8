package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only decomposition timer for a regression hunt. */
object DevQ {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, "graft-devq")
    graft.engine.GraftSession.quietKnownBenignWarnings()
    import graft.operators.Multimodal

    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val r = f
      println(f"[devq] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.engine.Tables.documents(spark, sfDir)
    import org.apache.spark.sql.{Dataset, Encoders}
    import Multimodal.{MediaRecord, AudioMeta}
    implicit val amEnc = Encoders.product[AudioMeta]
    // decode WITHOUT the memo (raw per-row decodeAudioHeader)
    def decodeRaw(media: Dataset[MediaRecord]): Dataset[AudioMeta] =
      media.mapPartitions { it =>
        it.map { r =>
          Multimodal.decodeAudioHeader(r.payload) match {
            case Some((rate, ch, frames, enc, container)) =>
              AudioMeta(r.doc_id, 1L, Some(rate), Some(ch),
                Some(frames), Some(enc), Some(container))
            case None =>
              AudioMeta(r.doc_id, 0L, None, None, None, None, None)
          }
        }
      }
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("encodeAudioFixture only") {
        noop(Multimodal.encodeAudioFixture(docs, "doc_id").toDF())
      }
      time("encode+decodeAudioMeta (memo)") {
        noop(Multimodal.decodeAudioMeta(
          Multimodal.encodeAudioFixture(docs, "doc_id")).toDF())
      }
      time("encode+decodeRaw (no memo)") {
        noop(decodeRaw(
          Multimodal.encodeAudioFixture(docs, "doc_id")).toDF())
      }
      time("encode+coalesce(1)+decodeRaw") {
        noop(decodeRaw(
          Multimodal.encodeAudioFixture(docs, "doc_id").coalesce(1))
          .toDF())
      }
      time("encode+decode+orderBy (q207)") {
        noop(Multimodal.decodeAudioMeta(
          Multimodal.encodeAudioFixture(docs, "doc_id")).toDF()
          .orderBy(col("doc_id")))
      }
      System.gc()
    }
    spark.stop()
  }
}
