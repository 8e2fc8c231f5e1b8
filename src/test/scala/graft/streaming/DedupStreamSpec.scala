package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Pins [[DedupStream.uniqueDocs]]'s within-watermark contract: a
  * duplicate inside the horizon is dropped, and state is EVICTED once
  * the watermark passes — a later re-arrival flows through (bounded
  * state is the point; full-history dedup is the batch op's job). */
class DedupStreamSpec extends SparkSpec {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("dup within the watermark dropped; state evicted past it; late re-arrival passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DedupStream.uniqueDocs(in.toDF(), "text", "ts", "10 seconds")
      .writeStream.format("memory").queryName("uniq")
      .outputMode(OutputMode.Append).start()
    try {
      def ids: Seq[Long] =
        spark.table("uniq").select("doc_id").collect().map(_.getLong(0))
          .sorted.toSeq

      // batch 1: two byte-identical docs in one batch -> first survives
      in.addData(Doc(1, t(0), "hola mundo"), Doc(2, t(1), "hola mundo"),
        Doc(3, t(0), "otro texto"))
      q.processAllAvailable()
      assert(ids == Seq(1L, 3L))

      // batch 2: watermark (max t1 - 10s) is still behind the original
      // -> the re-arrival is a within-horizon duplicate, dropped
      in.addData(Doc(4, t(2), "hola mundo"))
      q.processAllAvailable()
      assert(ids == Seq(1L, 3L))

      // batch 3: event time jumps far ahead -> watermark sweeps past the
      // old hashes, their state is evicted
      in.addData(Doc(5, t(100), "texto nuevo"))
      q.processAllAvailable()
      assert(ids == Seq(1L, 3L, 5L))

      // batch 4: the same old content AFTER eviction passes through —
      // the documented bounded-state trade
      in.addData(Doc(6, t(101), "hola mundo"))
      q.processAllAvailable()
      assert(ids == Seq(1L, 3L, 5L, 6L))
    } finally q.stop()
  }
}
