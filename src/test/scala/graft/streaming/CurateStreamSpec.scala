package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.{Dedup, Scrub, TextAnalysis}

/** Pins [[CurateStream.curatedDocs]] ≡ the batch funnel's stage
  * pipeline (exact dedup → quality band → repetition → redaction) on
  * in-order drained input — the discipline every streaming twin here
  * follows (SessionizeStream ≡ q34, IncrementalStream ≡ the sink). */
class CurateStreamSpec extends SparkSpec {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  // crafted corpus: a good doc (enough tokens, stopwords), an exact
  // dup of it, a short low-quality doc, a repetitive doc, and a good
  // doc carrying PII + network identifiers
  private val good = ("the quick brown fox jumps over the lazy dog and " +
    "then runs far away to the old stone bridge where a boat is waiting " +
    "for the last traveler of the evening as night falls over the valley")
  private val repetitive =
    Array.fill(30)("spam ham spam").mkString(" ")
  private val pii = ("write to the address agent007@example.com or visit " +
    "https://10.0.0.7/path now and quote the code 123456789 to claim a " +
    "prize that is of course entirely real and the offer is the best one")

  private val corpus = Seq(
    Doc(1, t(0), good),
    Doc(2, t(1), good),       // exact dup, inside the watermark
    Doc(3, t(2), "too short"),
    Doc(4, t(3), repetitive),
    Doc(5, t(4), pii))

  private def batchReference: Seq[(Long, String)] = {
    val docs = spark.createDataFrame(corpus).select(col("doc_id"),
      col("text"))
    val keep = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val kept = docs.join(keep, Seq("doc_id"))
    val q = TextAnalysis.qualityScores(kept, "doc_id", "text")
      .where(col("quality_band") =!= "low").select("doc_id")
    val lowRep = TextAnalysis.repetitionSignals(kept, "doc_id", "text")
      .where(col("dup_gram_ratio").isNull || col("dup_gram_ratio") <= 0.5)
      .select("doc_id")
    val gated = kept.join(q, Seq("doc_id")).join(lowRep, Seq("doc_id"))
    val piiR = Scrub.redactPii(gated, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("text"))
    Scrub.redactNetwork(piiR, "doc_id", "text")
      .select(col("doc_id"), col("redacted"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
  }

  test("drained stream matches the batch stage pipeline; redaction applied") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = CurateStream.curatedDocs(in.toDF(), "doc_id", "text", "ts",
      "10 seconds")
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(corpus: _*)
      q.processAllAvailable()
      val got = spark.table("curated")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(got == batchReference)
      // and the reference itself has the expected shape: dup, short,
      // and repetitive docs gone; the PII doc fully redacted
      assert(got.map(_._1) == Seq(1L, 5L))
      val redacted = got.last._2
      assert(!redacted.contains("agent007@example.com"))
      assert(!redacted.contains("123456789"))
      assert(!redacted.contains("https://10.0.0.7"))
      assert(redacted.contains("<EMAIL>") && redacted.contains("<NUM>")
        && redacted.contains("<URL>"))
    } finally q.stop()
  }

  test("gates are stateless: only the dedup key ever enters the state store") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = CurateStream.curatedDocs(in.toDF(), "doc_id", "text", "ts",
      "10 seconds")
      .writeStream.format("memory").queryName("curated_state")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(corpus: _*)
      q.processAllAvailable()
      val p = q.lastProgress
      // exactly ONE stateful operator (dropDuplicatesWithinWatermark);
      // a second one appearing means a gate started accumulating state
      assert(p.stateOperators.length == 1, p.stateOperators.mkString(","))
    } finally q.stop()
  }
}
