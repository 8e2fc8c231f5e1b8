package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.TextAnalysis

/** The incremental document-frequency invariants: doc-disjoint batch
  * splits merge to EXACTLY the one-shot q219 dfs (SUM is the whole
  * merge), scoring after full ingest ≡ the one-shot operator, the
  * span stamp fails fast on mismatch, and compact preserves the
  * merged state. */
class DfStoreSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  // 3-gram windows: "a b c" is shared by docs 0, 1 and 3 (df 3);
  // every other window is unique to its doc
  private val corpus = Seq(
    0L -> "a b c d",
    1L -> "a b c x",
    2L -> "p q r s",
    3L -> "a b c a b c")

  private def frac(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toSeq

  test("doc-disjoint batches merge to the one-shot dfs and the " +
    "one-shot q219 scores; a batch scored before its ingest sees " +
    "only prior state") {
    val dir = Files.createTempDirectory("graft_df").toString + "/store"
    val store = new DfStore(spark, dir, n = 3)

    // novelty reading: before anything is ingested, nothing is boiler
    store.ingest(docs(corpus.take(2): _*), "doc_id", "text")
    val early = frac(store.scoreBatch(docs(corpus.drop(2): _*),
      "doc_id", "text"))
    // doc 3's two "a b c" occurrences hit the stored df=2 vocabulary
    assert(early.toMap.apply(3L) == ((4L, 2L, 0.5)))
    assert(early.toMap.apply(2L) == ((2L, 0L, 0.0)))

    store.ingest(docs(corpus.drop(2): _*), "doc_id", "text")
    val merged = store.dfCounts.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one window (a b c) at df 3; 6 unique windows at df 1:
    //   doc0 {abc, bcd}, doc1 {abc, bcx}, doc2 {pqr, qrs},
    //   doc3 {abc, bca, cab}
    assert(merged.values.count(_ == 3L) == 1)
    assert(merged.values.count(_ == 1L) == 6)

    // after full ingest, scoring the corpus ≡ the one-shot operator
    val oneShot = frac(TextAnalysis.boilerplateFraction(
      docs(corpus: _*), "doc_id", "text", n = 3, minDf = 2))
    val stored = frac(store.scoreBatch(docs(corpus: _*),
      "doc_id", "text", minDf = 2))
    assert(stored == oneShot)
  }

  test("span stamp: reopening with a different n fails fast on " +
    "ingest, read, and compact") {
    val dir = Files.createTempDirectory("graft_df5").toString + "/store"
    new DfStore(spark, dir, n = 3)
      .ingest(docs(corpus: _*), "doc_id", "text")
    val wrong = new DfStore(spark, dir, n = 5)
    intercept[IllegalArgumentException] { wrong.dfCounts.collect() }
    intercept[IllegalArgumentException] {
      wrong.ingest(docs(corpus: _*), "doc_id", "text")
    }
    intercept[IllegalArgumentException] { wrong.compact() }
  }

  test("compact preserves the merged dfs and shrinks the file count") {
    val dir = Files.createTempDirectory("graft_dfc").toString + "/store"
    val store = new DfStore(spark, dir, n = 3)
    corpus.foreach { case (i, t) =>
      store.ingest(docs(i -> t), "doc_id", "text")
    }
    val before = store.dfCounts.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val (filesBefore, filesAfter) = store.compact()
    assert(filesAfter <= filesBefore)
    val after = store.dfCounts.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after == before)
    // the stamp survives the compact rewrite
    intercept[IllegalArgumentException] {
      new DfStore(spark, dir, n = 4).dfCounts.collect()
    }
  }
}
