package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.TextAnalysis

/** The incremental-novelty invariants: batch splits never change
  * scores (incremental ≡ the one-shot q67 operator over the union),
  * and re-ingesting a recorded batch reports everything seen. */
class NoveltyStoreSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  private val corpus = Seq(
    1L -> "uno dos tres cuatro cinco",
    2L -> "uno dos tres cuatro cinco",       // verbatim repeat of 1
    3L -> "alfa beta gamma delta",
    4L -> "gamma delta epsilon zeta eta",    // overlaps 3's tail
    5L -> "texto totalmente nuevo aqui")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("id-ordered batch splits reproduce the one-shot noveltyDecay scores") {
    val oneShot = collect(TextAnalysis.noveltyDecay(
      docs(corpus: _*), "doc_id", "text"))

    val dir = Files.createTempDirectory("graft_novelty").toString + "/store"
    val store = new NoveltyStore(spark, dir)
    val batched =
      collect(store.scoreAndRecord(docs(corpus.take(2): _*), "doc_id", "text")) ++
      collect(store.scoreAndRecord(docs(corpus.slice(2, 4): _*), "doc_id", "text")) ++
      collect(store.scoreAndRecord(docs(corpus.drop(4): _*), "doc_id", "text"))

    assert(batched == oneShot,
      s"batched=$batched\noneShot=$oneShot")
    assert(oneShot.exists(_._4 > 0L)) // the fixture exercises overlap
  }

  test("re-ingesting a recorded batch scores everything seen; compact keeps it") {
    val dir = Files.createTempDirectory("graft_novelty2").toString + "/store"
    val store = new NoveltyStore(spark, dir)
    store.scoreAndRecord(docs(corpus: _*), "doc_id", "text").collect()
    val vocab = store.seenShingles.count()
    assert(vocab > 0L)
    val (_, after) = store.compact()
    assert(after == 1L) // tiny store -> one sized file, not one-per-task
    assert(store.seenShingles.count() == vocab) // compact loses nothing
    val again = collect(
      store.scoreAndRecord(docs(corpus: _*), "doc_id", "text"))
    assert(again.nonEmpty)
    assert(again.forall(_._4 == 1048576L), again.toString) // all seen
    // the store never grows from a re-ingest (append-only-NEW)
    store.compact()
    assert(store.seenShingles.count() == vocab)
  }

  test("a store directory without _SUCCESS fails loudly; crashed compact heals") {
    val base = Files.createTempDirectory("graft_novelty3").toString
    val dir = base + "/store"
    val store = new NoveltyStore(spark, dir)
    store.scoreAndRecord(docs(corpus.take(2): _*), "doc_id", "text").collect()
    val vocab = store.seenShingles.count()

    // torn append: data files present, job-commit marker gone
    val marker = java.nio.file.Paths.get(dir, "_SUCCESS")
    Files.delete(marker)
    val e = intercept[IllegalStateException] { store.seenShingles }
    assert(e.getMessage.contains("_SUCCESS"))
    Files.createFile(marker) // restore

    // compact crash window: died between the two renames — the only
    // copy lives in .compact_old; the next compact() must restore it
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".compact_old"))
    intercept[IllegalStateException] { store.seenShingles } // loud pre-heal
    store.compact()
    assert(store.seenShingles.count() == vocab)
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".compact_old")))
  }

  test("heal keeps .compact_old while the live store is uncommitted") {
    // the post-swap verification-failure window: compact() threw after
    // the swap landed an UNCOMMITTED directory at the live path, with
    // the only complete copy promised to survive at .compact_old. The
    // next compact() must restore that copy, not delete it just
    // because a (broken) store directory exists.
    import java.nio.file.{Paths, Files => JF}
    val base = Files.createTempDirectory("graft_novelty5").toString
    val dir = base + "/store"
    val store = new NoveltyStore(spark, dir)
    store.scoreAndRecord(docs(corpus: _*), "doc_id", "text").collect()
    val vocab = store.seenShingles.count()
    JF.move(Paths.get(dir), Paths.get(dir + ".compact_old"))
    JF.createDirectory(Paths.get(dir)) // data file, no _SUCCESS marker
    JF.createFile(Paths.get(dir, "part-00000-torn.parquet"))
    // a READ in this window must fail loudly toward compact() — not
    // report an empty store while the last complete copy sits at old
    val e = intercept[IllegalStateException] { store.seenShingles }
    assert(e.getMessage.contains("compact() to heal"), e.getMessage)
    store.compact() // heal: restore old over the uncommitted wreck
    assert(store.seenShingles.count() == vocab,
      "heal lost the last complete copy")
    assert(!JF.exists(Paths.get(dir + ".compact_old")))
  }

  test("compact survives rename failures without losing the last copy") {
    // HDFS reports most rename failures by RETURNING FALSE, not by
    // throwing — inject that via a local FileSystem registered under
    // the `faulty://` scheme whose rename fails on a flagged dst.
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyRenameFs].getName)
    val base = Files.createTempDirectory("graft_novelty4").toString
    val dir = base + "/store"
    val store = new NoveltyStore(spark, "faulty://" + dir)
    store.scoreAndRecord(docs(corpus: _*), "doc_id", "text").collect()
    val vocab = store.seenShingles.count()
    assert(vocab > 0L)

    // first rename (store -> old) fails: compact throws, store intact
    FaultyRenameFs.failDst = Some(dir + ".compact_old")
    try intercept[java.io.IOException] { store.compact() }
    finally FaultyRenameFs.failDst = None
    assert(store.seenShingles.count() == vocab)

    // second rename (tmp -> store) fails AFTER store moved to old:
    // compact throws, the only durable copy survives at .compact_old,
    // and the next compact() heals and restores every shingle
    FaultyRenameFs.failDst = Some(dir)
    try intercept[java.io.IOException] { store.compact() }
    finally FaultyRenameFs.failDst = None
    assert(Files.exists(java.nio.file.Paths.get(dir + ".compact_old")),
      "the pre-swap copy must survive a failed swap")
    store.compact() // heals: old -> store, then a clean swap
    assert(store.seenShingles.count() == vocab)
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".compact_old")))
  }
}

/** Test-only local FileSystem whose rename returns false when the
  * destination matches [[FaultyRenameFs.failDst]] — the HDFS failure
  * mode NoveltyStore.compact's swap must tolerate. */
class FaultyRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (FaultyRenameFs.failDst.contains(dst.toUri.getPath)) false
    else super.rename(src, dst)
}

object FaultyRenameFs {
  @volatile var failDst: Option[String] = None
}
