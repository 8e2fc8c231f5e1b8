package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.{Dedup, Multimodal}

/** The incremental dHash-store invariants: batch splits merge to the
  * one-shot cluster decision (the hash is a pure payload function —
  * distinct is the whole merge), re-delivery is a NO-OP (the
  * at-least-once-safe side of the store family), corrupt payloads are
  * never stored, and compact preserves the answers. */
class DhashStoreSpec extends SparkSpec {

  // ids avoiding only nothing: 3/6 mod 10 are the corruption families
  private val allIds = (0L until 40L)

  private def media(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    Multimodal.encodeGradientImageFixture(ids.toDF("doc_id"), "doc_id")
  }

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet

  test("row-disjoint batches merge to the one-shot clusters; corrupt " +
    "rows never stored; compact preserves the answers") {
    val dir = Files.createTempDirectory("graft_dh").toString + "/store"
    val store = new DhashStore(spark, dir)
    assert(store.fingerprints.collect().isEmpty)
    val n1 = store.ingest(media(allIds.filter(_ % 2 == 0)))
    val n2 = store.ingest(media(allIds.filter(_ % 2 == 1)))
    val decodable = allIds.filterNot(i => i % 10 == 3 || i % 10 == 6)
    assert(n1 + n2 == decodable.size.toLong)
    // no corrupt ids in the store
    val storedIds = store.fingerprints.collect().map(_.getLong(0)).toSet
    assert(storedIds == decodable.toSet)
    // one-shot reference: decode everything at once, cluster directly
    val oneShot = Dedup.fingerprintClusters(
      Multimodal.imageDhash(media(allIds)).toDF()
        .where(col("ok") === 1L)
        .select(col("doc_id"), col("dhash").as("fp")),
      "doc_id", "fp", 3, 64)
    assert(rows(store.clusters()) == rows(oneShot))
    val pairsBefore = store.pairs().collect().toSeq
    val (before, after) = store.compact()
    assert(before >= 2L && after >= 1L)
    assert(rows(store.clusters()) == rows(oneShot))
    assert(store.pairs().collect().toSeq == pairsBefore)
  }

  test("store-side decontam (r19) ≡ the one-shot fingerprintDecontam " +
    "gate over the ingested union — full-history screening against a " +
    "new eval set with zero payload re-decode") {
    val dir = Files.createTempDirectory("graft_dhd").toString + "/store"
    val store = new DhashStore(spark, dir)
    val trainIds = allIds.filter(_ % 3 != 0)
    val evalIds = allIds.filter(_ % 3 == 0)
    store.ingest(media(trainIds))
    def fpsOf(ids: Seq[Long]) =
      Multimodal.imageDhash(media(ids)).toDF()
        .where(col("ok") === 1L)
        .select(col("doc_id"), col("dhash").as("fp"))
    // hamming is bit_count's INT32
    def decRows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
    val got = decRows(store.decontam(fpsOf(evalIds)))
    val want = decRows(Dedup.fingerprintDecontam(fpsOf(trainIds),
      fpsOf(evalIds), "doc_id", "fp", maxHamming = 3, bits = 64))
    assert(got == want)
    assert(got.nonEmpty,
      "perceptually-colliding eval images must flag stored docs")
  }

  test("re-delivering a batch is a NO-OP — the hash is a pure payload " +
    "function, distinct folds the duplicate rows") {
    val dir = Files.createTempDirectory("graft_dh2").toString + "/store"
    val store = new DhashStore(spark, dir)
    store.ingest(media(allIds))
    val want = rows(store.clusters())
    val nFp = store.fingerprints.count()
    store.ingest(media(allIds.take(20))) // replay a prefix
    assert(store.fingerprints.count() == nFp)
    assert(rows(store.clusters()) == want)
  }
}
