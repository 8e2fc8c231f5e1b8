package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.{Dedup, Multimodal}

/** The [[FingerprintStore]] family invariants on the AUDIO binding
  * (the DhashStoreSpec contract verbatim): batch splits merge to the
  * one-shot cluster decision, re-delivery is a NO-OP, corrupt
  * payloads are never stored, compact preserves the answers. */
class AudioFpStoreSpec extends SparkSpec {

  private val allIds = (0L until 40L)

  private def media(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    Multimodal.encodeWaveformFixture(ids.toDF("doc_id"), "doc_id")
  }

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet

  test("row-disjoint batches merge to the one-shot clusters; corrupt " +
    "rows never stored; re-delivery a NO-OP; compact preserves") {
    val dir = Files.createTempDirectory("graft_afp").toString + "/store"
    val store = new AudioFpStore(spark, dir)
    assert(store.fingerprints.collect().isEmpty)
    val n1 = store.ingest(media(allIds.filter(_ % 2 == 0)))
    val n2 = store.ingest(media(allIds.filter(_ % 2 == 1)))
    val decodable = allIds.filterNot(i => i % 10 == 3 || i % 10 == 6)
    assert(n1 + n2 == decodable.size.toLong)
    val storedIds = store.fingerprints.collect().map(_.getLong(0)).toSet
    assert(storedIds == decodable.toSet)
    val oneShot = Dedup.fingerprintClusters(
      Multimodal.audioFingerprints(media(allIds)).toDF()
        .where(col("ok") === 1L)
        .select(col("doc_id"), col("fp")),
      "doc_id", "fp", 3, 64)
    assert(rows(store.clusters()) == rows(oneShot))
    // the envelope fixture must actually deduplicate (21 patterns
    // over 36 decodable ids) or the merge test is vacuous
    assert(rows(store.clusters()).count(_._3) < decodable.size)
    // re-delivery: same answers after re-ingesting a whole batch
    store.ingest(media(allIds.filter(_ % 2 == 0)))
    assert(rows(store.clusters()) == rows(oneShot))
    val pairsBefore = store.pairs().collect().toSeq
    val (before, after) = store.compact()
    assert(before >= 2L && after >= 1L)
    assert(rows(store.clusters()) == rows(oneShot))
    assert(store.pairs().collect().toSeq == pairsBefore)
  }
}
