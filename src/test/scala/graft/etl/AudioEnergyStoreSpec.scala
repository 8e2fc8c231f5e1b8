package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, Multimodal}

/** The [[SequenceFpStore]] family invariants on the AUDIO
  * ENERGY-WINDOW binding (r19 — the store that answers q307/q309's
  * trimmed-re-upload questions over full history with zero payload
  * re-decode): batch splits merge to the one-shot CLIP decisions,
  * re-delivery is a no-op, compact preserves, and the store-side
  * decontam readouts equal the one-shot gates over the ingested
  * union. */
class AudioEnergyStoreSpec extends SparkSpec {

  private val allIds = (0L until 80L)

  private def media(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    Multimodal.encodeClipWaveformFixture(ids.toDF("doc_id"), "doc_id")
  }

  private def oneShotEnergies = Multimodal
    .audioWindowEnergies(media(allIds)).toDF()
    .select(col("doc_id"), col("w"), col("amp"))

  private def pairRows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  private def clusterRows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet

  test("row-disjoint batches merge to the one-shot q307 clip " +
    "decisions; corrupt rows never stored; re-delivery a NO-OP; " +
    "compact preserves") {
    val dir = Files.createTempDirectory("graft_aes").toString + "/store"
    val store = new AudioEnergyStore(spark, dir)
    assert(store.fingerprints.collect().isEmpty)
    store.ingest(media(allIds.filter(_ % 2 == 0)))
    val n2 = store.ingest(media(allIds.filter(_ % 2 == 1)))
    assert(n2 == allIds.count(i => i % 2 == 1 && i % 10 != 3).toLong)
    val decodable = allIds.filterNot(_ % 10 == 3)
    assert(store.fingerprints.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet == decodable.toSet)
    // clip readouts over the STORE ≡ the one-shot q307/q308-geometry
    // decisions over the union's energy streams
    val wantPairs = pairRows(Dedup.sequenceShingleContainment(
      oneShotEnergies, "doc_id", "w", "amp"))
    assert(pairRows(store.clipPairs()) == wantPairs)
    assert(wantPairs.nonEmpty,
      "the clip fixture must produce containment pairs")
    val universe = oneShotEnergies.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 3)
      .select(col("doc_id"))
    val wantClusters = clusterRows(Dedup.nearDupClusters(universe,
      "doc_id", Dedup.sequenceShingleContainment(oneShotEnergies,
        "doc_id", "w", "amp").select(col("doc_a"), col("doc_b"))))
    assert(clusterRows(store.clipClusters()) == wantClusters)
    assert(wantClusters.exists(!_._3),
      "same-reel trims must actually chain into families")
    // re-delivery: a whole batch again changes nothing
    store.ingest(media(allIds.filter(_ % 2 == 0)))
    assert(pairRows(store.clipPairs()) == wantPairs)
    val (before, after) = store.compact()
    assert(before >= 2L && after >= 1L)
    assert(pairRows(store.clipPairs()) == wantPairs)
    assert(clusterRows(store.clipClusters()) == wantClusters)
  }

  test("store-side clip decontam ≡ the one-shot " +
    "sequenceShingleDecontam gate over the ingested union (zero " +
    "payload re-decode on the train side)") {
    val dir = Files.createTempDirectory("graft_aesd").toString + "/store"
    val store = new AudioEnergyStore(spark, dir)
    // train = the offset-blocks (id div 64) % 4 != 0; eval = block 0
    // (the q309 reel-independent split, so genuine nonzero-offset
    // leaks cross the split)
    val trainIds = allIds.filter(i => (i / 64) % 4 != 0)
    val evalIds = allIds.filter(i => (i / 64) % 4 == 0)
    store.ingest(media(trainIds))
    val evalFps = Multimodal.audioWindowEnergies(media(evalIds)).toDF()
      .select(col("doc_id"), col("w").as("frame_idx"),
        col("amp").as("fp"))
    val got = store.clipDecontam(evalFps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val want = Dedup.sequenceShingleDecontam(
        Multimodal.audioWindowEnergies(media(trainIds)).toDF()
          .select(col("doc_id"), col("w"), col("amp")),
        Multimodal.audioWindowEnergies(media(evalIds)).toDF()
          .select(col("doc_id"), col("w"), col("amp")),
        "doc_id", "w", "amp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
    assert(got.nonEmpty, "trimmed eval excerpts must flag")
  }
}
