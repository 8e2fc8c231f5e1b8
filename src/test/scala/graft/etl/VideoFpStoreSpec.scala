package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.{Dedup, Multimodal}

/** The [[FingerprintStore]] family invariants on the SEQUENCE binding
  * (the AudioFpStoreSpec contract, lifted to per-frame rows): batch
  * splits merge to the one-shot aligned cluster decision, re-delivery
  * is a NO-OP, corrupt containers and frames are never stored,
  * compact preserves the answers. */
class VideoFpStoreSpec extends SparkSpec {

  private val allIds = (0L until 60L)

  private def media(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    Multimodal.encodeMjpegFixture(ids.toDF("doc_id"), "doc_id")
  }

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet

  test("row-disjoint batches merge to the one-shot aligned clusters; " +
    "corrupt containers/frames never stored; re-delivery a NO-OP; " +
    "compact preserves") {
    val dir = Files.createTempDirectory("graft_vfp").toString + "/store"
    val store = new VideoFpStore(spark, dir)
    assert(store.fingerprints.collect().isEmpty)
    val n1 = store.ingest(media(allIds.filter(_ % 2 == 0)))
    val n2 = store.ingest(media(allIds.filter(_ % 2 == 1)))
    val decodable = allIds.filterNot(i => i % 10 == 3 || i % 10 == 6)
    assert(n1 + n2 == decodable.size.toLong)
    val storedIds = store.fingerprints.select(col("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(storedIds == decodable.toSet)
    // the zeroed-SOI frame family stores every frame EXCEPT frame 1
    val corruptFrameIds = decodable.filter(_ % 10 == 9)
    assert(corruptFrameIds.nonEmpty)
    val frame1 = store.fingerprints
      .where(col("frame_idx") === 1L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(corruptFrameIds.forall(!frame1.contains(_)))
    val oneShotFps = Multimodal.videoFrameFingerprints(media(allIds))
      .toDF().where(col("ok") === 1L)
      .select(col("doc_id"), col("frame_idx"), col("fp")).persist()
    val oneShot = Dedup.alignedFingerprintClusters(oneShotFps,
      "doc_id", "frame_idx", "fp", 3, 64)
    assert(rows(store.clusters()) == rows(oneShot))
    // the MJPEG fixture must actually deduplicate or the merge test
    // is vacuous
    assert(rows(store.clusters()).count(_._3) < decodable.size)
    // re-delivery: same answers after re-ingesting a whole batch
    store.ingest(media(allIds.filter(_ % 2 == 0)))
    assert(rows(store.clusters()) == rows(oneShot))
    val pairsBefore = store.pairs().collect().toSeq
    val (before, after) = store.compact()
    assert(before >= 2L && after >= 1L)
    assert(rows(store.clusters()) == rows(oneShot))
    assert(store.pairs().collect().toSeq == pairsBefore)
    oneShotFps.unpersist()
  }

  test("clip readouts over the store: batch-split ingests answer the " +
    "one-shot offset-tolerant containment and family decisions " +
    "(q305/q308) with zero payload re-access") {
    val s = spark; import s.implicits._
    def clipMedia(ids: Seq[Long]) = Multimodal
      .encodeClipMjpegFixture(ids.toDF("doc_id"), "doc_id")
    val dir = Files.createTempDirectory("graft_vfpc").toString + "/store"
    val store = new VideoFpStore(spark, dir)
    store.ingest(clipMedia(allIds.filter(_ % 2 == 0)))
    store.ingest(clipMedia(allIds.filter(_ % 2 == 1)))
    val oneShotFps = Multimodal.videoFrameFingerprints(
        clipMedia(allIds)).toDF()
      .where(col("ok") === 1L)
      .select(col("doc_id"), col("frame_idx"), col("fp")).persist()
    val wantPairs = Dedup.sequenceShingleContainment(oneShotFps,
        "doc_id", "frame_idx", "fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = store.clipPairs()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs == wantPairs)
    assert(wantPairs.nonEmpty, "same-reel trims must pair")
    val universe = oneShotFps.groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .where(col("n") >= 3).select(col("doc_id"))
    val wantFam = rows(Dedup.nearDupClusters(universe, "doc_id",
      Dedup.sequenceShingleContainment(oneShotFps, "doc_id",
        "frame_idx", "fp").select(col("doc_a"), col("doc_b"))))
    assert(rows(store.clipClusters()) == wantFam)
    assert(wantFam.count(_._3) < wantFam.size,
      "trim families must actually collapse")
    oneShotFps.unpersist()
  }

  test("store-side decontam readouts (r19): the aligned gate and the " +
    "offset-tolerant clip gate over the STORE equal the one-shot " +
    "gates over the ingested union — full-history screening with " +
    "zero payload re-decode") {
    val s = spark; import s.implicits._
    def fpsOf(m: org.apache.spark.sql.Dataset[
        Multimodal.MediaRecord]) =
      Multimodal.videoFrameFingerprints(m).toDF()
        .where(col("ok") === 1L)
        .select(col("doc_id"), col("frame_idx"), col("fp"))
    // ALIGNED gate on the base MJPEG fixture: same-pattern-group ids
    // land on both sides of an id-mod split, so re-encoded eval clips
    // flag at the same frame indices
    val dir = Files.createTempDirectory("graft_vfpd").toString + "/store"
    val store = new VideoFpStore(spark, dir)
    val trainIds = allIds.filter(_ % 3 != 0)
    val evalIds = allIds.filter(_ % 3 == 0)
    store.ingest(media(trainIds))
    def decRows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val evalFps = fpsOf(media(evalIds))
    val gotAligned = decRows(store.decontam(evalFps))
    val wantAligned = decRows(graft.operators.Dedup
      .alignedFingerprintDecontam(fpsOf(media(trainIds)), evalFps,
        "doc_id", "frame_idx", "fp", 3, 64))
    assert(gotAligned == wantAligned)
    assert(gotAligned.nonEmpty, "same-group eval clips must flag")
    // CLIP gate on the clip fixture with the q306 offset-block split
    // (trimmed eval clips shift every index and escape the aligned
    // gate — only this rung sees them)
    val clipIds = (0L until 128L)
    def clipMedia(ids: Seq[Long]) = Multimodal
      .encodeClipMjpegFixture(ids.toDF("doc_id"), "doc_id")
    val dir2 = Files.createTempDirectory("graft_vfpd2").toString +
      "/store"
    val store2 = new VideoFpStore(spark, dir2)
    val trainClip = clipIds.filter(i => (i / 64) % 4 != 0)
    val evalClip = clipIds.filter(i => (i / 64) % 4 == 0)
    store2.ingest(clipMedia(trainClip))
    val evalClipFps = fpsOf(clipMedia(evalClip))
    val gotClip = decRows(store2.clipDecontam(evalClipFps))
    val wantClip = decRows(graft.operators.Dedup
      .sequenceShingleDecontam(fpsOf(clipMedia(trainClip)),
        evalClipFps, "doc_id", "frame_idx", "fp"))
    assert(gotClip == wantClip)
    assert(gotClip.nonEmpty, "trimmed eval clips must flag")
  }
}
