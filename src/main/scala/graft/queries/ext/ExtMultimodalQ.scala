package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** [[Ext]] family: multimodal binary-column plumbing and decode —
  * queries q26 (columnar metadata), q206 (image), q207 (audio),
  * q209 (video container), q221 (catalog profile over all three),
  * q238 (frame-sample plan), q255/q261 (image dHash pairs/clusters),
  * q256/q257 (sample tables + byte-range seeks), q262 (audio
  * envelope near-dup), q263 (modality router), q271/q272 (cross-modal
  * paired-row dedup agreement + disagreement worklist),
  * q275/q276 (audio + PNG chunk inventories).
  * Split from the monolithic Ext.scala in round 12
  * (pure relocation; helpers live in [[ExtHelpers]]). */
private[queries] trait ExtMultimodalQ { self: ExtHelpers =>
  // ---------------------------------------------------------------- q26
  /** q26 uses [[Multimodal.featureCols]] — the columnar twin of the
    * typed `decodeFeatures` path; MultimodalSpec pins the two equal so
    * the stub formulas cannot drift between the copies. */
  val q26: Q = Q(
    "q26_multimodal_meta",
    (s, d) => {
      val media = Multimodal.mediaFrame(Tables.documents(s, d),
        "doc_id", "text")
      media.select(
        Seq(col("doc_id"), col("uri"), col("mime"),
          sha2(decode(col("payload"), "UTF-8"), 256).as("fingerprint")) ++
          Multimodal.featureCols(col("doc_id"), col("payload")): _*)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
          ('memory://docs/' || CAST(doc_id AS VARCHAR)) AS uri,
          CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
            WHEN 2 THEN 'video/mp4' ELSE 'text/plain' END AS mime,
          encode(text) AS payload
        FROM documents)
      SELECT doc_id, uri, mime,
        CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        sha256(decode(payload)) AS fingerprint,
        CAST(16 + (octet_length(payload) % 1024) AS BIGINT) AS frame_w,
        CAST(16 + ((octet_length(payload) * 31) % 768) AS BIGINT) AS frame_h,
        CAST(1 + (doc_id % 30) AS BIGINT) AS n_frames
      FROM m ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q206
  /** q206 — REAL image decode: [[Multimodal.encodeImageFixture]] writes
    * actual PNG/JPEG bytes (`ImageIO.write`) with id-derived dimensions
    * and two injected corruption families, then
    * [[Multimodal.decodeImageMeta]] header-decodes them back with the
    * JDK's `javax.imageio` readers. The oracle states the expected
    * metadata as pure id arithmetic — the decode must round-trip the
    * encode exactly, and every corrupt payload must surface as an
    * `ok = 0` null-metadata row rather than a task failure. This is
    * the decode rung q26's columnar stub deliberately faked
    * (`extract.py` has no media path; SURVEY §2.11 north star). */
  val q206: Q = Q(
    "q206_image_decode",
    (s, d) => {
      val media = Multimodal.encodeImageFixture(
        Tables.documents(s, d), "doc_id")
      Multimodal.decodeImageMeta(media).toDF()
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        CAST(CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN 0 ELSE 1 END
          AS BIGINT) AS ok,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 8 + doc_id % 57 END AS width,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 8 + (doc_id * 3) % 41 END AS height,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE CAST(3 AS BIGINT) END AS channels,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
      FROM documents
      WHERE doc_id IS NOT NULL AND doc_id >= 0
      ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q207
  /** q207 — REAL audio decode: [[Multimodal.encodeAudioFixture]] writes
    * actual WAV/AIFF container bytes (`AudioSystem.write` of PCM
    * silence) with id-derived sample rate / channels / frame count and
    * the q206 corruption families, then [[Multimodal.decodeAudioMeta]]
    * header-decodes them back with the JDK's `javax.sound.sampled`
    * providers — zero new dependencies, the q206 argument applied to
    * the second modality. The oracle states the expected metadata as
    * pure id arithmetic; every corrupt payload must surface as an
    * `ok = 0` null-metadata row rather than a task failure. Video
    * remains the one documented stub (no FFmpeg in this environment). */
  val q207: Q = Q(
    "q207_audio_decode",
    (s, d) => {
      val media = Multimodal.encodeAudioFixture(
        Tables.documents(s, d), "doc_id")
      Multimodal.decodeAudioMeta(media).toDF()
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        CAST(CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN 0 ELSE 1 END
          AS BIGINT) AS ok,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 8000 + (doc_id % 5) * 2000 END AS sample_rate,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 1 + doc_id % 2 END AS channels,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 50 + (doc_id * 7) % 151 END AS n_frames,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 'pcm_signed' END AS encoding,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             WHEN doc_id % 2 = 0 THEN 'wave' ELSE 'aiff' END AS container
      FROM documents
      WHERE doc_id IS NOT NULL AND doc_id >= 0
      ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q209
  /** q209 — REAL video-container decode: [[Multimodal.encodeVideoFixture]]
    * writes structurally-valid MP4 (ISO 14496-12) box trees —
    * spec-correct 108-byte mvhd and 92-byte tkhd layouts, 16.16
    * fixed-point dimensions — with id-derived duration/tracks/size and
    * the q206 corruption families; [[Multimodal.decodeVideoMeta]]
    * parses them back with pure byte arithmetic (no codec, no SPI).
    * This retires the video stub at the CONTAINER level — the metadata
    * a catalog/curation pass actually reads; codec-FRAME decode is the
    * part that genuinely needs FFmpeg (absent) and stays out of scope.
    * The oracle states the expected metadata as pure id arithmetic;
    * every corrupt payload must surface as `ok = 0`, never a failure. */
  val q209: Q = Q(
    "q209_video_decode",
    (s, d) => {
      val media = Multimodal.encodeVideoFixture(
        Tables.documents(s, d), "doc_id")
      Multimodal.decodeVideoMeta(media).toDF()
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        CAST(CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN 0 ELSE 1 END
          AS BIGINT) AS ok,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 'isom' END AS brand,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 1000 + (doc_id % 97) * 250 END AS duration_ms,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 1 + doc_id % 2 END AS n_tracks,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 160 + (doc_id % 8) * 80 END AS width,
        CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN NULL
             ELSE 120 + (doc_id % 6) * 60 END AS height
      FROM documents
      WHERE doc_id IS NOT NULL AND doc_id >= 0
      ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q238
  /** q238 — frame-sample plan ([[Multimodal.frameSamplePlan]]): the
    * deterministic 4-frame seek schedule over q209's decoded video
    * metadata — midpoints of 4 equal duration segments, pure integer
    * arithmetic, so re-runs and other engines produce byte-identical
    * seek lists (extracted-frame caches stay reusable). Undecodable
    * videos have no plan rows; the oracle restates durations as the
    * fixture's id arithmetic. */
  val q238: Q = Q(
    "q238_frame_sample_plan",
    (s, d) =>
      Multimodal.frameSamplePlan(
        Multimodal.decodeVideoMeta(
          Multimodal.encodeVideoFixture(Tables.documents(s, d),
            "doc_id")).toDF(), k = 4),
    Some("""
      WITH d AS (
        SELECT doc_id, 1000 + (doc_id % 97) * 250 AS dur
        FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 4, 6, 7)),
      i AS (SELECT unnest(range(4)) AS frame_idx)
      SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        CAST((dur * (2 * frame_idx + 1)) // 8 AS BIGINT) AS t_ms
      FROM d CROSS JOIN i
      ORDER BY doc_id, frame_idx
    """.trim))

  // ---------------------------------------------------------------- q221
  /** q221 — media catalog profile ([[Multimodal.mediaProfile]]): the
    * readout OVER the three real decoders (q206/q207/q209) — per
    * modality, decode health plus the distributions that drive
    * training decisions (image resolution/aspect/format, audio
    * container/rate/duration band, video resolution/duration band) in
    * one long-format frame. Every bucket boundary is an integer
    * comparison; the oracle restates the buckets as pure id
    * arithmetic over the fixture's encode parameters. */
  val q221: Q = Q(
    "q221_media_profile",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Multimodal.mediaProfile(
        Multimodal.decodeImageMeta(
          Multimodal.encodeImageFixture(docs, "doc_id")).toDF(),
        Multimodal.decodeAudioMeta(
          Multimodal.encodeAudioFixture(docs, "doc_id")).toDF(),
        Multimodal.decodeVideoMeta(
          Multimodal.encodeVideoFixture(docs, "doc_id")).toDF())
    },
    Some("""
      WITH d AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0),
      ok AS (
        SELECT doc_id, 8 + doc_id % 57 AS iw, 8 + (doc_id * 3) % 41 AS ih,
          CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
          8000 + (doc_id % 5) * 2000 AS rate,
          50 + (doc_id * 7) % 151 AS frames,
          CASE WHEN doc_id % 2 = 0 THEN 'wave' ELSE 'aiff' END AS cont,
          1000 + (doc_id % 97) * 250 AS dur,
          160 + (doc_id % 8) * 80 AS vw, 120 + (doc_id % 6) * 60 AS vh
        FROM d WHERE doc_id % 10 NOT IN (3, 4, 6, 7)),
      r AS (
        SELECT 'image' AS modality, 'format' AS dimension, fmt AS bucket
          FROM ok
        UNION ALL SELECT 'image', 'resolution',
          CASE WHEN iw * ih < 1024 THEN 'tiny'
               WHEN iw * ih < 2048 THEN 'small'
               ELSE 'medium' END FROM ok
        UNION ALL SELECT 'image', 'aspect',
          CASE WHEN ih > iw THEN 'portrait'
               WHEN ih = iw THEN 'square'
               ELSE 'landscape' END FROM ok
        UNION ALL SELECT 'audio', 'container', cont FROM ok
        UNION ALL SELECT 'audio', 'sample_rate', CAST(rate AS VARCHAR)
          FROM ok
        UNION ALL SELECT 'audio', 'duration',
          CASE WHEN frames * 1000 < rate * 10 THEN 'lt_10ms'
               WHEN frames * 1000 < rate * 20 THEN 'lt_20ms'
               ELSE 'ge_20ms' END FROM ok
        UNION ALL SELECT 'video', 'resolution',
          CASE WHEN vw * vh < 100000 THEN 'lt_0_1mp'
               WHEN vw * vh < 200000 THEN 'lt_0_2mp'
               ELSE 'ge_0_2mp' END FROM ok
        UNION ALL SELECT 'video', 'duration',
          CASE WHEN dur < 8000 THEN 'lt_8s'
               WHEN dur < 16000 THEN 'lt_16s'
               ELSE 'ge_16s' END FROM ok
        UNION ALL SELECT 'image', 'health',
          CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN 'corrupt'
               ELSE 'ok' END FROM d
        UNION ALL SELECT 'audio', 'health',
          CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN 'corrupt'
               ELSE 'ok' END FROM d
        UNION ALL SELECT 'video', 'health',
          CASE WHEN doc_id % 10 IN (3, 4, 6, 7) THEN 'corrupt'
               ELSE 'ok' END FROM d)
      SELECT modality, dimension, bucket, CAST(count(*) AS BIGINT) AS n
      FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """.trim))

  // --------------------------------------------------------------- q255
  /** q255 — IMAGE perceptual-hash near-dup (the dedup × multimodal
    * rung): [[Multimodal.encodeGradientImageFixture]] writes real
    * grayscale PNGs whose 9×8 block luminance is pure id arithmetic
    * (25 gradient patterns × a one-bit tweak variant, plus two
    * corruption families), [[Multimodal.dhash64]] decodes pixels and
    * folds the integer-exact 64-bit difference hash, and
    * [[Dedup.fingerprintPairs]] reuses q19's pigeonhole Hamming
    * chunk-bucket machinery at 64 bits / radius 3. The oracle
    * restates every dHash from the block function (no pixels) and
    * brute-forces the pair set — Spark's chunk recall is exact by
    * pigeonhole, so the sets must be identical. Corrupt payloads
    * (magic zeroed / truncated) drop as ok = 0 before pairing. */
  val q255: Q = Q(
    "q255_image_dhash_neardup",
    (s, d) => {
      val media = Multimodal.encodeGradientImageFixture(
        Tables.documents(s, d), "doc_id")
      // the chunk self-join reads the fingerprint frame on BOTH sides:
      // without the persist the ImageIO encode+decode subtree runs
      // twice (measured 2× wall at sf0.1 — the simhashPairs lesson)
      val dh = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.imageDhash(media).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("dhash").as("fp")))
      Dedup.fingerprintPairs(dh, "doc_id", "fp",
        maxHamming = 3, bits = 64)
    },
    Some(dhashPairsOracleSql))

  /** The q255 oracle, shared with q261's cluster closure (the
    * q18OracleSql-inside-q31 pattern): id-arithmetic dHash replay +
    * brute-force Hamming-≤3 pairs. */
  private def dhashPairsOracleSql: String = """
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      cells AS (
        SELECT doc_id, r.r AS r, c.c AS c,
          CAST((((doc_id % 25) * 7 + r.r * 5 + c.c * 11) % 6) * 40 +
            CASE WHEN r.r = 0 AND c.c = 0 AND ((doc_id // 25) % 2) = 1
                 THEN 45 ELSE 0 END AS BIGINT) AS v
        FROM ids,
          (SELECT unnest(range(8)) AS r) r,
          (SELECT unnest(range(9)) AS c) c),
      bits AS (
        SELECT a.doc_id, CAST(a.r * 8 + a.c AS INT) AS b
        FROM cells a JOIN cells n
          ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
        WHERE a.c < 8 AND n.v > a.v),
      dh AS (
        SELECT i.doc_id,
          CAST(coalesce(sum(CASE WHEN b.b = 63
            THEN -9223372036854775808
            ELSE (1::BIGINT << b.b) END), 0) AS BIGINT) AS fp
        FROM ids i LEFT JOIN bits b USING (doc_id)
        GROUP BY i.doc_id)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
      FROM dh a JOIN dh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 3
      ORDER BY doc_a, doc_b
    """.trim

  // --------------------------------------------------------------- q261
  /** q261 — image near-dup CLUSTERS: q255's dHash pair set closed
    * into connected components ([[Dedup.nearDupClusters]] — min-id
    * label propagation, singletons included) — the actual KEEP/DROP
    * decision an image-dedup pipeline emits, completing the
    * dedup × multimodal rung end-to-end (fingerprint → pairs →
    * families → canonical picks). Universe = decodable images
    * (corrupt rows have no hash to cluster by). The oracle closes the
    * SAME replayed pair set with a recursive CTE (the q31 pattern:
    * min reachable id ≡ the propagation fixpoint). */
  val q261: Q = Q(
    "q261_image_dhash_clusters",
    (s, d) => {
      val media = Multimodal.encodeGradientImageFixture(
        Tables.documents(s, d), "doc_id")
      val dh = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.imageDhash(media).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("dhash").as("fp")))
      Dedup.fingerprintClusters(dh, "doc_id", "fp",
        maxHamming = 3, bits = 64)
    },
    Some(s"""
      WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ($dhashPairsOracleSql) q
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
      ),
      universe AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM universe
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
      )
      SELECT id AS doc_id, min(r) AS cluster_id,
        (id = min(r)) AS is_canonical
      FROM reach GROUP BY id ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q262
  /** q262 — AUDIO content near-dup (the dedup × audio rung, closing
    * the modality row the image dHash opened):
    * [[Multimodal.encodeWaveformFixture]] writes real 16-bit WAVs
    * whose per-window amplitude is pure id arithmetic,
    * [[Multimodal.audioEnvelopeHash64]] decodes the PCM stream and
    * folds the integer-exact 64-bit energy-ENVELOPE hash (louder-
    * than-previous-window bits — gain-invariant, the dHash idea on
    * the time axis), and [[Dedup.fingerprintPairs]] reuses the
    * pigeonhole Hamming machinery. Oracle restates every hash from
    * the waveform's amplitude function (no audio decode) and
    * brute-forces the pair set. */
  val q262: Q = Q(
    "q262_audio_envelope_neardup",
    (s, d) => {
      val media = Multimodal.encodeWaveformFixture(
        Tables.documents(s, d), "doc_id")
      val fp = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.audioFingerprints(media).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("fp")))
      Dedup.fingerprintPairs(fp, "doc_id", "fp",
        maxHamming = 3, bits = 64)
    },
    Some(envelopePairsOracleSql))

  // --------------------------------------------------------------- q267
  /** q267 — exact-vs-perceptual dedup AGREEMENT (the q188-family
    * audit for the multimodal rung): over the decodable gradient
    * images, compare byte-identity groups (sha-256 of the payload —
    * what a naive exact-dedup pass finds) against the dHash
    * clusters (q261) — group/cluster counts, duplicate-doc counts,
    * and pair masses side by side. Perceptual SUBSUMES exact by
    * construction (the hash is a pure byte function), so
    * `pairs_gained` is exactly what the perceptual rung buys:
    * re-encodes of one image that byte-compare different. The oracle
    * can restate BYTE-identity without bytes because the fixture
    * encoder is deterministic — two decodable payloads are
    * byte-equal iff their (pattern, tweak, block-width, block-height)
    * id residues agree — with the fixture's own arithmetic quirk made
    * explicit: the block formula reduces the 25 pattern ids MOD 6
    * (`(p·7 + …) % 6` and 7 ≡ 1 mod 6), so byte-identity keys on
    * `(id%25)%6`, which is exactly why exact groups are FEWER than
    * naive residue counting predicts — and replays the perceptual
    * side through the q261 closure. */
  val q267: Q = Q(
    "q267_image_dedup_agreement",
    (s, d) => {
      val media = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.encodeGradientImageFixture(
          Tables.documents(s, d), "doc_id").toDF())
      val dh = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.imageDhash(
          media.as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("dhash").as("fp")))
      val exactSizes = media
        .join(dh.select(col("doc_id")), Seq("doc_id")) // decodable only
        .select(sha2(col("payload"), 256).as("bh"))
        .groupBy(col("bh")).agg(count(lit(1)).as("n"))
      val percSizes = Dedup.fingerprintClusters(dh, "doc_id", "fp",
          maxHamming = 3, bits = 64)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      def summarize(sizes: org.apache.spark.sql.DataFrame, tag: String) =
        sizes.agg(
          count(lit(1)).as(s"${tag}_groups"),
          sum(col("n")).as(s"${tag}_docs"),
          sum(when(col("n") >= 2, col("n")).otherwise(0L))
            .as(s"${tag}_dup_docs"),
          sum(expr("n * (n - 1) div 2")).as(s"${tag}_pairs"))
      summarize(exactSizes, "exact")
        .crossJoin(broadcast(summarize(percSizes, "perc")))
        .select(col("exact_docs").as("n_docs"),
          col("exact_groups"), col("exact_dup_docs"), col("exact_pairs"),
          col("perc_groups").as("perc_clusters"), col("perc_dup_docs"),
          col("perc_pairs"),
          (col("perc_pairs") - col("exact_pairs")).as("pairs_gained"))
    },
    Some(s"""
      WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ($dhashPairsOracleSql) q
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
      ),
      universe AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM universe
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
      ),
      pclusters AS (
        SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
      psizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
        FROM pclusters GROUP BY 1),
      esizes AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM universe
        GROUP BY (doc_id % 25) % 6, (doc_id // 25) % 2,
          doc_id % 3, doc_id % 2),
      e AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_groups,
          CAST(sum(n) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
            AS exact_dup_docs,
          CAST(sum(n * (n - 1) // 2) AS BIGINT) AS exact_pairs
        FROM esizes),
      p AS (
        SELECT CAST(count(*) AS BIGINT) AS perc_clusters,
          CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
            AS perc_dup_docs,
          CAST(sum(n * (n - 1) // 2) AS BIGINT) AS perc_pairs
        FROM psizes)
      SELECT e.n_docs, e.exact_groups, e.exact_dup_docs, e.exact_pairs,
        p.perc_clusters, p.perc_dup_docs, p.perc_pairs,
        p.perc_pairs - e.exact_pairs AS pairs_gained
      FROM e, p
    """.trim))

  /** The q262 oracle, shared with q266's cluster closure (the q255 →
    * q261 pattern on the audio side). */
  private def envelopePairsOracleSql: String = """
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      cells AS (
        SELECT doc_id, CAST(u.w AS BIGINT) AS w,
          CAST(500 + ((doc_id % 21 + u.w) % 7) * 300 +
            CASE WHEN u.w = 0 AND (doc_id // 21) % 2 = 1
                 THEN 400 ELSE 0 END AS BIGINT) AS a
        FROM ids, LATERAL unnest(range(65)) AS u(w)),
      bits AS (
        SELECT x.doc_id, CAST(x.w AS INT) AS b
        FROM cells x JOIN cells n
          ON n.doc_id = x.doc_id AND n.w = x.w + 1
        WHERE n.a > x.a),
      fp AS (
        SELECT i.doc_id,
          CAST(coalesce(sum(CASE WHEN b.b = 63
            THEN -9223372036854775808
            ELSE (1::BIGINT << b.b) END), 0) AS BIGINT) AS fp
        FROM ids i LEFT JOIN bits b USING (doc_id)
        GROUP BY i.doc_id)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 3
      ORDER BY doc_a, doc_b
    """.trim

  // --------------------------------------------------------------- q266
  /** q266 — audio near-dup CLUSTERS: q262's envelope-hash pair set
    * closed into components via the distinct-fingerprint graph
    * ([[Dedup.fingerprintClusters]] — the q261 shape on the audio
    * side; broadcasts bounded by duplicate mass, never corpus
    * size), completing the audio dedup family end-to-end
    * (fingerprint → pairs → families → canonical picks). */
  val q266: Q = Q(
    "q266_audio_envelope_clusters",
    (s, d) => {
      val media = Multimodal.encodeWaveformFixture(
        Tables.documents(s, d), "doc_id")
      val fp = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.audioFingerprints(media).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("fp")))
      Dedup.fingerprintClusters(fp, "doc_id", "fp",
        maxHamming = 3, bits = 64)
    },
    Some(s"""
      WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ($envelopePairsOracleSql) q
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
      ),
      universe AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM universe
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
      )
      SELECT id AS doc_id, min(r) AS cluster_id,
        (id = min(r)) AS is_canonical
      FROM reach GROUP BY id ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q263
  /** q263 — MODALITY ROUTER health ([[Multimodal.sniffModality]]):
    * sniff every payload's container from MAGIC BYTES across a mixed
    * media lake (all three fixture encoders, routed by id % 3, PLUS
    * the ISO-BMFF brand fixture over the video ids and the GIF
    * fixture over the image ids — r17) and
    * report the declared-vs-sniffed confusion — the pre-decode
    * dispatch check production runs because crawler mimes lie.
    * Corrupted magics surface as `unknown` against their declared
    * mime (agree = false); truncation families keep their magic and
    * still route. The brand rows are the sharpest case: all declared
    * `video/mp4` (the naive ftyp guess), while the router dispatches
    * the major brand — M4A audio and heic/mif1/avif images disagree
    * with the lie, isom agrees. The oracle restates both columns as
    * id arithmetic over the fixtures' encoders. */
  val q263: Q = Q(
    "q263_modality_router",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val mixed = Multimodal.encodeImageFixture(
          docs.where(col("doc_id") % 3 === 0), "doc_id").toDF()
        .unionByName(Multimodal.encodeAudioFixture(
          docs.where(col("doc_id") % 3 === 1), "doc_id").toDF())
        .unionByName(Multimodal.encodeVideoFixture(
          docs.where(col("doc_id") % 3 === 2), "doc_id").toDF())
        .unionByName(Multimodal.encodeIsoBrandFixture(
          docs.where(col("doc_id") % 3 === 2), "doc_id").toDF())
        .unionByName(Multimodal.encodeGifFixture(
          docs.where(col("doc_id") % 3 === 0), "doc_id").toDF())
      mixed.select(col("mime").as("declared"),
          Multimodal.sniffModality(col("payload")).as("sniffed"))
        .groupBy(col("declared"), col("sniffed"))
        .agg(count(lit(1)).as("n"))
        .withColumn("agree", col("declared") === col("sniffed"))
        .orderBy(col("declared"), col("sniffed"))
    },
    Some("""
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0),
      m AS (
        SELECT doc_id,
          CASE
            WHEN doc_id % 3 = 0 THEN
              CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                   ELSE 'image/jpeg' END
            WHEN doc_id % 3 = 1 THEN
              CASE WHEN doc_id % 2 = 0 THEN 'audio/wav'
                   ELSE 'audio/aiff' END
            ELSE 'video/mp4' END AS declared,
          CASE WHEN doc_id % 10 IN (3, 4) THEN 'unknown'
            WHEN doc_id % 3 = 0 THEN
              CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                   ELSE 'image/jpeg' END
            WHEN doc_id % 3 = 1 THEN
              CASE WHEN doc_id % 2 = 0 THEN 'audio/wav'
                   ELSE 'audio/aiff' END
            ELSE 'video/mp4' END AS sniffed
        FROM ids),
      mb AS (
        SELECT doc_id, 'video/mp4' AS declared,
          CASE WHEN doc_id % 10 IN (3, 4) THEN 'unknown'
            WHEN doc_id % 5 = 0 THEN 'audio/mp4'
            WHEN doc_id % 5 = 1 THEN 'image/heic'
            WHEN doc_id % 5 = 2 THEN 'image/heif'
            WHEN doc_id % 5 = 3 THEN 'image/avif'
            ELSE 'video/mp4' END AS sniffed
        FROM ids WHERE doc_id % 3 = 2),
      mg AS (
        SELECT doc_id, 'image/gif' AS declared,
          CASE WHEN doc_id % 10 IN (3, 4) THEN 'unknown'
            ELSE 'image/gif' END AS sniffed
        FROM ids WHERE doc_id % 3 = 0),
      allm AS (
        SELECT declared, sniffed FROM m
        UNION ALL SELECT declared, sniffed FROM mb
        UNION ALL SELECT declared, sniffed FROM mg)
      SELECT declared, sniffed, CAST(count(*) AS BIGINT) AS n,
        declared = sniffed AS agree
      FROM allm GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** The shared id-arithmetic replay of the video fixture's sample
    * tables (q256/q257): per decodable video, n samples, uniform
    * delta, per-sample sizes, two chunks split at c1 with a dead-byte
    * gap — offsets anchored at the constant 28 (ftyp 20 + mdat
    * header 8). */
  private def sampleBytesOracleCte: String = """
      ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 4, 6, 7)),
      par AS (
        SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS n,
          CAST(100 + (doc_id % 7) * 50 AS BIGINT) AS delta,
          CAST((4 + doc_id % 5 + 1) // 2 AS BIGINT) AS c1,
          CAST(8 + doc_id % 4 AS BIGINT) AS gap
        FROM ids),
      s AS (
        SELECT doc_id, n, delta, c1, gap, CAST(u.i AS BIGINT) AS i,
          CAST(100 + ((doc_id + u.i) % 9) * 10 AS BIGINT) AS sz
        FROM par, LATERAL unnest(range(n)) AS u(i)),
      smp AS (
        SELECT doc_id, n, i AS sample_idx,
          CAST(i * delta AS BIGINT) AS t_ms,
          CAST(28 + coalesce(sum(sz) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + CASE WHEN i >= c1 THEN gap ELSE 0 END AS BIGINT)
            AS byte_off,
          sz AS n_bytes
        FROM s)""".trim

  // --------------------------------------------------------------- q256
  /** q256 — MP4 SAMPLE-TABLE decode
    * ([[Multimodal.decodeSampleTable]]): q209's box walk extended
    * through trak→mdia→mdhd/minf→stbl to the stts/stsc/stsz/stco
    * tables — per decodable video, every sample's decode timestamp
    * (MEDIA-timescale cumulated deltas) and BYTE range, the thing a
    * frame extractor actually fetches. The fixture writes two chunks
    * with a dead-byte gap so a misparse of stsc/stco lands chunk-2
    * samples on wrong offsets; the oracle restates all of it as id
    * arithmetic (offsets anchored at the constant 28 — mdat rides
    * before moov). Corrupt videos contribute no rows (the q238 plan
    * contract). */
  val q256: Q = Q(
    "q256_video_sample_bytes",
    (s, d) =>
      Multimodal.videoSampleBytes(Multimodal.encodeVideoFixture(
        Tables.documents(s, d), "doc_id")).toDF()
        .orderBy(col("doc_id"), col("sample_idx")),
    Some(s"""
      WITH $sampleBytesOracleCte
      SELECT doc_id, sample_idx, t_ms, byte_off, n_bytes
      FROM smp ORDER BY doc_id, sample_idx
    """.trim))

  // --------------------------------------------------------------- q257
  /** q257 — frame-sample plan WITH byte ranges
    * ([[Multimodal.frameSampleBytes]]): q238's midpoint seek schedule
    * completed by q256's sample tables — k = 4 frames per video at
    * sample-index midpoints `n·(2j+1) div 2k`, each row carrying the
    * timestamp AND the (byte_off, n_bytes) fetch range. */
  val q257: Q = Q(
    "q257_frame_sample_bytes",
    (s, d) =>
      Multimodal.frameSampleBytes(
        Multimodal.videoSampleBytes(Multimodal.encodeVideoFixture(
          Tables.documents(s, d), "doc_id")).toDF(), k = 4),
    Some(s"""
      WITH $sampleBytesOracleCte,
      tgt AS (
        SELECT DISTINCT doc_id, n, CAST(u.j AS BIGINT) AS frame_idx,
          CAST((n * (2 * u.j + 1)) // 8 AS BIGINT) AS sample_idx
        FROM smp, LATERAL unnest(range(4)) AS u(j))
      SELECT t.doc_id, t.frame_idx, t.sample_idx,
        m.t_ms, m.byte_off, m.n_bytes
      FROM tgt t JOIN smp m
        ON m.doc_id = t.doc_id AND m.sample_idx = t.sample_idx
      ORDER BY t.doc_id, t.frame_idx
    """.trim))

  /** Shared build for q271/q272 — the PAIRED-ROW cross-modal joint
    * frame: each doc's TEXT near-dup cluster (q31's MinHash-LSH
    * closure) joined to its IMAGE cluster (q261's dHash closure) on
    * doc_id — the (caption, image) pair being the actual unit of a
    * multimodal training corpus. Universe = docs with BOTH decisions
    * (text always exists; images restrict to decodable payloads).
    * Scale shape: both cluster frames are |docs|-row 16-byte
    * decisions, the join is one equi-shuffle of those decisions
    * (never payloads or pair sets). */
  private def crossModalJoint(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    val textC = Dedup.nearDupClusters(docs, "doc_id",
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.5, k = minhashK, bands = minhashBands))
      .select(col("doc_id"), col("cluster_id").as("tcid"))
    val dh = graft.engine.CacheScope.unmanaged.persist(
      Multimodal.imageDhash(Multimodal.encodeGradientImageFixture(
        docs, "doc_id")).toDF()
        .where(col("ok") === 1L)
        .select(col("doc_id"), col("dhash").as("fp")))
    val imgC = Dedup.fingerprintClusters(dh, "doc_id", "fp",
        maxHamming = 3, bits = 64)
      .select(col("doc_id"), col("cluster_id").as("icid"))
    textC.join(imgC, Seq("doc_id"))
  }

  /** The two recursive closures + joint frame restated in DuckDB —
    * the q31 oracle (text side, over all documents) and the q261
    * oracle (image side, over the decodable universe) joined on id.
    * Emits CTE fragments ending in `jsz(id, tcid, icid)`. */
  private def crossModalJointOracleSql: String = s"""
      tpairs AS (
        SELECT doc_a, doc_b FROM ($q18OracleSql) tq
      ),
      tedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM tpairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM tpairs
      ),
      treach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, treach.r FROM treach JOIN tedges e
          ON e.src = treach.id
      ),
      tclusters AS (SELECT id, min(r) AS tcid FROM treach GROUP BY id),
      ipairs AS (
        SELECT doc_a, doc_b FROM ($dhashPairsOracleSql) iq
      ),
      iedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM ipairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM ipairs
      ),
      iuniverse AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      ireach(id, r) AS (
        SELECT doc_id, doc_id FROM iuniverse
        UNION
        SELECT e.dst, ireach.r FROM ireach JOIN iedges e
          ON e.src = ireach.id
      ),
      iclusters AS (SELECT id, min(r) AS icid FROM ireach GROUP BY id),
      jsz AS (
        SELECT id, tcid, icid
        FROM tclusters JOIN iclusters USING (id))"""

  // --------------------------------------------------------------- q271
  /** q271 — CROSS-MODAL paired-row dedup agreement (q267 generalized
    * ACROSS modalities): for each (caption, image) pair — a document
    * and its same-id fixture image — compare the TEXT near-dup
    * decision (q31's MinHash-LSH closure) with the IMAGE decision
    * (q261's dHash closure). Everything folds from the FINEST
    * partition, the per-(text cluster × image cluster) joint-cell
    * counts: both modalities' pair masses, the pairs only one
    * modality finds (`text_only_pairs` / `image_only_pairs` — what
    * each rung buys for paired rows), and the union a compose-OR
    * dedup policy would drop. Cluster sizes are JOINT-restricted
    * (pairs both modalities can see), so the masses are comparable.
    * Scale shape: the cell frame is ≤ min(|text clusters| ×
    * |image clusters|, |docs|) rows; every readout is a fold of it —
    * no doc pair ever materializes (the q267 group-size identity
    * `Σ n·(n−1)/2`, per modality via regrouping the SAME cells). */
  val q271: Q = Q(
    "q271_crossmodal_dedup_agreement",
    (s, d) => {
      val cells = graft.engine.CacheScope.unmanaged.persist(
        crossModalJoint(s, d)
          .groupBy(col("tcid"), col("icid"))
          .agg(count(lit(1)).as("n")))
      val both = cells.agg(
        coalesce(sum(col("n")), lit(0L)).as("n_docs"),
        coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))
          .as("both_pairs"))
      val t = cells.groupBy(col("tcid"))
        .agg(sum(col("n")).as("n"))
        .agg(count(lit(1)).as("text_clusters"),
          coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))
            .as("text_pairs"))
      val i = cells.groupBy(col("icid"))
        .agg(sum(col("n")).as("n"))
        .agg(count(lit(1)).as("image_clusters"),
          coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))
            .as("image_pairs"))
      both.crossJoin(broadcast(t)).crossJoin(broadcast(i))
        .select(col("n_docs"), col("text_clusters"),
          col("image_clusters"), col("text_pairs"), col("image_pairs"),
          col("both_pairs"),
          (col("text_pairs") - col("both_pairs")).as("text_only_pairs"),
          (col("image_pairs") - col("both_pairs"))
            .as("image_only_pairs"),
          (col("text_pairs") + col("image_pairs") - col("both_pairs"))
            .as("union_pairs"))
    },
    Some(s"""
      WITH RECURSIVE $crossModalJointOracleSql,
      cells AS (
        SELECT tcid, icid, CAST(count(*) AS BIGINT) AS n
        FROM jsz GROUP BY 1, 2),
      bb AS (
        SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_docs,
          CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
            AS both_pairs
        FROM cells),
      tt AS (
        SELECT CAST(count(*) AS BIGINT) AS text_clusters,
          CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
            AS text_pairs
        FROM (SELECT tcid, sum(n) AS n FROM cells GROUP BY 1) tsz),
      ii AS (
        SELECT CAST(count(*) AS BIGINT) AS image_clusters,
          CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
            AS image_pairs
        FROM (SELECT icid, sum(n) AS n FROM cells GROUP BY 1) isz)
      SELECT bb.n_docs, tt.text_clusters, ii.image_clusters,
        tt.text_pairs, ii.image_pairs, bb.both_pairs,
        tt.text_pairs - bb.both_pairs AS text_only_pairs,
        ii.image_pairs - bb.both_pairs AS image_only_pairs,
        tt.text_pairs + ii.image_pairs - bb.both_pairs AS union_pairs
      FROM bb, tt, ii
    """.trim))

  // --------------------------------------------------------------- q272
  /** q272 — the cross-modal DISAGREEMENT worklist (q271's readout at
    * doc grain, the q188→q195 split applied across modalities): the
    * paired rows whose duplicate STATUS disagrees — text says dup
    * (joint-restricted text cluster ≥ 2) while the image is unique,
    * or vice versa — exactly the rows a curator reviews before
    * trusting a single-modality dedup policy on a paired corpus.
    * Sizes re-attach by cluster-id equi-joins (cluster ids are never
    * null — min-id labels); output is bounded by the joint universe,
    * ordered by doc_id. */
  val q272: Q = Q(
    "q272_crossmodal_dedup_worklist",
    (s, d) => {
      val joint = graft.engine.CacheScope.unmanaged.persist(
        crossModalJoint(s, d))
      val tsz = joint.groupBy(col("tcid"))
        .agg(count(lit(1)).as("text_size"))
      val isz = joint.groupBy(col("icid"))
        .agg(count(lit(1)).as("image_size"))
      joint.join(tsz, Seq("tcid")).join(isz, Seq("icid"))
        .where((col("text_size") >= 2) =!= (col("image_size") >= 2))
        .select(col("doc_id"), col("tcid").as("text_cluster_id"),
          col("icid").as("image_cluster_id"),
          col("text_size"), col("image_size"),
          when(col("text_size") >= 2, lit("text_only"))
            .otherwise(lit("image_only")).as("modality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $crossModalJointOracleSql,
      tsz AS (
        SELECT tcid, CAST(count(*) AS BIGINT) AS text_size
        FROM jsz GROUP BY 1),
      isz AS (
        SELECT icid, CAST(count(*) AS BIGINT) AS image_size
        FROM jsz GROUP BY 1)
      SELECT j.id AS doc_id, j.tcid AS text_cluster_id,
        j.icid AS image_cluster_id, tsz.text_size, isz.image_size,
        CASE WHEN tsz.text_size >= 2 THEN 'text_only'
             ELSE 'image_only' END AS modality
      FROM jsz j JOIN tsz USING (tcid) JOIN isz USING (icid)
      WHERE (tsz.text_size >= 2) != (isz.image_size >= 2)
      ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q275
  /** q275 — audio container CHUNK INVENTORY
    * ([[Multimodal.audioChunks]]): the RIFF/AIFF structure audit over
    * the q207 fixture — per decodable payload, every chunk's fourcc,
    * byte offset and size (the byte ranges a selective reader
    * fetches: `data`/`SSND` is the sample mass, the rest is header),
    * the ISO-BMFF box walk's sibling on the audio side. The oracle
    * restates the JDK writers' deterministic layouts as id
    * arithmetic: WAVE = fmt(16) at 12, data(frames·frameSize) at 36;
    * AIFF = COMM(18) at 12, SSND(8 + frames·frameSize) at 38 —
    * frameSize = 2·channels, frames/channels from the fixture's
    * encode parameters (spec-pinned so a writer change fails loudly
    * here, not silently downstream). Corrupt families have no rows
    * (zeroed magic and 16-byte truncations both fail the total
    * walk). */
  val q275: Q = Q(
    "q275_audio_chunk_inventory",
    (s, d) =>
      Multimodal.audioChunks(
        Multimodal.encodeAudioFixture(Tables.documents(s, d),
          "doc_id"))
        .toDF().orderBy(col("doc_id"), col("chunk_idx")),
    Some("""
      WITH ids AS (
        SELECT doc_id, 1 + doc_id % 2 AS ch,
          50 + (doc_id * 7) % 151 AS frames,
          doc_id % 2 = 0 AS wav
        FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 4, 6, 7))
      SELECT doc_id, chunk_idx, container, fourcc, byte_off, n_bytes
      FROM (
        SELECT doc_id, CAST(0 AS BIGINT) AS chunk_idx,
          CASE WHEN wav THEN 'wave' ELSE 'aiff' END AS container,
          CASE WHEN wav THEN 'fmt ' ELSE 'COMM' END AS fourcc,
          CAST(12 AS BIGINT) AS byte_off,
          CAST(CASE WHEN wav THEN 16 ELSE 18 END AS BIGINT) AS n_bytes
        FROM ids
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT),
          CASE WHEN wav THEN 'wave' ELSE 'aiff' END,
          CASE WHEN wav THEN 'data' ELSE 'SSND' END,
          CAST(CASE WHEN wav THEN 36 ELSE 38 END AS BIGINT),
          CAST(frames * 2 * ch + CASE WHEN wav THEN 0 ELSE 8 END
            AS BIGINT)
        FROM ids)
      ORDER BY doc_id, chunk_idx
    """.trim))

  // --------------------------------------------------------------- q276
  /** q276 — PNG container CHUNK INVENTORY ([[Multimodal.pngChunks]]):
    * the third leg of the structure-audit family (q256 walks ISO-BMFF
    * boxes, q275 walks RIFF/AIFF chunks, this walks PNG chunks) over
    * the structure-exact fixture: per decodable payload, every
    * chunk's type, byte offset and declared size (`IDAT` is the pixel
    * mass a selective reader actually fetches; the rest is header).
    * The fixture assembles its own stored-deflate `IDAT` framing
    * precisely so the layout is pure id arithmetic — an `ImageIO`
    * compressor owns its `IDAT` sizes, which no oracle can restate —
    * while staying a standard, JDK-readable PNG (spec-pinned
    * pixel-exact read-back). Corrupt families (zeroed signature,
    * 16-byte truncation, 2³²−1 declared length) have no rows — the
    * total walk rejects all three. */
  val q276: Q = Q(
    "q276_png_chunk_inventory",
    (s, d) =>
      Multimodal.pngChunks(
        Multimodal.encodePngFixture(Tables.documents(s, d), "doc_id"))
        .toDF().orderBy(col("doc_id"), col("chunk_idx")),
    Some("""
      WITH ids AS (
        SELECT doc_id,
          (1 + (doc_id * 3) % 5) * (2 + doc_id % 8) AS rawlen
        FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6, 9))
      SELECT doc_id, chunk_idx, fourcc, byte_off, n_bytes
      FROM (
        SELECT doc_id, CAST(0 AS BIGINT) AS chunk_idx,
          'IHDR' AS fourcc, CAST(8 AS BIGINT) AS byte_off,
          CAST(13 AS BIGINT) AS n_bytes
        FROM ids
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT), 'IDAT',
          CAST(33 AS BIGINT), CAST(rawlen + 11 AS BIGINT)
        FROM ids
        UNION ALL
        SELECT doc_id, CAST(2 AS BIGINT), 'IEND',
          CAST(56 + rawlen AS BIGINT), CAST(0 AS BIGINT)
        FROM ids)
      ORDER BY doc_id, chunk_idx
    """.trim))

  // --------------------------------------------------------------- q277
  /** The shared fps CTE of the MJPEG rung (q277/q278/q279): replay
    * [[Multimodal.encodeMjpegFixture]]'s per-frame dHash as pure id
    * arithmetic — row `r` of frame `f` carries pattern byte
    * `P[(g·5 + f·3 + r + 2·[variant=2]) % 4]` (P = 85/170/43/212),
    * bit 3 of frame 0 row 0 XOR-flipped for variant 1, composed into
    * the 64-bit hash with the bit-63 MIN_BIGINT trick (the q255
    * composition). The JPEG codec sits between the pattern and the
    * hash on the Spark side — the fixture's 24-level block separation
    * is what makes the lossy round-trip exact, and this oracle is the
    * proof. */
  private def mjpegFpsCte: String = """
      ids AS (
        SELECT doc_id, doc_id % 12 AS g, (doc_id // 12) % 3 AS variant
        FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      vframes AS (
        SELECT doc_id, g, variant, f.f AS frame_idx
        FROM ids, (SELECT unnest(range(8)) AS f) f
        WHERE f.f < 4 + g % 5),
      rowbytes AS (
        SELECT doc_id, frame_idx, r.r AS r,
          xor(CASE CAST((g * 5 + frame_idx * 3 + r.r +
                CASE WHEN variant = 2 THEN 2 ELSE 0 END) % 4 AS INT)
            WHEN 0 THEN 85 WHEN 1 THEN 170 WHEN 2 THEN 43
            ELSE 212 END,
            CASE WHEN variant = 1 AND frame_idx = 0 AND r.r = 0
                 THEN 8 ELSE 0 END) AS pb
        FROM vframes, (SELECT unnest(range(8)) AS r) r),
      fps AS (
        SELECT doc_id, frame_idx,
          CAST(sum(CASE WHEN r = 7 AND pb >= 128
            THEN -9223372036854775808 + ((pb % 128)::BIGINT << 56)
            ELSE pb::BIGINT << (8 * r) END) AS BIGINT) AS fp
        FROM rowbytes GROUP BY doc_id, frame_idx)"""

  /** q277 — per-frame VIDEO perceptual fingerprints: the decode pass
    * that retires "video near-dup is codec-blocked" at the honest JDK
    * rung — [[Multimodal.encodeMjpegFixture]] assembles standard
    * RIFF/AVI Motion-JPEG (every frame a complete baseline JPEG),
    * [[Multimodal.videoFrameFingerprints]] walks the container
    * (idx1 never trusted), decodes each frame with ImageIO and
    * dHashes it. Corrupt containers (zeroed magic / truncation) have
    * no rows; the zeroed-SOI frame family surfaces as `ok = 0` rows —
    * per-frame errors are data. The oracle restates every hash as id
    * arithmetic THROUGH the lossy codec (see [[mjpegFpsCte]]). */
  val q277: Q = Q(
    "q277_video_frame_fingerprints",
    (s, d) =>
      Multimodal.videoFrameFingerprints(
        Multimodal.encodeMjpegFixture(Tables.documents(s, d),
          "doc_id"))
        .toDF().orderBy(col("doc_id"), col("frame_idx")),
    Some(s"""
      WITH $mjpegFpsCte
      SELECT doc_id, frame_idx,
        CAST(CASE WHEN doc_id % 10 = 9 AND frame_idx = 1
             THEN 0 ELSE 1 END AS BIGINT) AS ok,
        CASE WHEN doc_id % 10 = 9 AND frame_idx = 1 THEN NULL
             ELSE fp END AS fp
      FROM fps ORDER BY doc_id, frame_idx
    """.trim))

  // --------------------------------------------------------------- q278
  /** q278 — VIDEO near-dup pairs ([[Dedup.alignedFingerprintPairs]]):
    * two videos are near-dup when ≥ half the longer one's frames
    * carry dHashes within Hamming ≤ 3 of the other's at the SAME
    * frame index. Exact sequence signatures collapse re-encoded
    * copies before any join; per-position pigeonhole buckets make the
    * match exact-recall; the only corpus-quadratic object is the
    * verified pair output. The fixture exercises all three paths:
    * same-signature exact dups (same g/variant class), the 1-bit
    * tweak variant (cross-signature, all-but-one-bit aligned), and
    * the corrupt-frame family (one missing position — still above the
    * half-share bar). Oracle: brute-force aligned Hamming join over
    * the replayed fps. */
  val q278: Q = Q(
    "q278_video_neardup_pairs",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.alignedFingerprintPairs(fps, "doc_id", "frame_idx", "fp",
        maxHamming = 3, bits = 64)
    },
    Some(videoPairsOracleSql))

  /** The q278 oracle, shared with q279's cluster closure (the
    * q255-inside-q261 pattern). */
  private def videoPairsOracleSql: String = s"""
      WITH $mjpegFpsCte,
      okf AS (
        SELECT doc_id, frame_idx, fp FROM fps
        WHERE NOT (doc_id % 10 = 9 AND frame_idx = 1)),
      cnt AS (SELECT doc_id, count(*) AS n FROM okf GROUP BY doc_id),
      m AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_match
        FROM okf a JOIN okf b
          ON a.frame_idx = b.frame_idx AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
        GROUP BY 1, 2)
      SELECT m.doc_a, m.doc_b, CAST(m.n_match AS BIGINT) AS n_match,
        CAST(ca.n AS BIGINT) AS n_frames_a,
        CAST(cb.n AS BIGINT) AS n_frames_b
      FROM m
      JOIN cnt ca ON ca.doc_id = m.doc_a
      JOIN cnt cb ON cb.doc_id = m.doc_b
      WHERE 2 * m.n_match >= greatest(ca.n, cb.n)
      ORDER BY doc_a, doc_b
    """.trim

  // --------------------------------------------------------------- q279
  /** q279 — VIDEO near-dup CLUSTERS: the KEEP/DROP decision of
    * closing q278's pair relation into connected components,
    * computed WITHOUT materializing doc pairs
    * ([[Dedup.alignedFingerprintClusters]]: label propagation over
    * the distinct-SEQUENCE graph, members re-attached afterwards —
    * measured 78 MB → ~2 MB of shuffle at sf0.1 vs the pair-frame
    * closure). Completes the per-modality dedup ladder (text q31,
    * image q261, audio q266, video here). Universe =
    * container-decodable videos (every such video has ≥ 1 decodable
    * frame in the fixture). The oracle brute-forces the pair set it
    * never materializes and closes it with a recursive CTE. */
  val q279: Q = Q(
    "q279_video_neardup_clusters",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.alignedFingerprintClusters(fps, "doc_id", "frame_idx",
        "fp", maxHamming = 3, bits = 64)
    },
    Some(s"""
      WITH RECURSIVE vpairs AS (
        SELECT doc_a, doc_b FROM ($videoPairsOracleSql) q
      ),
      vuniverse AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      vedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM vpairs
        UNION ALL SELECT doc_b, doc_a FROM vpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM vuniverse
        UNION
        SELECT r.doc_id, e.dst FROM reach r
        JOIN vedges e ON e.src = r.via),
      comp AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id)
      SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
      FROM comp ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q280
  /** q280 — exact-vs-perceptual VIDEO dedup agreement (q267's video
    * sibling, closing the audit family across modalities): over the
    * container-decodable MJPEG videos, compare byte-identity groups
    * (sha-256 of the payload — the naive exact pass, which IS the
    * honest MP4 tier) against the aligned sequence clusters (q279) —
    * group/cluster counts, duplicate-doc counts, pair masses, and
    * the pairs the perceptual rung buys. Perceptual subsumes exact
    * (byte-identical payloads have identical frame-fp sequences), and
    * the GAIN here is structural, not just re-encodes: identical
    * pattern streams at different frame counts prefix-chain into one
    * component (2·min ≥ max), which byte identity can never see. The
    * oracle restates byte identity without bytes — the fixture
    * encoder is deterministic, so payloads are byte-equal iff their
    * PATTERN FUNCTIONS agree, with the fixture's arithmetic quirk
    * made explicit (the q267 discipline): every pattern index is
    * `(g·5 + f·3 + r + 2·[v=2]) % 4`, so identity keys on the phase
    * `(5g + 2·[v=2]) % 4`, the tweak flag `[v=1]`, the frame count
    * `g % 5`, and the frame-corrupt flag — under which variant-2 of
    * group g is byte-identical to variant-0 of group g+10 (mod 20),
    * exactly the classes naive (g, variant) counting over-splits.
    * The perceptual side replays through the q278 closure. */
  val q280: Q = Q(
    "q280_video_dedup_agreement",
    (s, d) => {
      val media = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.encodeMjpegFixture(
          Tables.documents(s, d), "doc_id").toDF())
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          media.as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      val vids = fps.select(col("doc_id")).distinct()
      val exactSizes = media
        .join(vids, Seq("doc_id")) // container-decodable only
        .select(sha2(col("payload"), 256).as("bh"))
        .groupBy(col("bh")).agg(count(lit(1)).as("n"))
      val percSizes = Dedup.alignedFingerprintClusters(fps, "doc_id",
          "frame_idx", "fp", maxHamming = 3, bits = 64)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      def summarize(sizes: org.apache.spark.sql.DataFrame, tag: String) =
        sizes.agg(
          count(lit(1)).as(s"${tag}_groups"),
          sum(col("n")).as(s"${tag}_docs"),
          sum(when(col("n") >= 2, col("n")).otherwise(0L))
            .as(s"${tag}_dup_docs"),
          sum(expr("n * (n - 1) div 2")).as(s"${tag}_pairs"))
      summarize(exactSizes, "exact")
        .crossJoin(broadcast(summarize(percSizes, "perc")))
        .select(col("exact_docs").as("n_docs"),
          col("exact_groups"), col("exact_dup_docs"), col("exact_pairs"),
          col("perc_groups").as("perc_clusters"), col("perc_dup_docs"),
          col("perc_pairs"),
          (col("perc_pairs") - col("exact_pairs")).as("pairs_gained"))
    },
    Some(s"""
      WITH RECURSIVE vpairs AS (
        SELECT doc_a, doc_b FROM ($videoPairsOracleSql) q
      ),
      vuniverse AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      vedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM vpairs
        UNION ALL SELECT doc_b, doc_a FROM vpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM vuniverse
        UNION
        SELECT r.doc_id, e.dst FROM reach r
        JOIN vedges e ON e.src = r.via),
      pclusters AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id),
      psizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
        FROM pclusters GROUP BY 1),
      esizes AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM vuniverse
        GROUP BY
          (5 * (doc_id % 12) +
            CASE WHEN (doc_id // 12) % 3 = 2 THEN 2 ELSE 0 END) % 4,
          (doc_id // 12) % 3 = 1,
          (doc_id % 12) % 5,
          doc_id % 10 = 9),
      e AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_groups,
          CAST(sum(n) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
            AS exact_dup_docs,
          CAST(sum(n * (n - 1) // 2) AS BIGINT) AS exact_pairs
        FROM esizes),
      p AS (
        SELECT CAST(count(*) AS BIGINT) AS perc_clusters,
          CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
            AS perc_dup_docs,
          CAST(sum(n * (n - 1) // 2) AS BIGINT) AS perc_pairs
        FROM psizes)
      SELECT e.n_docs, e.exact_groups, e.exact_dup_docs, e.exact_pairs,
        p.perc_clusters, p.perc_dup_docs, p.perc_pairs,
        p.perc_pairs - e.exact_pairs AS pairs_gained
      FROM e, p
    """.trim))

  // --------------------------------------------------------------- q281
  /** q281 — video SHOT segmentation ([[Multimodal.videoShotSegments]]):
    * cut the frame-fingerprint stream wherever consecutive observed
    * frames' dHash Hamming distance exceeds the threshold — the
    * readout that sizes a per-SHOT frame-sample budget (q238's plan
    * assumes a stride; this finds the shots the stride should adapt
    * to). Runs on the scene-structured fixture
    * ([[Multimodal.encodeSceneMjpegFixture]]): intra-scene frames are
    * dHash-identical (Hamming 0) and scene changes jump by exactly 40
    * bits, so shots ≡ scenes at any threshold in (0, 40) and the
    * oracle is pure id arithmetic. The zeroed-SOI family drops frame
    * 1 mid-scene — segmentation must BRIDGE the gap (its flanks still
    * agree), which the oracle states by grouping observed frames by
    * their scene. */
  val q281: Q = Q(
    "q281_video_shot_segments",
    (s, d) =>
      Multimodal.videoShotSegments(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeSceneMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")),
        "doc_id", "frame_idx", "fp", cutHamming = 8),
    Some("""
      WITH ids AS (
        SELECT doc_id, 2 + doc_id % 3 AS s
        FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      obs AS (
        SELECT doc_id, f.f AS frame_idx, f.f // 3 AS scene
        FROM ids, (SELECT unnest(range(12)) AS f) f
        WHERE f.f < s * 3
          AND NOT (doc_id % 10 = 9 AND f.f = 1))
      SELECT doc_id, CAST(scene AS BIGINT) AS shot_idx,
        CAST(min(frame_idx) AS BIGINT) AS start_frame,
        CAST(max(frame_idx) AS BIGINT) AS end_frame,
        CAST(count(*) AS BIGINT) AS n_frames
      FROM obs GROUP BY doc_id, scene
      ORDER BY doc_id, shot_idx
    """.trim))

  // --------------------------------------------------------------- q283
  /** q283 — SHOT-ADAPTIVE frame-sample schedule
    * ([[Multimodal.shotSampleSchedule]] = q281 ∘ q238): a per-video
    * budget of 4 seeks split across shots in proportion to shot
    * length (every shot ≥ 1 — uniform strides starve short shots),
    * each shot seeked at its own positional midpoints over OBSERVED
    * frames, so decode-failure gaps are never addressed. Pure
    * integer arithmetic: `k_s = min(n_s, max(1, (4·n_s) div F))`
    * (the ceiling keeps seeks distinct), seek j at
    * position `(n_s·(2j+1)) div (2·k_s)`. Runs on the
    * scene-structured fixture, where shots ≡ scenes and the oracle
    * replays the whole schedule — shot table, allocation, midpoint
    * positions — from id arithmetic (incl. the dropped-frame family,
    * whose shot has one fewer position). */
  val q283: Q = Q(
    "q283_shot_sample_schedule",
    (s, d) =>
      Multimodal.shotSampleSchedule(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeSceneMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")),
        "doc_id", "frame_idx", "fp", cutHamming = 8, k = 4),
    Some("""
      WITH ids AS (
        SELECT doc_id, 2 + doc_id % 3 AS s
        FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      obs AS (
        SELECT doc_id, f.f AS frame_idx, f.f // 3 AS scene
        FROM ids, (SELECT unnest(range(12)) AS f) f
        WHERE f.f < s * 3
          AND NOT (doc_id % 10 = 9 AND f.f = 1)),
      pos AS (
        SELECT doc_id, scene, frame_idx,
          row_number() OVER (PARTITION BY doc_id, scene
            ORDER BY frame_idx) - 1 AS p
        FROM obs),
      shots AS (
        SELECT doc_id, scene, count(*) AS n_s FROM obs GROUP BY 1, 2),
      tot AS (
        SELECT doc_id, CAST(sum(n_s) AS BIGINT) AS f
        FROM shots GROUP BY 1),
      alloc AS (
        SELECT shots.doc_id, scene, n_s,
          CAST(least(n_s, greatest(1, (4 * n_s) // f)) AS BIGINT)
            AS k_s
        FROM shots JOIN tot USING (doc_id)),
      tgt AS (
        SELECT doc_id, scene, CAST(u.j AS BIGINT) AS sample_idx,
          (n_s * (2 * u.j + 1)) // (2 * k_s) AS p
        FROM alloc, LATERAL unnest(range(k_s)) AS u(j))
      SELECT t.doc_id, CAST(t.scene AS BIGINT) AS shot_idx,
        t.sample_idx, CAST(p.frame_idx AS BIGINT) AS frame_idx
      FROM tgt t JOIN pos p ON p.doc_id = t.doc_id
        AND p.scene = t.scene AND p.p = t.p
      ORDER BY t.doc_id, shot_idx, sample_idx
    """.trim))

  // --------------------------------------------------------------- q287
  /** q287 — ISO-BMFF EXACT-identity dedup decision (the tier behind
    * the r17 brand routing): for the families the router lands on
    * the audio/image branches but the JDK cannot pixel/PCM-decode
    * (M4A audio, HEIC/HEIF/AVIF stills), container health still
    * gates and BYTE identity still deduplicates —
    * [[Multimodal.isoBmffWalks]] + sha-256 keep-min, the MP4 video
    * tier's discipline generalized (and what [[graft.etl
    * .MediaPipeline]]'s exact tiers run). Fixture: the brand
    * fixture's payload is a pure function of the brand, so exact
    * groups ≡ brand classes and the oracle is id arithmetic
    * (corrupt-magic rows sniff unknown and never reach the tier;
    * isom rows route video/mp4 and are the existing MP4 tier's
    * scope). */
  val q287: Q = Q(
    "q287_iso_exact_dedup",
    (s, d) => {
      val media = Multimodal.encodeIsoBrandFixture(
        Tables.documents(s, d), "doc_id")
      val routed = graft.engine.CacheScope.unmanaged.persist(
        media.toDF().where(Multimodal.sniffModality(col("payload"))
          .isin("audio/mp4", "image/heic", "image/heif",
            "image/avif")))
      val healthy = graft.engine.CacheScope.unmanaged.persist(routed
        .join(Multimodal.isoContainerHealth(routed
            .as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc))
          .toDF()
          .where(col("ok") === 1L).select(col("doc_id")),
          Seq("doc_id"))
        .select(col("doc_id"),
          Multimodal.sniffModality(col("payload")).as("modality"),
          sha2(col("payload"), 256).as("__bh")))
      // keep-min per exact group; the group frame scales with the
      // corpus (mostly-unique lakes) — shuffle join, never broadcast
      healthy.join(healthy.groupBy(col("__bh"))
          .agg(min(col("doc_id")).as("cluster_id")), Seq("__bh"))
        .select(col("doc_id"), col("modality"), col("cluster_id"),
          (col("doc_id") === col("cluster_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 4) AND doc_id % 5 < 4),
      cls AS (
        SELECT doc_id, doc_id % 5 AS b,
          CASE doc_id % 5 WHEN 0 THEN 'audio/mp4'
            WHEN 1 THEN 'image/heic' WHEN 2 THEN 'image/heif'
            ELSE 'image/avif' END AS modality
        FROM ids),
      m AS (SELECT b, min(doc_id) AS cluster_id FROM cls GROUP BY 1)
      SELECT doc_id, modality, cluster_id,
        doc_id = cluster_id AS is_canonical
      FROM cls JOIN m USING (b) ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q288
  /** q288 — GIF near-dup PAIRS ([[Dedup.alignedFingerprintPairs]]
    * over the GIF rung — the q278 decision at the second multi-frame
    * coding, completing the family ladder fingerprints → pairs →
    * clusters): two GIFs are near-dup when ≥ half the longer one's
    * frames carry dHashes within Hamming ≤ 3 at the SAME frame
    * index; exact signature collapse first, per-position pigeonhole
    * candidates, verified pair output as the only quadratic object.
    * The fixture exercises same-signature exact dups, the v0/v1
    * one-bit tweak (cross-signature), statics (1-frame sequences
    * pair only with sequences ≤ 2 frames under the half share), and
    * the cross-phase v2 ≡ v0 stream identities. Oracle: brute-force
    * aligned Hamming join over the bit-exact fps replay. */
  val q288: Q = Q(
    "q288_gif_neardup_pairs",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.gifFrameFingerprints(
          Multimodal.encodeGifFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.alignedFingerprintPairs(fps, "doc_id", "frame_idx", "fp",
        maxHamming = 3, bits = 64)
    },
    Some(s"""
      WITH $gifFpsCte,
      cnt AS (SELECT doc_id, count(*) AS n FROM gfps GROUP BY doc_id),
      m AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_match
        FROM gfps a JOIN gfps b
          ON a.frame_idx = b.frame_idx AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
        GROUP BY 1, 2)
      SELECT m.doc_a, m.doc_b, CAST(m.n_match AS BIGINT) AS n_match,
        CAST(ca.n AS BIGINT) AS n_frames_a,
        CAST(cb.n AS BIGINT) AS n_frames_b
      FROM m
      JOIN cnt ca ON ca.doc_id = m.doc_a
      JOIN cnt cb ON cb.doc_id = m.doc_b
      WHERE 2 * m.n_match >= greatest(ca.n, cb.n)
      ORDER BY doc_a, doc_b
    """.trim))

  // --------------------------------------------------------------- q289
  /** q289 — exact-vs-perceptual GIF dedup agreement (q280's sibling
    * on the second multi-frame coding, closing the audit family):
    * byte-identity groups (sha-256) vs q285's aligned sequence
    * clusters over the decodable GIFs — group/cluster counts,
    * dup-doc counts, pair masses, `pairs_gained` = what the
    * perceptual rung buys beyond byte compare (the v0/v1 one-bit
    * tweak and cross-phase stream identities of unequal LENGTH,
    * which prefix-chain perceptually but can never byte-match). The
    * oracle restates BYTE identity as id arithmetic — two intact
    * GIFs are byte-equal iff they share the pattern phase
    * `(7g + 2·[v=2]) mod 4`, the v1 tweak flag, and the frame count
    * `g mod 3` (the fixture's own frame formula made explicit, the
    * q267/q280 quirk discipline) — and replays the perceptual side
    * through the q288 closure. */
  val q289: Q = Q(
    "q289_gif_dedup_agreement",
    (s, d) => {
      val media = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.encodeGifFixture(
          Tables.documents(s, d), "doc_id").toDF())
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.gifFrameFingerprints(
          media.as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      val gifs = fps.select(col("doc_id")).distinct()
      val exactSizes = media
        .join(gifs, Seq("doc_id")) // decodable only
        .select(sha2(col("payload"), 256).as("bh"))
        .groupBy(col("bh")).agg(count(lit(1)).as("n"))
      val percSizes = Dedup.alignedFingerprintClusters(fps, "doc_id",
          "frame_idx", "fp", maxHamming = 3, bits = 64)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      def summarize(sizes: org.apache.spark.sql.DataFrame, tag: String) =
        sizes.agg(
          count(lit(1)).as(s"${tag}_groups"),
          sum(col("n")).as(s"${tag}_docs"),
          sum(when(col("n") >= 2, col("n")).otherwise(0L))
            .as(s"${tag}_dup_docs"),
          sum(expr("n * (n - 1) div 2")).as(s"${tag}_pairs"))
      summarize(exactSizes, "exact")
        .crossJoin(broadcast(summarize(percSizes, "perc")))
        .select(col("exact_docs").as("n_docs"),
          col("exact_groups"), col("exact_dup_docs"), col("exact_pairs"),
          col("perc_groups").as("perc_clusters"), col("perc_dup_docs"),
          col("perc_pairs"),
          (col("perc_pairs") - col("exact_pairs")).as("pairs_gained"))
    },
    Some(s"""
      WITH RECURSIVE gpairs0 AS (
        SELECT doc_a, doc_b FROM (WITH $gifFpsCte,
          cnt AS (
            SELECT doc_id, count(*) AS n FROM gfps GROUP BY doc_id),
          m AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              count(*) AS n_match
            FROM gfps a JOIN gfps b
              ON a.frame_idx = b.frame_idx AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3
            GROUP BY 1, 2)
          SELECT m.doc_a, m.doc_b FROM m
          JOIN cnt ca ON ca.doc_id = m.doc_a
          JOIN cnt cb ON cb.doc_id = m.doc_b
          WHERE 2 * m.n_match >= greatest(ca.n, cb.n)) q
      ),
      guniverse AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 4, 6)),
      gedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM gpairs0
        UNION ALL SELECT doc_b, doc_a FROM gpairs0),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM guniverse
        UNION
        SELECT r.doc_id, e.dst FROM reach r
        JOIN gedges e ON e.src = r.via),
      pclusters AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id),
      psizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
        FROM pclusters GROUP BY 1),
      esizes AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM guniverse
        GROUP BY
          (7 * (doc_id % 12) +
            CASE WHEN (doc_id // 12) % 3 = 2 THEN 2 ELSE 0 END) % 4,
          (doc_id // 12) % 3 = 1,
          (doc_id % 12) % 3),
      e AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_groups,
          CAST(sum(n) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
            AS exact_dup_docs,
          CAST(sum(n * (n - 1) // 2) AS BIGINT) AS exact_pairs
        FROM esizes),
      p AS (
        SELECT CAST(count(*) AS BIGINT) AS perc_clusters,
          CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
            AS perc_dup_docs,
          CAST(sum(n * (n - 1) // 2) AS BIGINT) AS perc_pairs
        FROM psizes)
      SELECT e.n_docs, e.exact_groups, e.exact_dup_docs, e.exact_pairs,
        p.perc_clusters, p.perc_dup_docs, p.perc_pairs,
        p.perc_pairs - e.exact_pairs AS pairs_gained
      FROM e, p
    """.trim))

  // --------------------------------------------------------------- q286
  /** q286 — K-PARTITE cross-modal dedup policies (q273's bipartite
    * cell closure generalized to THREE modalities): paired (caption,
    * image, audio) rows — a document with its same-id fixture image
    * AND waveform — scored under every composition policy. The
    * union-dedup decision is the closure of the TRI-partite cell
    * graph: each doc contributes nodes (3·tcid, 3·icid+1, 3·acid+2)
    * and edges text–image and image–audio (the doc chains its own
    * three nodes, so text–audio follows transitively) — |cells|
    * nodes, never doc pairs, the q273 trick at k = 3 (and the
    * construction generalizes to any k: one node family per
    * modality, a spanning path of edge families per doc).
    * Canonicals are JOINT-restricted (min-id member of each cluster
    * within the 3-way-decodable universe); the readout ordering
    * kept_and ≤ union_clusters ≤ min(kept_*) ≤ kept_or is the
    * intersection-over-drops / OR-leaves-dups story at k = 3. */
  val q286: Q = Q(
    "q286_kpartite_dedup_policies",
    (s, d) => {
      val afp = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.audioFingerprints(Multimodal.encodeWaveformFixture(
          Tables.documents(s, d), "doc_id")).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("fp")))
      val audC = Dedup.fingerprintClusters(afp, "doc_id", "fp",
          maxHamming = 3, bits = 64)
        .select(col("doc_id"), col("cluster_id").as("acid"))
      val joint = graft.engine.CacheScope.unmanaged.persist(
        crossModalJoint(s, d).join(audC, Seq("doc_id")))
      val flags = joint
        .join(joint.groupBy(col("tcid"))
          .agg(min(col("doc_id")).as("tmin")), Seq("tcid"))
        .join(joint.groupBy(col("icid"))
          .agg(min(col("doc_id")).as("imin")), Seq("icid"))
        .join(joint.groupBy(col("acid"))
          .agg(min(col("doc_id")).as("amin")), Seq("acid"))
        .select((col("doc_id") === col("tmin")).as("tkeep"),
          (col("doc_id") === col("imin")).as("ikeep"),
          (col("doc_id") === col("amin")).as("akeep"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("tkeep"), 1L).otherwise(0L)).as("kept_text"),
          sum(when(col("ikeep"), 1L).otherwise(0L)).as("kept_image"),
          sum(when(col("akeep"), 1L).otherwise(0L)).as("kept_audio"),
          sum(when(col("tkeep") && col("ikeep") && col("akeep"), 1L)
            .otherwise(0L)).as("kept_and"),
          sum(when(col("tkeep") || col("ikeep") || col("akeep"), 1L)
            .otherwise(0L)).as("kept_or"))
      val cells = joint.select((col("tcid") * 3).as("doc_a"),
          (col("icid") * 3 + 1).as("doc_b")).distinct()
        .unionByName(joint.select((col("icid") * 3 + 1).as("doc_a"),
          (col("acid") * 3 + 2).as("doc_b")).distinct())
      val nodes = cells.select(col("doc_a").as("node"))
        .unionByName(cells.select(col("doc_b").as("node"))).distinct()
      val unionClusters = Dedup.nearDupClusters(nodes, "node", cells)
        .agg(countDistinct(col("cluster_id")).as("union_clusters"))
      flags.crossJoin(broadcast(unionClusters))
        .select(col("n_docs"), col("kept_text"), col("kept_image"),
          col("kept_audio"), col("kept_and"), col("kept_or"),
          col("union_clusters"))
    },
    Some(s"""
      WITH RECURSIVE $crossModalJointOracleSql,
      apairs AS (
        SELECT doc_a, doc_b FROM ($envelopePairsOracleSql) aq),
      aedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM apairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM apairs),
      auniverse AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      areach(id, r) AS (
        SELECT doc_id, doc_id FROM auniverse
        UNION
        SELECT e.dst, areach.r FROM areach JOIN aedges e
          ON e.src = areach.id),
      aclusters AS (SELECT id, min(r) AS acid FROM areach GROUP BY id),
      j3 AS (
        SELECT id, tcid, icid, acid
        FROM jsz JOIN aclusters USING (id)),
      t3 AS (SELECT tcid, min(id) AS tmin FROM j3 GROUP BY 1),
      i3 AS (SELECT icid, min(id) AS imin FROM j3 GROUP BY 1),
      a3 AS (SELECT acid, min(id) AS amin FROM j3 GROUP BY 1),
      f AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN id = tmin THEN 1 ELSE 0 END) AS BIGINT)
            AS kept_text,
          CAST(sum(CASE WHEN id = imin THEN 1 ELSE 0 END) AS BIGINT)
            AS kept_image,
          CAST(sum(CASE WHEN id = amin THEN 1 ELSE 0 END) AS BIGINT)
            AS kept_audio,
          CAST(sum(CASE WHEN id = tmin AND id = imin AND id = amin
            THEN 1 ELSE 0 END) AS BIGINT) AS kept_and,
          CAST(sum(CASE WHEN id = tmin OR id = imin OR id = amin
            THEN 1 ELSE 0 END) AS BIGINT) AS kept_or
        FROM j3 JOIN t3 USING (tcid) JOIN i3 USING (icid)
        JOIN a3 USING (acid)),
      kedges AS (
        SELECT DISTINCT 3 * tcid AS src, 3 * icid + 1 AS dst FROM j3
        UNION ALL
        SELECT DISTINCT 3 * icid + 1 AS src, 3 * tcid AS dst FROM j3
        UNION ALL
        SELECT DISTINCT 3 * icid + 1 AS src, 3 * acid + 2 AS dst
        FROM j3
        UNION ALL
        SELECT DISTINCT 3 * acid + 2 AS src, 3 * icid + 1 AS dst
        FROM j3),
      knodes AS (
        SELECT DISTINCT src AS node FROM kedges
        UNION SELECT DISTINCT dst FROM kedges),
      kreach(node, r) AS (
        SELECT node, node FROM knodes
        UNION
        SELECT e.dst, kreach.r FROM kreach JOIN kedges e
          ON e.src = kreach.node),
      u AS (
        SELECT CAST(count(DISTINCT lbl) AS BIGINT) AS union_clusters
        FROM (SELECT node, min(r) AS lbl FROM kreach GROUP BY node))
      SELECT f.n_docs, f.kept_text, f.kept_image, f.kept_audio,
        f.kept_and, f.kept_or, u.union_clusters
      FROM f, u
    """.trim))

  // --------------------------------------------------------------- q290
  /** q290 — AUDIO ENERGY SEGMENTATION ([[Multimodal
    * .audioEnergySegments]] over [[Multimodal.audioWindowEnergies]]):
    * the VAD-shaped readout a speech pipeline runs before paying ASR
    * — label windows quiet/loud by an integer threshold on the exact
    * mean-abs amplitude, group consecutive same-label windows into
    * segments. Runs on the SEGMENTED waveform fixture (alternating
    * loud/quiet spans whose window amplitudes are pure id
    * arithmetic), so the oracle replays the whole segment table —
    * span lengths via a prefix sum over the replayed segment lens —
    * with no decode. Corrupt families contribute no rows. */
  val q290: Q = Q(
    "q290_audio_energy_segments",
    (s, d) =>
      Multimodal.audioEnergySegments(
        Multimodal.audioWindowEnergies(
          Multimodal.encodeSegmentedWaveformFixture(
            Tables.documents(s, d), "doc_id")).toDF(),
        "doc_id", "w", "amp", quietBelow = 500L),
    Some("""
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      segs AS (
        SELECT doc_id, CAST(u.k AS BIGINT) AS seg_idx,
          CAST(2 + (doc_id + u.k) % 3 AS BIGINT) AS len,
          u.k % 2 = 1 AS is_quiet
        FROM ids, LATERAL unnest(range(2 + doc_id % 4)) AS u(k)),
      spans AS (
        SELECT doc_id, seg_idx, len, is_quiet,
          CAST(coalesce(sum(len) OVER (PARTITION BY doc_id
            ORDER BY seg_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_w
        FROM segs)
      SELECT doc_id, seg_idx, start_w,
        start_w + len - 1 AS end_w, len AS n_windows, is_quiet
      FROM spans ORDER BY doc_id, seg_idx
    """.trim))

  // --------------------------------------------------------------- q291
  /** q291 — segment-adaptive AUDIO excerpt schedule
    * ([[Multimodal.audioExcerptSchedule]] ∘ q290 — the audio sibling
    * of q283's shot-adaptive plan): a per-recording budget of 4
    * window seeks split across the LOUD segments in proportion to
    * length (quiet segments get none — excerpt speech, skip
    * silence), each segment seeked at its positional midpoints in
    * pure integer arithmetic. The oracle replays segments, loud
    * totals, allocation, and midpoints from the fixture's id
    * arithmetic. */
  val q291: Q = Q(
    "q291_audio_excerpt_schedule",
    (s, d) =>
      Multimodal.audioExcerptSchedule(
        Multimodal.audioEnergySegments(
          Multimodal.audioWindowEnergies(
            Multimodal.encodeSegmentedWaveformFixture(
              Tables.documents(s, d), "doc_id")).toDF(),
          "doc_id", "w", "amp", quietBelow = 500L), k = 4),
    Some("""
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      segs AS (
        SELECT doc_id, CAST(u.k AS BIGINT) AS seg_idx,
          CAST(2 + (doc_id + u.k) % 3 AS BIGINT) AS len,
          u.k % 2 = 1 AS is_quiet
        FROM ids, LATERAL unnest(range(2 + doc_id % 4)) AS u(k)),
      spans AS (
        SELECT doc_id, seg_idx, len, is_quiet,
          CAST(coalesce(sum(len) OVER (PARTITION BY doc_id
            ORDER BY seg_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_w
        FROM segs),
      loud AS (SELECT * FROM spans WHERE NOT is_quiet),
      tot AS (
        SELECT doc_id, CAST(sum(len) AS BIGINT) AS f
        FROM loud GROUP BY 1),
      alloc AS (
        SELECT loud.doc_id, seg_idx, start_w, len,
          CAST(least(len, greatest(1, (4 * len) // f)) AS BIGINT)
            AS k_s
        FROM loud JOIN tot USING (doc_id))
      SELECT doc_id, seg_idx, CAST(u.j AS BIGINT) AS sample_idx,
        start_w + (len * (2 * u.j + 1)) // (2 * k_s) AS w
      FROM alloc, LATERAL unnest(range(k_s)) AS u(j)
      ORDER BY doc_id, seg_idx, sample_idx
    """.trim))

  // --------------------------------------------------------------- q292
  /** q292 — IMAGE QUALITY GATES ([[Multimodal.imageQualityGates]]):
    * the keep/drop pre-filter an image-corpus team runs before any
    * expensive downstream work — too-small thumbnails, extreme-
    * aspect banner strips, and FLAT (zero-dHash-gradient) solids all
    * drop, in ONE decode pass per payload. The quality fixture's
    * five families make every gate id arithmetic: a patterned
    * keeper, a flat solid, a flat thumbnail (two gates at once), a
    * 1024-px banner strip sitting exactly AT the minPx boundary (so
    * only the aspect gate trips — the boundary is the test), and a
    * zeroed-magic family contributing no rows. */
  val q292: Q = Q(
    "q292_image_quality_gates",
    (s, d) =>
      Multimodal.imageQualityGates(
        Multimodal.encodeQualityImageFixture(
          Tables.documents(s, d), "doc_id"))
        .toDF().orderBy(col("doc_id")),
    Some("""
      WITH ids AS (
        SELECT doc_id, doc_id % 5 AS fam FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id % 5 < 4)
      SELECT doc_id,
        CAST(CASE fam WHEN 2 THEN 16 WHEN 3 THEN 128 ELSE 72 END
          AS BIGINT) AS width,
        CAST(CASE fam WHEN 2 THEN 8 WHEN 3 THEN 8 ELSE 64 END
          AS BIGINT) AS height,
        fam <> 0 AS flat,
        fam = 2 AS too_small,
        fam = 3 AS extreme_aspect,
        fam = 0 AS keep
      FROM ids ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q293
  /** q293 — AUDIO QUALITY GATES ([[Multimodal.audioQualityGates]] ∘
    * q290): the keep/drop pre-filter completing the per-modality
    * gate symmetry (text q23, image q292, audio here) — too-short
    * clips and mostly-silence recordings drop, with the quiet-share
    * boundary CROSS-MULTIPLIED so it is integer-exact. The oracle
    * replays window totals and quiet masses from the segmented
    * fixture's id arithmetic. */
  val q293: Q = Q(
    "q293_audio_quality_gates",
    (s, d) =>
      Multimodal.audioQualityGates(
        Multimodal.audioEnergySegments(
          Multimodal.audioWindowEnergies(
            Multimodal.encodeSegmentedWaveformFixture(
              Tables.documents(s, d), "doc_id")).toDF(),
          "doc_id", "w", "amp", quietBelow = 500L),
        minWindows = 8L, maxQuietNum = 1, maxQuietDen = 2),
    Some("""
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      segs AS (
        SELECT doc_id, CAST(2 + (doc_id + u.k) % 3 AS BIGINT) AS len,
          u.k % 2 = 1 AS is_quiet
        FROM ids, LATERAL unnest(range(2 + doc_id % 4)) AS u(k)),
      folds AS (
        SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_windows,
          CAST(sum(CASE WHEN is_quiet THEN len ELSE 0 END) AS BIGINT)
            AS quiet_windows
        FROM segs GROUP BY 1)
      SELECT doc_id, n_windows, quiet_windows,
        n_windows < 8 AS too_short,
        quiet_windows * 2 > n_windows AS mostly_quiet,
        NOT (n_windows < 8) AND NOT (quiet_windows * 2 > n_windows)
          AS keep
      FROM folds ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q296
  /** q296 — AUDIO decontamination gate
    * ([[Dedup.fingerprintDecontam]] on the envelope-hash rung): the
    * q295 gate is fingerprint-generic by construction — here it
    * flags train recordings whose energy envelope sits within
    * Hamming ≤ 3 of any eval-set recording (a benchmark clip leaked
    * as a volume-renormalized re-encode byte-compares different but
    * keeps its envelope shape). Eval = waveform-fixture ids ≡ 0
    * (mod 4); oracle brute-forces the cross Hamming join over the
    * replayed envelope hashes with the same min-then-min witness
    * fold. */
  val q296: Q = Q(
    "q296_audio_decontam_gate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def fp(part: org.apache.spark.sql.DataFrame) =
        graft.engine.CacheScope.unmanaged.persist(
          Multimodal.audioFingerprints(Multimodal.encodeWaveformFixture(
            part, "doc_id")).toDF()
            .where(col("ok") === 1L)
            .select(col("doc_id"), col("fp")))
      Dedup.fingerprintDecontam(
        fp(docs.where(col("doc_id") % 4 =!= 0)),
        fp(docs.where(col("doc_id") % 4 === 0)),
        "doc_id", "fp", maxHamming = 3, bits = 64)
    },
    Some("""
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      cells AS (
        SELECT doc_id, CAST(u.w AS BIGINT) AS w,
          CAST(500 + ((doc_id % 21 + u.w) % 7) * 300 +
            CASE WHEN u.w = 0 AND (doc_id // 21) % 2 = 1
                 THEN 400 ELSE 0 END AS BIGINT) AS a
        FROM ids, LATERAL unnest(range(65)) AS u(w)),
      bits AS (
        SELECT x.doc_id, CAST(x.w AS INT) AS b
        FROM cells x JOIN cells n
          ON n.doc_id = x.doc_id AND n.w = x.w + 1
        WHERE n.a > x.a),
      fp AS (
        SELECT i.doc_id,
          CAST(coalesce(sum(CASE WHEN b.b = 63
            THEN -9223372036854775808
            ELSE (1::BIGINT << b.b) END), 0) AS BIGINT) AS fp
        FROM ids i LEFT JOIN bits b USING (doc_id)
        GROUP BY i.doc_id),
      pairs AS (
        SELECT t.doc_id, e.doc_id AS eval_id,
          CAST(bit_count(xor(t.fp, e.fp)) AS INT) AS h
        FROM fp t JOIN fp e
          ON t.doc_id % 4 <> 0 AND e.doc_id % 4 = 0
        WHERE bit_count(xor(t.fp, e.fp)) <= 3),
      mh AS (SELECT doc_id, min(h) AS hamming FROM pairs GROUP BY 1),
      w AS (
        SELECT p.doc_id, mh.hamming, min(p.eval_id) AS eval_id
        FROM pairs p JOIN mh
          ON mh.doc_id = p.doc_id AND p.h = mh.hamming
        GROUP BY 1, 2)
      SELECT doc_id, hamming, eval_id FROM w ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q297
  /** q297 — VIDEO sequence decontamination gate
    * ([[Dedup.alignedFingerprintDecontam]]): an eval video leaked
    * into training as a re-encode/remux byte-compares different AND
    * escapes the single-fingerprint gates (q295 sees stills, q296
    * whole-clip envelopes) — here a train video is flagged when ≥
    * half the longer side's positions carry dHashes within Hamming
    * ≤ 3 of one eval video at the SAME frame index, with the
    * deterministic witness (most matched positions, ties to the
    * smallest eval id). Split: eval = fixture ids ≡ 0 (mod 4) —
    * the shared (g, variant) classes guarantee exact and one-bit
    * leaks across the split, and the dropped-frame family exercises
    * the missing-position tolerance. Oracle brute-forces the aligned
    * train × eval Hamming join over the replayed fps and re-derives
    * the witness with a max-then-min fold. */
  val q297: Q = Q(
    "q297_video_decontam_gate",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.alignedFingerprintDecontam(
        fps.where(col("doc_id") % 4 =!= 0),
        fps.where(col("doc_id") % 4 === 0),
        "doc_id", "frame_idx", "fp", maxHamming = 3, bits = 64)
    },
    Some(s"""
      WITH $mjpegFpsCte,
      okf AS (
        SELECT doc_id, frame_idx, fp FROM fps
        WHERE NOT (doc_id % 10 = 9 AND frame_idx = 1)),
      tr AS (SELECT * FROM okf WHERE doc_id % 4 <> 0),
      ev AS (SELECT * FROM okf WHERE doc_id % 4 = 0),
      tc AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY 1),
      ec AS (SELECT doc_id, count(*) AS n FROM ev GROUP BY 1),
      m AS (
        SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_match
        FROM tr t JOIN ev e ON t.frame_idx = e.frame_idx
        WHERE bit_count(xor(t.fp, e.fp)) <= 3
        GROUP BY 1, 2),
      pass AS (
        SELECT m.doc_id, m.eval_id, m.n_match, tc.n AS n_frames
        FROM m JOIN tc ON tc.doc_id = m.doc_id
        JOIN ec ON ec.doc_id = m.eval_id
        WHERE 2 * m.n_match >= greatest(tc.n, ec.n)),
      best AS (SELECT doc_id, max(n_match) AS n_match
        FROM pass GROUP BY 1),
      w AS (
        SELECT p.doc_id, p.n_match, p.n_frames,
          min(p.eval_id) AS eval_id
        FROM pass p JOIN best b
          ON b.doc_id = p.doc_id AND p.n_match = b.n_match
        GROUP BY 1, 2, 3)
      SELECT w.doc_id, CAST(w.n_match AS BIGINT) AS n_match,
        CAST(w.n_frames AS BIGINT) AS n_frames, w.eval_id,
        CAST(ec.n AS BIGINT) AS n_frames_eval
      FROM w JOIN ec ON ec.doc_id = w.eval_id
      ORDER BY w.doc_id
    """.trim))

  // --------------------------------------------------------------- q298
  /** q298 — GIF sequence decontamination gate: q297's decision
    * applied unchanged to the GIF rung (the operator is
    * sequence-generic; GIF is lossless so the oracle replay is
    * bit-exact with no codec argument) — an eval GIF leaked as a
    * palette-shuffled or re-muxed copy keeps its per-frame dHash
    * stream and is caught here; static GIFs degenerate to
    * single-position sequences and still gate under the half-share
    * rule. Same eval ≡ 0 (mod 4) split and witness fold. */
  val q298: Q = Q(
    "q298_gif_decontam_gate",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.gifFrameFingerprints(
          Multimodal.encodeGifFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.alignedFingerprintDecontam(
        fps.where(col("doc_id") % 4 =!= 0),
        fps.where(col("doc_id") % 4 === 0),
        "doc_id", "frame_idx", "fp", maxHamming = 3, bits = 64)
    },
    Some(s"""
      WITH $gifFpsCte,
      tr AS (SELECT * FROM gfps WHERE doc_id % 4 <> 0),
      ev AS (SELECT * FROM gfps WHERE doc_id % 4 = 0),
      tc AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY 1),
      ec AS (SELECT doc_id, count(*) AS n FROM ev GROUP BY 1),
      m AS (
        SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_match
        FROM tr t JOIN ev e ON t.frame_idx = e.frame_idx
        WHERE bit_count(xor(t.fp, e.fp)) <= 3
        GROUP BY 1, 2),
      pass AS (
        SELECT m.doc_id, m.eval_id, m.n_match, tc.n AS n_frames
        FROM m JOIN tc ON tc.doc_id = m.doc_id
        JOIN ec ON ec.doc_id = m.eval_id
        WHERE 2 * m.n_match >= greatest(tc.n, ec.n)),
      best AS (SELECT doc_id, max(n_match) AS n_match
        FROM pass GROUP BY 1),
      w AS (
        SELECT p.doc_id, p.n_match, p.n_frames,
          min(p.eval_id) AS eval_id
        FROM pass p JOIN best b
          ON b.doc_id = p.doc_id AND p.n_match = b.n_match
        GROUP BY 1, 2, 3)
      SELECT w.doc_id, CAST(w.n_match AS BIGINT) AS n_match,
        CAST(w.n_frames AS BIGINT) AS n_frames, w.eval_id,
        CAST(ec.n AS BIGINT) AS n_frames_eval
      FROM w JOIN ec ON ec.doc_id = w.eval_id
      ORDER BY w.doc_id
    """.trim))

  // --------------------------------------------------------------- q299
  /** q299 — VIDEO QUALITY GATES ([[Multimodal.videoQualityGates]] ∘
    * q277 ∘ q209's RIFF tier): the keep/drop pre-filter CLOSING the
    * per-modality gate symmetry (text q23, image q292, audio q293,
    * video here) — too-short clips (observed frames, never the
    * header's claim), thumbnail-resolution video, and all-static
    * dead clips (one q281 shot AND zero gradient bits — a
    * static-camera SCENE survives, solid nothing drops). One frame
    * decode pass feeds both the shot labels and the gradient fold;
    * the container dims are header byte arithmetic. The oracle
    * replays the whole decision table from the fixture's `id % 5`
    * family arithmetic. */
  val q299: Q = Q(
    "q299_video_quality_gates",
    (s, d) => {
      val media = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.encodeQualityMjpegFixture(
          Tables.documents(s, d), "doc_id").toDF())
      val asM = media.as[Multimodal.MediaRecord](
        Multimodal.mediaRecordEnc)
      Multimodal.videoQualityGates(
        Multimodal.videoFrameFingerprints(asM).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")),
        Multimodal.decodeMjpegMeta(asM).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("width"), col("height")))
    },
    Some("""
      WITH ids AS (
        SELECT doc_id, doc_id % 5 AS fam FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id % 5 < 4)
      SELECT doc_id,
        CAST(CASE fam WHEN 2 THEN 2 ELSE 6 END AS BIGINT) AS n_frames,
        CAST(CASE fam WHEN 3 THEN 24 ELSE 72 END AS BIGINT) AS width,
        CAST(CASE fam WHEN 3 THEN 16 ELSE 64 END AS BIGINT) AS height,
        fam = 2 AS too_short,
        fam = 3 AS tiny,
        fam IN (1, 3) AS all_static,
        fam = 0 AS keep
      FROM ids ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q300
  /** q300 — AUDIO cluster keep-best ([[Multimodal.keepBest]] ∘ q266):
    * q294's best-copy refinement generalized off the image rung — an
    * audio near-dup family keeps its highest-SAMPLE-RATE member
    * (then most frames, ties to the smallest id), never an arbitrary
    * min-id canonical that might be the worst encode. The fixture
    * declares a rate of `8000 + (id%3)·4000` Hz over PCM whose
    * envelope hash is rate-independent, so dup families span rates
    * and the argmax is pinned non-degenerately (best ≠ min id in
    * most clusters). Oracle: q266's recursive closure + the rate
    * arithmetic. */
  val q300: Q = Q(
    "q300_audio_cluster_keep_best",
    (s, d) => {
      val media = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.encodeWaveformFixture(Tables.documents(s, d),
          "doc_id", rateOf = id => (8000L + (id % 3) * 4000L).toFloat)
          .toDF())
      val asM = media.as[Multimodal.MediaRecord](
        Multimodal.mediaRecordEnc)
      val fp = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.audioFingerprints(asM).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("fp")))
      Multimodal.keepBest(
        Dedup.fingerprintClusters(fp, "doc_id", "fp",
          maxHamming = 3, bits = 64),
        Multimodal.decodeAudioMeta(asM).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("sample_rate"), col("n_frames")),
        Seq("sample_rate", "n_frames"))
    },
    Some(s"""
      WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ($envelopePairsOracleSql) q
      ),
      universe AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM universe
        UNION
        SELECT r.doc_id, e.dst FROM reach r
        JOIN edges e ON e.src = r.via),
      cl AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id),
      qual AS (
        SELECT doc_id,
          CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS rate
        FROM universe),
      mx AS (
        SELECT cl.cluster_id, max(qual.rate) AS mr
        FROM cl JOIN qual USING (doc_id) GROUP BY 1),
      best AS (
        SELECT cl.cluster_id, min(cl.doc_id) AS best_id
        FROM cl JOIN qual USING (doc_id)
        JOIN mx ON mx.cluster_id = cl.cluster_id
          AND qual.rate = mx.mr
        GROUP BY 1)
      SELECT cl.doc_id, cl.cluster_id, best.best_id,
        cl.doc_id = best.best_id AS is_best
      FROM cl JOIN best USING (cluster_id)
      ORDER BY cl.doc_id
    """.trim))

  // --------------------------------------------------------------- q301
  /** q301 — VIDEO cluster keep-best ([[Multimodal.keepBest]] ∘ q279):
    * an aligned-sequence dup family keeps its MOST-DECODED-FRAMES
    * member — the fixture's zeroed-SOI family (`id%10 = 9`) loses one
    * frame yet still chains into its family (n−1 aligned matches ≥
    * half), so a min-id canonical can be the DAMAGED copy; the argmax
    * on observed frame count picks the intact one (pinning the fold
    * non-degenerately: damaged members hold min id in some families).
    * Quality is read off the ALREADY-COMPUTED fingerprint frame —
    * zero extra decode. Oracle: q278/q279's pair+closure replay +
    * the observed-count arithmetic. */
  val q301: Q = Q(
    "q301_video_cluster_keep_best",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Multimodal.keepBest(
        Dedup.alignedFingerprintClusters(fps, "doc_id", "frame_idx",
          "fp", maxHamming = 3, bits = 64),
        fps.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_obs")),
        Seq("n_obs"))
    },
    Some(s"""
      WITH RECURSIVE vpairs AS (
        SELECT doc_a, doc_b FROM ($videoPairsOracleSql) q
      ),
      vuniverse AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      vedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM vpairs
        UNION ALL SELECT doc_b, doc_a FROM vpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM vuniverse
        UNION
        SELECT r.doc_id, e.dst FROM reach r
        JOIN vedges e ON e.src = r.via),
      cl AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id),
      qual AS (
        SELECT doc_id,
          CAST(4 + (doc_id % 12) % 5
            - CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END
            AS BIGINT) AS n_obs
        FROM vuniverse),
      mx AS (
        SELECT cl.cluster_id, max(qual.n_obs) AS mn
        FROM cl JOIN qual USING (doc_id) GROUP BY 1),
      best AS (
        SELECT cl.cluster_id, min(cl.doc_id) AS best_id
        FROM cl JOIN qual USING (doc_id)
        JOIN mx ON mx.cluster_id = cl.cluster_id
          AND qual.n_obs = mx.mn
        GROUP BY 1)
      SELECT cl.doc_id, cl.cluster_id, best.best_id,
        cl.doc_id = best.best_id AS is_best
      FROM cl JOIN best USING (cluster_id)
      ORDER BY cl.doc_id
    """.trim))

  // --------------------------------------------------------------- q302
  /** q302 — GIF cluster keep-best ([[Multimodal.keepBest]] ∘ q285):
    * the same argmax on the second multi-frame coding — quality =
    * observed frame count off the already-computed fingerprint frame
    * (the fixture's families share frame counts, so this pins the
    * GIF plumbing and the ties-to-min-id edge of the fold; the
    * argmax itself is pinned non-degenerately by q300/q301 — one
    * shared implementation). Oracle: q285's pair+closure replay +
    * the frame-count arithmetic. */
  val q302: Q = Q(
    "q302_gif_cluster_keep_best",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.gifFrameFingerprints(
          Multimodal.encodeGifFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Multimodal.keepBest(
        Dedup.alignedFingerprintClusters(fps, "doc_id", "frame_idx",
          "fp", maxHamming = 3, bits = 64),
        fps.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_obs")),
        Seq("n_obs"))
    },
    Some(s"""
      WITH RECURSIVE $gifFpsCte,
      cnt AS (SELECT doc_id, count(*) AS n FROM gfps GROUP BY doc_id),
      m AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_match
        FROM gfps a JOIN gfps b
          ON a.frame_idx = b.frame_idx AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
        GROUP BY 1, 2),
      gpairs AS (
        SELECT doc_a, doc_b FROM m
        JOIN cnt ca ON ca.doc_id = m.doc_a
        JOIN cnt cb ON cb.doc_id = m.doc_b
        WHERE 2 * m.n_match >= greatest(ca.n, cb.n)),
      guniverse AS (SELECT DISTINCT doc_id FROM gfps),
      gedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM gpairs
        UNION ALL SELECT doc_b, doc_a FROM gpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM guniverse
        UNION
        SELECT r.doc_id, e.dst FROM reach r
        JOIN gedges e ON e.src = r.via),
      cl AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id),
      mx AS (
        SELECT cl.cluster_id, max(cnt.n) AS mn
        FROM cl JOIN cnt USING (doc_id) GROUP BY 1),
      best AS (
        SELECT cl.cluster_id, min(cl.doc_id) AS best_id
        FROM cl JOIN cnt USING (doc_id)
        JOIN mx ON mx.cluster_id = cl.cluster_id
          AND cnt.n = mx.mn
        GROUP BY 1)
      SELECT cl.doc_id, cl.cluster_id, best.best_id,
        cl.doc_id = best.best_id AS is_best
      FROM cl JOIN best USING (cluster_id)
      ORDER BY cl.doc_id
    """.trim))

  // --------------------------------------------------------------- q303
  /** q303 — ISO-BMFF exact-tier METADATA readout
    * ([[Multimodal.decodeIsoMeta]]): the q209 box walk extended
    * through HEIF's `meta`(FullBox)→`iprp`→`ipco`→`ispe` for still
    * pixel dimensions and reusing `moov`→`mvhd` for M4A/isom
    * duration — the catalog distributions that drive training
    * decisions, previously absent for exactly the brand-routed
    * classes (the r17 verdict's missing readout). The oracle replays
    * every field from the fixture's byte arithmetic: brand by the
    * `id % 5` cycle, duration `500 + (id%50)·100` ms at timescale
    * 1000, dims `(64 + (id%9)·16) × (48 + (id%7)·16)`, the zeroed-
    * ftyp family `ok = 0` all-null. */
  val q303: Q = Q(
    "q303_iso_meta_readout",
    (s, d) =>
      Multimodal.decodeIsoMeta(
        Multimodal.encodeIsoMetaFixture(Tables.documents(s, d),
          "doc_id"))
        .toDF().orderBy(col("doc_id")),
    Some("""
      WITH ids AS (
        SELECT doc_id, doc_id % 5 AS fam,
          doc_id % 10 IN (3, 4) AS corrupt
        FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0)
      SELECT doc_id,
        CAST(CASE WHEN corrupt THEN 0 ELSE 1 END AS BIGINT) AS ok,
        CASE WHEN corrupt THEN NULL
             WHEN fam = 0 THEN 'M4A ' WHEN fam = 1 THEN 'heic'
             WHEN fam = 2 THEN 'mif1' WHEN fam = 3 THEN 'avif'
             ELSE 'isom' END AS brand,
        CASE WHEN corrupt OR fam IN (1, 2, 3) THEN NULL
             ELSE CAST(500 + (doc_id % 50) * 100 AS BIGINT)
        END AS duration_ms,
        CASE WHEN corrupt OR fam NOT IN (1, 2, 3) THEN NULL
             ELSE CAST(64 + (doc_id % 9) * 16 AS BIGINT) END AS width,
        CASE WHEN corrupt OR fam NOT IN (1, 2, 3) THEN NULL
             ELSE CAST(48 + (doc_id % 7) * 16 AS BIGINT) END AS height
      FROM ids ORDER BY doc_id
    """.trim))

  /** Shared oracle CTE of the clip rung (q305/q306): replay
    * [[Multimodal.encodeClipMjpegFixture]]'s per-frame dHash as pure
    * id arithmetic — id records reel `g = id % G` from offset
    * `(id div G) % 5` for `5 + id % 3` frames, where `G =
    * greatest(64, N div 64)` is the corpus-scaled reel count
    * ([[Multimodal.clipReels]] — N counts the fixture's id universe
    * BEFORE the corruption family, so both engines agree), row `r`
    * at reel position `pos` carrying pattern byte
    * `P[((h·(2r+3)) % 1000003) % 4]` with
    * `h = (g·1500450271 + pos·2654435761) % 1000003` (multiplicative
    * in `r` — the additive mix collapsed mod 4, see
    * [[Multimodal.encodeClipMjpegFixture]]), composed
    * with the bit-63 MIN_BIGINT trick; `id % 10 = 3` zeroes the
    * magic (no rows). Then the 3-gram shingles positionally.
    * Parameterized on the multiplier offset (`2r+3` = the MJPEG clip
    * fixture, `2r+5` = the GIF one — q311/q312 share everything
    * else). */
  private def clipShinglesCte: String = clipShinglesCteFor(3)

  private def clipShinglesCteFor(rOff: Int): String = s"""
      gv AS (
        SELECT greatest(64, count(*) // 64) AS ng FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0),
      clipids AS (
        SELECT doc_id, doc_id % ng AS g, (doc_id // ng) % 5 AS o,
          5 + doc_id % 3 AS len
        FROM documents, gv
        WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id % 10 <> 3),
      cframes AS (
        SELECT doc_id, f.f AS frame_idx, g, o + f.f AS pos
        FROM clipids, (SELECT unnest(range(7)) AS f) f
        WHERE f.f < len),
      crows AS (
        SELECT doc_id, frame_idx, r.r AS r,
          CASE CAST((((g * 1500450271 + pos * 2654435761) % 1000003)
              * (2 * r.r + $rOff)) % 1000003 % 4 AS INT)
            WHEN 0 THEN 85 WHEN 1 THEN 170 WHEN 2 THEN 43
            ELSE 212 END AS pb
        FROM cframes, (SELECT unnest(range(8)) AS r) r),
      cfps AS (
        SELECT doc_id, frame_idx,
          CAST(sum(CASE WHEN r = 7 AND pb >= 128
            THEN -9223372036854775808 + ((pb % 128)::BIGINT << 56)
            ELSE pb::BIGINT << (8 * r) END) AS BIGINT) AS fp
        FROM crows GROUP BY doc_id, frame_idx),
      r AS (
        SELECT doc_id, fp, row_number() OVER (
          PARTITION BY doc_id ORDER BY frame_idx) AS rn
        FROM cfps),
      sh AS (
        SELECT DISTINCT a.doc_id, a.fp AS f0, b.fp AS f1, c.fp AS f2
        FROM r a
        JOIN r b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
        JOIN r c ON c.doc_id = a.doc_id AND c.rn = a.rn + 2),
      dfc AS (
        SELECT f0, f1, f2, count(*) AS d FROM sh GROUP BY 1, 2, 3),
      cold AS (
        SELECT sh.doc_id, sh.f0, sh.f1, sh.f2
        FROM sh JOIN dfc USING (f0, f1, f2) WHERE dfc.d <= 100)"""

  // --------------------------------------------------------------- q305
  /** q305 — VIDEO CLIP containment
    * ([[Dedup.sequenceShingleContainment]]): the OFFSET-TOLERANT
    * dedup rung q278's aligned matcher cannot cover — a TRIMMED
    * re-upload (intro cut, clip embedded mid-video) shifts every
    * frame index and escapes same-index matching entirely; here the
    * per-frame dHash streams are 3-gram shingled over observed
    * frames and pairs flag on sharing ≥ half the smaller side's
    * distinct shingles (q100's containment decision on fingerprint
    * sequences). The CLIP fixture makes the relationship genuine:
    * same-reel ids record overlapping WINDOWS at different offsets,
    * aperiodic frame content keeps shingle df under the cap. Oracle
    * replays shingles positionally and brute-forces the capped
    * inverted index. */
  val q305: Q = Q(
    "q305_video_clip_containment",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeClipMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.sequenceShingleContainment(fps, "doc_id", "frame_idx",
        "fp", k = 3, minSharedNum = 1, minSharedDen = 2, maxDf = 100L)
    },
    Some(s"""
      WITH $clipShinglesCte,
      sz AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
      i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM cold a JOIN cold b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b, CAST(i.n_shared AS BIGINT) AS n_shared,
        CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
      FROM i
      JOIN sz sa ON sa.doc_id = i.doc_a
      JOIN sz sb ON sb.doc_id = i.doc_b
      WHERE 2 * i.n_shared >= least(sa.n, sb.n)
      ORDER BY i.doc_a, i.doc_b
    """.trim))

  // --------------------------------------------------------------- q306
  /** q306 — TRIMMED-clip decontamination gate
    * ([[Dedup.sequenceShingleDecontam]] — q305's eval-restricted
    * asymmetry): an eval VIDEO leaked into training as a trimmed or
    * embedded clip shifts every frame index and escapes q297's
    * aligned gate entirely; here a train video flags when it carries
    * ≥ half of some eval clip's distinct 3-gram shingles (normalized
    * by the EVAL side — "how much of the benchmark appears here"),
    * with the deterministic witness (most shared, ties to smallest
    * eval id). Split: eval = OFFSET-BLOCK `(id div G) ≡ 0 (mod 4)` — a
    * reel-independent split (the quotient `id div G` varies within
    * every reel), so every reel carries BOTH eval and train windows
    * and genuine nonzero-offset leaks cross the split (an id-mod
    * split would partition BY reel — measured empty). Oracle replays
    * the capped inverted index and the witness fold positionally. */
  val q306: Q = Q(
    "q306_clip_decontam_gate",
    (s, d) => {
      val reels = Multimodal.clipReels(Tables.documents(s, d), "doc_id")
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeClipMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.sequenceShingleDecontam(
        fps.where(expr(s"(doc_id div $reels) % 4") =!= 0),
        fps.where(expr(s"(doc_id div $reels) % 4") === 0),
        "doc_id", "frame_idx", "fp", k = 3,
        minSharedNum = 1, minSharedDen = 2, maxDf = 100L)
    },
    Some(s"""
      WITH $clipShinglesCte,
      tr AS (SELECT c.* FROM cold c, gv WHERE (doc_id // ng) % 4 <> 0),
      ev AS (SELECT c.* FROM cold c, gv WHERE (doc_id // ng) % 4 = 0),
      tsz AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY 1),
      esz AS (SELECT doc_id, count(*) AS n FROM ev GROUP BY 1),
      m AS (
        SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_shared
        FROM tr t JOIN ev e
          ON t.f0 = e.f0 AND t.f1 = e.f1 AND t.f2 = e.f2
        GROUP BY 1, 2),
      pass AS (
        SELECT m.doc_id, m.eval_id, m.n_shared, esz.n AS ne
        FROM m JOIN esz ON esz.doc_id = m.eval_id
        WHERE 2 * m.n_shared >= esz.n),
      best AS (
        SELECT doc_id, max(n_shared) AS n_shared FROM pass GROUP BY 1),
      w AS (
        SELECT p.doc_id, p.n_shared, min(p.eval_id) AS eval_id
        FROM pass p JOIN best b
          ON b.doc_id = p.doc_id AND p.n_shared = b.n_shared
        GROUP BY 1, 2)
      SELECT w.doc_id, CAST(w.n_shared AS BIGINT) AS n_shared,
        CAST(tsz.n AS BIGINT) AS n_shingles, w.eval_id,
        CAST(esz.n AS BIGINT) AS n_shingles_eval
      FROM w
      JOIN tsz ON tsz.doc_id = w.doc_id
      JOIN esz ON esz.doc_id = w.eval_id
      ORDER BY w.doc_id
    """.trim))

  // --------------------------------------------------------------- q307
  /** q307 — AUDIO clip containment
    * ([[Dedup.sequenceShingleContainment]] on the window-energy
    * stream): the offset-tolerant rung on the SECOND modality — a
    * trimmed audio re-upload (intro cut, excerpt embedded) shifts
    * every window index and escapes both the whole-clip envelope
    * hash (q262 fingerprints the first 65 windows) and any aligned
    * matcher; here the per-window mean-abs energies shingle as exact
    * 3-grams and pairs flag on sharing ≥ half the smaller side's
    * shingles. Trims are window-aligned by the fixture (the
    * documented granularity of energy matching). Oracle replays the
    * aperiodic amplitude arithmetic and the capped inverted index —
    * energy streams are dense (w = 0..n−1), so shingles join on
    * w+1/w+2 directly. */
  val q307: Q = Q(
    "q307_audio_clip_containment",
    (s, d) => {
      val en = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.audioWindowEnergies(
          Multimodal.encodeClipWaveformFixture(Tables.documents(s, d),
            "doc_id")).toDF()
          .select(col("doc_id"), col("w"), col("amp")))
      Dedup.sequenceShingleContainment(en, "doc_id", "w", "amp",
        k = 3, minSharedNum = 1, minSharedDen = 2, maxDf = 100L)
    },
    Some("""
      WITH gv AS (
        SELECT greatest(64, count(*) // 64) AS ng FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0),
      clipids AS (
        SELECT doc_id, doc_id % ng AS g, (doc_id // ng) % 5 AS o,
          5 + doc_id % 3 AS len
        FROM documents, gv
        WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id % 10 <> 3),
      amps AS (
        SELECT doc_id, w.w AS w,
          CAST(500 + (((g * 1500450271 + (o + w.w) * 2654435761) % 1000003)
            * ((g * 1500450271 + (o + w.w) * 2654435761) % 1000003))
            % 1000003 % 997 AS BIGINT) AS amp
        FROM clipids, (SELECT unnest(range(7)) AS w) w
        WHERE w.w < len),
      sh AS (
        SELECT DISTINCT a.doc_id, a.amp AS f0, b.amp AS f1, c.amp AS f2
        FROM amps a
        JOIN amps b ON b.doc_id = a.doc_id AND b.w = a.w + 1
        JOIN amps c ON c.doc_id = a.doc_id AND c.w = a.w + 2),
      dfc AS (
        SELECT f0, f1, f2, count(*) AS d FROM sh GROUP BY 1, 2, 3),
      cold AS (
        SELECT sh.doc_id, sh.f0, sh.f1, sh.f2
        FROM sh JOIN dfc USING (f0, f1, f2) WHERE dfc.d <= 100),
      sz AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
      i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM cold a JOIN cold b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b, CAST(i.n_shared AS BIGINT) AS n_shared,
        CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
      FROM i
      JOIN sz sa ON sa.doc_id = i.doc_a
      JOIN sz sb ON sb.doc_id = i.doc_b
      WHERE 2 * i.n_shared >= least(sa.n, sb.n)
      ORDER BY i.doc_a, i.doc_b
    """.trim))

  // --------------------------------------------------------------- q308
  /** q308 — VIDEO CLIP families
    * ([[Dedup.sequenceShingleClusters]] — q305's relation closed to
    * the KEEP/DROP decision): completing the clip rung's ladder the
    * way every dedup family ends (fingerprint → pairs → FAMILIES →
    * canonical): connected components over the containment relation,
    * one min-id canonical per family, so a reel recorded as five
    * overlapping trims keeps ONE copy — computed the
    * [[Dedup.alignedFingerprintClusters]] way since r19 (components
    * propagate over the REPRESENTATIVE pair graph; the member-pair
    * expansion never materializes). Universe = videos with ≥ k
    * observed frames (the shingle-able ones — a shorter clip cannot
    * participate in the relation and has no row). Oracle closes the
    * replayed pair set with the recursive CTE. */
  val q308: Q = Q(
    "q308_video_clip_clusters",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeClipMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.sequenceShingleClusters(fps, "doc_id",
        "frame_idx", "fp", k = 3, minSharedNum = 1, minSharedDen = 2,
        maxDf = 100L)
    },
    Some(s"""
      WITH RECURSIVE $clipShinglesCte,
      sz AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
      i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM cold a JOIN cold b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cpairs AS (
        SELECT doc_a, doc_b FROM i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE 2 * i.n_shared >= least(sa.n, sb.n)),
      cuniverse AS (SELECT doc_id FROM clipids),
      cedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cpairs
        UNION ALL SELECT doc_b, doc_a FROM cpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM cuniverse
        UNION
        SELECT rr.doc_id, e.dst FROM reach rr
        JOIN cedges e ON e.src = rr.via),
      comp AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id)
      SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
      FROM comp ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q309
  /** q309 — TRIMMED-audio decontamination gate
    * ([[Dedup.sequenceShingleDecontam]] on the window-energy
    * stream): q306's decision on the second modality — an eval
    * recording leaked as a trimmed excerpt shifts every window and
    * escapes the envelope gate (q296 hashes the first 65 windows);
    * a train recording flags when it carries ≥ half of some eval
    * clip's energy 3-gram shingles, eval-normalized, with the
    * deterministic witness. Split: eval = offset-block
    * `(id div G) ≡ 0 (mod 4)` (reel-independent — see q306). Oracle replays the aperiodic amplitudes, the capped
    * cross inverted index, and the witness fold. */
  val q309: Q = Q(
    "q309_audio_clip_decontam_gate",
    (s, d) => {
      val en = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.audioWindowEnergies(
          Multimodal.encodeClipWaveformFixture(Tables.documents(s, d),
            "doc_id")).toDF()
          .select(col("doc_id"), col("w"), col("amp")))
      val reels = Multimodal.clipReels(Tables.documents(s, d), "doc_id")
      Dedup.sequenceShingleDecontam(
        en.where(expr(s"(doc_id div $reels) % 4") =!= 0),
        en.where(expr(s"(doc_id div $reels) % 4") === 0),
        "doc_id", "w", "amp", k = 3,
        minSharedNum = 1, minSharedDen = 2, maxDf = 100L)
    },
    Some("""
      WITH gv AS (
        SELECT greatest(64, count(*) // 64) AS ng FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0),
      clipids AS (
        SELECT doc_id, doc_id % ng AS g, (doc_id // ng) % 5 AS o,
          5 + doc_id % 3 AS len
        FROM documents, gv
        WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id % 10 <> 3),
      amps AS (
        SELECT doc_id, w.w AS w,
          CAST(500 + (((g * 1500450271 + (o + w.w) * 2654435761) % 1000003)
            * ((g * 1500450271 + (o + w.w) * 2654435761) % 1000003))
            % 1000003 % 997 AS BIGINT) AS amp
        FROM clipids, (SELECT unnest(range(7)) AS w) w
        WHERE w.w < len),
      sh AS (
        SELECT DISTINCT a.doc_id, a.amp AS f0, b.amp AS f1, c.amp AS f2
        FROM amps a
        JOIN amps b ON b.doc_id = a.doc_id AND b.w = a.w + 1
        JOIN amps c ON c.doc_id = a.doc_id AND c.w = a.w + 2),
      dfc AS (
        SELECT f0, f1, f2, count(*) AS d FROM sh GROUP BY 1, 2, 3),
      cold AS (
        SELECT sh.doc_id, sh.f0, sh.f1, sh.f2
        FROM sh JOIN dfc USING (f0, f1, f2) WHERE dfc.d <= 100),
      tr AS (SELECT c.* FROM cold c, gv WHERE (doc_id // ng) % 4 <> 0),
      ev AS (SELECT c.* FROM cold c, gv WHERE (doc_id // ng) % 4 = 0),
      tsz AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY 1),
      esz AS (SELECT doc_id, count(*) AS n FROM ev GROUP BY 1),
      m AS (
        SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_shared
        FROM tr t JOIN ev e
          ON t.f0 = e.f0 AND t.f1 = e.f1 AND t.f2 = e.f2
        GROUP BY 1, 2),
      pass AS (
        SELECT m.doc_id, m.eval_id, m.n_shared, esz.n AS ne
        FROM m JOIN esz ON esz.doc_id = m.eval_id
        WHERE 2 * m.n_shared >= esz.n),
      best AS (
        SELECT doc_id, max(n_shared) AS n_shared FROM pass GROUP BY 1),
      w AS (
        SELECT p.doc_id, p.n_shared, min(p.eval_id) AS eval_id
        FROM pass p JOIN best b
          ON b.doc_id = p.doc_id AND p.n_shared = b.n_shared
        GROUP BY 1, 2)
      SELECT w.doc_id, CAST(w.n_shared AS BIGINT) AS n_shared,
        CAST(tsz.n AS BIGINT) AS n_shingles, w.eval_id,
        CAST(esz.n AS BIGINT) AS n_shingles_eval
      FROM w
      JOIN tsz ON tsz.doc_id = w.doc_id
      JOIN esz ON esz.doc_id = w.eval_id
      ORDER BY w.doc_id
    """.trim))

  // --------------------------------------------------------------- q310
  /** q310 — clip ALIGNMENT OFFSETS
    * ([[Dedup.sequenceShingleOffsets]]): the forensic readout over
    * the q305 relation — for every threshold-passing pair, WHERE the
    * shared content aligns (the modal `position-in-A −
    * position-in-B` over matched shingles, ties to the smallest
    * offset) and how many shingles agree there: the evidence a
    * curator reviews before trusting offset-tolerant dedup, and the
    * seek plan a differ uses to fetch the overlapping spans. On the
    * clip fixture the modal offset IS the reel-window offset
    * difference, which the oracle replays positionally. */
  val q310: Q = Q(
    "q310_clip_alignment_offsets",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeClipMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.sequenceShingleOffsets(fps, "doc_id", "frame_idx", "fp",
        k = 3, minSharedNum = 1, minSharedDen = 2, maxDf = 100L)
    },
    Some(s"""
      WITH $clipShinglesCte,
      shp AS (
        SELECT a.doc_id, a.rn - 1 AS pos,
          a.fp AS f0, b.fp AS f1, c.fp AS f2
        FROM r a
        JOIN r b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
        JOIN r c ON c.doc_id = a.doc_id AND c.rn = a.rn + 2),
      coldp AS (
        SELECT shp.doc_id, shp.pos, shp.f0, shp.f1, shp.f2
        FROM shp JOIN dfc USING (f0, f1, f2) WHERE dfc.d <= 100),
      sz AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
      i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM cold a JOIN cold b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pass AS (
        SELECT i.doc_a, i.doc_b, i.n_shared FROM i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE 2 * i.n_shared >= least(sa.n, sb.n)),
      offs AS (
        SELECT p.doc_a, p.doc_b, p.n_shared,
          a.pos - b.pos AS off, count(*) AS n
        FROM pass p
        JOIN coldp a ON a.doc_id = p.doc_a
        JOIN coldp b ON b.doc_id = p.doc_b
          AND a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
        GROUP BY 1, 2, 3, 4),
      mx AS (
        SELECT doc_a, doc_b, max(n) AS m FROM offs GROUP BY 1, 2)
      SELECT o.doc_a, o.doc_b, CAST(o.n_shared AS BIGINT) AS n_shared,
        CAST(min(o.off) AS BIGINT) AS offset,
        CAST(mx.m AS BIGINT) AS n_at_offset
      FROM offs o JOIN mx
        ON mx.doc_a = o.doc_a AND mx.doc_b = o.doc_b AND o.n = mx.m
      GROUP BY o.doc_a, o.doc_b, o.n_shared, mx.m
      ORDER BY o.doc_a, o.doc_b
    """.trim))

  // --------------------------------------------------------------- q311
  /** q311 — GIF clip containment
    * ([[Dedup.sequenceShingleContainment]] over
    * [[Multimodal.gifFrameFingerprints]]): the offset-tolerant rung
    * on the THIRD sequence coding — a trimmed/embedded animated-GIF
    * re-upload shifts every frame index and escapes q285's aligned
    * matching exactly as the MJPEG case escaped q278's; the per-frame
    * dHash streams 3-gram shingle over observed frames and pairs flag
    * on sharing ≥ half the smaller side's distinct shingles. The clip
    * fixture is [[Multimodal.encodeClipGifFixture]] (multiplicative
    * `2r+5` row mix, corpus-scaled reels — the q305 lessons);
    * GIF is lossless, so the oracle replays every fingerprint
    * bit-exactly with no codec-error argument. */
  val q311: Q = Q(
    "q311_gif_clip_containment",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.gifFrameFingerprints(
          Multimodal.encodeClipGifFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.sequenceShingleContainment(fps, "doc_id", "frame_idx",
        "fp", k = 3, minSharedNum = 1, minSharedDen = 2, maxDf = 100L)
    },
    Some(s"""
      WITH ${clipShinglesCteFor(5)},
      sz AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
      i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM cold a JOIN cold b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b, CAST(i.n_shared AS BIGINT) AS n_shared,
        CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
      FROM i
      JOIN sz sa ON sa.doc_id = i.doc_a
      JOIN sz sb ON sb.doc_id = i.doc_b
      WHERE 2 * i.n_shared >= least(sa.n, sb.n)
      ORDER BY i.doc_a, i.doc_b
    """.trim))

  // --------------------------------------------------------------- q312
  /** q312 — GIF clip families ([[Dedup.sequenceShingleClusters]] on
    * the GIF rung): the KEEP/DROP decision over the GIF
    * offset-tolerant relation — connected components over the
    * containment relation via the representative pair graph (r19 —
    * member pairs never materialize), one min-id canonical per
    * family, so a reel recorded as five overlapping trimmed GIFs
    * keeps ONE copy. Universe = GIFs with ≥ k observed frames (the
    * shingle-able ones). Oracle closes the replayed pair set with
    * the recursive CTE — the q308 pattern on the GIF fixture. */
  val q312: Q = Q(
    "q312_gif_clip_clusters",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.gifFrameFingerprints(
          Multimodal.encodeClipGifFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.sequenceShingleClusters(fps, "doc_id",
        "frame_idx", "fp", k = 3, minSharedNum = 1, minSharedDen = 2,
        maxDf = 100L)
    },
    Some(s"""
      WITH RECURSIVE ${clipShinglesCteFor(5)},
      sz AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
      i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM cold a JOIN cold b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cpairs AS (
        SELECT doc_a, doc_b FROM i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE 2 * i.n_shared >= least(sa.n, sb.n)),
      cuniverse AS (SELECT doc_id FROM clipids),
      cedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cpairs
        UNION ALL SELECT doc_b, doc_a FROM cpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM cuniverse
        UNION
        SELECT rr.doc_id, e.dst FROM reach rr
        JOIN cedges e ON e.src = rr.via),
      comp AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id)
      SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
      FROM comp ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q295
  /** q295 — IMAGE decontamination gate
    * ([[Dedup.fingerprintDecontam]]): the q36/q113 decontamination
    * ladder's perceptual rung — train images whose dHash sits within
    * Hamming ≤ 3 of ANY eval-set image are flagged with the closest
    * witness (min hamming, then smallest eval id); a benchmark image
    * leaked as a RE-ENCODE is invisible to byte decontamination and
    * exactly what this gate sees. Split: eval = gradient-fixture ids
    * ≡ 0 (mod 4) — benchmarks-small by nature, so its pigeonhole
    * index broadcasts — train = the rest. Oracle brute-forces the
    * cross Hamming join over the replayed fps and re-derives the
    * witness with a min-then-min fold. */
  val q295: Q = Q(
    "q295_image_decontam_gate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def dh(part: org.apache.spark.sql.DataFrame) =
        graft.engine.CacheScope.unmanaged.persist(
          Multimodal.imageDhash(Multimodal.encodeGradientImageFixture(
            part, "doc_id")).toDF()
            .where(col("ok") === 1L)
            .select(col("doc_id"), col("dhash").as("fp")))
      Dedup.fingerprintDecontam(
        dh(docs.where(col("doc_id") % 4 =!= 0)),
        dh(docs.where(col("doc_id") % 4 === 0)),
        "doc_id", "fp", maxHamming = 3, bits = 64)
    },
    Some("""
      WITH ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 6)),
      cells AS (
        SELECT doc_id, r.r AS r, c.c AS c,
          CAST((((doc_id % 25) * 7 + r.r * 5 + c.c * 11) % 6) * 40 +
            CASE WHEN r.r = 0 AND c.c = 0 AND ((doc_id // 25) % 2) = 1
                 THEN 45 ELSE 0 END AS BIGINT) AS v
        FROM ids,
          (SELECT unnest(range(8)) AS r) r,
          (SELECT unnest(range(9)) AS c) c),
      bits AS (
        SELECT a.doc_id, CAST(a.r * 8 + a.c AS INT) AS b
        FROM cells a JOIN cells n
          ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
        WHERE a.c < 8 AND n.v > a.v),
      dh AS (
        SELECT i.doc_id,
          CAST(coalesce(sum(CASE WHEN b.b = 63
            THEN -9223372036854775808
            ELSE (1::BIGINT << b.b) END), 0) AS BIGINT) AS fp
        FROM ids i LEFT JOIN bits b USING (doc_id)
        GROUP BY i.doc_id),
      pairs AS (
        SELECT t.doc_id, e.doc_id AS eval_id,
          CAST(bit_count(xor(t.fp, e.fp)) AS INT) AS h
        FROM dh t JOIN dh e
          ON t.doc_id % 4 <> 0 AND e.doc_id % 4 = 0
        WHERE bit_count(xor(t.fp, e.fp)) <= 3),
      mh AS (SELECT doc_id, min(h) AS hamming FROM pairs GROUP BY 1),
      w AS (
        SELECT p.doc_id, mh.hamming, min(p.eval_id) AS eval_id
        FROM pairs p JOIN mh
          ON mh.doc_id = p.doc_id AND p.h = mh.hamming
        GROUP BY 1, 2)
      SELECT doc_id, hamming, eval_id FROM w ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q294
  /** q294 — cluster KEEP-BEST-RESOLUTION
    * ([[Multimodal.keepBestResolution]] over q261's cluster decision
    * + [[Multimodal.decodeImageMeta]]): the curation refinement a
    * min-id canonical misses — keep each near-dup family's
    * highest-resolution copy, ties to the smallest id, as a
    * partial-aggregable `max(struct(px, -id))` (q48's keep-best
    * discipline: no window, no per-cluster sort). On the quality
    * fixture the FLAT families (solid 72×64, 16×8 thumbnail, 128×8
    * banner) share dHash 0 and cluster together, so the best pick
    * must cross sizes — the 72×64 solid beats both skinny variants;
    * the patterned family is byte-identical 72×64 and falls to the
    * id tie-break. All id arithmetic for the oracle. */
  val q294: Q = Q(
    "q294_cluster_keep_best_resolution",
    (s, d) => {
      val media = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.encodeQualityImageFixture(
          Tables.documents(s, d), "doc_id").toDF())
      val asM = media.as[Multimodal.MediaRecord](
        Multimodal.mediaRecordEnc)
      val dh = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.imageDhash(asM).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("dhash").as("fp")))
      val clusters = Dedup.fingerprintClusters(dh, "doc_id", "fp",
        maxHamming = 3, bits = 64)
      Multimodal.keepBestResolution(clusters,
        Multimodal.decodeImageMeta(asM).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("width"), col("height")))
    },
    Some("""
      WITH ids AS (
        SELECT doc_id, doc_id % 5 AS fam FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id % 5 < 4),
      m AS (
        SELECT doc_id, fam, fam <> 0 AS flat,
          CAST(CASE fam WHEN 2 THEN 128 WHEN 3 THEN 1024
            ELSE 4608 END AS BIGINT) AS px
        FROM ids),
      cl AS (
        SELECT doc_id, flat, px,
          min(doc_id) OVER (PARTITION BY flat) AS cluster_id
        FROM m),
      best AS (
        SELECT cl.flat, min(doc_id) AS best_id
        FROM cl JOIN (SELECT flat, max(px) AS mx FROM cl GROUP BY 1) t
          ON t.flat = cl.flat AND cl.px = t.mx
        GROUP BY 1)
      SELECT cl.doc_id, cl.cluster_id, best.best_id,
        cl.doc_id = best.best_id AS is_best
      FROM cl JOIN best ON best.flat = cl.flat
      ORDER BY cl.doc_id
    """.trim))

  // --------------------------------------------------------------- q284
  /** The shared fps CTE of the GIF rung (q284/q285): replay
    * [[Multimodal.encodeGifFixture]]'s per-frame dHash as pure id
    * arithmetic — row `r` of frame `f` carries pattern byte
    * `P[(g·7 + f·5 + r + 2·[variant=2]) % 4]` (P = 85/170/43/212),
    * bit 3 of frame 0 row 0 XOR-flipped for variant 1, composed with
    * the bit-63 MIN_BIGINT trick. No codec-error argument needed —
    * GIF is lossless — but the 24-level flat-block geometry is the
    * MJPEG fixture's, shared. */
  private def gifFpsCte: String = """
      gids AS (
        SELECT doc_id, doc_id % 12 AS g, (doc_id // 12) % 3 AS variant
        FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 4, 6)),
      gframes AS (
        SELECT doc_id, g, variant, f.f AS frame_idx
        FROM gids, (SELECT unnest(range(3)) AS f) f
        WHERE f.f < 1 + g % 3),
      growbytes AS (
        SELECT doc_id, frame_idx, r.r AS r,
          xor(CASE CAST((g * 7 + frame_idx * 5 + r.r +
                CASE WHEN variant = 2 THEN 2 ELSE 0 END) % 4 AS INT)
            WHEN 0 THEN 85 WHEN 1 THEN 170 WHEN 2 THEN 43
            ELSE 212 END,
            CASE WHEN variant = 1 AND frame_idx = 0 AND r.r = 0
                 THEN 8 ELSE 0 END) AS pb
        FROM gframes, (SELECT unnest(range(8)) AS r) r),
      gfps AS (
        SELECT doc_id, frame_idx,
          CAST(sum(CASE WHEN r = 7 AND pb >= 128
            THEN -9223372036854775808 + ((pb % 128)::BIGINT << 56)
            ELSE pb::BIGINT << (8 * r) END) AS BIGINT) AS fp
        FROM growbytes GROUP BY doc_id, frame_idx)"""

  /** q284 — per-frame GIF perceptual fingerprints: the decode pass of
    * the SECOND multi-frame coding the JDK honestly decodes
    * ([[Multimodal.gifFrameFingerprints]] over
    * [[Multimodal.encodeGifFixture]] — static 1-frame GIFs, animated
    * 2–3-frame ones, zeroed-magic and truncated corruption families
    * contributing no rows). GIF is LOSSLESS, so the oracle replays
    * every hash bit-exactly with no codec-error argument — the
    * easier sibling of q277's through-the-codec proof. */
  val q284: Q = Q(
    "q284_gif_frame_fingerprints",
    (s, d) =>
      Multimodal.gifFrameFingerprints(
        Multimodal.encodeGifFixture(Tables.documents(s, d), "doc_id"))
        .toDF().orderBy(col("doc_id"), col("frame_idx")),
    Some(s"""
      WITH $gifFpsCte
      SELECT doc_id, frame_idx, CAST(1 AS BIGINT) AS ok, fp
      FROM gfps ORDER BY doc_id, frame_idx
    """.trim))

  // --------------------------------------------------------------- q285
  /** q285 — GIF near-dup CLUSTERS: the aligned-sequence machinery
    * ([[Dedup.alignedFingerprintClusters]] — exact signature collapse,
    * per-position pigeonhole, duplicate-mass-bounded broadcasts)
    * applied unchanged to the GIF rung: static GIFs degenerate to
    * single-image dHash identity, animated ones match frame-by-frame
    * (the v0/v1 one-bit tweak is a cross-signature near-dup, v2 a
    * separate stream). Oracle: brute-force aligned Hamming pairs over
    * the replayed fps, closed with the q279 recursive CTE. */
  val q285: Q = Q(
    "q285_gif_neardup_clusters",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.gifFrameFingerprints(
          Multimodal.encodeGifFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Dedup.alignedFingerprintClusters(fps, "doc_id", "frame_idx",
        "fp", maxHamming = 3, bits = 64)
    },
    Some(s"""
      WITH RECURSIVE $gifFpsCte,
      cnt AS (SELECT doc_id, count(*) AS n FROM gfps GROUP BY doc_id),
      m AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_match
        FROM gfps a JOIN gfps b
          ON a.frame_idx = b.frame_idx AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
        GROUP BY 1, 2),
      gpairs AS (
        SELECT doc_a, doc_b FROM m
        JOIN cnt ca ON ca.doc_id = m.doc_a
        JOIN cnt cb ON cb.doc_id = m.doc_b
        WHERE 2 * m.n_match >= greatest(ca.n, cb.n)),
      guniverse AS (SELECT DISTINCT doc_id FROM gfps),
      gedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM gpairs
        UNION ALL SELECT doc_b, doc_a FROM gpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM guniverse
        UNION
        SELECT r.doc_id, e.dst FROM reach r
        JOIN gedges e ON e.src = r.via),
      comp AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id)
      SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
      FROM comp ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q273
  /** q273 — cross-modal dedup POLICY masses (the DECISION layer over
    * q271's agreement): how many paired (caption, image) rows survive
    * each composition policy a multimodal corpus team can pick.
    * Canonicals are JOINT-restricted (the min-id PAIRED member of
    * each cluster — a global canonical without an image would zero
    * out whole clusters), so the policies are:
    *   kept_text / kept_image — single-modality dedup (one canonical
    *     per text / image cluster);
    *   kept_and — keep only docs canonical in BOTH (the naive
    *     intersection: OVER-drops, can kill clusters entirely);
    *   kept_or — keep docs canonical in EITHER (leaves cross-modal
    *     dups in);
    *   union_clusters — the PRINCIPLED compose-OR dedup: connected
    *     components of the union graph (dup-in-either links), one
    *     canonical each. Computed WITHOUT pair frames: two docs are
    *     union-linked iff chained through shared text or image
    *     clusters, which is exactly the closure of the BIPARTITE
    *     (text cluster)–(image cluster) cell graph — |cells| nodes
    *     (t-nodes at 2·tcid, i-nodes at 2·icid+1; cluster labels are
    *     doc ids, so the encoding stays in range anywhere below 2⁶²
    *     ids), never materializing doc-level pairs — the [[Dedup
    *     .fingerprintClusters]] distinct-graph trick on the policy
    *     layer (shuffle-based label propagation; no broadcast of
    *     the cell frame, whose size tracks the doc count on a
    *     mostly-unique corpus).
    * The ordering kept_and ≤ union_clusters ≤ min(kept_text,
    * kept_image) ≤ kept_or is the readout: what intersection
    * over-drops and OR leaves behind. */
  val q273: Q = Q(
    "q273_crossmodal_dedup_policies",
    (s, d) => {
      val joint = graft.engine.CacheScope.unmanaged.persist(
        crossModalJoint(s, d))
      val flags = joint
        .join(joint.groupBy(col("tcid"))
          .agg(min(col("doc_id")).as("tmin")), Seq("tcid"))
        .join(joint.groupBy(col("icid"))
          .agg(min(col("doc_id")).as("imin")), Seq("icid"))
        .select((col("doc_id") === col("tmin")).as("tkeep"),
          (col("doc_id") === col("imin")).as("ikeep"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("tkeep"), 1L).otherwise(0L)).as("kept_text"),
          sum(when(col("ikeep"), 1L).otherwise(0L)).as("kept_image"),
          sum(when(col("tkeep") && col("ikeep"), 1L).otherwise(0L))
            .as("kept_and"),
          sum(when(col("tkeep") || col("ikeep"), 1L).otherwise(0L))
            .as("kept_or"))
      val cells = joint.select((col("tcid") * 2).as("doc_a"),
        (col("icid") * 2 + 1).as("doc_b")).distinct()
      val nodes = cells.select(col("doc_a").as("node"))
        .unionByName(cells.select(col("doc_b").as("node"))).distinct()
      val unionClusters = Dedup.nearDupClusters(nodes, "node", cells)
        .agg(countDistinct(col("cluster_id")).as("union_clusters"))
      flags.crossJoin(broadcast(unionClusters))
        .select(col("n_docs"), col("kept_text"), col("kept_image"),
          col("kept_and"), col("kept_or"), col("union_clusters"))
    },
    Some(s"""
      WITH RECURSIVE $crossModalJointOracleSql,
      tmin AS (SELECT tcid, min(id) AS tmin FROM jsz GROUP BY 1),
      imin AS (SELECT icid, min(id) AS imin FROM jsz GROUP BY 1),
      f AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN id = tmin THEN 1 ELSE 0 END) AS BIGINT)
            AS kept_text,
          CAST(sum(CASE WHEN id = imin THEN 1 ELSE 0 END) AS BIGINT)
            AS kept_image,
          CAST(sum(CASE WHEN id = tmin AND id = imin THEN 1 ELSE 0 END)
            AS BIGINT) AS kept_and,
          CAST(sum(CASE WHEN id = tmin OR id = imin THEN 1 ELSE 0 END)
            AS BIGINT) AS kept_or
        FROM jsz JOIN tmin USING (tcid) JOIN imin USING (icid)),
      bedges AS (
        SELECT DISTINCT 2 * tcid AS src, 2 * icid + 1 AS dst FROM jsz
        UNION ALL
        SELECT DISTINCT 2 * icid + 1 AS src, 2 * tcid AS dst FROM jsz),
      bnodes AS (
        SELECT DISTINCT src AS node FROM bedges
        UNION SELECT DISTINCT dst FROM bedges),
      breach(node, r) AS (
        SELECT node, node FROM bnodes
        UNION
        SELECT e.dst, breach.r FROM breach JOIN bedges e
          ON e.src = breach.node
      ),
      u AS (
        SELECT CAST(count(DISTINCT lbl) AS BIGINT) AS union_clusters
        FROM (SELECT node, min(r) AS lbl FROM breach GROUP BY node))
      SELECT f.n_docs, f.kept_text, f.kept_image, f.kept_and,
        f.kept_or, u.union_clusters
      FROM f, u
    """.trim))

  // --------------------------------------------------------------- q313
  /** q307's amps replay over q313's half-sample (the reel count `ng`
    * scales with the SAMPLED doc count — the fixture derives it from
    * the frame it is handed). */
  private def clipAmpsCte: String = """
      gv AS (
        SELECT greatest(64, count(*) // 64) AS ng FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id % 2 = 0),
      clipids AS (
        SELECT doc_id, doc_id % ng AS g, (doc_id // ng) % 5 AS o,
          5 + doc_id % 3 AS len
        FROM documents, gv
        WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id % 10 <> 3
          AND doc_id % 2 = 0),
      amps AS (
        SELECT doc_id, w.w AS w,
          CAST(500 + (((g * 1500450271 + (o + w.w) * 2654435761) % 1000003)
            * ((g * 1500450271 + (o + w.w) * 2654435761) % 1000003))
            % 1000003 % 997 AS BIGINT) AS amp
        FROM clipids, (SELECT unnest(range(7)) AS w) w
        WHERE w.w < len),
      sh AS (
        SELECT DISTINCT a.doc_id, a.amp AS f0, b.amp AS f1, c.amp AS f2
        FROM amps a
        JOIN amps b ON b.doc_id = a.doc_id AND b.w = a.w + 1
        JOIN amps c ON c.doc_id = a.doc_id AND c.w = a.w + 2),
      dfc AS (
        SELECT f0, f1, f2, count(*) AS d FROM sh GROUP BY 1, 2, 3)"""

  /** The (share, maxDf) grid q313 measures — shared between the Spark
    * runner and the oracle generator so the two sweeps cannot drift. */
  private val clipOperatingPolicies: Seq[(Int, Int, Long)] = Seq(
    (1, 2, 2L), (1, 2, 100L), (1, 4, 100L), (3, 4, 100L))

  /** q313 — CLIP-rung OPERATING POINT
    * ([[Dedup.sequenceShingleContainment]]'s measured (share, maxDf)
    * curve — the q144/q214/q250 discipline applied to the last
    * approximate screen that shipped without one): every policy knob
    * of the clip rung is now a `curate()` parameter, but a curator
    * tuning `clipMaxDf` at 100 TB was flying blind — no recall
    * readout existed. GROUND TRUTH is the UNCAPPED shared-shingle
    * relation (maxDf = 2⁶⁰, threshold ≥ 1 shared k-gram: a shared
    * 3-gram IS a shared 3-window run at some offset — the
    * brute-force offset-shifted truth the fixture can replay);
    * each grid policy reports flagged mass, true hits, precision
    * and recall — all derived from ONE uncapped inverted-index join
    * ([[Dedup.sequenceShinglePolicyCurve]]: every capped screen is a
    * conditional sum over the df-annotated truth join, pinned ≡ the
    * per-policy operator reruns by DedupSpec). The honest eval cost
    * is paid at profile time, q144's stance — on a DETERMINISTIC
    * HALF SAMPLE of the corpus (`doc_id ≡ 0 (mod 2)`, the q129
    * brute-force-on-a-sample discipline: the TRUTH relation has no
    * df cap, so its candidate mass is the one quantity the screen's
    * own cap cannot bound; the sample bounds it instead, and the
    * curve is a policy readout, not a per-doc decision). Runs on the
    * audio clip fixture — the cheapest honest sequence fixture; the
    * policy machinery is modality-shared, so the curve transfers.
    * Oracle replays shingles, every capped screen, and the truth
    * join positionally over the same sample. */
  val q313: Q = Q(
    "q313_clip_operating_point",
    (s, d) => {
      val en = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.audioWindowEnergies(
          Multimodal.encodeClipWaveformFixture(
            Tables.documents(s, d).where(col("doc_id") % 2 === 0),
            "doc_id")).toDF()
          .select(col("doc_id"), col("w"), col("amp")))
      Dedup.sequenceShinglePolicyCurve(en, "doc_id", "w", "amp",
        k = 3, policies = clipOperatingPolicies)
    },
    Some {
      val perPolicy = clipOperatingPolicies.map { case (num, den, df) =>
        s"""
      cold_${num}_${den}_$df AS (
        SELECT sh.doc_id, sh.f0, sh.f1, sh.f2
        FROM sh JOIN dfc USING (f0, f1, f2) WHERE dfc.d <= $df),
      sz_${num}_${den}_$df AS (
        SELECT doc_id, count(*) AS n FROM cold_${num}_${den}_$df
        GROUP BY 1),
      pass_${num}_${den}_$df AS (
        SELECT i.doc_a, i.doc_b FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS n_shared
          FROM cold_${num}_${den}_$df a JOIN cold_${num}_${den}_$df b
            ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
            AND a.doc_id < b.doc_id
          GROUP BY 1, 2) i
        JOIN sz_${num}_${den}_$df sa ON sa.doc_id = i.doc_a
        JOIN sz_${num}_${den}_$df sb ON sb.doc_id = i.doc_b
        WHERE $den * i.n_shared >= $num * least(sa.n, sb.n))"""
      }.mkString(",")
      val rows = clipOperatingPolicies.map { case (num, den, df) =>
        s"""
        SELECT CAST($num AS BIGINT) AS share_num,
          CAST($den AS BIGINT) AS share_den,
          CAST($df AS BIGINT) AS max_df,
          (SELECT CAST(count(*) AS BIGINT)
            FROM pass_${num}_${den}_$df) AS n_flagged,
          (SELECT CAST(count(*) AS BIGINT) FROM pass_${num}_${den}_$df
            JOIN truth USING (doc_a, doc_b)) AS n_hits"""
      }.mkString(" UNION ALL ")
      s"""
      WITH $clipAmpsCte,
      truth AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id),
      tn AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
      $perPolicy,
      grid AS ($rows)
      SELECT g.share_num, g.share_den, g.max_df, g.n_flagged,
        g.n_hits, tn.n_truth,
        CASE WHEN g.n_flagged = 0 THEN 0.0
          ELSE CAST(g.n_hits AS DOUBLE) / g.n_flagged END AS precision,
        CASE WHEN tn.n_truth = 0 THEN 0.0
          ELSE CAST(g.n_hits AS DOUBLE) / tn.n_truth END AS recall
      FROM grid g, tn
      ORDER BY g.share_num, g.share_den, g.max_df
    """.trim })

  // --------------------------------------------------------------- q314
  /** q314 — VIDEO clip-family keep-best ([[Multimodal.keepBest]] ∘
    * q308, the r19 verdict's missing composition): the clip ladder
    * ends the way every dedup family ends since r18 — a reel
    * recorded as five overlapping trims keeps its MOST-OBSERVED-
    * FRAMES member (the longest trim — the copy a training run
    * wants), never an arbitrary min-id one; ties to the smallest id.
    * Quality reads off the ALREADY-COMPUTED fingerprint frame (zero
    * extra decode), the q301 discipline on the offset-tolerant
    * decision. Non-degenerate on the clip fixture: family members'
    * lengths differ (`5 + id mod 3`), so min-id members lose
    * whenever a longer trim exists. Oracle: q308's recursive-CTE
    * closure + the observed-count argmax. */
  val q314: Q = Q(
    "q314_video_clip_keep_best",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.videoFrameFingerprints(
          Multimodal.encodeClipMjpegFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Multimodal.keepBest(
        Dedup.sequenceShingleClusters(fps, "doc_id", "frame_idx",
          "fp", k = 3, minSharedNum = 1, minSharedDen = 2,
          maxDf = 100L),
        fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_obs")),
        Seq("n_obs"))
    },
    Some(s"""
      WITH RECURSIVE $clipShinglesCte,
      sz AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
      i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM cold a JOIN cold b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cpairs AS (
        SELECT doc_a, doc_b FROM i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE 2 * i.n_shared >= least(sa.n, sb.n)),
      cuniverse AS (SELECT doc_id FROM clipids),
      cedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cpairs
        UNION ALL SELECT doc_b, doc_a FROM cpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM cuniverse
        UNION
        SELECT rr.doc_id, e.dst FROM reach rr
        JOIN cedges e ON e.src = rr.via),
      comp AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id),
      qual AS (
        SELECT doc_id, CAST(5 + doc_id % 3 AS BIGINT) AS n_obs
        FROM clipids),
      mx AS (
        SELECT comp.cluster_id, max(qual.n_obs) AS mn
        FROM comp JOIN qual USING (doc_id) GROUP BY 1),
      best AS (
        SELECT comp.cluster_id, min(comp.doc_id) AS best_id
        FROM comp JOIN qual USING (doc_id)
        JOIN mx ON mx.cluster_id = comp.cluster_id
          AND qual.n_obs = mx.mn
        GROUP BY 1)
      SELECT comp.doc_id, comp.cluster_id, best.best_id,
        comp.doc_id = best.best_id AS is_best
      FROM comp JOIN best USING (cluster_id)
      ORDER BY comp.doc_id
    """.trim))

  // --------------------------------------------------------------- q315
  /** q315 — GIF clip-family keep-best ([[Multimodal.keepBest]] ∘
    * q312): q314's argmax on the second frame-stream coding — one
    * shared fold, pinned here over the GIF clip fixture (lossless
    * coding, so the oracle replays every fingerprint bit-exactly);
    * quality = observed frame count off the already-computed
    * fingerprint frame. Oracle: q312's closure + the argmax. */
  val q315: Q = Q(
    "q315_gif_clip_keep_best",
    (s, d) => {
      val fps = graft.engine.CacheScope.unmanaged.persist(
        Multimodal.gifFrameFingerprints(
          Multimodal.encodeClipGifFixture(Tables.documents(s, d),
            "doc_id"))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      Multimodal.keepBest(
        Dedup.sequenceShingleClusters(fps, "doc_id", "frame_idx",
          "fp", k = 3, minSharedNum = 1, minSharedDen = 2,
          maxDf = 100L),
        fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_obs")),
        Seq("n_obs"))
    },
    Some(s"""
      WITH RECURSIVE ${clipShinglesCteFor(5)},
      sz AS (SELECT doc_id, count(*) AS n FROM cold GROUP BY 1),
      i AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM cold a JOIN cold b
          ON a.f0 = b.f0 AND a.f1 = b.f1 AND a.f2 = b.f2
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cpairs AS (
        SELECT doc_a, doc_b FROM i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE 2 * i.n_shared >= least(sa.n, sb.n)),
      cuniverse AS (SELECT doc_id FROM clipids),
      cedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cpairs
        UNION ALL SELECT doc_b, doc_a FROM cpairs),
      reach(doc_id, via) AS (
        SELECT doc_id, doc_id FROM cuniverse
        UNION
        SELECT rr.doc_id, e.dst FROM reach rr
        JOIN cedges e ON e.src = rr.via),
      comp AS (
        SELECT doc_id, min(via) AS cluster_id FROM reach
        GROUP BY doc_id),
      qual AS (
        SELECT doc_id, CAST(5 + doc_id % 3 AS BIGINT) AS n_obs
        FROM clipids),
      mx AS (
        SELECT comp.cluster_id, max(qual.n_obs) AS mn
        FROM comp JOIN qual USING (doc_id) GROUP BY 1),
      best AS (
        SELECT comp.cluster_id, min(comp.doc_id) AS best_id
        FROM comp JOIN qual USING (doc_id)
        JOIN mx ON mx.cluster_id = comp.cluster_id
          AND qual.n_obs = mx.mn
        GROUP BY 1)
      SELECT comp.doc_id, comp.cluster_id, best.best_id,
        comp.doc_id = best.best_id AS is_best
      FROM comp JOIN best USING (cluster_id)
      ORDER BY comp.doc_id
    """.trim))

}
