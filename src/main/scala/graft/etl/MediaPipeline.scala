package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.CacheScope
import graft.operators.{Dedup, Multimodal, Packing}

/** The MULTIMODAL curation funnel — [[CorpusPipeline]]'s media sibling
  * (SURVEY.md §2.11 composed end to end): the individual operators are
  * each oracle-checked in the registry (q263 router, q255/q261 image
  * dHash, q262/q266 audio envelope, q209 video container, q221
  * profile, q224 shard manifest); this is the single composed path a
  * media-corpus team actually runs — one pass from a mixed binary
  * lake to a deduplicated, profiled, shard-exported corpus.
  *
  *   raw → modality routing by MAGIC BYTES (q263 — crawler mimes lie;
  *         the routed tree is written partitioned by modality so every
  *         later stage reads ONLY its modality's payload bytes)
  *       → PER-MODALITY QUALITY GATES before each tier's dedup (junk
  *         never becomes a canonical), each read off a pass the
  *         funnel already runs — no extra decode anywhere: stills
  *         drop flat / sub-`imageMinPx` / extreme-aspect (q292's
  *         decision off the one-pass dHash+dims frame), audio drops
  *         below the `audioMinFrames` duration bar (q293's too-short
  *         rule off the header meta; the envelope decode itself
  *         already enforces ≥ 65 windows), MJPEG clips drop
  *         too-short / tiny-resolution / all-static (q299's keep off
  *         the fingerprint frame + avih header); every drop counted
  *         per modality
  *       → per-modality dedup decision with a KEEP-BEST canonical
  *         (never min-id where quality varies: stills keep the
  *         highest-resolution member — q294, audio the highest
  *         sample rate — q300, MJPEG/GIF the most decoded frames —
  *         q301/q302; the exact byte-identity tiers stay min-id,
  *         their members are identical), TIERED by
  *         what the JDK honestly decodes in every branch:
  *           image: stills dHash → Hamming clusters (q261); GIF —
  *                  per-frame dHash → aligned sequence clusters
  *                  (q285); HEIF-family (heic/mif1/avif brands) —
  *                  exact tier
  *           audio: WAV/AIFF envelope hash → Hamming clusters
  *                  (q266's); ISO-BMFF audio (M4A brand) — exact tier
  *           video: MJPEG/AVI — per-frame dHash → aligned sequence
  *                  clusters (q279's PERCEPTUAL decision) → q305's
  *                  clip containment over the family REPRESENTATIVES
  *                  (overlapping trims of one reel chain into one
  *                  family — q308 — without running the shingle join
  *                  on collapsed duplicate mass); MP4 —
  *                  container-decodable + exact payload identity
  *         the EXACT tier (q287's decision) = ISO container walk
  *         gates health, identity is sha-256 keep-min — codec-frame
  *         perception stays the documented out-of-scope rung for
  *         codecs the JDK cannot decode
  *         unroutable payloads and rows that sniff but fail their
  *         modality's decode are DROPPED and counted (lake health)
  *       → optional EVAL-SET DECONTAMINATION over the kept canonicals
  *         (`eval = Some(df)`): kept stills gate against the eval
  *         set's dHashes, kept WAV/AIFF against its envelope hashes
  *         (q295/q296's perceptual [[Dedup.fingerprintDecontam]] —
  *         a benchmark leaked as a re-encode byte-compares different
  *         but is caught here), and kept GIF/MJPEG canonicals against
  *         the eval set's per-frame dHash SEQUENCES (q297/q298's
  *         [[Dedup.alignedFingerprintDecontam]] — the rung that sees
  *         a re-encoded/remuxed eval CLIP); flagged canonicals are
  *         dropped and counted per modality
  *       → q221 catalog profile OVER THE KEPT media (the distributions
  *         that drive training decisions, measured on what survives)
  *       → byte-budgeted shard export with `_manifest`
  *         ([[Packing.writeShards]] with payload octet lengths — the
  *         same deterministic file plan, diffable across re-runs)
  *
  * Scale shape: payloads are only ever SCANNED (fingerprint/meta
  * decode passes are mapPartitions over the modality's partition) or
  * routed by one hash repartition (the two writes); every decision
  * frame that crosses a shuffle is a 16-byte (doc_id, fp) or
  * (doc_id, cluster) row. The driver holds stage COUNTS, never rows.
  * Stage counts come back as [[MediaPipeline.Stats]].
  *
  * The two modality-partitioned writes repartition on `(modality,
  * salt)` — NEVER on the bare modality: a modality key has ~5
  * distinct values, so `repartition(col("modality"))` would funnel
  * every video byte in the lake through ONE task's writer (the r17
  * verdict's scale defect). The salt is `pmod(hash(doc_id), F)` with
  * `F` budgeted from the REAL byte mass ÷ `routedFileBytes` — read
  * off the filesystem, never a row-count proxy, so the task/file
  * count scales with the lake's bytes exactly like
  * [[Packing.writeShards]]' file plan does, while
  * `partitionBy("modality")` keeps the directory layout. The route
  * write budgets against the INPUT tree (per-modality masses do not
  * exist before the sniff pass); the curated write budgets EACH
  * branch against its own `routed/modality=…` mass, so a 95%-video
  * lake does not shatter its audio sliver into video-sized bucket
  * counts. Determinism holds (the salt is an affine hash of doc_id,
  * no sampling pass), so re-runs reproduce the file plan.
  */
object MediaPipeline {

  final case class Stats(
      raw: Long, routedImage: Long, routedAudio: Long, routedVideo: Long,
      unroutable: Long, decodedImage: Long, decodedAudio: Long,
      decodedVideo: Long, keptImage: Long, keptAudio: Long,
      keptVideo: Long, droppedEvalImage: Long, droppedEvalAudio: Long,
      droppedEvalVideo: Long, droppedQualityImage: Long,
      droppedQualityAudio: Long, droppedQualityVideo: Long,
      shards: Long, exported: Long,
      // r19 — the optional `--mix` stage's per-modality byte masses:
      // what the mixture kept and what it dropped (both empty when no
      // mix was requested)
      mixKeptBytes: Map[String, Long] = Map.empty,
      mixDroppedBytes: Map[String, Long] = Map.empty)

  private val mediaCols = Seq("doc_id", "uri", "mime", "payload")

  /** On-disk byte mass of a tree — the exact budget for the salted
    * write fan-out, free off the namenode (no data scan). */
  private def fsBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Salt cardinality for a byte mass at a per-file budget: ⌈bytes /
    * target⌉, floored at 1, capped at 2¹⁸ buckets (a runaway-input
    * backstop — 256 Ki files of `routedFileBytes` each is far past
    * any single write's sane plan). */
  private def saltCount(bytes: Long, targetBytes: Long): Int =
    math.max(1L, math.min(1L << 18,
      (bytes + targetBytes - 1) / targetBytes)).toInt

  /** The salted modality distribution: hash-partition on `(modality,
    * pmod(hash(doc_id), buckets))` across an EXPLICIT `buckets`-wide
    * exchange so each modality's byte mass fans out across
    * ~`its bytes / routedFileBytes` writer tasks instead of one. The
    * width is explicit because a column-only `repartition` is
    * AQE-coalescible — at small inputs AQE folds it back to one
    * partition, which is correct for bytes but erases the fan-out
    * this exists to pin (and at scale the explicit width IS the byte
    * budget, so there is nothing for AQE to improve). */
  private def saltedByModality(df: DataFrame, buckets: Int): DataFrame =
    df.repartition(buckets, col("modality"),
      pmod(hash(col("doc_id")), lit(buckets)))

  /** Per-modality byte masses of a `modality=`-partitioned tree —
    * free off the namenode, the exact per-branch budgets for the
    * curated write. */
  private def modalityBytes(spark: SparkSession, dir: String)
      : Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("modality="))
      .map(st => st.getPath.getName.stripPrefix("modality=") ->
        fs.getContentSummary(st.getPath).getLength)
      .toMap
  }

  /** Run the funnel over `mediaParquet` (MediaRecord schema: doc_id,
    * uri, mime, payload), writing under `outDir`:
    * `routed/` (modality-partitioned lake), `curated/` (the kept
    * canonical rows, modality-partitioned), `profile/` (q221 catalog
    * readout over the kept media), `shards/` (+ `_manifest`).
    * Intermediate decision frames live in one managed [[CacheScope]],
    * released before return. */
  def curate(spark: SparkSession, mediaParquet: String, outDir: String,
      shardBytes: Long = 64L << 20, maxHamming: Int = 3,
      onScope: CacheScope => Unit = _ => (),
      routedFileBytes: Long = 128L << 20,
      // eval-set decontamination ([[Dedup.fingerprintDecontam]] on
      // the kept canonicals — perceptual, so a benchmark image/clip
      // leaked as a re-encode is still caught); None skips the stage
      eval: Option[DataFrame] = None,
      decontamHamming: Int = 3,
      // per-modality quality-gate thresholds (r18 — the q292/q293/
      // q299 gates composed BEFORE each tier's dedup). Defaults are
      // deliberately permissive floors (a funnel default must not
      // surprise-drop a healthy lake); a corpus team tightens them to
      // its own curation bar. Flat (zero-gradient) stills and the
      // video gates are not parameterized — flat nothing is junk at
      // any bar.
      imageMinPx: Long = 64L, imageAspectMax: Int = 8,
      audioMinFrames: Long = 256L,
      // clip-containment policy of the two-stage dedup tiers (r19 —
      // the r18 advice finding: at real corpus scale the df cap is a
      // consequential dedup policy, not a constant to hard-code).
      // Defaults are [[Dedup.sequenceShingleContainment]]'s; a corpus
      // team tunes them with its quality bars.
      clipK: Int = 3, clipMinSharedNum: Int = 1,
      clipMinSharedDen: Int = 2, clipMaxDf: Long = 100L,
      // optional BYTE-BUDGET MIXTURE over the kept canonicals (r19 —
      // q304 composed, [[Sampling.mixToByteBudget]]): `Some((weights,
      // budgetBytes))` restates the funnel's output as a stated
      // per-modality byte mixture between the keep decision and every
      // export; a kept modality without a weight drops entirely
      // (quota zero is a decision, not an accident)
      mix: Option[(Map[String, Double], Long)] = None): Stats =
    CacheScope.withScope { scope =>
      require(routedFileBytes >= 1,
        s"need routedFileBytes >= 1, got $routedFileBytes")
      val media = spark.read.parquet(mediaParquet)
      val raw = media.count()

      // 1. ROUTE by sniffed magic (never the declared mime): one
      // payload pass, written partitioned by modality so each later
      // stage scans only its own bytes. `unknown` rows are counted
      // and go no further (a real lake quarantines them). The write
      // fans out on (modality, byte-budgeted salt) — see the object
      // scaladoc; the budget is the INPUT tree's real byte mass.
      saltedByModality(media
        .withColumn("sniffed", Multimodal.sniffModality(col("payload")))
        .withColumn("modality",
          split(col("sniffed"), "/").getItem(0)),
        saltCount(fsBytes(spark, mediaParquet), routedFileBytes))
        .write.partitionBy("modality").mode("overwrite")
        .parquet(s"$outDir/routed")
      val routed = spark.read.parquet(s"$outDir/routed")
      val routeCounts = routed.groupBy(col("modality"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def routedOf(modality: String) = routed
        .where(col("modality") === modality)
        .select(mediaCols.map(col): _*)
      def asMedia(df: DataFrame) =
        df.as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc)

      // 2. PER-MODALITY dedup decision — canonical ids to keep.
      // Fingerprint frames are persisted (16 bytes/row): each feeds
      // its cluster closure AND the decoded count, and without the
      // persist the decode pass would run once per consumer (the
      // q255/DhashStore lesson).
      // the EXACT-identity tier shared by the brand-routed ISO-BMFF
      // audio/image families (M4A, HEIC/HEIF/AVIF — the r17 brand
      // dispatch lands them here instead of the video branch): the
      // JDK cannot decode these codecs, but container health and
      // byte identity are still honest — the MP4 video tier's
      // discipline verbatim. Returns (decodable count, keep ids).
      def exactIsoTier(rows: DataFrame): (Long, DataFrame) = {
        val healthy = scope.persist(rows
          .join(Multimodal.isoContainerHealth(asMedia(rows)).toDF()
            .where(col("ok") === 1L).select(col("doc_id")),
            Seq("doc_id"))
          .select(col("doc_id"), sha2(col("payload"), 256).as("__bh")))
        (healthy.count(),
          healthy.groupBy(col("__bh"))
            .agg(min(col("doc_id")).as("doc_id"))
            .select(col("doc_id")))
      }

      // TWO-STAGE sequence dedup, shared by the MJPEG (r18), GIF and
      // audio (r19) tiers: FAMILY clusters collapse re-encode mass
      // first (aligned signatures for frame streams, envelope
      // proximity for audio), then the offset-tolerant clip
      // containment ([[Dedup.sequenceShingleContainment]]) runs over
      // the family REPRESENTATIVES' sequence streams only —
      // overlapping trims of one reel chain into ONE family without
      // the shingle join ever touching collapsed duplicate mass;
      // members attach through their family's representative, the
      // canonical is keep-best on `quality` (never min-id — a damaged
      // copy must not win).
      def twoStageSeqKeep(famClusters: DataFrame, seq: DataFrame,
          alignCol: String, fpCol: String, quality: DataFrame,
          qCols: Seq[String]): DataFrame = {
        val fam = scope.persist(famClusters)
        val repIds = fam.where(col("is_canonical"))
          .select(col("doc_id"))
        val repSeq = scope.persist(seq.join(repIds, Seq("doc_id")))
        val clipPairs = Dedup.sequenceShingleContainment(repSeq,
            "doc_id", alignCol, fpCol, k = clipK,
            minSharedNum = clipMinSharedNum,
            minSharedDen = clipMinSharedDen, maxDf = clipMaxDf,
            scope = scope)
          .select(col("doc_a"), col("doc_b"))
        val repComps = Dedup.nearDupClusters(repIds, "doc_id",
            clipPairs)
          .select(col("doc_id").as("__rep"), col("cluster_id"))
        Multimodal.keepBest(
            fam.select(col("doc_id"), col("cluster_id").as("__rep"))
              .join(repComps, Seq("__rep"))
              .select(col("doc_id"), col("cluster_id")),
            quality, qCols)
          .where(col("is_best")).select(col("doc_id"))
      }

      // image, THREE-tier by coding (the video-branch discipline):
      //   GIF — per-frame dHash → aligned sequence clusters (animated
      //     GIFs are multi-frame; statics degenerate to one frame)
      //   HEIF-family (heic/mif1/avif brands) — exact tier
      //   everything else — single dHash → fingerprint clusters
      // The universes are disjoint by magic, so counts add.
      val imgRouted = routedOf("image")
      val imgSniff = Multimodal.sniffModality(col("payload"))
      val isGif = imgSniff === "image/gif"
      val isIsoImg = imgSniff.isin("image/heic", "image/heif",
        "image/avif")
      // ONE ImageIO pass yields fingerprint AND dims (the keep-best
      // pick needs pixel counts — a second decodeImageMeta pass would
      // decode every still twice)
      val imgDm = scope.persist(
        Multimodal.imageDhashMeta(asMedia(imgRouted.where(!isGif &&
            !isIsoImg))).toDF()
          .where(col("ok") === 1L)
          .select(col("doc_id"), col("dhash"), col("width"),
            col("height")))
      // r18 IMAGE QUALITY GATE — q292's decision read off the SAME
      // one-pass frame (zero extra decode), BEFORE dedup so junk
      // never becomes a canonical: flat (zero-gradient) stills,
      // sub-`imageMinPx` thumbnails, and extreme-aspect strips drop
      // counted; stills smaller than the dHash grid are already
      // ok=0 at the decode gate above.
      val imgGated = scope.persist(imgDm.where(
        col("dhash") =!= 0L &&
          col("width") * col("height") >= imageMinPx &&
          greatest(col("width"), col("height")) <=
            least(col("width"), col("height")) * imageAspectMax))
      val droppedQualityImage = imgDm.count() - imgGated.count()
      val imgFp = imgGated.select(col("doc_id"), col("dhash").as("fp"))
      val gifFp = scope.persist(
        Multimodal.gifFrameFingerprints(asMedia(imgRouted.where(isGif)))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      val (isoImgDecoded, isoImgKeep) =
        exactIsoTier(imgRouted.where(isIsoImg))
      val decodedImage = imgDm.count() +
        gifFp.select(col("doc_id")).distinct().count() + isoImgDecoded
      // canonical pick = KEEP-BEST, never min-id (r18): stills keep
      // the highest-resolution member (q294), GIFs the most-decoded-
      // frames member (q302) — the exact ISO tier stays min-id, its
      // members are byte-identical so no copy is better
      // GIF dedup is TWO-STAGE since r19 (the MJPEG tier's r18
      // discipline on the second frame-stream coding): aligned
      // families collapse re-encodes, then q311's clip containment
      // chains trimmed/embedded GIF re-uploads over the family
      // representatives; canonical keeps the most decoded frames
      // (q302/q312).
      val keepImage = Multimodal.keepBestResolution(
          Dedup.fingerprintClusters(imgFp, "doc_id", "fp",
            maxHamming = maxHamming, bits = 64, scope = scope),
          imgGated.select(col("doc_id"), col("width"), col("height")))
        .where(col("is_best")).select(col("doc_id"))
        .unionByName(twoStageSeqKeep(
          Dedup.alignedFingerprintClusters(gifFp, "doc_id",
            "frame_idx", "fp", maxHamming = maxHamming, bits = 64,
            scope = scope),
          gifFp, "frame_idx", "fp",
          gifFp.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_obs")), Seq("n_obs")))
        .unionByName(isoImgKeep)

      // audio, two-tier: WAV/AIFF — envelope hash → Hamming clusters
      // (the JDK decodes the PCM); ISO-BMFF audio (M4A) — exact tier.
      val audRouted = routedOf("audio")
      val isIsoAud = Multimodal.sniffModality(col("payload")) ===
        "audio/mp4"
      // ONE PCM pass (r18 — the decode-once seam): the window-energy
      // stream powers the envelope fingerprint (derived columnar,
      // pinned ≡ the direct fold) AND the eval gate's clip shingles;
      // nothing below decodes samples again
      val audEnergies = scope.persist(
        Multimodal.audioWindowEnergies(
          asMedia(audRouted.where(!isIsoAud))).toDF()
          .select(col("doc_id"), col("w"), col("amp")))
      val audFpAll = scope.persist(
        Multimodal.envelopeFromEnergies(audEnergies))
      val (isoAudDecoded, isoAudKeep) =
        exactIsoTier(audRouted.where(isIsoAud))
      val decodedAudio = audFpAll.count() + isoAudDecoded
      // header-only meta pass: the keep-best quality AND the duration
      // bar (no second PCM decode; the energy pass above is the only
      // sample scan)
      val audMeta = scope.persist(
        Multimodal.decodeAudioMeta(asMedia(audRouted.where(!isIsoAud)))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("sample_rate"), col("n_frames")))
      // r18 AUDIO QUALITY BAR — q293's too-short rule composed as a
      // configurable `n_frames >= audioMinFrames` floor BEFORE dedup.
      // The envelope decode already enforces >= 65 windows (16640
      // samples, ~2 s at 8 kHz) structurally, so the default bar is
      // permissive; a speech-corpus team raises it (e.g. 10 s · rate).
      // The quiet-share gate stays q293's standalone scope — it needs
      // the segment pass, a second PCM decode this funnel refuses.
      val audFp = scope.persist(audFpAll.join(
        audMeta.where(col("n_frames") >= audioMinFrames)
          .select(col("doc_id")), Seq("doc_id")))
      val droppedQualityAudio = audFpAll.count() - audFp.count()
      // audio dedup is TWO-STAGE since r19 (the verdict's composition
      // gap #1): envelope-hash families collapse re-encodes (q266),
      // then q307's clip containment runs over the family
      // representatives' ALREADY-DECODED window-energy streams — a
      // trimmed audio re-upload shifts every window and escapes the
      // envelope (which hashes the first 65), but shares the
      // excerpt's energy 3-grams; zero extra PCM decode (the one
      // energy pass above powers fingerprint, gates, and this).
      // Canonical = keep-best: highest sample rate, then most frames
      // (q300).
      val keepAudio = twoStageSeqKeep(
          Dedup.fingerprintClusters(audFp, "doc_id", "fp",
            maxHamming = maxHamming, bits = 64, scope = scope),
          audEnergies.join(audFp.select(col("doc_id")), Seq("doc_id")),
          "w", "amp", audMeta, Seq("sample_rate", "n_frames"))
        .unionByName(isoAudKeep)

      // video, two-tier by what the JDK can honestly decode:
      //   MJPEG/AVI — per-frame dHash → aligned sequence clusters
      //     (q279's decision: the PERCEPTUAL rung, since every frame
      //     is a baseline JPEG ImageIO reads)
      //   MP4 — container decode gates health; identity is exact
      //     bytes (sha-256 keep-min, the q16 rule on payloads —
      //     codec-FRAME perception stays the documented out-of-scope
      //     rung for non-MJPEG codecs)
      // The two universes are disjoint by magic (RIFF vs ftyp), so
      // decoded/kept counts add.
      val mjpegFps = scope.persist(
        Multimodal.videoFrameFingerprints(asMedia(routedOf("video")))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("frame_idx"), col("fp")))
      val decodedMjpeg = mjpegFps.select(col("doc_id")).distinct().count()
      // r18 QUALITY GATE before the dedup decision (q299's keep —
      // junk must not survive as a cluster canonical): too-short,
      // tiny-resolution, and all-static clips drop and are counted;
      // a clip whose avih header cannot be read fails the gate too
      // (its resolution cannot be attested). Gates fold over the
      // ALREADY-COMPUTED fingerprint frame + the header-arithmetic
      // meta pass — no extra pixel decode.
      val mjpegGateKeep = scope.persist(
        Multimodal.videoQualityGates(mjpegFps,
            Multimodal.decodeMjpegMeta(asMedia(routedOf("video")))
              .toDF().where(col("ok") === 1L)
              .select(col("doc_id"), col("width"), col("height")))
          .where(col("keep")).select(col("doc_id")))
      val droppedQualityVideo = decodedMjpeg - mjpegGateKeep.count()
      val gatedFps = scope.persist(
        mjpegFps.join(mjpegGateKeep, Seq("doc_id")))
      // VIDEO dedup decision, TWO-STAGE (r18): aligned families first
      // (re-encodes/remuxes — exact-signature collapse keeps the
      // clip pass off the duplicate mass), then q305's
      // offset-tolerant clip containment over the FAMILY
      // REPRESENTATIVES only — overlapping trims of one reel chain
      // into ONE family (q308's decision) without ever running the
      // shingle join on collapsed duplicates. Members attach through
      // their aligned family's representative; canonical = keep-best
      // by observed frames (q301 — a damaged copy must not win on
      // min id).
      val keepMjpeg = twoStageSeqKeep(
        Dedup.alignedFingerprintClusters(gatedFps,
          "doc_id", "frame_idx", "fp", maxHamming = maxHamming,
          bits = 64, scope = scope),
        gatedFps, "frame_idx", "fp",
        gatedFps.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_obs")), Seq("n_obs"))
      val vidHash = scope.persist(
        routedOf("video")
          .select(col("doc_id"), sha2(col("payload"), 256).as("bh"))
          .join(Multimodal.decodeVideoMeta(asMedia(routedOf("video")))
            .toDF().where(col("ok") === 1L).select(col("doc_id")),
            Seq("doc_id")))
      val decodedVideo = vidHash.count() + decodedMjpeg
      val keepVideo = vidHash.groupBy(col("bh"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
        .unionByName(keepMjpeg)

      // 3. CURATED tree: the kept canonical rows, still partitioned
      // by modality (one payload pass per modality). The keep-id
      // frames are NOT hint-broadcast: canonical lists scale with the
      // corpus (a near-dup-free lake keeps ~everything), so a forced
      // broadcast is exactly the at-scale OOM the q223/q264
      // discipline forbids — AQE broadcasts them at small SF on its
      // own and correctly refuses when they would not fit.
      // 2b. EVAL-SET DECONTAMINATION (between dedup and export): the
      // kept STILL canonicals gate against the eval set's dHashes,
      // the kept WAV/AIFF canonicals against its envelope hashes
      // ([[Dedup.fingerprintDecontam]]'s perceptual rung — q295/
      // q296), and since r18 the kept GIF and MJPEG canonicals gate
      // against the eval set's per-frame dHash SEQUENCES
      // ([[Dedup.alignedFingerprintDecontam]] — q297/q298: an eval
      // clip leaked as a re-encode/remux byte-compares different AND
      // escapes the single-fingerprint gates). Eval fingerprints
      // decode from the eval payloads by the SAME router dispatch;
      // every gate reuses the persisted train fp frames, so no train
      // payload is re-decoded. Only the ISO exact tier keeps its
      // canonicals ungated (the JDK cannot fingerprint those codecs
      // — byte identity against eval bytes is subsumed by dedup when
      // the eval rows are in the lake, and a perceptual gate would
      // need the codec).
      def decontamDrops(trainFp: DataFrame, evalFp: DataFrame,
          keep: DataFrame): DataFrame =
        Dedup.fingerprintDecontam(
          trainFp.join(keep, Seq("doc_id")), evalFp,
          "doc_id", "fp", maxHamming = decontamHamming, bits = 64)
          .select(col("doc_id"))
      // sequence rungs compose-OR (r18): the ALIGNED gate sees
      // re-encodes/remuxes (per-frame Hamming tolerance, same index),
      // the SHINGLE gate sees TRIMMED/embedded eval clips (exact
      // shingles at any offset — q306); either flags the canonical
      def seqDecontamDrops(trainFps: DataFrame, evalFps: DataFrame,
          keep: DataFrame): DataFrame = {
        // both gates read the kept frames — persist the restriction
        val kept = scope.persist(trainFps.join(keep, Seq("doc_id")))
        Dedup.alignedFingerprintDecontam(
          kept, evalFps, "doc_id", "frame_idx", "fp",
          maxHamming = decontamHamming, bits = 64, scope = scope)
          .select(col("doc_id"))
          .unionByName(Dedup.sequenceShingleDecontam(
            kept, evalFps, "doc_id", "frame_idx", "fp",
            scope = scope)
            .select(col("doc_id")))
          .distinct()
      }
      val (keepImageG, keepAudioG, keepVideoG, droppedEvalImage,
          droppedEvalAudio, droppedEvalVideo) =
        eval match {
          case Some(ev) =>
            // the keep frames get a second consumer (gate + anti-join)
            // — persist the id-only frames so the cluster closures
            // above run once
            val keepImageP = scope.persist(keepImage)
            val keepAudioP = scope.persist(keepAudio)
            val keepVideoP = scope.persist(keepVideo)
            val evSniff = Multimodal.sniffModality(col("payload"))
            val evStill = ev.where(evSniff.startsWith("image") &&
              evSniff =!= "image/gif" && !evSniff.isin("image/heic",
                "image/heif", "image/avif"))
              .select(mediaCols.map(col): _*)
            val evWave = ev.where(evSniff.isin("audio/wav",
              "audio/aiff")).select(mediaCols.map(col): _*)
            val evImgFp = Multimodal.imageDhash(asMedia(evStill)).toDF()
              .where(col("ok") === 1L)
              .select(col("doc_id"), col("dhash").as("fp"))
            // eval audio decodes once too: energies → envelope fp
            // AND the clip-shingle stream
            val evWaveEnergies = scope.persist(
              Multimodal.audioWindowEnergies(asMedia(evWave)).toDF()
                .select(col("doc_id"), col("w"), col("amp")))
            val evAudFp = Multimodal.envelopeFromEnergies(
              evWaveEnergies)
            val evGifFp = Multimodal.gifFrameFingerprints(asMedia(
                ev.where(evSniff === "image/gif")
                  .select(mediaCols.map(col): _*)))
              .toDF().where(col("ok") === 1L)
              .select(col("doc_id"), col("frame_idx"), col("fp"))
            val evAviFp = Multimodal.videoFrameFingerprints(asMedia(
                ev.where(evSniff === "video/x-msvideo")
                  .select(mediaCols.map(col): _*)))
              .toDF().where(col("ok") === 1L)
              .select(col("doc_id"), col("frame_idx"), col("fp"))
            // still + GIF drops both live on the image branch; the
            // frame-frame joins restrict each gate to its own tier
            val dropsImg = scope.persist(
              decontamDrops(imgFp, evImgFp, keepImageP)
              .unionByName(
                seqDecontamDrops(gifFp, evGifFp, keepImageP)))
            // audio gates compose-OR: envelope proximity (q296 — a
            // renormalized re-encode) OR energy-stream clip shingles
            // (q309 — a TRIMMED eval excerpt shifts every window and
            // escapes the envelope, which hashes the first 65)
            val dropsAud = scope.persist(
              decontamDrops(audFp, evAudFp, keepAudioP)
                .unionByName(Dedup.sequenceShingleDecontam(
                  audEnergies.join(keepAudioP, Seq("doc_id")),
                  evWaveEnergies, "doc_id", "w", "amp",
                  scope = scope).select(col("doc_id")))
                .distinct())
            val dropsVid = scope.persist(
              seqDecontamDrops(gatedFps, evAviFp, keepVideoP))
            (keepImageP.join(dropsImg, Seq("doc_id"), "left_anti"),
              keepAudioP.join(dropsAud, Seq("doc_id"), "left_anti"),
              keepVideoP.join(dropsVid, Seq("doc_id"), "left_anti"),
              dropsImg.count(), dropsAud.count(), dropsVid.count())
          case None => (keepImage, keepAudio, keepVideo, 0L, 0L, 0L)
        }

      // 2c. OPTIONAL BYTE-BUDGET MIXTURE (r19 — q304 composed into
      // the funnel): restate the kept canonicals as a stated
      // per-modality byte mixture BEFORE any export, so the curated
      // tree, profile, and shards all see the mixture. The decision
      // frame is (doc_id, modality, n_bytes) — 24 B/row, payloads
      // never shuffle; the per-modality masses are a ≤-3-row collect
      // (driver-dim by construction).
      val keptTriple = Seq("image" -> keepImageG, "audio" -> keepAudioG,
        "video" -> keepVideoG)
      val (keptMixed, mixKeptBytes, mixDroppedBytes) = mix match {
        case Some((weights, budgetBytes)) =>
          val lens = scope.persist(keptTriple.map { case (m, keep) =>
            routedOf(m).join(keep, Seq("doc_id"))
              .select(col("doc_id"), lit(m).as("modality"),
                octet_length(col("payload")).cast("long")
                  .as("n_bytes"))
          }.reduce(_.unionByName(_)))
          val picked = scope.persist(
            graft.operators.Sampling.mixToByteBudget(lens, "doc_id",
              "modality", col("n_bytes"), weights, budgetBytes))
          def massOf(df: DataFrame): Map[String, Long] =
            df.groupBy(col("modality"))
              .agg(sum(col("n_bytes")).cast("long").as("b"))
              .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val pre = massOf(lens)
          val post = massOf(picked)
          (keptTriple.map { case (m, keep) =>
            m -> keep.join(picked.where(col("modality") === m)
              .select(col("doc_id")), Seq("doc_id"))
          }, post,
            pre.map { case (m, b) =>
              m -> (b - post.getOrElse(m, 0L)) })
        case None =>
          (keptTriple, Map.empty[String, Long], Map.empty[String, Long])
      }

      // each branch salts against ITS OWN routed byte mass (free off
      // the namenode; the kept subset is ≤ it) — a per-modality
      // budget, so a lake that is 95% video by bytes does not
      // shatter its audio sliver into video-sized bucket counts
      val branchBuckets = modalityBytes(spark, s"$outDir/routed")
        .map { case (m, b) => m -> saltCount(b, routedFileBytes) }
      def keptOf(modality: String, keep: DataFrame) =
        routedOf(modality).join(keep, Seq("doc_id"))
          .withColumn("modality", lit(modality))
          .withColumn("__salt", pmod(hash(col("doc_id")),
            lit(branchBuckets.getOrElse(modality, 1))))
      keptMixed.map { case (m, keep) => keptOf(m, keep) }
        .reduce(_.unionByName(_))
        .repartition(math.max(1, branchBuckets.values.sum),
          col("modality"), col("__salt"))
        .drop("__salt")
        .write.partitionBy("modality").mode("overwrite")
        .parquet(s"$outDir/curated")
      val curated = spark.read.parquet(s"$outDir/curated")
      val keptCounts = curated.groupBy(col("modality"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def curatedOf(modality: String) = curated
        .where(col("modality") === modality)
        .select(mediaCols.map(col): _*)

      // 4. PROFILE the kept media (q221's readout, measured on what
      // survives — the distributions a training run will actually
      // see). Video metadata dispatches by the same magic the router
      // used: MP4s through the ISO-BMFF box walk, MJPEG/AVIs through
      // the avih header — each tier's kept rows profile as ok=1
      // through THEIR decoder, never the other's.
      val vidCurated = curatedOf("video")
      val isAvi = Multimodal.sniffModality(col("payload")) ===
        "video/x-msvideo"
      // exact-tier kept rows (M4A / HEIF-family) profile on what the
      // JDK can honestly measure — container health (ok by
      // construction: the keep gate walked them), the ftyp BRAND,
      // and since r18 the box-walk METADATA readouts (q303's
      // [[Multimodal.decodeIsoMeta]]): HEIF `ispe` pixel dims bucket
      // into q221's image resolution bands, M4A `mvhd` duration into
      // its audio duration bands — appended to q221's fold rather
      // than run through the pixel/PCM decoders that would misreport
      // a healthy-but-undecodable codec as corrupt
      def isoProfileRows(cur: DataFrame, modality: String)
          : DataFrame = {
        val m = Multimodal.decodeIsoMeta(asMedia(cur)).toDF()
        val px = col("width") * col("height")
        val base = m.select(lit(modality).as("modality"),
            lit("health").as("dimension"),
            when(col("ok") === 1L, "ok").otherwise("corrupt")
              .as("bucket"))
          .unionByName(m.where(col("ok") === 1L)
            .select(lit(modality).as("modality"),
              lit("container").as("dimension"),
              col("brand").as("bucket")))
        val meta =
          if (modality == "image")
            m.where(col("ok") === 1L && col("width").isNotNull)
              .select(lit(modality).as("modality"),
                lit("resolution").as("dimension"),
                when(px < 1024L, "tiny").when(px < 2048L, "small")
                  .otherwise("medium").as("bucket"))
          else
            m.where(col("ok") === 1L && col("duration_ms").isNotNull)
              .select(lit(modality).as("modality"),
                lit("duration").as("dimension"),
                when(col("duration_ms") < 10L, "lt_10ms")
                  .when(col("duration_ms") < 20L, "lt_20ms")
                  .otherwise("ge_20ms").as("bucket"))
        base.unionByName(meta)
      }
      val isoExtra = isoProfileRows(curatedOf("image")
          .where(isIsoImg), "image")
        .unionByName(isoProfileRows(curatedOf("audio")
          .where(isIsoAud), "audio"))
        .groupBy(col("modality"), col("dimension"), col("bucket"))
        .agg(count(lit(1)).as("n"))
      Multimodal.mediaProfile(
          Multimodal.decodeImageMeta(asMedia(curatedOf("image")
            .where(!isIsoImg))).toDF(),
          Multimodal.decodeAudioMeta(asMedia(curatedOf("audio")
            .where(!isIsoAud))).toDF(),
          Multimodal.decodeVideoMeta(asMedia(vidCurated.where(!isAvi)))
            .toDF()
            .unionByName(Multimodal.decodeMjpegMeta(
              asMedia(vidCurated.where(isAvi))).toDF()))
        .unionByName(isoExtra)
        .groupBy(col("modality"), col("dimension"), col("bucket"))
        .agg(sum(col("n")).as("n"))
        .orderBy(col("modality"), col("dimension"), col("bucket"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/profile")

      // 5. SHARD EXPORT: byte-budgeted one-file-per-shard tree with
      // _manifest — payload octet lengths drive the same
      // deterministic prefix-sum file plan the text funnel uses.
      // writeShards targets a fresh tree by contract; replace any
      // prior run's output so the whole funnel is re-runnable like
      // its other stages (the assignment is deterministic, so a
      // re-run reproduces the same file plan).
      val shardsPath = new org.apache.hadoop.fs.Path(s"$outDir/shards")
      val fs = shardsPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (fs.exists(shardsPath)) fs.delete(shardsPath, true)
      val (shards, exported) = Packing.writeShards(
        curated.select((mediaCols :+ "modality").map(col): _*),
        "doc_id", "payload", s"$outDir/shards", shardBytes)

      val stats = Stats(raw,
        routeCounts.getOrElse("image", 0L),
        routeCounts.getOrElse("audio", 0L),
        routeCounts.getOrElse("video", 0L),
        routeCounts.getOrElse("unknown", 0L),
        decodedImage, decodedAudio, decodedVideo,
        keptCounts.getOrElse("image", 0L),
        keptCounts.getOrElse("audio", 0L),
        keptCounts.getOrElse("video", 0L),
        droppedEvalImage, droppedEvalAudio, droppedEvalVideo,
        droppedQualityImage, droppedQualityAudio, droppedQualityVideo,
        shards, exported, mixKeptBytes, mixDroppedBytes)
      onScope(scope)
      stats
    }
}
