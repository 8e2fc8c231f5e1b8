package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.CacheScope
import graft.operators.{Dedup, Multimodal, Packing}

/** The PAIRED text+media curation funnel — the LAION-style product
  * path: the unit of a multimodal training corpus is the (caption,
  * image) ROW, and neither single-modality funnel ([[CorpusPipeline]]
  * curates text, [[MediaPipeline]] curates media) makes the composed
  * keep decision for it. q273 established WHICH decision is
  * principled — `union_clusters`, the compose-OR policy: two pairs
  * are duplicates when they chain through shared TEXT clusters or
  * shared IMAGE clusters, and the corpus keeps one canonical per
  * connected component of that union graph (kept_and over-drops,
  * kept_or leaves cross-modal dups in). This pipeline APPLIES it end
  * to end:
  *
  *   raw (doc_id, text, uri, mime, payload)
  *       → text near-dup clusters (q31's MinHash-LSH closure — the
  *         caption side) × image clusters (q261's dHash closure,
  *         duplicate-mass-bounded broadcasts) joined on doc_id; rows
  *         whose image fails decode are DROPPED and counted (a pair
  *         without a usable image is not a training pair)
  *       → the q273 compose-OR closure WITHOUT doc pairs: label
  *         propagation over the bipartite (text cluster)–(image
  *         cluster) cell graph (t-nodes at 2·tcid, i-nodes at
  *         2·icid+1), each doc attached through its t-node, one
  *         min-id canonical per union component
  *       → optional EVAL-SET DECONTAMINATION (`eval = Some(df)`),
  *         compose-OR like the keep policy itself: a kept pair drops
  *         when its caption overlaps the eval captions (q49's gate)
  *         OR its image sits within Hamming `decontamHamming` of an
  *         eval image (q295's gate) — flagged pairs counted
  *       → kept pairs written as `curated/` (text AND payload — the
  *         pair stays one row) → shard export with `_manifest`,
  *         budgeted on `octet_length(text) + octet_length(payload)`
  *         (both modalities ride the shard file, so both meter it —
  *         [[Packing.writeShardsWeighted]])
  *
  * Scale shape: payloads are scanned once (the dHash pass); every
  * decision frame that shuffles is a 16-byte (doc_id, cluster) row;
  * the cell graph and its component labels scale with the corpus and
  * are therefore NEVER broadcast (shuffle equi-joins on node /
  * component / doc_id — the q273 scaladoc's discipline); the driver
  * holds stage counts, never rows. `kept` EQUALS q273's
  * `union_clusters` over the same paired lake by construction —
  * MainSpec pins the identity.
  */
object PairedPipeline {

  final case class Stats(
      raw: Long, decodable: Long, droppedImage: Long,
      droppedAudio: Long, kept: Long, droppedEval: Long, shards: Long,
      exported: Long,
      // --mix readout (r20): per-modality byte masses kept/dropped by
      // the paired byte-budget stage; empty when mix = None
      mixKeptBytes: Map[String, Long] = Map.empty,
      mixDroppedBytes: Map[String, Long] = Map.empty)

  private val pairCols = Seq("doc_id", "text", "uri", "mime", "payload")

  /** Run the paired funnel over `pairedParquet` (doc_id, text, uri,
    * mime, payload), writing `curated/` (kept pairs) and `shards/`
    * (+ `_manifest`) under `outDir`. Minhash parameters default to
    * the registry's q273 configuration so the kept mass is the
    * oracle-checked policy row.
    *
    * TRI-MODAL rows (r18): when the input carries an `audio` column
    * (a third per-row payload — the caption+image+audio training
    * triple), the keep decision upgrades from q273's bipartite
    * closure to q286's k-PARTITE one: audio near-dup clusters join
    * the cell graph through the per-doc spanning path t-node —
    * i-node — a-node (nodes at `3·cid + {0,1,2}`), and two triples
    * are duplicates when they chain through ANY modality's clusters.
    * The audio cluster decision is TWO-STAGE since r20 (q266 ∘ q307,
    * the corpus-media discipline): envelope-hash families collapse
    * re-encodes, then clip containment over the family
    * representatives' energy streams chains TRIMMED re-uploads the
    * whole-clip envelope cannot see — one PCM pass powers both
    * stages and the eval gate. Rows whose audio fails decode drop
    * and are counted (`droppedAudio` — a triple without usable audio
    * is not a training triple, the image rule's sibling); the eval
    * gate composes the audio envelope rung (q296) OR the
    * trim-tolerant energy-shingle rung (q309); the shard meter adds
    * the audio octets. Without the column the 2-modal path is
    * byte-identical to before. */
  def curate(spark: SparkSession, pairedParquet: String, outDir: String,
      shardBytes: Long = 64L << 20, maxHamming: Int = 3,
      threshold: Double = 0.5, minhashK: Int = 16,
      minhashBands: Int = 4,
      // eval-set decontamination over the kept pairs — compose-OR,
      // like the keep policy itself: a pair drops when its TEXT
      // overlaps the eval captions (q49's gate) OR its IMAGE sits
      // within `decontamHamming` of an eval image (q295's gate) OR,
      // tri-modal, its AUDIO matches an eval clip on the envelope
      // (q296) or on trim-tolerant energy shingles (q309)
      eval: Option[DataFrame] = None,
      contaminatedAt: Double = 0.2, decontamHamming: Int = 3,
      // clip-containment policy of the two-stage audio tier (r20 —
      // [[MediaPipeline.curate]]'s knobs, same rationale: at corpus
      // scale the df cap is a consequential dedup policy). Defaults
      // are [[Dedup.sequenceShingleContainment]]'s; q313 is the
      // measured operating-point readout behind them.
      clipK: Int = 3, clipMinSharedNum: Int = 1,
      clipMinSharedDen: Int = 2, clipMaxDf: Long = 100L,
      // optional PAIRED BYTE-BUDGET MIXTURE over the kept pairs (r20
      // — [[Sampling.pairedMixToByteBudget]], q316's decision):
      // `Some((weights, budgetBytes))` keeps a uniform deterministic
      // row fraction such that NO modality exceeds its stated byte
      // share of the budget — rows are atomic, so the binding
      // modality fixes the fraction and the others land under cap
      mix: Option[(Map[String, Double], Long)] = None): Stats =
    CacheScope.withScope { scope =>
      val paired = spark.read.parquet(pairedParquet)
      val hasAudio = paired.columns.contains("audio")
      val outCols = if (hasAudio) pairCols :+ "audio" else pairCols
      val raw = paired.count()

      // 1. per-modality decisions. Text clusters cover every row;
      // image (and audio, tri-modal) clusters only the decodable
      // payloads.
      val textC = Dedup.nearDupClusters(paired, "doc_id",
        Dedup.minhashLshPairs(paired, "doc_id", "text",
          threshold = threshold, k = minhashK, bands = minhashBands,
          scope = scope))
        .select(col("doc_id"), col("cluster_id").as("tcid"))
      val dh = scope.persist(
        Multimodal.imageDhash(paired.select(pairCols.map(col): _*)
            .select(col("doc_id"), col("uri"), col("mime"),
              col("payload"))
            .as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc))
          .toDF().where(col("ok") === 1L)
          .select(col("doc_id"), col("dhash").as("fp")))
      val imgC = Dedup.fingerprintClusters(dh, "doc_id", "fp",
          maxHamming = maxHamming, bits = 64, scope = scope)
        .select(col("doc_id"), col("cluster_id").as("icid"))
      val joint2 = scope.persist(textC.join(imgC, Seq("doc_id")))
      val decodable2 = joint2.count()

      // tri-modal: audio payloads ride the same MediaRecord decode
      // shape (the row's uri/mime carry over — the envelope hash
      // reads bytes only); a triple whose audio fails decode is not
      // a training triple, the image rule's sibling
      def audioAsMedia(df: DataFrame) = df
        .select(col("doc_id"), col("uri"), col("mime"),
          col("audio").as("payload"))
        .as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc)
      // ONE PCM pass (r20 — the corpus-media decode-once seam): the
      // window-energy stream powers the envelope fingerprint (derived
      // columnar, pinned ≡ the direct fold), the TWO-STAGE cluster
      // decision, and the eval gate's clip shingles; nothing below
      // decodes samples again
      val audEnergies =
        if (hasAudio) scope.persist(
          Multimodal.audioWindowEnergies(audioAsMedia(paired)).toDF()
            .select(col("doc_id"), col("w"), col("amp")))
        else spark.emptyDataFrame
      val audFp =
        if (hasAudio) scope.persist(
          Multimodal.envelopeFromEnergies(audEnergies))
        else spark.emptyDataFrame
      // the audio cluster decision is TWO-STAGE (r20, the r19 verdict
      // gap: whole-clip envelope proximity misses a TRIMMED audio
      // re-upload — every window shifts, the envelope hashes the
      // first 65): envelope-hash families (q266) collapse re-encodes
      // first, then q307's clip containment chains trimmed excerpts
      // over the family REPRESENTATIVES' already-decoded energy
      // streams; each doc's acid is its two-stage component — the
      // composition [[MediaPipeline]]'s twoStageSeqKeep embodies,
      // here as a CLUSTER id because the k-partite cell graph (not a
      // per-modality keep-best) makes the paired keep decision
      val acid =
        if (!hasAudio) spark.emptyDataFrame
        else {
          val fam = scope.persist(
            Dedup.fingerprintClusters(audFp, "doc_id", "fp",
              maxHamming = maxHamming, bits = 64, scope = scope))
          val repIds = fam.where(col("is_canonical"))
            .select(col("doc_id"))
          val clipPairs = Dedup.sequenceShingleContainment(
              audEnergies.join(repIds, Seq("doc_id")), "doc_id", "w",
              "amp", k = clipK, minSharedNum = clipMinSharedNum,
              minSharedDen = clipMinSharedDen, maxDf = clipMaxDf,
              scope = scope)
            .select(col("doc_a"), col("doc_b"))
          val repComps = Dedup.nearDupClusters(repIds, "doc_id",
              clipPairs)
            .select(col("doc_id").as("__rep"),
              col("cluster_id").as("acid"))
          fam.select(col("doc_id"), col("cluster_id").as("__rep"))
            .join(repComps, Seq("__rep"))
            .select(col("doc_id"), col("acid"))
        }
      val joint = if (!hasAudio) joint2 else scope.persist(
        joint2.join(acid, Seq("doc_id")))
      val decodable = if (hasAudio) joint.count() else decodable2

      // 2. the compose-OR keep decision — q273's union closure at
      // k = 2, q286's at k = 3, per doc: components of the k-partite
      // cell graph (each doc contributes its spanning path t-node —
      // i-node [— a-node], nodes at k·cid + modality offset), docs
      // attached through their t-node, min-id canonical per
      // component. The cell/component frames scale with the corpus:
      // shuffle joins only.
      val k = if (hasAudio) 3 else 2
      val tiCells = joint.select((col("tcid") * k).as("doc_a"),
        (col("icid") * k + 1).as("doc_b")).distinct()
      val cells = if (!hasAudio) tiCells
        else tiCells.unionByName(
          joint.select((col("icid") * k + 1).as("doc_a"),
            (col("acid") * k + 2).as("doc_b")).distinct())
      val nodes = cells.select(col("doc_a").as("node"))
        .unionByName(cells.select(col("doc_b").as("node"))).distinct()
      val comps = Dedup.nearDupClusters(nodes, "node", cells)
        .select(col("doc_id").as("__node"), col("cluster_id")
          .as("__comp"))
      val keepIds = joint
        .select(col("doc_id"), (col("tcid") * k).as("__node"))
        .join(comps, Seq("__node"))
        .groupBy(col("__comp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))

      // 2b. EVAL-SET DECONTAMINATION over the kept pairs (between
      // dedup and export) — compose-OR like the keep policy: text
      // overlap (q49's broadcast-eval shingle gate over the caption)
      // OR image proximity (q295's fingerprintDecontam over the
      // already-persisted pair dHashes — no payload re-decode) OR,
      // tri-modal, audio envelope proximity (q296's rung, when the
      // eval set carries an audio column too).
      val keptPairs0 = paired.select(outCols.map(col): _*)
        .join(keepIds, Seq("doc_id"))
      val (keptPairs, droppedEval) = eval match {
        case Some(ev) =>
          val kp = scope.persist(keptPairs0)
          val evSniff = Multimodal.sniffModality(col("payload"))
          val evImgFp = Multimodal.imageDhash(
            ev.where(evSniff.startsWith("image"))
              .select(col("doc_id"), col("uri"), col("mime"),
                col("payload"))
              .as[Multimodal.MediaRecord](Multimodal.mediaRecordEnc))
            .toDF().where(col("ok") === 1L)
            .select(col("doc_id"), col("dhash").as("fp"))
          val textFlagged = Dedup.evalOverlapRate(kp, ev, "doc_id",
              "text", contaminatedAt = contaminatedAt)
            .where(col("contaminated") === 1).select(col("doc_id"))
          val imgFlagged = Dedup.fingerprintDecontam(
            dh.join(kp.select(col("doc_id")), Seq("doc_id")),
            evImgFp, "doc_id", "fp", maxHamming = decontamHamming,
            bits = 64).select(col("doc_id"))
          val audFlagged =
            if (hasAudio && ev.columns.contains("audio")) {
              // the eval audio decodes ONCE too: energies power the
              // envelope fp AND the clip shingles. The two rungs
              // compose-OR (r20): q296's envelope gate sees
              // re-encodes, q309's trim-tolerant shingle gate sees a
              // TRIMMED eval excerpt that shifts every window and
              // escapes the envelope (which hashes the first 65) —
              // the exact gap the keep decision's two-stage upgrade
              // closes, closed for the gate as well
              val evEnergies = scope.persist(
                Multimodal.audioWindowEnergies(audioAsMedia(ev)).toDF()
                  .select(col("doc_id"), col("w"), col("amp")))
              Dedup.fingerprintDecontam(
                  audFp.join(kp.select(col("doc_id")), Seq("doc_id")),
                  Multimodal.envelopeFromEnergies(evEnergies),
                  "doc_id", "fp", maxHamming = decontamHamming,
                  bits = 64).select(col("doc_id"))
                .unionByName(Dedup.sequenceShingleDecontam(
                  audEnergies.join(kp.select(col("doc_id")),
                    Seq("doc_id")),
                  evEnergies, "doc_id", "w", "amp", k = clipK,
                  minSharedNum = clipMinSharedNum,
                  minSharedDen = clipMinSharedDen, maxDf = clipMaxDf,
                  scope = scope).select(col("doc_id")))
            } else textFlagged.limit(0)
          val flagged = scope.persist(
            textFlagged.unionByName(imgFlagged)
              .unionByName(audFlagged).distinct())
          (kp.join(flagged, Seq("doc_id"), "left_anti"),
            flagged.count())
        case None => (keptPairs0, 0L)
      }

      // 2c. OPTIONAL PAIRED BYTE-BUDGET MIXTURE (r20 — q316 composed
      // into the funnel, the media funnel's --mix sibling): rows are
      // ATOMIC (text+image[+audio] travel together), so the stated
      // per-modality byte shares act as CAPS and the binding modality
      // fixes ONE uniform deterministic keep fraction
      // ([[graft.operators.Sampling.pairedMixToByteBudget]]) —
      // applied between the keep decision and every export so the
      // curated tree and the shards both see the mixture. The
      // decision frame is (doc_id, ≤3 longs); payloads never
      // shuffle; the mass readout is a ≤-3-entry driver map.
      val modMasses: Seq[(String, org.apache.spark.sql.Column)] =
        Seq("text" -> octet_length(col("text")).cast("long"),
          "image" -> octet_length(col("payload")).cast("long")) ++
          (if (hasAudio)
            Seq("audio" -> octet_length(col("audio")).cast("long"))
          else Nil)
      val (keptMixed, mixKeptBytes, mixDroppedBytes) = mix match {
        case Some((weights, budgetBytes)) =>
          val kp2 = scope.persist(keptPairs)
          val picked = scope.persist(
            graft.operators.Sampling.pairedMixToByteBudget(
              kp2, "doc_id", modMasses, weights, budgetBytes))
          def massOf(df: DataFrame): Map[String, Long] = {
            val r = df.agg(
              sum(col(s"${modMasses.head._1}_bytes")).cast("long")
                .as(modMasses.head._1),
              modMasses.tail.map { case (m, _) =>
                sum(col(s"${m}_bytes")).cast("long").as(m) }: _*)
              .collect().head
            modMasses.map { case (m, _) =>
              m -> Option(r.getAs[java.lang.Long](m))
                .map(_.longValue).getOrElse(0L) }.toMap
          }
          val lens = kp2.select(col("doc_id") +: modMasses.map {
            case (m, c) => c.as(s"${m}_bytes") }: _*)
          val pre = massOf(lens)
          val post = massOf(picked)
          (kp2.join(picked.select(col("doc_id")), Seq("doc_id")),
            post,
            pre.map { case (m, b) => m -> (b - post.getOrElse(m, 0L)) })
        case None =>
          (keptPairs, Map.empty[String, Long], Map.empty[String, Long])
      }

      // 3. curated pairs + weighted shard export (the audio octets
      // ride the shard file too, so they meter it too).
      keptMixed.write.mode("overwrite").parquet(s"$outDir/curated")
      val curated = spark.read.parquet(s"$outDir/curated")
      val kept = curated.count()
      val shardsPath = new org.apache.hadoop.fs.Path(s"$outDir/shards")
      val fs = shardsPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (fs.exists(shardsPath)) fs.delete(shardsPath, true)
      val rowWeight = octet_length(col("text")) +
        octet_length(col("payload")) +
        (if (hasAudio) octet_length(col("audio")) else lit(0))
      val (shards, exported) = Packing.writeShardsWeighted(curated,
        "doc_id", rowWeight, s"$outDir/shards", shardBytes)
      Stats(raw, decodable, raw - decodable2, decodable2 - decodable,
        kept, droppedEval, shards, exported, mixKeptBytes,
        mixDroppedBytes)
    }
}
