package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.engine.CacheScope
import graft.functions.TextHash

/** Sequence packing for context-window training (SURVEY.md §2.11): the
  * concat-and-chunk step that turns a document stream into fixed-size
  * token windows. Documents are concatenated in `idCol` order and cut
  * every `maxTokens`; each document's pack assignment is a pure
  * function of the GLOBAL token offset where it starts.
  *
  * The interesting part at scale is that global offset: it is a prefix
  * sum over the whole ordered corpus, and the naive formulation —
  * `sum(n) over (ORDER BY id)` with no partition — collapses the entire
  * dataset into ONE task (Spark warns `No Partition Defined for Window`
  * and ships every row to a single partition; at 100 TB that is not
  * slow, it is dead). This operator computes the same number in two
  * phases, the textbook distributed scan:
  *
  *   1. range-repartition by `idCol` (partition i holds ids strictly
  *      below partition i+1's — so (partition, id) IS the global order)
  *      and take a per-partition running sum with an ordinary
  *      partition-local window;
  *   2. collect the K per-partition token totals (K = shuffle
  *      partitions — KB-scale, like q21's √N centroid table, never
  *      corpus-scale), exclusive-prefix them on the driver, and add
  *      each partition's prefix back via a broadcast join on the
  *      partition id.
  *
  * The result is identical for ANY partition count (offsets depend only
  * on the id order), which is what the single-window DuckDB oracle
  * replays. PackingSpec pins partition-count invariance explicitly.
  *
  * Output per doc: n_tokens, global_offset (tokens before it), pack_id
  * (the window its first token lands in), pack_offset (position within
  * that window), spans_boundary (whether it crosses into the next
  * window — the consumer's signal to split or re-pad).
  */
object Packing {

  /** The shared two-phase distributed prefix sum over a
    * `(doc_id, n_tokens)` frame — phases 1/2 of the scaladoc above;
    * returns `(doc_id, n_tokens, global_offset)` unordered.
    * [[contiguousOffsets]] runs it on token counts,
    * [[shardManifest]] on byte counts. */
  private def globalOffsets(counts: DataFrame,
      scope: CacheScope): DataFrame = {
    val spark = counts.sparkSession
    // phase 1: range partitions aligned with the global order + local scan.
    // Persisted: the totals aggregate and the output projection both read
    // it, and re-running it would re-shuffle the corpus.
    val parts = math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val ranged = scope.persist(counts
      .repartitionByRange(parts, col("doc_id"))
      .withColumn("pid", spark_partition_id()))
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // phase 2: K partition totals -> exclusive prefix on the driver
    val totals = ranged.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).cast("long").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefixRows = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, before), (pid, _)) =>
      Row(pid.toLong, before)
    }
    val prefix = spark.createDataFrame(
      spark.sparkContext.parallelize(prefixRows.toSeq, 1),
      StructType(Seq(StructField("pid_l", LongType),
        StructField("part_before", LongType))))
    val off = col("part_before") +
      coalesce(sum(col("n_tokens")).over(w), lit(0L))
    ranged
      .join(broadcast(prefix), col("pid") === col("pid_l"))
      .select(col("doc_id"), col("n_tokens"), off.as("global_offset"))
  }

  def contiguousOffsets(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int = 2048,
      scope: CacheScope = CacheScope.unmanaged,
      subwordMerges: Option[Seq[(String, String)]] = None): DataFrame = {
    require(maxTokens >= 1, s"need maxTokens >= 1, got $maxTokens")
    // tokenizer seam (r15, as tokenFertility's/mixToTokenBudget's):
    // None = whitespace tokens (original contract); Some(merges) =
    // greedy-BPE subwords — block boundaries land where the model's
    // real token budget does. Both row-local compiled passes.
    val nTokens = subwordMerges match {
      case None => size(TextHash.tokenHashesOf(col(textCol)))
      case Some(m) => graft.functions.Bpe
        .subwordCountOf(lower(trim(col(textCol))), m)
    }
    val counts = docs.select(col(idCol).as("doc_id"),
      nTokens.as("n_tokens"))
    globalOffsets(counts, scope)
      // `div` = exact integer division on longs — a double round-trip
      // would silently mis-bucket offsets past 2^53 (a few hundred TB
      // of tokens, i.e. exactly the regime this operator targets)
      .select(col("doc_id"), col("n_tokens"), col("global_offset"),
        expr(s"global_offset div $maxTokens").as("pack_id"),
        (col("global_offset") % maxTokens).as("pack_offset"),
        ((col("global_offset") % maxTokens) + col("n_tokens") > maxTokens)
          .as("spans_boundary"))
      .orderBy(col("doc_id"))
  }

  /** SHARD MANIFEST — the writer-side plan of a large export: pack the
    * corpus in deterministic id order into contiguous byte-budget
    * shards and report, per shard, what lands there — doc count, byte
    * mass, id range, and how many docs straddle the boundary into the
    * next shard (the consumer's split-or-round-up signal, q37's
    * `spans_boundary` at file grain). This is the manifest a 100 TB
    * job computes BEFORE writing N roughly-equal output files —
    * deterministic (pure function of ids and byte lengths: stable
    * across runs, engines, and partition counts), so a re-run resumes
    * against the same file plan.
    *
    * Byte offsets come from the same two-phase distributed prefix sum
    * as [[contiguousOffsets]] (never a single-partition global
    * window); sizes are OCTET lengths (bytes, not chars — what files
    * actually cost); `fill` is the one IEEE division at the output
    * edge (can exceed 1.0 exactly when a straddling doc carries mass
    * past the boundary). Scale shape: one range shuffle + a
    * ≤ |shards|-key partial-aggregated fold. */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
      shardBytes: Long = 256L << 20,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    shardManifestWeighted(docs, idCol, octet_length(col(textCol)),
      shardBytes, scope)

  /** [[shardManifest]] under an arbitrary per-row WEIGHT expression —
    * the seam that lets a PAIRED corpus budget on
    * `octet_length(text) + octet_length(payload)` (both modalities
    * ride one shard file, so both must meter it) without a second
    * manifest discipline. */
  def shardManifestWeighted(docs: DataFrame, idCol: String,
      weight: Column, shardBytes: Long = 256L << 20,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(shardBytes >= 1L, s"need shardBytes >= 1, got $shardBytes")
    val counts = docs.select(col(idCol).as("doc_id"),
      weight.cast("long").as("n_tokens"))
    globalOffsets(counts, scope)
      .select(col("doc_id"), col("n_tokens").as("n_bytes"),
        expr(s"global_offset div $shardBytes").as("shard_id"),
        ((col("global_offset") % shardBytes) + col("n_tokens") >
          shardBytes).as("straddles"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("n_bytes"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddle"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("fill",
        col("n_bytes").cast("double") / lit(shardBytes.toDouble))
      .orderBy(col("shard_id"))
  }

  /** TOKEN-budget shard manifest — [[shardManifest]] metered in the
    * MODEL's currency: shards sized by SUBWORD counts (the q265
    * tokenizer seam applied to the export plan), because a training
    * loader buys tokens, not bytes, and byte-sized shards of
    * mixed-fertility corpora (CJK vs ASCII, code vs prose) deliver
    * wildly uneven step counts per shard. Same deterministic
    * two-phase prefix sum, same manifest shape with `n_tokens`
    * columns; `None` merges = whitespace tokens (the q37 contract),
    * `Some(merges)` = greedy-BPE subwords against the shipped
    * tokenizer artifact. `fill` is the one IEEE division at the
    * output edge. Scale shape: one compiled tokenize pass + one range
    * shuffle + a ≤ |shards|-key fold. */
  def tokenShardManifest(docs: DataFrame, idCol: String,
      textCol: String, shardTokens: Long = 1L << 22,
      subwordMerges: Option[Seq[(String, String)]] = None,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(shardTokens >= 1L, s"need shardTokens >= 1, got $shardTokens")
    val nTokens = subwordMerges match {
      case None => size(TextHash.tokenHashesOf(col(textCol))).cast("long")
      case Some(m) => graft.functions.Bpe
        .subwordCountOf(lower(trim(col(textCol))), m)
    }
    val counts = docs.select(col(idCol).as("doc_id"),
      nTokens.as("n_tokens"))
    globalOffsets(counts, scope)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"global_offset div $shardTokens").as("shard_id"),
        ((col("global_offset") % shardTokens) + col("n_tokens") >
          shardTokens).as("straddles"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddle"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("fill",
        col("n_tokens").cast("double") / lit(shardTokens.toDouble))
      .orderBy(col("shard_id"))
  }

  /** SHARD EXPORT — [[shardManifest]] made actionable: write the
    * corpus to `outDir` as a parquet tree partitioned by the
    * manifest's `shard_id`, each shard ONE file of roughly
    * `shardBytes` of text (the one-file-per-bucket discipline
    * [[graft.etl.Bucketed]] documents: downstream consumers get
    * file-count = shard-count, no small-file debris). The hash
    * repartition on `shard_id` routes every shard to exactly one
    * task, so `partitionBy` emits exactly one file per shard; the
    * assignment is the same deterministic prefix sum as the manifest,
    * so a re-run (fresh outDir) reproduces the same file plan —
    * which is what makes the export resumable and diffable.
    *
    * The manifest itself is written under `outDir/_manifest` —
    * underscore-prefixed, so a parquet read of `outDir` ignores it
    * (the `_SUCCESS` convention) while a consumer that wants the file
    * plan reads it directly. Returns (shards, docs) written. */
  def writeShards(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, shardBytes: Long = 256L << 20): (Long, Long) =
    writeShardsWeighted(docs, idCol, octet_length(col(textCol)),
      outDir, shardBytes)

  /** [[writeShards]] under an arbitrary per-row WEIGHT expression
    * (see [[shardManifestWeighted]]). */
  def writeShardsWeighted(docs: DataFrame, idCol: String,
      weight: Column, outDir: String,
      shardBytes: Long = 256L << 20): (Long, Long) =
    CacheScope.withScope { scope =>
      val counts = docs.select(col(idCol).as("doc_id"),
        weight.cast("long").as("n_tokens"))
      val assigned = globalOffsets(counts, scope)
        .select(col("doc_id").as("__sid"),
          expr(s"global_offset div $shardBytes").as("shard_id"))
      val data = docs.join(assigned, docs(idCol) === col("__sid"))
        .drop("__sid")
      data.repartition(col("shard_id"))
        .write.partitionBy("shard_id").parquet(outDir)
      val manifest = shardManifestWeighted(docs, idCol, weight,
        shardBytes, scope)
      manifest.coalesce(1).write.parquet(s"$outDir/_manifest")
      val spark = docs.sparkSession
      val m = spark.read.parquet(s"$outDir/_manifest")
        .agg(count(lit(1)),
          coalesce(sum(col("n_docs")), lit(0L))).collect()(0)
      (m.getLong(0), m.getLong(1))
    }

  /** Sliding-window chunking — the retrieval-side sibling of packing:
    * split each document into fixed-size token windows with overlap
    * (the RAG / embedding-prep step; stride < chunkTokens makes
    * consecutive chunks share `chunkTokens - stride` tokens so no
    * boundary context is lost). Entirely ROW-LOCAL: tokenize, explode
    * the start offsets, slice — no shuffle at any corpus size, and the
    * explode is the only row expansion (×ceil(n/stride) per doc, the
    * output's own size).
    *
    * Start-offset rule: starts run `0, stride, 2·stride, …` strictly
    * below `max(n_tokens - overlap, 1)`. The upper bound trims a
    * trailing start that would only re-emit a suffix of the previous
    * chunk: chunk i ≥ 1 starting at s covers `[s, min(s+C, n))` while
    * its predecessor already covers `[s-stride, s+overlap)`, so the
    * bound `s < n - overlap` is exactly "the new chunk reaches at
    * least one token its predecessor doesn't" (PackingSpec pins
    * no-containment plus full coverage). Zero-token docs emit no
    * chunks.
    *
    * Output: (doc_id, chunk_idx, start_token, n_chunk_tokens,
    * chunk_hash) — the hash stands in for chunk text so verification
    * doesn't ship the corpus twice; a consumer materializes text with
    * the same slice+join. */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      s"need 1 <= stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    val overlap = chunkTokens - stride
    docs
      .select(col(idCol).as("doc_id"),
        TextHash.tokens(col(textCol)).as("w"))
      .withColumn("n_tokens", size(col("w")))
      .where(col("n_tokens") > 0)
      .withColumn("start", explode(sequence(lit(0),
        greatest(col("n_tokens") - overlap, lit(1)) - 1, lit(stride))))
      .select(col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        col("start").as("start_token"),
        least(lit(chunkTokens), col("n_tokens") - col("start"))
          .as("n_chunk_tokens"),
        sha2(array_join(
          slice(col("w"), col("start") + 1, lit(chunkTokens)), " "), 256)
          .as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** TOKEN-BUDGET TRUNCATION — context-length preparation: keep each
    * document's FIRST `maxTokens` tokens and report what was cut — the
    * row-local sibling of [[slidingChunks]] for consumers that take one
    * fixed-budget window per doc (embedding models with a hard input
    * cap, preview/snippet stores, eval harnesses that score prefixes).
    * Head truncation specifically because it is the convention
    * downstream tokenizers apply — the point is that the CUT happens
    * here, once, instead of silently inside every consumer.
    *
    * The kept prefix travels as `kept_hash` (sha-256 of the re-joined
    * token prefix — [[slidingChunks]]' chunk-hash trick), so
    * verification and dedup-after-truncation never ship the corpus
    * twice; a caller wanting the text applies the same slice to its
    * own copy. Zero-token docs keep their row (kept 0, hash of the
    * empty string) — truncation reports on every doc, the audit
    * contract.
    *
    * Scale shape: fully row-local (tokenize → slice → hash); no
    * shuffle at any corpus size except the output ordering. */
  def truncateToTokens(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int = 2048): DataFrame = {
    require(maxTokens >= 1, s"need maxTokens >= 1, got $maxTokens")
    docs
      .select(col(idCol).as("doc_id"),
        TextHash.tokens(col(textCol)).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        least(size(col("w")), lit(maxTokens)).cast("long")
          .as("kept_tokens"),
        (size(col("w")) > maxTokens).as("truncated"),
        sha2(array_join(slice(col("w"), 1, maxTokens), " "), 256)
          .as("kept_hash"))
      .orderBy(col("doc_id"))
  }

  /** Epoch-sharded packing — [[Sampling.trainingOrder]] composed with
    * per-shard chunking: docs are dealt into `shards` training shards
    * in seed-(= epoch-)dependent shuffled order, then each shard is
    * concatenated in its own order and cut every `maxTokens`. This is
    * the form a trainer actually consumes: one shard per data-loader
    * worker, each holding an independent stream of fixed-size windows,
    * reshuffled every epoch by a seed change.
    *
    * Scale shape: sharding bounds every window to ~N/shards rows, so
    * the prefix sum needs NO two-phase trick here — `partitionBy(shard)`
    * is an ordinary distributed window (the global, unsharded case is
    * what [[contiguousOffsets]]'s two-phase scan exists for). Both
    * windows (position, then offsets) hash-partition on `shard`, so
    * Catalyst plans ONE exchange for the whole operator.
    *
    * `pack_id` is per-shard; consumers key windows by (shard, pack_id).
    */
  def epochShardedOffsets(docs: DataFrame, idCol: String, textCol: String,
      shards: Int = 8, seed: Long = 0L, maxTokens: Int = 2048): DataFrame = {
    require(maxTokens >= 1, s"need maxTokens >= 1, got $maxTokens")
    val ordered = Sampling.trainingOrder(docs, idCol, shards, seed)
      .select(col(idCol).as("doc_id"), col("shard"), col("pos"),
        size(TextHash.tokenHashesOf(col(textCol))).as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = coalesce(sum(col("n_tokens")).over(w), lit(0L))
    ordered
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        off.as("shard_offset"))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        col("shard_offset"),
        expr(s"shard_offset div $maxTokens").as("pack_id"),
        (col("shard_offset") % maxTokens).as("pack_offset"),
        ((col("shard_offset") % maxTokens) + col("n_tokens") > maxTokens)
          .as("spans_boundary"))
      .orderBy(col("shard"), col("pos"))
  }
}
