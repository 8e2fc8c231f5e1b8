package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.engine.CacheScope
import graft.functions.TextHash

/** Document deduplication operators (SURVEY.md §2.11; the
  * training-data-pipeline surface required by BASELINE.json beyond the
  * reference's own inventory — the reference's closest analog is its
  * keep-first key dedup, /root/reference/src/transform.py:79).
  *
  * Four escalating strategies, all shuffle-on-key (never all-pairs):
  *  - exact: content-hash groupBy — one shuffle of 32-byte keys.
  *  - n-gram Jaccard: inverted-index self-join on shingles — the
  *    candidate generator is the shingle key, not a cross join; a
  *    document-frequency cap bounds the worst hot-shingle skew.
  *  - MinHash-LSH: constant-size signature per doc (16 mins), banded
  *    bucketing — candidate volume is per-bucket, independent of corpus
  *    size; the verify step touches candidate pairs only.
  *  - SimHash: constant-size fingerprint per doc (one long), chunked
  *    bucketing with a pigeonhole recall guarantee for hamming <= 3.
  *
  * At 100 TB the pattern is the same for all four: per-row signature
  * computation (narrow, codegen), then a groupBy on a small key whose
  * cardinality the algorithm controls. All hashes are the portable
  * folds from [[TextHash]], so an external oracle reproduces results
  * bit-for-bit.
  *
  * Cache lifecycle contract: the multi-consumer operators persist
  * their shared intermediate frames (shingles, fingerprints) and the
  * returned DataFrame stays lazily dependent on them, so they are NOT
  * unpersisted here. With the default (unmanaged) scope, blocks live
  * until `spark.catalog.clearCache()` or session end — per-query
  * processes (Verify) and the bench (which clears per run) are fine. A
  * long-lived session interleaving many dedup calls should pass a
  * managed [[graft.engine.CacheScope]] (or use `CacheScope.eager`) so
  * each call's intermediates are released deterministically.
  */
object Dedup {

  import TextHash.P

  /** Exact + normalized content-hash dedup: one row per distinct text,
    * keep-first (min id) semantics like the reference's
    * drop_duplicates. Grouping is by `content_hash` (byte-exact);
    * `norm_hash` (case/whitespace-folded) is carried as a REPORTED key
    * so a downstream pass can additionally collapse normalized variants
    * — it does not collapse them here. */
  /** DEDUP IMPACT REPORT — the summary page above [[exact]]'s
    * row-level output: per group (source, feed, language), how many
    * docs arrived, how many distinct contents they collapse to, and
    * the duplicate rate. This is the number a corpus team actually
    * tracks per feed ("crawl X is 40% self-copies — fix the crawler,
    * don't just dedup harder") and the before/after metric of every
    * dedup run; the row-level operator says WHICH docs to keep, this
    * says WHERE the duplication lives. Exact content identity via the
    * same sha-256 as [[exact]], normalized-whitespace identity
    * reported beside it (the gap between the two is
    * whitespace-only near-duplication — a formatting pipeline bug
    * signature, not true content duplication).
    *
    * Scale shape: ONE partial-aggregated pass — hashes are row-local,
    * `countDistinct` expands map-side, counters cross the wire. */
  def dedupImpact(docs: DataFrame, groupCol: String, textCol: String)
      : DataFrame =
    docs
      .select(col(groupCol),
        sha2(col(textCol), 256).as("__h"),
        sha2(regexp_replace(lower(col(textCol)), "\\s+", " "), 256)
          .as("__nh"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__h")).as("n_unique"),
        countDistinct(col("__nh")).as("n_unique_norm"))
      .withColumn("n_dupes", col("n_docs") - col("n_unique"))
      .withColumn("dup_rate",
        col("n_dupes").cast("double") / col("n_docs").cast("double"))
      .orderBy(col(groupCol))

  /** SOFT (sqrt-law) DEDUP — the middle ground between keeping every
    * duplicate (over-weights boilerplate in training) and keeping one
    * ([[exact]]'s keep-first, which erases the natural frequency signal
    * entirely): keep `⌈√n⌉` members of each exact-duplicate family, so
    * a 10 000-copy page survives as 100, a 4-copy page as 2, and
    * singletons are untouched. Sub-linear downsampling of duplicate
    * mass is the published middle rung (a doc's training weight grows
    * with, but much slower than, its crawl frequency); √ specifically
    * because it is the one sub-linear law that is ENGINE-EXACT — one
    * correctly-rounded IEEE `sqrt` of an exact integer, and `ceil` of
    * a correctly-rounded double cannot flip engines (perfect squares
    * hit sqrt exactly; non-squares round identically — the q90
    * one-IEEE-op argument).
    *
    * Members are chosen deterministically: rank within the family by
    * the portable affine id-hash (ties → lowest id), keep rank ≤
    * quota — so re-runs, retries, and engines agree row for row, and
    * any smaller quota is a prefix (nested samples, the q51 contract).
    *
    * Scale shape: the family key is the 32-byte sha-256, so grouping is
    * ONE hash exchange; the rank is a per-family window (the quota
    * varies by family, so no constant-k WindowGroupLimit — the honest
    * cost is the per-family sort). A pathological family (one page
    * crawled 10^9 times) makes one fat sort partition: feeds with that
    * profile should pre-bound families with [[Skew.capHotKeys]] on the
    * hash — the same guard q17/q92 use — trading the tail above the
    * cap for bounded partitions. Output: the KEPT rows (doc_id,
    * content_hash, n_copies, keep_quota, sample_rank), by doc id. */
  def softDedup(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val P = 1000000007L
    val h = ((col(idCol) % P) * lit(2654435761L) % P + lit(12345L)) % P
    val fam = Window.partitionBy(col("content_hash"))
    val ranked = docs.select(col(idCol),
        sha2(col(textCol), 256).as("content_hash"))
      .withColumn("__h", h)
      .withColumn("sample_rank",
        row_number().over(fam.orderBy(col("__h"), col(idCol))))
      .withColumn("n_copies", count(lit(1)).over(fam))
    ranked
      .withColumn("keep_quota",
        ceil(sqrt(col("n_copies").cast("double"))).cast("long"))
      .where(col("sample_rank") <= col("keep_quota"))
      .select(col(idCol), col("content_hash"), col("n_copies"),
        col("keep_quota"), col("sample_rank"))
      .orderBy(col(idCol))
  }

  /** CLUSTER IMPACT BY GROUP — what near-dup deduplication does to
    * each slice of the corpus: per group (source/feed), member docs,
    * distinct near-dup FAMILIES touched, canonical survivors (the
    * family's min-id member — [[nearDupClusters]]' keep rule), and
    * the survival rate. The per-feed reading of the dedup DECISION:
    * a source with survival 0.3 is 70% redundant against the corpus —
    * fix the crawl or down-weight the mix. A family spanning sources
    * counts once per TOUCHING source (each feed sees its own
    * exposure), and its one canonical credits only the source that
    * holds it — so survival reads as "of this feed's docs, how many
    * does the deduped corpus keep".
    *
    * Scale shape: one id-keyed equi-join of docs to the cluster
    * frame, ONE partial-aggregable groupBy with a distinct-family
    * expand; one IEEE division. */
  def clusterImpact(docs: DataFrame, idCol: String, groupCol: String,
      clusters: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(groupCol).as("g"))
      .join(clusters.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_families"),
        sum(when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L))
          .as("n_canonical"))
      .select(col("g").as(groupCol), col("n_docs"), col("n_families"),
        col("n_canonical"),
        (col("n_canonical").cast("double") /
          col("n_docs").cast("double")).as("survival_rate"))
      .orderBy(col(groupCol))

  /** PAIR-SET EVALUATION — the dedup family's [[graft.operators
    * .Similarity.topKRecall]]: given a candidate pair set (`got`) and
    * a reference pair set (`want`), ONE row with hit counts, precision
    * and recall. This is how a team picks the LSH operating point
    * (bands × rows, df caps, block keys) with a MEASURED recall
    * instead of the formula's idealized curve — and re-measures it
    * after every tokenizer or threshold change, exactly as q129 does
    * for the ANN index. Both inputs reduce to distinct (doc_a, doc_b)
    * id pairs; precision/recall are one IEEE division of exact counts
    * each (empty sides keep NULL, the contract-row rule).
    *
    * Scale shape: two distincts + ONE hash join on the 16-byte pair
    * key; the three one-row aggregates meet on the documented
    * broadcast scalar-append. The reference side is usually the
    * EXPENSIVE exact rung — the eval runs on a sample or a golden
    * slice, not the corpus (the q129 pattern). */
  def pairsEval(got: DataFrame, want: DataFrame): DataFrame = {
    val g = got.select(col("doc_a"), col("doc_b")).distinct()
    val w = want.select(col("doc_a"), col("doc_b")).distinct()
    val hit = g.join(w, Seq("doc_a", "doc_b"))
      .agg(count(lit(1)).as("n_hit"))
    val ng = g.agg(count(lit(1)).as("n_got"))
    val nw = w.agg(count(lit(1)).as("n_want"))
    ng.crossJoin(broadcast(nw)).crossJoin(broadcast(hit))
      .select(col("n_got"), col("n_want"), col("n_hit"),
        when(col("n_got") > 0,
          col("n_hit").cast("double") / col("n_got").cast("double"))
          .as("pair_precision"),
        when(col("n_want") > 0,
          col("n_hit").cast("double") / col("n_want").cast("double"))
          .as("pair_recall"))
  }

  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(
        col(idCol),
        sha2(col(textCol), 256).as("content_hash"),
        sha2(regexp_replace(lower(col(textCol)), "\\s+", " "), 256)
          .as("norm_hash"))
      .groupBy(col("content_hash"))
      .agg(
        min(col("norm_hash")).as("norm_hash"),
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Normalized-variant collapse with keep-BEST selection — the
    * "downstream pass" [[exact]]'s scaladoc promises: one row per
    * `norm_hash` (case/whitespace-folded content), keeping the most
    * token-rich variant (ties → lowest id). Real pipelines prefer this
    * over keep-first when variants differ (a fixed-encoding rescrape
    * beats its mojibake twin); the reference's own dedup
    * (/root/reference/src/transform.py:79) is keep-first, so this is
    * the EXT refinement, not a replacement.
    *
    * Scale shape: `max_by` over an ordering struct is PARTIAL-
    * AGGREGABLE — executors pre-fold a single best row per group
    * before the exchange, so the one shuffle carries ≤ |groups| rows
    * per partition. A window `row_number` formulation (the oracle's)
    * would shuffle the full corpus to sort each group; the aggregate
    * form never materializes group order at all. The ordering struct
    * negates the id so lexicographic struct-max = (max tokens, then
    * MIN id) — a total order, so the winner is engine-independent. */
  def keepBest(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs
      .select(
        col(idCol).as("doc_id"),
        sha2(regexp_replace(lower(col(textCol)), "\\s+", " "), 256)
          .as("norm_hash"),
        size(TextHash.tokens(col(textCol))).as("n_tokens"))
      .groupBy(col("norm_hash"))
      .agg(
        max_by(col("doc_id"), struct(col("n_tokens"), -col("doc_id")))
          .as("best_id"),
        max(col("n_tokens")).as("best_tokens"),
        count(lit(1)).as("n_variants"))
      .orderBy(col("best_id"))

  /** One-sided eval-overlap contamination rate — the PaLM/GPT-4-style
    * per-document rule, complementing [[crossNgramJaccardPairs]]'s
    * pairwise view: a TRAIN doc is contaminated when ≥ `contaminatedAt`
    * of its distinct 3-gram shingles appear ANYWHERE in the eval
    * corpus (the union set — no per-pair attribution, which is what
    * makes this the cheap first-line check). Output per train doc:
    * shingle count, hit count, overlap rate, 0/1 contaminated flag.
    *
    * Scale shape: eval benchmarks are KB-to-MB against a 100 TB
    * train side, so the distinct eval shingle set is BROADCAST
    * (`broadcastEval=true`, the default) and the probe is a row-local
    * broadcast left-join — the train corpus is never shuffled, and the
    * per-doc aggregate that follows groups on `doc_id`, a key the scan
    * already clusters. With `broadcastEval=false` the same plan falls
    * back to a shuffle join for oversized eval sets.
    *
    * The THIRD rung, `bloomPrefilter=true` (use with
    * `broadcastEval=false`), covers the gap between the other two: an
    * eval shingle set too big for a broadcast HASH RELATION (~40
    * bytes/key of join-table overhead) but whose Bloom filter (~1.2
    * bytes/key at 1% fpp) still fits every executor — it ships as a
    * broadcast VARIABLE (a plan-side handle; the bytes move once per
    * executor), see [[graft.functions.BloomMightContain]]. The train
    * side is filtered ROW-LOCALLY through that codegen'd probe
    * before the confirm join, so only the
    * true hits plus the fpp-sized false-positive trickle ever shuffle
    * — per-doc totals come from a separate partial aggregate whose
    * exchange carries counts, not shingles. EXACTNESS IS PRESERVED: a
    * Bloom filter has no false negatives, and the exact join confirms
    * away its false positives — q76 pins the composition against the
    * same DuckDB oracle as q49. The filter is built from the eval side
    * with one `stat.bloomFilter` pass sized by `bloomExpectedItems` /
    * `bloomFpp` (caller-supplied — the q61 lesson: no hidden count()
    * job; an undersized filter only raises fpp, never breaks
    * exactness). */
  def evalOverlapRate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, contaminatedAt: Double = 0.2,
      broadcastEval: Boolean = true,
      bloomPrefilter: Boolean = false,
      bloomExpectedItems: Long = 4L << 20,
      bloomFpp: Double = 0.01): DataFrame = {
    require(contaminatedAt >= 0.0 && contaminatedAt <= 1.0,
      s"contaminatedAt=$contaminatedAt must be in [0, 1]")
    val tr = hashShingled(train, idCol, textCol)
    val ev0 = hashShingled(eval, idCol, textCol).select(col("hs")).distinct()
    val rate = col("n_hit").cast("double") / col("n_shingles")
    val flagged = (counts: DataFrame) => counts
      .select(
        col("doc_id"), col("n_shingles"), col("n_hit"),
        rate.as("overlap_rate"),
        when(rate >= contaminatedAt, 1).otherwise(0).as("contaminated"))
      .orderBy(col("doc_id"))
    if (!bloomPrefilter) {
      val ev = (if (broadcastEval) broadcast(ev0) else ev0)
        .withColumn("__hit", lit(1))
      flagged(tr.join(ev, Seq("hs"), "left")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_shingles"),
          count(col("__hit")).as("n_hit")))
    } else {
      val bf = ev0.stat.bloomFilter("hs", bloomExpectedItems, bloomFpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      // the filter rides a broadcast VARIABLE (torrent, once per
      // executor), never an inline Literal — an embedded multi-MB
      // binary would ship inside every serialized plan fragment and
      // explain string, the exact overhead this rung exists to avoid
      // (see graft.functions.BloomMightContain)
      val bloomBc = train.sparkSession.sparkContext.broadcast(bos.toByteArray)
      val might = org.apache.spark.sql.GraftColumns.of(
        graft.functions.BloomMightContain(bloomBc,
          org.apache.spark.sql.GraftColumns.expr(col("hs"))))
      val totals = tr.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"))
      val ev = if (broadcastEval) broadcast(ev0) else ev0
      val hits = tr.where(might).join(ev, Seq("hs"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      flagged(totals.join(hits, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_hit")))
    }
  }

  /** Pairwise Jaccard >= `threshold` over word-3-gram shingle sets via
    * an inverted-index self-join (SURVEY §2.11: "shuffle-based, scales
    * to 100 TB"). Output: (doc_a, doc_b, n_common, n_union, jaccard).
    *
    * Plan shape (r2 verdict item 5): the index runs on 8-byte shingle
    * HASHES, never the raw 3-word strings — the self-join shuffles
    * longs, and hash collisions are deterministic and replayed
    * identically by the oracle. Hot shingles (document frequency >
    * `maxDf`) are dropped before the join: stopword-shingles would
    * generate O(df²) candidate pairs for zero near-dup signal, and the
    * cap bounds worst-case skew at scale. The exploded shingle frame is
    * computed (tokenize + explode) exactly once and persisted; every
    * downstream consumer — the hot-key aggregate, the per-doc sizes,
    * both self-join sides — reads that one cache. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, maxDf: Int = 100,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    ngramJaccardPairsUnordered(docs, idCol, textCol, threshold, maxDf,
      scope).orderBy(col("doc_a"), col("doc_b"))

  /** [[ngramJaccardPairs]] WITHOUT the trailing global sort — for
    * order-insensitive consumers (the agreement/disagreement/
    * transitivity/threshold-curve compositions, which aggregate or
    * re-sort anyway): a persisted sorted frame materializes a useless
    * range exchange + sort in its cache build that EliminateSorts
    * cannot remove (the sort is the cached plan's root). The public
    * query keeps the ordered output contract. */
  private[graft] def ngramJaccardPairsUnordered(docs: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.5, maxDf: Int = 100,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // the hot-shingle cap is the shared [[Skew.capHotKeys]]: a tiny
    // hot-key list + AQE-broadcast anti-join, NOT a
    // count-over-partition window: the window formulation sorted the
    // ENTIRE exploded shingle frame on hs (the single most expensive
    // stage of r4's q17 and the first thing to stall under host
    // contention), where the groupBy is partial-aggregated map-side —
    // the exchange carries (hs, partial count), and the hot list it
    // produces is heavy-hitters-small, so AQE plans the anti-join as a
    // broadcast. The EXPLODED frame is the one persisted frame (r5
    // verdict item 3): it feeds the hot-key aggregate AND the anti-join
    // left side, so persisting downstream of the cap (the r5 shape)
    // still paid tokenize+explode twice — at 100 TB that is two full
    // corpus scans. The capped `sh` stays UNpersisted on purpose: each
    // of its consumers (sizes + both self-join sides) re-runs only a
    // broadcast hash probe over the cached exploded rows (narrow,
    // no shuffle — the hot-list broadcast is built once and reused via
    // exchange reuse), which is far cheaper than materializing a second
    // near-identical cache. PlanAuditSpec pins the single
    // InMemoryRelation and the generator living inside its build plan.
    val ex = scope.persist(hashShingled(docs, idCol, textCol))
    val sh = Skew.capHotKeys(ex, "hs", maxDf.toLong)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("da"), col("hs"))
    val b = sh.select(col("doc_id").as("db"), col("hs"))
    val inter = a.join(b, Seq("hs"))
      .where(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    val union = col("na") + col("nb") - col("i")
    inter
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .withColumn("jaccard", col("i").cast("double") / union)
      .where(col("jaccard") >= threshold)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("i").as("n_common"), union.as("n_union"), col("jaccard"))
  }

  /** Shingle CONTAINMENT pairs — the asymmetric near-dup rung
    * [[ngramJaccardPairs]] cannot see: a benchmark question quoted
    * inside a long document shares nearly ALL of ITS shingles while
    * the symmetric Jaccard `i/(na+nb−i)` stays tiny (the long doc's
    * mass dominates the union), so a Jaccard threshold misses exactly
    * the contamination that matters most. Containment normalizes by
    * the SMALLER side — `i / min(na, nb)` — so a short doc fully
    * embedded in a long one scores 1.0 regardless of the length gap.
    *
    * Same scale shape as [[ngramJaccardPairs]] (one persisted exploded
    * hash frame, [[Skew.capHotKeys]] df-cap, inverted-index self-join
    * on 8-byte hashes, partial-aggregated pair counts); only the final
    * row-local metric differs. Output: (doc_a, doc_b, n_common,
    * n_small, containment), doc_a < doc_b. The df-cap recall trade is
    * q17's, with the same justification — a stopword-shingle's O(df²)
    * candidates carry no containment signal either. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, maxDf: Int = 100,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(threshold > 0.0,
      s"containmentPairs needs threshold > 0 (got $threshold): " +
        "zero-overlap pairs are excluded by construction")
    val ex = scope.persist(hashShingled(docs, idCol, textCol))
    val sh = Skew.capHotKeys(ex, "hs", maxDf.toLong)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("da"), col("hs"))
    val b = sh.select(col("doc_id").as("db"), col("hs"))
    val inter = a.join(b, Seq("hs"))
      .where(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    val small = least(col("na"), col("nb"))
    inter
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .withColumn("containment", col("i").cast("double") / small)
      .where(col("containment") >= threshold)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("i").as("n_common"), small.as("n_small"), col("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cross-corpus near-dup pairs — the DECONTAMINATION operator: find
    * documents of `right` (e.g. an eval benchmark) that near-duplicate
    * documents of `left` (the training corpus), so they can be held out
    * of training. Same inverted-index shape as [[ngramJaccardPairs]]
    * but the join is LEFT×RIGHT, never within a side — candidate volume
    * is Σ_hs df_A(hs)·df_B(hs), bounded by the same document-frequency
    * cap, which is computed over the COMBINED corpus (a shingle hot in
    * either side floods the cross join all the same).
    *
    * Scale: each side is tokenized+exploded exactly once (persisted);
    * the index join shuffles 8-byte hashes keyed identically on both
    * sides; output is (left_id, right_id, n_common, n_union, jaccard).
    */
  def crossNgramJaccardPairs(left: DataFrame, right: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.5,
      maxDf: Int = 100,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val exA = scope.persist(hashShingled(left, idCol, textCol))
    val exB = scope.persist(hashShingled(right, idCol, textCol))
    val hot = exA.unionByName(exB)
      .groupBy(col("hs")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf).select(col("hs"))
    crossPairsFrom(
      exA.join(hot, Seq("hs"), "left_anti"),
      exB.join(hot, Seq("hs"), "left_anti"), threshold)
  }

  /** The asymmetric tail shared by the cross-corpus CONTAINMENT paths:
    * same inverted-index intersection as [[crossPairsFrom]], but the
    * metric normalizes by the RIGHT side's set size alone — `i / nb`,
    * the fraction of the right doc present in the left doc. */
  private def crossContainFrom(a: DataFrame, b: DataFrame,
      threshold: Double): DataFrame = {
    val szB = b.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = a.select(col("doc_id").as("da"), col("hs"))
      .join(b.select(col("doc_id").as("db"), col("hs")), Seq("hs"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    inter
      .join(szB.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .withColumn("containment", col("i").cast("double") / col("nb"))
      .where(col("containment") >= threshold)
      .select(col("da").as("left_id"), col("db").as("right_id"),
        col("i").as("n_common"), col("nb").as("n_right"),
        col("containment"))
      .orderBy(col("left_id"), col("right_id"))
  }

  /** Cross-corpus CONTAINMENT — the decontamination metric q36/q49's
    * symmetric forms approximate: the question that actually matters
    * at a decontamination gate is "what fraction of THIS EVAL DOC's
    * shingles appear in that training doc", i.e. `i / n_eval` — a
    * short benchmark item fully quoted inside a long training page
    * scores 1.0 where the Jaccard `i/(na+nb−i)` hides it behind the
    * page's bulk (the [[containmentPairs]] argument, pointed across
    * corpora). `right` is the eval/held-out side being protected.
    * Same scale shape as [[crossNgramJaccardPairs]]: each side
    * tokenized+exploded once (persisted), combined-corpus df cap,
    * 8-byte-hash index join, partial-aggregated pair counts. */
  def crossContainmentPairs(left: DataFrame, right: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      maxDf: Int = 100,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(threshold > 0.0,
      s"crossContainmentPairs needs threshold > 0 (got $threshold)")
    val exA = scope.persist(hashShingled(left, idCol, textCol))
    val exB = scope.persist(hashShingled(right, idCol, textCol))
    val hot = exA.unionByName(exB)
      .groupBy(col("hs")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf).select(col("hs"))
    crossContainFrom(
      exA.join(hot, Seq("hs"), "left_anti"),
      exB.join(hot, Seq("hs"), "left_anti"), threshold)
  }

  /** [[crossContainmentPairs]] for the SAME-TABLE split case — ONE
    * persisted shingle index feeds both sides and the df cap, the
    * [[crossNgramJaccardPairsSplit]] single-cache shape. `leftSide`
    * marks the TRAINING side; containment is of the eval (right) doc. */
  def crossContainmentPairsSplit(docs: DataFrame, idCol: String,
      textCol: String, leftSide: Column, threshold: Double = 0.8,
      maxDf: Int = 100,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(threshold > 0.0,
      s"crossContainmentPairsSplit needs threshold > 0 (got $threshold)")
    val ex = scope.persist(hashShingled(docs, idCol, textCol)
      .withColumn("__left", leftSide))
    val hot = ex.groupBy(col("hs")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf).select(col("hs"))
    val capped = ex.join(hot, Seq("hs"), "left_anti")
    crossContainFrom(
      capped.where(col("__left")).drop("__left"),
      capped.where(!col("__left")).drop("__left"), threshold)
  }

  /** [[crossNgramJaccardPairs]] for the SAME-TABLE split case (a parity
    * holdout, a time cut, a source split): `leftSide` partitions one
    * corpus into the two sides. The general two-corpus path must scan
    * and tokenize each input separately; here the exploded shingle
    * index is built and persisted ONCE and both sides (and the df cap —
    * no union pass needed) filter the single cache, halving parquet IO
    * at any scale. Predicate columns must survive into the index frame
    * (doc_id does; arbitrary columns would not). Same output contract. */
  def crossNgramJaccardPairsSplit(docs: DataFrame, idCol: String,
      textCol: String, leftSide: Column, threshold: Double = 0.5,
      maxDf: Int = 100,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val ex = scope.persist(hashShingled(docs, idCol, textCol)
      .withColumn("__left", leftSide))
    val hot = ex.groupBy(col("hs")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf).select(col("hs"))
    val capped = ex.join(hot, Seq("hs"), "left_anti")
    crossPairsFrom(
      capped.where(col("__left")).drop("__left"),
      capped.where(!col("__left")).drop("__left"), threshold)
  }

  /** Pairwise SOURCE-level shingle overlap — the corpus-composition
    * matrix: for every pair of sources, the exact Jaccard similarity
    * of their distinct 3-gram shingle VOCABULARIES. Doc-level dedup
    * answers "which documents repeat"; this answers "which feeds are
    * republishing each other" — the signal for collapsing mirrored
    * crawls or re-weighting a training mix before any per-doc work.
    *
    * Scale shape: one distinct over (source, shingle-hash) — 8-byte
    * hashes through the exchange, persisted ONCE and read three times
    * (sizes, both join sides). The intersection self-join keys on the
    * shingle hash; a shingle shared by s sources expands to s² rows,
    * bounded by the SOURCE count (hundreds at web scale), not the
    * corpus — and the per-pair count aggregate combines map-side. The
    * |sources|-row size frames broadcast. Exact integers throughout;
    * the one division runs on both engines' IEEE doubles identically. */
  def sourceOverlapMatrix(docs: DataFrame, sourceCol: String,
      textCol: String,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val srcSh = scope.persist(
      docs.select(col(sourceCol).as("src"),
          explode(TextHash.shingleHashesOf(col(textCol))).as("hs"))
        .distinct())
    // sizes is |sources| rows but joins TWICE — persisting it keeps the
    // big exploded frame at exactly three reads (sizes build + 2 sides)
    val sizes = scope.persist(
      srcSh.groupBy(col("src")).agg(count(lit(1)).as("n")))
    val inter = srcSh.select(col("src").as("sa"), col("hs"))
      .join(srcSh.select(col("src").as("sb"), col("hs")), Seq("hs"))
      .where(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_common"))
    val union = col("na") + col("nb") - col("n_common")
    inter
      .join(broadcast(sizes.select(col("src").as("sa"), col("n").as("na"))),
        Seq("sa"))
      .join(broadcast(sizes.select(col("src").as("sb"), col("n").as("nb"))),
        Seq("sb"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("n_common"), union.as("n_union"),
        (col("n_common").cast("double") / union).as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Fuzzy ENTITY matching — near-identical name pairs by edit
    * distance, the record-linkage step before merging product /
    * author / site catalogs that doc-level shingle dedup can't see
    * (names are too short for 3-gram statistics to separate typos
    * from distinct entities; edit distance is the right metric).
    *
    * The classic scalable shape: collapse to DISTINCT names first
    * (entity vocabularies are domain-bounded — the corpus may be
    * 100 TB, the name set is not), derive a cheap BLOCKING key, and
    * pay the quadratic `levenshtein` (codegen'd in Spark) only inside
    * blocks — a `maxDist`-edit pair must agree on a robust block key,
    * so the all-pairs product never exists. `n_rows` rides along so
    * the caller can see how much mass each side of a match carries.
    *
    * `blockOf` maps the name column to its block key; the default
    * blocks multi-token names on the second whitespace token (the
    * head noun of two-token catalog names — "cold bolt" / "old bolt")
    * and single-token names on their 4-char prefix, so a vocabulary
    * of brands / usernames / one-word products spreads across prefix
    * blocks instead of piling into one degenerate `""` block whose
    * quadratic inside-block join would dwarf the rest of the plan. A
    * pair is emitted once (`name_a < name_b`), with pairs in
    * DIFFERENT blocks never compared: recall is the blocking key's
    * contract, the standard trade of blocked linkage.
    *
    * No blockOf is degenerate-proof against adversarial data, so the
    * quadratic is ALSO hard-bounded structurally: any block holding
    * more than `maxBlockNames` distinct names is dropped whole by
    * [[Skew.capHotKeys]] before the join — the same discipline as
    * [[ngramJaccardPairs]]'s hot-shingle df-cap, trading recall
    * inside oversized blocks for a worst-block pair count that can
    * never exceed `maxBlockNames·(maxBlockNames−1)/2`. */
  def fuzzyMatchPairs(rows: DataFrame, nameCol: String, maxDist: Int = 2,
      blockOf: Column => Column = n =>
        when(instr(n, " ") === 0, substring(n, 1, 4))
          .otherwise(coalesce(element_at(split(n, " "), 2), lit(""))),
      maxBlockNames: Long = 4096,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(maxDist >= 1, s"maxDist=$maxDist must be >= 1")
    // the distinct-name frame feeds the cap's count AND both join
    // sides — persist so the corpus-wide name collapse runs once
    val names = scope.persist(rows
      .groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", blockOf(col("name"))))
    val capped = Skew.capHotKeys(names, "blk", maxBlockNames)
    val a = capped.select(col("name").as("name_a"), col("n_rows").as("n_a"),
      col("blk"))
    val b = capped.select(col("name").as("name_b"), col("n_rows").as("n_b"),
      col("blk"))
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b"))
      .withColumn("distance", levenshtein(col("name_a"), col("name_b")))
      .where(col("distance") <= maxDist)
      .select(col("name_a"), col("name_b"), col("distance"),
        col("n_a"), col("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Shared tail of the cross-corpus contamination paths: per-side set
    * sizes, the inverted-index intersection join, and the Jaccard
    * threshold — inputs are the df-capped (doc_id, hs) streams. */
  private def crossPairsFrom(a: DataFrame, b: DataFrame,
      threshold: Double): DataFrame = {
    val szA = a.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val szB = b.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = a.select(col("doc_id").as("da"), col("hs"))
      .join(b.select(col("doc_id").as("db"), col("hs")), Seq("hs"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    val union = col("na") + col("nb") - col("i")
    inter
      .join(szA.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(szB.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .withColumn("jaccard", col("i").cast("double") / union)
      .where(col("jaccard") >= threshold)
      .select(col("da").as("left_id"), col("db").as("right_id"),
        col("i").as("n_common"), union.as("n_union"), col("jaccard"))
      .orderBy(col("left_id"), col("right_id"))
  }

  /** (doc_id, sh: array<long>) — each doc's DISTINCT shingle-hash set
    * as one row-local array, computed by the codegen'd
    * [[graft.functions.ShingleHashes]] pass (docs under 3 tokens drop
    * out, matching the HOF guard). Signatures (minhash, simhash) and
    * set sizes are order-free folds over this set, so everything but
    * candidate generation stays narrow. */
  private[graft] def shingleArrays(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextHash.shingleHashesOf(col(textCol)).as("sh"))
      .where(size(col("sh")) >= 1)

  /** (doc_id, shingle_hash) distinct pairs — [[shingleArrays]] exploded
    * for the paths that need an inverted index (collisions are
    * deterministic and identical in the oracle, so verification stays
    * exact). */
  private def hashShingled(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    shingleArrays(docs, idCol, textCol)
      .select(col("doc_id"), explode(col("sh")).as("hs"))

  /** MinHash-LSH near-dup pairs (SURVEY §2.11: shingle → minhash
    * signature → band-bucket → pairwise verify; never all-pairs).
    *
    * k=16 permutations in 4 bands of 4: one groupBy builds all 16 mins
    * (partial-aggregable — executors pre-fold before the shuffle), the
    * band signatures bucket candidates, and only candidate pairs pay
    * the exact-Jaccard verification join. Recall for j=0.98 pairs is
    * ~1; pairs near the 0.5 threshold may be (deterministically)
    * missed — that is the documented LSH trade. */
  /** (doc_id, band, sig) MinHash LSH band signatures — the banding
    * stage of [[minhashLshPairs]] exposed for consumers that persist
    * or index signatures instead of immediately pairing them
    * ([[graft.etl.LshIndex]]'s store rows). Row-local from the shingle
    * arrays; two selects on purpose — the signature array materializes
    * ONCE in the first projection and CollapseProject keeps the
    * multi-referenced alias rather than inlining k copies of the
    * signature pass. */
  def bandSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4): DataFrame =
    bandSignaturesFrom(shingleArrays(docs, idCol, textCol), k, bands)

  private def bandSignaturesFrom(base: DataFrame, k: Int,
      bands: Int): DataFrame = {
    val rows = k / bands
    val sigs = base.select(col("doc_id"),
      TextHash.minhashSignatureOf(col("sh"), k).as("sig"))
    val bandStructs = (0 until bands).map { b =>
      val sig = concat_ws("|",
        (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    minhashLshPairsUnordered(docs, idCol, textCol, threshold, k, bands,
      scope).orderBy(col("doc_a"), col("doc_b"))

  /** [[minhashLshPairs]] without the trailing global sort — the
    * [[ngramJaccardPairsUnordered]] rationale. */
  private[graft] def minhashLshPairsUnordered(docs: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(threshold > 0.0,
      s"minhashLshPairs needs threshold > 0 (got $threshold): zero-overlap " +
        "band collisions are excluded from the output by construction")
    // three consumers (signatures, both verify-join sides) share the
    // per-doc shingle-array frame — persist so the codegen'd
    // tokenize+shingle pass runs once. Everything per-doc is ROW-LOCAL
    // from the array (signature mins via the compiled k-permutation
    // pass, set size via size()): the r4 formulation exploded the
    // shingles and paid a 16-column groupBy shuffle for the signatures
    // plus another for the sizes before any candidate was generated.
    val base = scope.persist(shingleArrays(docs, idCol, textCol)
      .withColumn("n", size(col("sh")).cast("long")))

    val bucketed = bandSignaturesFrom(base, k, bands)

    val cand = bucketed.select(col("doc_id").as("da"), col("band"), col("sig"))
      .join(bucketed.select(col("doc_id").as("db"), col("band"), col("sig")),
        Seq("band", "sig"))
      .where(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()

    verifyWith(cand, base, threshold)
  }

  /** The exact-Jaccard verify rung over a (da, db) candidate frame and
    * a (doc_id, sh, n) shingle-array base: re-attach both shingle
    * ARRAYS and intersect row-locally — the arrays are distinct-element
    * sets, so size(array_intersect) is the exact overlap — same count
    * an exploded inner join + groupBy would produce, without shuffling
    * the index twice. A candidate pair with zero overlap (band
    * collision without a shared shingle) gets jaccard 0 and is dropped
    * by the threshold filter, exactly as an inner join would drop it. */
  private def verifyWith(cand: DataFrame, base: DataFrame,
      threshold: Double): DataFrame = {
    val union = col("na") + col("nb") - col("i")
    cand
      .join(base.select(col("doc_id").as("da"), col("sh").as("sha"),
        col("n").as("na")), Seq("da"))
      .join(base.select(col("doc_id").as("db"), col("sh").as("shb"),
        col("n").as("nb")), Seq("db"))
      .withColumn("i", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard", col("i").cast("double") / union)
      .where(col("jaccard") >= threshold)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), col("jaccard"))
  }

  /** [[minhashLshPairs]]'s verify rung DECOUPLED from candidate
    * generation — for callers that produce candidates elsewhere (the
    * incremental [[graft.etl.LshIndex]], whose store emits band
    * candidates only): confirm a (doc_a, doc_b) frame against the
    * corpus that holds both docs' texts, emitting exactly the pairs
    * with exact shingle Jaccard ≥ `threshold`. Composing this over the
    * index's candidates reproduces one-shot [[minhashLshPairs]] over
    * the union (LshIndexSpec pins it), because the candidate sets are
    * split-invariant and the verify is a deterministic per-pair
    * function of the texts. Scale shape: the pair frame joins the
    * row-local shingle-array frame twice — no explosion, no index
    * shuffle; candidates a caller feeds that reference ids ABSENT from
    * `docs` drop out (inner joins), matching the band-candidate
    * contract that both endpoints were ingested. */
  def verifyCandidates(cands: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.5,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(threshold > 0.0,
      s"verifyCandidates needs threshold > 0 (got $threshold): " +
        "zero-overlap band collisions are excluded by construction")
    val base = scope.persist(shingleArrays(docs, idCol, textCol)
      .withColumn("n", size(col("sh")).cast("long")))
    verifyWith(
      cands.select(col("doc_a").as("da"), col("doc_b").as("db")), base,
      threshold).orderBy(col("doc_a"), col("doc_b"))
  }

  /** 48-bit SimHash fingerprints over hashed shingles. One long per
    * document; near-dups land within small hamming distance.
    * Row-local: the compiled fingerprint pass folds each doc's shingle
    * array directly — no explode, no 48-column groupBy shuffle (the r4
    * shape). Bit-identical: each bit's majority vote sums ±1 over the
    * same distinct-shingle set, so order never enters. */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 48): DataFrame =
    shingleArrays(docs, idCol, textCol)
      .select(col("doc_id"), TextHash.simhashOf(col("sh"), bits).as("simhash"))

  /** Near-dup CLUSTERS from a pair list — the step that turns pairwise
    * similarity into an actual dedup decision. Connected components by
    * min-id label propagation: every doc starts as its own label; each
    * iteration every doc takes the min label among itself and its
    * neighbors; fixpoint = the component's min doc id. Iteration count
    * is the cluster DIAMETER — near-dup clusters are shallow (dups of a
    * common source), so a handful of passes closes them; the hard cap
    * exists so pathological chains fail loudly instead of looping.
    *
    * Scale shape: each pass is one join on doc_id + one groupBy — all
    * shuffle-on-key, no driver data; lineage is cut per pass with
    * localCheckpoint so the plan doesn't grow with iterations (the
    * classic iterative-algorithm hazard). `docs` supplies the universe:
    * documents in no pair come out as their own singleton cluster.
    *
    * Driver synchronization is ONE blocking job per pass (the eager
    * checkpoint). Convergence checks are skipped while `iter <
    * uncheckedIters` — the first check runs AT pass `uncheckedIters`
    * (near-dup components are shallow, so earlier checks never fire) —
    * then run EVERY pass: the check reads
    * already-checkpointed blocks, so it is orders cheaper than the one
    * full propagation pass that a sparser check cadence would waste
    * past the fixpoint. The check itself is exact and join-free: the
    * previous label
    * rides through the min-aggregate as a side column (neighbors
    * contribute null, which min ignores), so "any row changed" is a
    * short-circuiting `where(new < prev).isEmpty` over the
    * already-checkpointed blocks — no sums, so no overflow aliasing at
    * any id magnitude.
    *
    * `checkpointDir` picks the lineage-cut durability: None (default)
    * uses `localCheckpoint` — blocks are non-replicated executor state,
    * right for single-JVM runs but a lost executor kills the iteration
    * on a cluster; Some(dir) sets the SparkContext checkpoint dir and
    * uses reliable `checkpoint()` (HDFS-backed on a cluster), the
    * long-run multi-executor mode.
    *
    * Output: (doc_id, cluster_id, is_canonical) — canonical = the
    * cluster's min id, the keep-first rule the reference's dedup uses
    * (transform.py:79 semantics lifted to near-dup groups). */
  def nearDupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 20, uncheckedIters: Int = 2,
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(docs.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() // eager, reliable
      else df.localCheckpoint(true)
    // persist the pair frame BEFORE the src/dst mirror union: its two
    // branches otherwise re-materialize the entire upstream pair
    // pipeline (LSH banding + cosine/jaccard verify) once each
    val p = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p.select(col("doc_b").as("src"),
        col("doc_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val idType = docs.schema(idCol).dataType
    var labels = docs.select(col(idCol).as("doc_id"),
      col(idCol).as("cluster_id")).transform(cut)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // min over self + neighbors' labels; the self row carries the old
      // label in `prev` (neighbor rows carry null, ignored by min), so
      // the checkpointed frame contains its own convergence signal
      val viaNeighbors = edges
        .join(labels.select(col("doc_id").as("src"), col("cluster_id")),
          Seq("src"))
        .select(col("dst").as("doc_id"), col("cluster_id"),
          lit(null).cast(idType).as("prev"))
      val next = labels.withColumn("prev", col("cluster_id"))
        .unionByName(viaNeighbors)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"), min(col("prev")).as("prev"))
        .transform(cut) // cut lineage per pass
      iter += 1
      if (iter >= uncheckedIters || iter == maxIters)
        // null prev = the id FIRST appeared this pass (a pair endpoint
        // outside `docs`): that is a change, not a fixpoint — filtering
        // nulls out would declare early convergence and truncate
        // propagation through such chains
        converged = next
          .where(col("prev").isNull || col("cluster_id") < col("prev"))
          .isEmpty
      labels = next.drop("prev")
    }
    edges.unpersist(); p.unpersist() // before the require — no leak on the failure path
    require(converged, s"label propagation did not converge in $maxIters passes")
    labels.select(col("doc_id"), col("cluster_id"),
      (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-wide PARAGRAPH dedup — the C4-style sub-document pass
    * (documents that are each unique can still share a boilerplate
    * footer/header/license paragraph thousands of times over): any
    * paragraph occurring in >= `maxDf` distinct documents is removed
    * from EVERY document, and the cleaned text is reassembled in
    * original paragraph order. Complements exact (doc-level, q16) and
    * shingle (near-dup, q17-q19) dedup, and the cross-corpus
    * commonness SIGNAL (q54) — this one edits the text.
    *
    * Scale shape: paragraphs explode row-locally; the document
    * frequency is one groupBy over 32-byte paragraph hashes (distinct
    * (doc, hash) first, partial-aggregable); the join back is on the
    * same hash; reassembly is a per-document collect bounded by the
    * document's own size (sort_array over (idx, para) structs — no
    * window, no global sort). Dropping ALL copies (not keep-first)
    * keeps the rule engine-order-independent and replayable.
    *
    * Output per doc: paragraph counts and the cleaned text's hash (the
    * verification surface — shipping the corpus back out belongs to a
    * sink, not the metric frame). */
  def dropBoilerplateParagraphs(docs: DataFrame, idCol: String,
      textCol: String, maxDf: Int = 10): DataFrame =
    cleanBoilerplateParagraphs(docs, idCol, textCol, maxDf)
      .select(col("doc_id"), col("n_paras"), col("n_kept"),
        sha2(col("cleaned"), 256).as("cleaned_hash"))
      .orderBy(col("doc_id"))

  /** [[dropBoilerplateParagraphs]]'s text-returning core — what a
    * pipeline stage consumes (the CLEANED text itself, q60 hashes it
    * for the verification surface). */
  def cleanBoilerplateParagraphs(docs: DataFrame, idCol: String,
      textCol: String, maxDf: Int = 10): DataFrame = {
    require(maxDf > 1, s"need maxDf > 1, got $maxDf")
    val paras = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n\n")).as(Seq("idx", "para")))
    val df = paras.select(col("doc_id"), sha2(col("para"), 256).as("h"))
      .distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    paras.withColumn("h", sha2(col("para"), 256))
      .join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("df") < maxDf, 1L).otherwise(0L)).as("n_kept"),
        // when() without otherwise is NULL for dropped paras and
        // collect_list skips NULLs; sort by idx restores text order
        array_join(transform(
          array_sort(collect_list(when(col("df") < maxDf,
            struct(col("idx"), col("para"))))),
          s => s.getField("para")), "\n\n").as("cleaned"))
  }

  /** Exact SUBSTRING-level dedup profile — the ">= L-token duplicated
    * span" pass run on large pretraining corpora (doc-level q16 misses
    * two long documents that share one long quoted block; paragraph
    * q60 misses spans that cross paragraph boundaries or repeat inside
    * one paragraph). A span occurrence is REPEATED if its `spanTokens`-
    * window hash has an earlier occurrence anywhere in the corpus —
    * earlier = lexicographically smaller (doc_id, position), so the
    * first occurrence corpus-wide keeps its text and every later copy
    * is flagged (keep-first, like the reference's dedup and unlike
    * q60's drop-all rule). Per doc, the profile reports how many of
    * its windows are repeats and how many TOKENS the union of repeated
    * windows covers (overlapping windows merged, each token counted
    * once) — the number [[maskRepeatedSpans]] would remove.
    *
    * Scale shape: window hashes are ONE compiled rolling O(tokens)
    * pass per row ([[TextHash.windowHashesOf]]); the corpus-wide
    * machinery is a single groupBy on the 8-byte window hash — the
    * first-occurrence pick is a partial-aggregable min(struct) — and
    * an equi-join back on the same key (the exchange is reused), with
    * everything after the `n_occ >= 2` filter proportional to the
    * DUPLICATED volume only. Coverage merging is a per-doc fold over
    * that doc's own repeat positions (no window function, no second
    * shuffle). Never all-pairs, no suffix array: the fixed-L window
    * hash is the standard scalable relaxation of suffix-array substring
    * dedup — spans >= L are caught exactly (every length-L sub-window
    * repeats), spans < L never; 31^k collisions mod P are possible in
    * principle and shared deterministically with the oracle replay. */
  def repeatedSpanProfile(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 20): DataFrame = {
    val span = spanTokens
    val base = docs.select(col(idCol).as("doc_id"),
      size(TextHash.tokenHashesOf(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("n_windows",
        greatest(col("n_tokens") - lit(span - 1), lit(0L)))
    val perDoc = repeatedSpanPositions(docs, idCol, textCol, span)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rep_windows"),
        // union length of the fixed-length cover intervals: fold the
        // sorted positions carrying (covered count, previous end) —
        // each window adds span tokens minus its overlap with the
        // previous one; pe starts at 0, positions are >= 0, so the
        // first window always contributes the full span
        expr(s"""aggregate(array_sort(collect_list(pos)),
          named_struct('c', 0L, 'pe', 0L),
          (a, p) -> named_struct(
            'c', a.c + (p + ${span}L) - greatest(a.pe, p),
            'pe', p + ${span}L),
          a -> a.c)""").as("n_masked_tokens"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("n_rep_windows"), lit(0L)).as("n_rep_windows"),
        coalesce(col("n_masked_tokens"), lit(0L)).as("n_masked_tokens"))
      .withColumn("masked_fp", when(col("n_tokens") > 0,
        expr("(n_masked_tokens * 1048576) div n_tokens")).otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }

  /** [[repeatedSpanProfile]]'s text-editing core: tokens covered by
    * any repeated span are removed (first occurrence kept), the
    * survivors rejoined with single spaces (whitespace normalizes,
    * like every tokenizing rewrite here). The per-token keep test is a
    * row-local scan of the doc's own repeat positions — no extra
    * shuffle beyond the profile's. DedupSpec pins the token accounting
    * against the profile: kept tokens == n_tokens - n_masked_tokens. */
  def maskRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 20): DataFrame = {
    val span = spanTokens
    val covs = repeatedSpanPositions(docs, idCol, textCol, span)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("covpos"))
    docs.select(col(idCol).as("doc_id"),
        TextHash.tokens(col(textCol)).as("w"))
      .join(covs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("covpos").isNull, concat_ws(" ", col("w")))
          .otherwise(expr(s"""concat_ws(' ', filter(w, (t, i) ->
            NOT exists(covpos, p -> p <= i AND i < p + $span)))"""))
          .as("cleaned"))
      .orderBy(col("doc_id"))
  }

  /** Shared candidate pass for the span-dedup pair above: the (doc_id,
    * pos) of every REPEAT window occurrence (first occurrence
    * excluded). Positions are cast to long so downstream folds never
    * mix int/long arithmetic. */
  private def repeatedSpanPositions(docs: DataFrame, idCol: String,
      textCol: String, span: Int): DataFrame = {
    require(span >= 1, s"span dedup needs spanTokens >= 1, got $span")
    val win = docs.select(col(idCol).as("doc_id"),
      posexplode(TextHash.windowHashesOf(col(textCol), span))
        .as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
    val dup = win.groupBy(col("w"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
        count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2)
    win.join(dup, Seq("w"))
      .where(col("doc_id") =!= col("f.doc_id") ||
        col("pos") =!= col("f.pos"))
      .select(col("doc_id"), col("pos"))
  }

  /** SimHash near-dup pairs with hamming <= `maxHamming` (default 3).
    * Candidates come from `maxHamming + 1` equal-width chunk buckets:
    * a pair within hamming h differs in at most h of the 48 bits, so by
    * pigeonhole at least one of h+1 chunks is identical — recall is
    * exact for the given `maxHamming`, not probabilistic (the chunk
    * count is DERIVED from the parameter so the guarantee can't drift).
    * Verification is a single bit_count(xor). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bits: Int = 48,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // fingerprints feed both sides of the chunk self-join — persist the
    // 2-longs-per-doc frame instead of recomputing the signature agg
    val fps = scope.persist(simhashFingerprints(docs, idCol, textCol, bits))
    fingerprintPairs(fps, "doc_id", "simhash", maxHamming, bits)
  }

  /** Hamming-≤-`maxHamming` pairs of ANY per-doc bit fingerprint — the
    * pigeonhole chunk-bucket core shared by [[simhashPairs]] (48-bit
    * text SimHash) and the 64-bit image dHash rung
    * ([[Multimodal.imageDhash]]): split the fingerprint into
    * `maxHamming + 1` equal chunks; a pair within Hamming h differs in
    * at most h chunks, so at least one chunk matches — candidate
    * recall is EXACT for the declared radius, never probabilistic.
    * Verification is one `bit_count(xor)`. Works for bits = 64: the
    * arithmetic `shiftright` sign-fill is masked off, and xor/
    * bit_count are sign-agnostic.
    *
    * Scale shape — DISTINCT fingerprints first (r15): a perceptual-
    * hash corpus is duplicate-HEAVY by nature (re-encoded/rescaled
    * copies collapse to one hash), so the chunk self-join runs over
    * the \|F\|-row distinct-fingerprint frame, never the corpus:
    * identical-hash doc pairs come from ONE fp equi-join (Hamming 0
    * by definition — no chunk machinery, no 4× candidate
    * duplication), and cross-hash pairs expand the verified ≤-radius
    * fp-pair frame through the two doc lists. Measured at sf0.1 on
    * the q255 fixture (50 distinct hashes over 4k docs): 54 MB of
    * chunk-candidate shuffle down to ~6 MB, 2.7 s → ~1 s. When every
    * fingerprint is unique the distinct is a no-op and the shape
    * degenerates to the classic inverted-index self-join. The caller
    * persists `fps` (it feeds the distinct and both expansion
    * sides). */
  def fingerprintPairs(fps: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int, bits: Int): DataFrame = {
    val docs = fps.select(col(idCol).as("doc_id"), col(fpCol).as("fp"))
    val fpPairs = distinctFpPairs(docs, maxHamming, bits)
      .withColumn("hamming",
        bit_count(col("fa").bitwiseXOR(col("fb"))))
    // identical fingerprints: Hamming 0 by definition — one equi-join
    val same = docs.select(col("fp"), col("doc_id").as("doc_a"))
      .join(docs.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(0).as("hamming"))
    // near (but not equal) fingerprints: expand each verified fp pair
    // through both doc lists
    val cross = fpPairs
      .join(docs.select(col("fp").as("fa"), col("doc_id").as("ida")),
        Seq("fa"))
      .join(docs.select(col("fp").as("fb"), col("doc_id").as("idb")),
        Seq("fb"))
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("hamming"))
    same.unionByName(cross).orderBy(col("doc_a"), col("doc_b"))
  }

  /** The ≤-radius pairs of DISTINCT fingerprint values — the chunk
    * self-join core shared by [[fingerprintPairs]] (which expands
    * them to doc pairs) and [[fingerprintClusters]] (which never
    * does). Output (fa, fb) with fa < fb, verified Hamming ≤ max. */
  private def distinctFpPairs(docs: DataFrame, maxHamming: Int,
      bits: Int): DataFrame =
    distinctFpPairsOver(docs.select(col("fp")).distinct(), maxHamming,
      bits)

  /** [[distinctFpPairs]] over an ALREADY-distinct single-column `fp`
    * frame — callers that computed the distinct pass themselves (e.g.
    * as a groupBy carrying per-fp aggregates) reuse that shuffle
    * instead of paying a second one for a distinct Catalyst cannot
    * prove. */
  private def distinctFpPairsOver(distinctFp: DataFrame,
      maxHamming: Int, bits: Int): DataFrame = {
    val nChunks = maxHamming + 1
    require(bits % nChunks == 0,
      s"bits=$bits must split evenly into ${nChunks} chunks")
    require(bits >= nChunks && bits <= 64, s"bits=$bits out of range")
    val width = bits / nChunks
    val mask = (1L << width) - 1
    val chunks = distinctFp.select(col("fp"),
      explode(array((0 until nChunks).map(c =>
        struct(lit(c).as("chunk_id"),
          shiftright(col("fp"), c * width).bitwiseAND(lit(mask))
            .as("chunk"))): _*)).as("cs"))
      .select(col("fp"), col("cs.chunk_id").as("chunk_id"),
        col("cs.chunk").as("chunk"))
    val hamming = bit_count(col("fa").bitwiseXOR(col("fb")))
    chunks
      .select(col("fp").as("fa"), col("chunk_id"), col("chunk"))
      .join(chunks.select(col("fp").as("fb"), col("chunk_id"),
        col("chunk")), Seq("chunk_id", "chunk"))
      .where(col("fa") < col("fb"))
      .select(col("fa"), col("fb")).distinct()
      .where(hamming <= maxHamming)
  }

  /** Near-dup CLUSTERS from per-doc bit fingerprints — the KEEP/DROP
    * decision, computed WITHOUT ever materializing doc-level pairs:
    * two docs are connected iff their fingerprints sit in the same
    * ≤-radius component (same-hash docs are always pairwise within
    * radius 0), so label propagation runs over the DISTINCT
    * -fingerprint graph and docs attach their component afterwards —
    * the doc-pair graph is quadratic in duplicate mass (measured at
    * sf0.1 on the q255 fixture: 3.1 s / 50 MB via doc pairs,
    * sub-second / ~2 MB this way).
    *
    * Broadcast discipline: every broadcast frame here is bounded by
    * DUPLICATE MASS, never corpus size. On a mostly-unique lake —
    * the common 100 TB case — \|distinct fingerprints\| ≈ \|docs\|,
    * so a corpus-sized frame must never carry a broadcast hint. Only
    * the INTERESTING fingerprints do: those touched by a ≤-radius
    * pair (≤ 2·\|pairs\|) or shared by > 1 doc (≤ duplicate count) —
    * both vanish as the lake approaches all-unique. Docs whose
    * fingerprint is boring are their own singleton cluster
    * ROW-LOCALLY (`coalesce` after the broadcast left join — no
    * shuffle, no propagation node, no broadcast row for them). The
    * per-fp (min doc, doc count) aggregate rides the distinct pass
    * the pigeonhole needs anyway — same shuffle key, +16 bytes/row.
    *
    * Output (doc_id, cluster_id = min doc id of the component,
    * is_canonical), identical to [[nearDupClusters]] over
    * [[fingerprintPairs]]. */
  def fingerprintClusters(fps: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int, bits: Int,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val docs = fps.select(col(idCol).as("doc_id"), col(fpCol).as("fp"))
    // the distinct pass, widened to carry per-fp min doc id and count
    val fpAgg = scope.persist(docs.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("fp_min"), count(lit(1)).as("cnt")))
    // eager checkpoint — the pair frame seeds the propagation loop
    // (the q308 4 MB-plan lesson); duplicate-mass-bounded
    val pairs = distinctFpPairsOver(
      fpAgg.select(col("fp")), maxHamming, bits).localCheckpoint(true)
    // fp-level components over PAIR-TOUCHED fingerprints only (valid
    // ids for the propagation — they are longs); bounded by 2·|pairs|
    val touched = pairs.select(col("fa").as("fp"))
      .unionByName(pairs.select(col("fb").as("fp"))).distinct()
    val fpComponents = nearDupClusters(touched.select(
        col("fp").as("doc_id")), "doc_id",
      pairs.select(col("fa").as("doc_a"), col("fb").as("doc_b")))
      .select(col("doc_id").as("fp"), col("cluster_id").as("__comp"))
    // interesting fps: pair-touched, or shared by >1 doc (same-hash
    // docs cluster at radius 0 with no pair edge); untouched ones
    // component to themselves. Every small side below is
    // duplicate-mass-bounded — AQE broadcasts them at runtime; the
    // hints are deliberately NOT forced (the r17 capHotKeys
    // discipline: a hostile all-duplicates lake degrades to a shuffle
    // join instead of a driver OOM), and the corpus-sized frames sit
    // on the storage side of LEFT joins, which Spark cannot broadcast.
    val interesting = scope.persist(fpAgg
      .join(fpComponents, Seq("fp"), "left")
      .where(col("cnt") > 1 || col("__comp").isNotNull)
      .select(col("fp"), col("fp_min"),
        coalesce(col("__comp"), col("fp")).as("__comp")))
    val compMin = interesting.groupBy(col("__comp"))
      .agg(min(col("fp_min")).as("cluster_id"))
    val clusterMap = interesting.join(compMin, Seq("__comp"))
      .select(col("fp"), col("cluster_id"))
    // boring fps miss the map → singleton cluster, decided row-locally
    docs.join(clusterMap, Seq("fp"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** EVAL-SET DECONTAMINATION on the fingerprint rung — the
    * q36/q113 ladder's perceptual sibling for images/audio: flag
    * every TRAIN doc whose fingerprint sits within Hamming ≤
    * `maxHamming` of ANY eval-set fingerprint, with the closest hit
    * as a deterministic witness (min hamming, then the smallest eval
    * id carrying a closest fingerprint). A benchmark image that
    * leaked into the training lake as a re-encode is invisible to
    * byte-level decontamination — this is the gate that sees it.
    *
    * Scale shape: eval sets are benchmarks-SMALL by nature (the q113
    * broadcast argument), so the eval pigeonhole chunk index rides a
    * broadcast and the TRAIN side streams — one pass over distinct
    * train fingerprints, no self-join, exact recall for the radius
    * (chunk cover + verify); the flagged output re-attaches to train
    * docs by one fp-keyed shuffle join. The broadcast is AQE's
    * runtime decision, not a forced hint (the r17 capHotKeys
    * discipline): the chunk index is `(maxHamming+1) × |distinct
    * eval fps|` rows — small for every real benchmark, but nothing
    * BOUNDS a hostile caller's eval set, and a forced hint would
    * turn that mistake into a driver OOM where the unhinted plan
    * degrades to a shuffle join. Output
    * (doc_id, hamming, eval_id) — only contaminated docs — ordered. */
  def fingerprintDecontam(train: DataFrame, evalSet: DataFrame,
      idCol: String, fpCol: String, maxHamming: Int,
      bits: Int): DataFrame = {
    val nChunks = maxHamming + 1
    require(bits % nChunks == 0,
      s"bits=$bits must split evenly into ${nChunks} chunks")
    require(bits >= nChunks && bits <= 64, s"bits=$bits out of range")
    val width = bits / nChunks
    val mask = (1L << width) - 1
    def chunksOf(fp: Column) = explode(array((0 until nChunks).map(c =>
      struct(lit(c).as("chunk_id"),
        shiftright(fp, c * width).bitwiseAND(lit(mask))
          .as("chunk"))): _*))
    val tr = train.select(col(idCol).as("doc_id"), col(fpCol).as("fp"))
    val evFps = evalSet.select(col(idCol).as("eval_id"),
        col(fpCol).as("fp"))
      .groupBy(col("fp")).agg(min(col("eval_id")).as("eval_min"))
    val evChunks = evFps.select(col("fp").as("fe"), col("eval_min"),
        chunksOf(col("fp")).as("cs"))
      .select(col("fe"), col("eval_min"),
        col("cs.chunk_id").as("chunk_id"), col("cs.chunk").as("chunk"))
    val trChunks = tr.select(col("fp")).distinct()
      .select(col("fp").as("ft"), chunksOf(col("fp")).as("cs"))
      .select(col("ft"), col("cs.chunk_id").as("chunk_id"),
        col("cs.chunk").as("chunk"))
    val best = trChunks
      .join(evChunks, Seq("chunk_id", "chunk"))
      .select(col("ft"), col("fe"), col("eval_min")).distinct()
      .withColumn("hamming",
        bit_count(col("ft").bitwiseXOR(col("fe"))))
      .where(col("hamming") <= maxHamming)
      .groupBy(col("ft"))
      .agg(min(struct(col("hamming"), col("eval_min"))).as("__b"))
      .select(col("ft").as("fp"),
        col("__b.hamming").as("hamming"),
        col("__b.eval_min").as("eval_id"))
    tr.join(best, Seq("fp"))
      .select(col("doc_id"), col("hamming"), col("eval_id"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup pairs of fingerprint SEQUENCES — videos as per-frame
    * dHash streams ([[Multimodal.videoFrameFingerprints]]), audio as
    * per-window envelope hashes, any (id, align, fp) frame: two
    * sequences are near-dup when at least `minMatchNum/minMatchDen`
    * of the longer one's positions carry fingerprints within
    * Hamming ≤ `maxHamming` of the other's AT THE SAME position
    * (temporal alignment — the dup class re-encodes/rescales frames
    * but does not re-order them; trims show up as missing positions
    * and are tolerated up to the share threshold).
    *
    * Scale shape — the r15 distinct-fingerprint discipline lifted to
    * sequences, twice over:
    *  1. EXACT sequence signature first: group ids by their full
    *     sorted (align, fp) list (exact, collision-free — the
    *     signature IS the sequence). Re-encoded copies of the same
    *     video collapse to one representative; only representatives
    *     ever enter the match join, so a million-copy dup family
    *     costs ONE sequence there (the member-pair expansion at the
    *     end is the pair-output mass itself — irreducible for a pair
    *     operator, and exactly where [[fingerprintClusters]]-style
    *     consumers fold it back down).
    *  2. Within representatives, the per-position match is the
    *     [[fingerprintPairs]] pigeonhole: DISTINCT (align, fp) rows
    *     chunk into `maxHamming + 1` buckets keyed (align, chunk_id,
    *     chunk) — candidates never cross positions, recall is exact
    *     for the radius, verification is one `bit_count(xor)`.
    * No all-pairs anywhere: every join is keyed by position buckets
    * or signature, and the only corpus-quadratic object is the
    * verified pair OUTPUT itself.
    *
    * Output: (doc_a, doc_b, n_match, n_frames_a, n_frames_b) with
    * doc_a < doc_b, `minMatchDen·n_match ≥ minMatchNum·max(n_a, n_b)`.
    * Input must carry at most one fp per (id, align) — decode rungs
    * emit exactly that; corrupt frames (`ok = 0`) are the caller's
    * filter. The signature fold's per-group state is one (align, fp)
    * pair per FRAME of one video — the per-video frame count is the
    * operator's state bound, and it is a policy choice upstream (a
    * sampling plan caps it: q238's stride, q281's per-shot budget),
    * not corpus-dependent. */
  /** SEQUENCE-shingle clip CONTAINMENT — the OFFSET-TOLERANT rung the
    * aligned family cannot cover: [[alignedFingerprintPairs]] matches
    * frames at the SAME index, so a TRIMMED copy (an intro cut off, a
    * clip embedded mid-video — the classic re-upload) shifts every
    * index and escapes it entirely. Here each video's ordered
    * fingerprint stream is k-gram SHINGLED over its OBSERVED frames
    * (consecutive decoded frames — a mid-stream decode failure is
    * bridged, the q281 discipline), and two videos match when they
    * share at least `minSharedNum/minSharedDen` of the SMALLER side's
    * distinct shingles — q100's containment decision lifted from word
    * shingles to fingerprint sequences. Shingles join EXACTLY (k
    * 8-byte fps as the key — no re-statable-hash gymnastics, and the
    * perceptual tolerance already lives inside each dHash: a
    * re-encode reproduces the fingerprints bit-for-bit on the
    * codec-exact rungs).
    *
    * Scale shape (the [[containmentPairs]] discipline, plus the
    * [[alignedRepGraph]] signature collapse since r19): EXACT stream
    * signatures collapse first — a million-copy dup family costs ONE
    * representative in the shingle machinery, so the self-join runs
    * on distinct-STREAM mass (before r19 only the funnel collapsed,
    * via aligned families; standalone calls paid full duplicate
    * mass) — then one per-representative window builds shingles
    * (bounded by per-video frame counts), the document-frequency cap
    * `maxDf` applies BEFORE the self-join with each representative
    * row WEIGHTED by its member count (the cap still counts DOCS — a
    * ubiquitous black-frame shingle carried by a million copies
    * still trips it), then the inverted-index intersection keyed on
    * the shingle — candidate volume Σ_sh df² over streams, never
    * all-pairs. The member-pair expansion at the end is the pair
    * OUTPUT mass itself (irreducible for a pair operator;
    * [[sequenceShingleClusters]] is the consumer that never expands
    * it). Videos with fewer than k observed frames carry no shingles
    * and are absent by construction; an all-capped stream pairs with
    * nothing, including its own byte-identical copies.
    *
    * Output (doc_a, doc_b, n_shared, n_a, n_b) with doc_a < doc_b and
    * `minSharedDen·n_shared ≥ minSharedNum·min(n_a, n_b)`, ordered. */
  def sequenceShingleContainment(fps: DataFrame, idCol: String,
      alignCol: String, fpCol: String, k: Int = 3,
      minSharedNum: Int = 1, minSharedDen: Int = 2, maxDf: Long = 100L,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    requireClipPolicy(k, minSharedNum, minSharedDen, maxDf)
    val keys = (0 until k).map(i => s"f$i")
    val f = fps.select(col(idCol).as("doc_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    val (members, repPairs, sz) = clipRepGraph(f, keys, k,
      minSharedNum, minSharedDen, maxDf, scope)
    // same-signature members share EVERY cold shingle, so they pair
    // iff the stream kept at least one (an all-capped stream pairs
    // with nothing — not even its own byte-identical copies — exactly
    // the uncollapsed relation)
    val exact = members.where(size(col("docs")) > 1)
      .join(sz.select(col("doc_id").as("rep"), col("n")), Seq("rep"))
      .select(col("n"), explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("n"), col("doc_a"), explode(col("docs")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n").as("n_shared"),
        col("n").as("n_a"), col("n").as("n_b"))
    // threshold-passing representative pairs expand through both
    // member lists; the (a, b) order can flip inside the cross
    // product — n_a/n_b swap with it
    val cross = repPairs
      .join(members.select(col("rep").as("ra"), col("docs").as("__da")),
        Seq("ra"))
      .join(members.select(col("rep").as("rb"), col("docs").as("__db")),
        Seq("rb"))
      .select(col("n_shared"), col("n_a"), col("n_b"),
        explode(col("__da")).as("__a"), col("__db"))
      .select(col("n_shared"), col("n_a"), col("n_b"), col("__a"),
        explode(col("__db")).as("__b"))
      .select(least(col("__a"), col("__b")).as("doc_a"),
        greatest(col("__a"), col("__b")).as("doc_b"),
        col("n_shared"),
        when(col("__a") < col("__b"), col("n_a")).otherwise(col("n_b"))
          .as("n_a"),
        when(col("__a") < col("__b"), col("n_b")).otherwise(col("n_a"))
          .as("n_b"))
    exact.unionByName(cross)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** CLIP FAMILIES without the member-pair expansion (r19) — the
    * KEEP/DROP decision over [[sequenceShingleContainment]]'s
    * relation, computed the [[alignedFingerprintClusters]] way:
    * components propagate over the REPRESENTATIVE pair graph only
    * (bounded by duplicate mass), members attach through their
    * stream's representative afterwards — the doc-pair graph (125k
    * edges on the sf0.1 clip fixture) never materializes. Exact
    * same-signature groups cluster with their representative iff the
    * stream kept ≥ 1 cold shingle (all-capped streams pair with
    * nothing in the uncollapsed relation, so their members stay
    * SINGLETONS — preserved bit-for-bit). Universe = shingle-able
    * docs (≥ k observed frames). Output (doc_id, cluster_id,
    * is_canonical), identical to [[nearDupClusters]] over the
    * containment pairs. */
  def sequenceShingleClusters(fps: DataFrame, idCol: String,
      alignCol: String, fpCol: String, k: Int = 3,
      minSharedNum: Int = 1, minSharedDen: Int = 2, maxDf: Long = 100L,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    requireClipPolicy(k, minSharedNum, minSharedDen, maxDf)
    val keys = (0 until k).map(i => s"f$i")
    val f = fps.select(col(idCol).as("doc_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    val (members, rawRepPairs, sz) = clipRepGraph(f, keys, k,
      minSharedNum, minSharedDen, maxDf, scope)
    // eager checkpoint, not persist (r20): the pair frame seeds the
    // label-propagation loop, whose per-pass plans would otherwise
    // each render the ENTIRE shingle pipeline's lineage — at sf0.1
    // the q308 plan string exceeded the 4 MB render cap and every
    // Catalyst pass walked it. The frame is duplicate-mass-bounded.
    val repPairs = rawRepPairs.select(col("ra"), col("rb"))
      .localCheckpoint(true)
    val touched = repPairs.select(col("ra").as("rep"))
      .unionByName(repPairs.select(col("rb").as("rep"))).distinct()
    val comps = nearDupClusters(
      touched.select(col("rep").as("doc_id")), "doc_id",
      repPairs.select(col("ra").as("doc_a"), col("rb").as("doc_b")))
      .select(col("doc_id").as("rep"), col("cluster_id"))
    // comps is bounded by 2·|repPairs| (duplicate mass) — small on
    // every honest lake, so AQE broadcasts it at runtime; the hint is
    // deliberately NOT forced (the r17 capHotKeys discipline): an
    // all-duplicates lake makes comps corpus-sized, and the unhinted
    // plan degrades to a shuffle join instead of a driver OOM. The
    // has-cold-shingles join is |streams|-keyed, AQE's call too.
    members.where(col("n_frames") >= k)
      .join(comps, Seq("rep"), "left")
      .join(sz.select(col("doc_id").as("rep"), col("n")), Seq("rep"),
        "left")
      .select(explode(col("docs")).as("doc_id"), col("rep"),
        col("cluster_id"), col("n"))
      .select(col("doc_id"),
        when(col("n").isNotNull, coalesce(col("cluster_id"), col("rep")))
          .otherwise(col("doc_id")).as("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** The signature-collapse layer of the clip rung (r19 — the
    * [[alignedRepGraph]] discipline lifted to shingles, closing the
    * funnel-vs-standalone gap: standalone q305/q308 paid the shingle
    * self-join on FULL duplicate mass while the funnel collapsed
    * first): `members` = one row per DISTINCT (align, fp) stream
    * (min-id representative, sorted member list, member count,
    * frame count); shingles build over REPRESENTATIVE streams only;
    * the df cap weights each representative shingle row by its
    * member count, so the cap still counts DOCS (a million-copy
    * black-frame family still trips it); `repPairs` = the
    * threshold-passing (ra, rb, n_shared, n_a, n_b) representative
    * relation; `sz` = per-representative distinct COLD shingle
    * counts. All persisted under `scope`. */
  private def clipRepGraph(f: DataFrame, keys: Seq[String], k: Int,
      minSharedNum: Int, minSharedDen: Int, maxDf: Long,
      scope: CacheScope): (DataFrame, DataFrame, DataFrame) = {
    val members = streamMembers(f, scope)
    val repFrames = f.join(members.select(col("rep").as("doc_id")),
      Seq("doc_id"))
    val sh = scope.persist(clipShingleLeads(repFrames, "doc_id",
        "align", "fp", k, withPos = false)
      .select(col("doc_id") +: keys.map(col): _*)
      .distinct())
    val hot = sh
      .join(members.select(col("rep").as("doc_id"), col("w")),
        Seq("doc_id"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("w")).as("__df"))
      .where(col("__df") > maxDf)
      .select(keys.map(col): _*)
    val cold = scope.persist(sh.join(hot, keys, "left_anti"))
    val repPairs = clipPassingPairs(cold, keys, minSharedNum,
        minSharedDen)
      .select(col("doc_a").as("ra"), col("doc_b").as("rb"),
        col("n_shared"), col("n_a"), col("n_b"))
    val sz = cold.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    (members, repPairs, sz)
  }

  /** The exact-stream signature collapse shared by the clip and
    * aligned rep-graph rungs: one row per DISTINCT (align, fp) stream
    * — (rep = min member id, docs = sorted member list, w = member
    * count, n_frames), persisted under `scope`.
    *
    * The grouping key is a 128-bit HASH of the stream (two
    * independent per-row `xxhash64` folds XOR-combined per doc, plus
    * the frame count), NOT the materialized
    * `sort_array(collect_list(struct(align, fp)))` array the r19
    * implementation grouped on: the array key is unbounded-width (a
    * 2-hour video is tens of KB per key), forces object-hash
    * aggregation, and ships whole streams through the exchange —
    * measured on the sf0.1 clip fixture it made q308/q312 SLOWER
    * than the collapse it was meant to speed up. The hash key is
    * 24 bytes and hash-aggregable, the
    * [[graft.streaming.VideoDedupStream.sequenceKey]] discipline in
    * aggregate form. No ordered fold is needed: `align` IS the
    * position, so the (align, fp) SET determines the stream, and XOR
    * is a sound set hash because inputs carry at most one fp per
    * (id, align) — the decode rungs' contract (duplicate rows would
    * self-cancel). A 2⁻¹²⁸-per-pair collision merges two streams;
    * the naive array model stays in DedupSpec as the equivalence
    * oracle. */
  private def streamMembers(f: DataFrame,
      scope: CacheScope): DataFrame =
    scope.persist(f
      .groupBy(col("doc_id"))
      .agg(bit_xor(xxhash64(col("align"), col("fp"))).as("__sig1"),
        bit_xor(xxhash64(col("fp"), col("align"),
          lit(0x9e3779b97f4a7c15L))).as("__sig2"),
        count(lit(1)).as("n_frames"))
      .groupBy(col("__sig1"), col("__sig2"), col("n_frames"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("docs"),
        count(lit(1)).as("w"))
      .select(col("rep"), col("docs"), col("w"), col("n_frames")))

  private def requireClipPolicy(k: Int, minSharedNum: Int,
      minSharedDen: Int, maxDf: Long): Unit = {
    require(k >= 1 && k <= 16, s"k=$k out of [1, 16]")
    require(minSharedNum >= 1 && minSharedDen >= 1 &&
      minSharedNum <= minSharedDen,
      s"bad share threshold $minSharedNum/$minSharedDen")
    require(maxDf >= 1, s"maxDf=$maxDf must be positive")
  }

  /** Shared shingle build of the clip rung (the r18 advice factoring —
    * [[sequenceShingleContainment]]/[[sequenceShingleOffsets]] built
    * the same frames twice): k-gram shingle OCCURRENCE rows
    * (doc_id, [pos,] f0..f{k−1}) over each doc's OBSERVED frames, one
    * per-doc lead window. `withPos` adds the observed-frame start
    * position (`row_number − 1` on the same window — the offsets
    * readout needs it; the containment decision does not and skips
    * the extra column). */
  private def clipShingleLeads(fps: DataFrame, idCol: String,
      alignCol: String, fpCol: String, k: Int,
      withPos: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("align"))
    val f = fps.select(col(idCol).as("doc_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    val keys = (0 until k).map(i => s"f$i")
    val base = f.withColumn("f0", col("fp"))
    val posed =
      if (withPos) base.withColumn("pos", row_number().over(w) - 1)
      else base
    val outCols = col("doc_id") +:
      (if (withPos) Seq(col("pos")) else Nil) ++: keys.map(col)
    (1 until k).foldLeft(posed) { case (df, i) =>
        df.withColumn(s"f$i", lead(col("fp"), i).over(w))
      }
      .where(col(keys.last).isNotNull)
      .select(outCols: _*)
  }

  /** The ubiquitous-shingle cap: shingles carried by more than `maxDf`
    * docs (computed over DISTINCT-per-doc rows — count(*) IS the doc
    * count) are dropped from pairing before any self-join, bounding
    * candidate mass at Σ_sh df². */
  private def clipHotShingles(distinctSh: DataFrame,
      keys: Seq[String], maxDf: Long): DataFrame =
    distinctSh.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf)
      .select(keys.map(col): _*)

  /** OPERATING-POINT CURVE of the clip rung's (share, maxDf) policy
    * grid — the measured readout behind [[sequenceShingleContainment]]'s
    * knobs (r20, the q144/q214/q250 discipline): per grid policy, the
    * flagged-pair mass, the true hits, precision and recall against
    * the UNCAPPED shared-shingle GROUND TRUTH (a shared k-gram IS a
    * shared k-window run at some offset — the brute-force
    * offset-shifted truth).
    *
    * ONE inverted-index self-join powers the whole grid: every capped
    * screen is a deterministic function of (per-pair shared-shingle
    * counts bucketed by shingle df, per-doc cold counts per cap), so
    * the join runs once over ALL distinct doc-level shingles with the
    * df annotated, and each policy's relation falls out of
    * conditional sums — 5 containment runs' worth of readout for one
    * join (measured at sf0.1: 13.5 s per-policy reruns → one-join).
    * Doc-level df over DISTINCT rows equals the operator's
    * member-weighted representative df, and the doc-level pair
    * relation equals its member expansion, so the derived screens
    * match [[sequenceShingleContainment]] exactly (DedupSpec pins the
    * equivalence per policy). Screen ⊆ truth by construction (a cold
    * shingle IS a shingle), so precision ≡ 1 against this truth and
    * RECALL is the information: what the df cap and the share
    * threshold silently discard.
    *
    * The truth join is the one quantity the screen's own cap cannot
    * bound — Σ_sh df² over UNCAPPED df. At corpus scale run this on a
    * deterministic sample (the q129 brute-force-on-a-sample stance);
    * the curve is a policy readout, not a per-doc decision. Output
    * (share_num, share_den, max_df, n_flagged, n_hits, n_truth,
    * precision, recall) ordered by the grid. */
  def sequenceShinglePolicyCurve(fps: DataFrame, idCol: String,
      alignCol: String, fpCol: String, k: Int = 3,
      policies: Seq[(Int, Int, Long)] =
        Seq((1, 2, 2L), (1, 2, 100L), (1, 4, 100L), (3, 4, 100L)),
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(policies.nonEmpty, "need at least one policy")
    policies.foreach { case (num, den, cap) =>
      requireClipPolicy(k, num, den, cap) }
    val keys = (0 until k).map(i => s"f$i")
    val caps = policies.map(_._3).distinct
    val f = fps.select(col(idCol).as("doc_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    val sh = clipShingleLeads(f, "doc_id", "align", "fp", k,
        withPos = false)
      .select(col("doc_id") +: keys.map(col): _*)
      .distinct()
    val shd = scope.persist(sh.join(
      sh.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__df")),
      keys))
    val sz = scope.persist(shd.groupBy(col("doc_id")).agg(
      sum(when(col("__df") <= caps.head, 1L).otherwise(0L))
        .as(s"n_le_${caps.head}"),
      caps.tail.map(c => sum(when(col("__df") <= c, 1L).otherwise(0L))
        .as(s"n_le_$c")): _*))
    val pairAgg = scope.persist(
      shd.select(col("doc_id").as("doc_a") +:
          keys.map(col) :+ col("__df"): _*)
        .join(shd.select(col("doc_id").as("doc_b") +: keys.map(col): _*),
          keys)
        .where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("__all"),
          caps.map(c => sum(when(col("__df") <= c, 1L).otherwise(0L))
            .as(s"sh_le_$c")): _*))
    val truthAgg = pairAgg.agg(count(lit(1)).as("n_truth"))
    val grid = policies.map { case (num, den, cap) =>
      pairAgg
        .join(sz.select(col("doc_id").as("doc_a"),
          col(s"n_le_$cap").as("__na")), Seq("doc_a"))
        .join(sz.select(col("doc_id").as("doc_b"),
          col(s"n_le_$cap").as("__nb")), Seq("doc_b"))
        .where(col(s"sh_le_$cap") >= 1L &&
          col(s"sh_le_$cap") * den >=
            least(col("__na"), col("__nb")) * num)
        .agg(count(lit(1)).as("n_flagged"))
        .select(lit(num.toLong).as("share_num"),
          lit(den.toLong).as("share_den"), lit(cap).as("max_df"),
          col("n_flagged"),
          // screen ⊆ truth (cold ⊆ all shingles): hits = flagged
          col("n_flagged").as("n_hits"))
    }.reduce(_.unionByName(_))
    grid.crossJoin(broadcast(truthAgg))
      .select(col("share_num"), col("share_den"), col("max_df"),
        col("n_flagged"), col("n_hits"), col("n_truth"),
        when(col("n_flagged") > 0,
          col("n_hits").cast("double") / col("n_flagged"))
          .otherwise(lit(0.0)).as("precision"),
        when(col("n_truth") > 0,
          col("n_hits").cast("double") / col("n_truth"))
          .otherwise(lit(0.0)).as("recall"))
      .orderBy(col("share_num"), col("share_den"), col("max_df"))
  }

  /** The threshold-passing containment relation over capped DISTINCT
    * shingle rows: (doc_a, doc_b, n_shared, n_a, n_b) with doc_a <
    * doc_b and `minSharedDen·n_shared ≥ minSharedNum·min(n_a, n_b)` —
    * the inverted-index intersection both clip readouts share. */
  private def clipPassingPairs(coldDistinct: DataFrame,
      keys: Seq[String], minSharedNum: Int,
      minSharedDen: Int): DataFrame = {
    val sz = coldDistinct.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
    coldDistinct.select(col("doc_id").as("doc_a") +: keys.map(col): _*)
      .join(coldDistinct.select(col("doc_id").as("doc_b") +:
        keys.map(col): _*), keys)
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        Seq("doc_b"))
      .where(col("n_shared") * minSharedDen >=
        least(col("n_a"), col("n_b")) * minSharedNum)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_a"), col("n_b"))
  }

  /** CLIP ALIGNMENT OFFSETS — the forensic readout over
    * [[sequenceShingleContainment]]'s relation (r18): for every pair
    * passing the containment threshold, WHERE the shared content
    * aligns — the dominant positional offset (`position in A −
    * position in B` over matched shingles, positions indexing
    * OBSERVED frames) and how many shingles agree at it. This is the
    * evidence a curator reviews before trusting an offset-tolerant
    * dedup decision ("B is A starting at frame 17"), and the seek
    * plan a downstream differ uses to fetch the overlapping spans.
    * Deterministic: the modal offset, ties to the SMALLEST offset.
    *
    * Scale shape: the [[sequenceShingleContainment]] machinery with
    * positions carried through — the inverted-index join emits one
    * (pair, offset) row per matched shingle OCCURRENCE (within-doc
    * shingle repeats multiply locally, bounded by per-video frame
    * counts), folded to ≤ \|pairs\| modal rows; candidate volume is
    * still Σ_sh df², never all-pairs. Output (doc_a, doc_b,
    * n_shared, offset, n_at_offset) for threshold-passing pairs,
    * ordered. */
  def sequenceShingleOffsets(fps: DataFrame, idCol: String,
      alignCol: String, fpCol: String, k: Int = 3,
      minSharedNum: Int = 1, minSharedDen: Int = 2, maxDf: Long = 100L,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    requireClipPolicy(k, minSharedNum, minSharedDen, maxDf)
    val keys = (0 until k).map(i => s"f$i")
    // shingles WITH their observed-frame start position
    val sh = scope.persist(clipShingleLeads(
      fps, idCol, alignCol, fpCol, k, withPos = true))
    val distinctSh = sh.select(col("doc_id") +: keys.map(col): _*)
      .distinct()
    val hot = clipHotShingles(distinctSh, keys, maxDf)
    val cold = scope.persist(sh.join(hot, keys, "left_anti"))
    // distinct-shingle sizes and shared counts: the q305 decision —
    // the SAME passing stage as [[sequenceShingleContainment]] (the
    // advice factoring: one machinery, two readouts)
    val coldDistinct = scope.persist(
      cold.select(col("doc_id") +: keys.map(col): _*).distinct())
    val passing = clipPassingPairs(coldDistinct, keys, minSharedNum,
        minSharedDen)
      .select(col("doc_a"), col("doc_b"), col("n_shared"))
    // offsets over matched shingle OCCURRENCES, modal per pair
    val offs = cold.select(col("doc_id").as("doc_a") +:
        col("pos").as("__pa") +: keys.map(col): _*)
      .join(cold.select(col("doc_id").as("doc_b") +:
        col("pos").as("__pb") +: keys.map(col): _*), keys)
      .where(col("doc_a") < col("doc_b"))
      .join(passing, Seq("doc_a", "doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("__pa") - col("__pb")).cast("long").as("offset"))
      .agg(count(lit(1)).as("n_at_offset"))
    offs.groupBy(col("doc_a"), col("doc_b"), col("n_shared"))
      .agg(max(struct(col("n_at_offset").as("n"),
        (-col("offset")).as("no"))).as("__b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (-col("__b.no")).as("offset"), col("__b.n").as("n_at_offset"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SEQUENCE-shingle DECONTAMINATION —
    * [[sequenceShingleContainment]]'s eval-restricted variant, the
    * TRIMMED-eval-clip rung [[alignedFingerprintDecontam]] cannot
    * see (same-index matching dies on any offset): a TRAIN video is
    * contaminated when it contains at least `minSharedNum /
    * minSharedDen` of some EVAL clip's distinct k-gram shingles —
    * normalized by the EVAL side (the decontamination direction: "how
    * much of the benchmark clip appears in this training video",
    * regardless of how much longer the training video is — the
    * [[crossContainFrom]] asymmetry on fingerprint sequences).
    *
    * Scale shape: shingles build per side with one per-video window;
    * the document-frequency cap is computed over the COMBINED sides
    * (a shingle hot in either floods the cross join all the same —
    * the [[crossNgramJaccardPairs]] argument); eval sets are
    * benchmarks-small, so AQE broadcasts the eval index on its own
    * (never a forced hint). Witness per contaminated train doc: most
    * shared shingles, ties to the smallest eval id. Output (doc_id,
    * n_shared, n_shingles, eval_id, n_shingles_eval) ordered. */
  def sequenceShingleDecontam(train: DataFrame, evalSet: DataFrame,
      idCol: String, alignCol: String, fpCol: String, k: Int = 3,
      minSharedNum: Int = 1, minSharedDen: Int = 2, maxDf: Long = 100L,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    requireClipPolicy(k, minSharedNum, minSharedDen, maxDf)
    val keys = (0 until k).map(i => s"f$i")
    val tr = train.select(col(idCol).as("doc_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    val ev = evalSet.select(col(idCol).as("doc_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    // BOTH sides collapse to exact stream signatures (r19 — the
    // clipRepGraph discipline on the cross relation): identical
    // streams share identical shingle sets, so every per-(train,
    // eval) count, the threshold, and the witness are stream-level
    // facts; the TRAIN side is the corpus-sized one and is where the
    // collapse pays, the eval side rides along for the witness
    // argument (an eval rep IS the min id of its identical-stream
    // members, so the min-id witness over members equals the min-id
    // witness over reps)
    def membersOf(f: DataFrame) = streamMembers(f, scope)
      .select(col("rep"), col("docs"), col("w"))
    val trM = membersOf(tr)
    val evM = membersOf(ev)
    def repShingles(f: DataFrame, m: DataFrame) = scope.persist(
      clipShingleLeads(
          f.join(m.select(col("rep").as("doc_id")), Seq("doc_id")),
          "doc_id", "align", "fp", k, withPos = false)
        .select(col("doc_id") +: keys.map(col): _*)
        .distinct())
    val trSh = repShingles(tr, trM)
    val evSh = repShingles(ev, evM)
    // the df cap counts DOCS across the COMBINED sides (a shingle hot
    // in either floods the cross join all the same) — weight each
    // representative row by its member count
    def weighted(sh: DataFrame, m: DataFrame) = sh
      .join(m.select(col("rep").as("doc_id"), col("w")), Seq("doc_id"))
      .select(keys.map(col) :+ col("w"): _*)
    val hot = weighted(trSh, trM).unionByName(weighted(evSh, evM))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("w")).as("__df"))
      .where(col("__df") > maxDf)
      .select(keys.map(col): _*)
    val trCold = scope.persist(trSh.join(hot, keys, "left_anti"))
    val evCold = scope.persist(evSh.join(hot, keys, "left_anti")
      .withColumnRenamed("doc_id", "eval_id"))
    val trSz = trCold.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val evSz = evCold.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_shingles_eval"))
    val pass = trCold.join(evCold, keys)
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(evSz, Seq("eval_id"))
      .where(col("n_shared") * minSharedDen >=
        col("n_shingles_eval") * minSharedNum)
    val best = pass.groupBy(col("doc_id"))
      .agg(max(struct(col("n_shared").as("m"),
        (-col("eval_id")).as("ne"),
        col("n_shingles_eval").as("nse"))).as("__b"))
      .select(col("doc_id").as("rep"), col("__b.m").as("n_shared"),
        (-col("__b.ne")).as("eval_id"),
        col("__b.nse").as("n_shingles_eval"))
    // flagged train representatives expand to their members — every
    // identical-stream copy carries the same counts and witness
    best.join(trSz.select(col("doc_id").as("rep"), col("n_shingles")),
        Seq("rep"))
      .join(trM.select(col("rep"), col("docs")), Seq("rep"))
      .select(explode(col("docs")).as("doc_id"), col("n_shared"),
        col("n_shingles"), col("eval_id"), col("n_shingles_eval"))
      .orderBy(col("doc_id"))
  }

  def alignedFingerprintPairs(fps: DataFrame, idCol: String,
      alignCol: String, fpCol: String, maxHamming: Int, bits: Int,
      minMatchNum: Int = 1, minMatchDen: Int = 2,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val (members, repPairs) = alignedRepGraph(fps, idCol, alignCol,
      fpCol, maxHamming, bits, minMatchNum, minMatchDen, scope)
    // same-signature members: exact sequence duplicates by definition
    val exact = members.where(size(col("docs")) > 1)
      .select(col("n_frames"), explode(col("docs")).as("doc_a"),
        col("docs"))
      .select(col("n_frames"), col("doc_a"),
        explode(col("docs")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        col("n_frames").as("n_match"),
        col("n_frames").as("n_frames_a"),
        col("n_frames").as("n_frames_b"))
    // kept representative pairs expand through both member lists
    val cross = repPairs
      .join(members.select(col("rep").as("ra"), col("docs").as("da")),
        Seq("ra"))
      .join(members.select(col("rep").as("rb"), col("docs").as("db")),
        Seq("rb"))
      .select(col("n_match"), col("n_a"), col("n_b"), col("db"),
        explode(col("da")).as("ia"))
      .select(col("n_match"), col("n_a"), col("n_b"), col("ia"),
        explode(col("db")).as("ib"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"),
        col("n_match"),
        when(col("ia") < col("ib"), col("n_a")).otherwise(col("n_b"))
          .as("n_frames_a"),
        when(col("ia") < col("ib"), col("n_b")).otherwise(col("n_a"))
          .as("n_frames_b"))
    exact.unionByName(cross).orderBy(col("doc_a"), col("doc_b"))
  }

  /** Near-dup CLUSTERS of fingerprint sequences — the KEEP/DROP
    * decision over [[alignedFingerprintPairs]]' relation, computed
    * WITHOUT ever materializing doc-level pairs (the
    * [[fingerprintClusters]] discipline lifted to sequences): label
    * propagation runs over the DISTINCT-sequence graph (one node per
    * exact signature, edges = threshold-passing representative
    * pairs), and docs join their signature's component afterwards —
    * the doc-pair graph is quadratic in duplicate mass, measured on
    * the MJPEG fixture at sf0.1: 78 MB of pair-frame shuffle down to
    * ~2 MB. A signature component's cluster id is its min doc id,
    * which IS the min representative id (each rep is already its
    * signature's min doc), so the rep-level propagation label needs
    * no second fold.
    *
    * Broadcast discipline (the [[fingerprintClusters]] argument): on
    * a mostly-unique video lake \|signatures\| ≈ \|docs\|, so the
    * component frame must never be corpus-sized. Only reps TOUCHED by
    * a threshold-passing pair propagate (≤ 2·\|repPairs\| — bounded
    * by duplicate mass); an untouched signature's cluster id is its
    * own rep, decided row-locally by `coalesce` after the broadcast
    * left join (multi-doc same-signature groups included: their rep
    * is already the group min). Output (doc_id, cluster_id,
    * is_canonical), identical to [[nearDupClusters]] over the pair
    * relation. */
  def alignedFingerprintClusters(fps: DataFrame, idCol: String,
      alignCol: String, fpCol: String, maxHamming: Int, bits: Int,
      minMatchNum: Int = 1, minMatchDen: Int = 2,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val (members, rawRepPairs) = alignedRepGraph(fps, idCol, alignCol,
      fpCol, maxHamming, bits, minMatchNum, minMatchDen, scope)
    // consumed three times below (touched twice, edges once), and it
    // seeds the propagation loop — eager checkpoint, not persist, so
    // the per-pass plans stop rendering the pigeonhole pipeline's
    // lineage (the q308 4 MB-plan lesson); duplicate-mass-bounded
    val repPairs = rawRepPairs.select(col("ra"), col("rb"))
      .localCheckpoint(true)
    val touched = repPairs.select(col("ra").as("rep"))
      .unionByName(repPairs.select(col("rb").as("rep"))).distinct()
    val comps = nearDupClusters(
      touched.select(col("rep").as("doc_id")), "doc_id",
      repPairs.select(col("ra").as("doc_a"), col("rb").as("doc_b")))
      .select(col("doc_id").as("rep"), col("cluster_id"))
    // comps is duplicate-mass-bounded — AQE's broadcast call at
    // runtime, never a forced hint (a hostile all-duplicates lake
    // degrades to a shuffle join, not a driver OOM)
    members.select(col("rep"), explode(col("docs")).as("doc_id"))
      .join(comps, Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** SEQUENCE decontamination — [[fingerprintDecontam]] lifted to
    * fingerprint SEQUENCES (videos as per-frame dHash streams, GIFs
    * and audio windows alike): a TRAIN sequence is contaminated when
    * at least `minMatchNum/minMatchDen` of the LONGER side's aligned
    * positions carry fingerprints within Hamming ≤ `maxHamming` of
    * some single EVAL sequence at the SAME position
    * ([[alignedFingerprintPairs]]' match rule, restricted to
    * train × eval). An eval VIDEO leaked into training as a
    * re-encode/remux byte-compares different and is invisible to the
    * single-fingerprint gates (q295/q296 see stills and whole-clip
    * envelopes) — this is the rung that sees it.
    *
    * Scale shape — the eval-broadcast restriction of
    * [[alignedRepGraph]]: TRAIN collapses to exact sequence
    * signatures first (a million-copy dup family costs ONE
    * representative in the match), then representative positions
    * meet the eval positions through the per-position pigeonhole
    * (chunk buckets keyed (align, chunk_id, chunk) — exact recall
    * for the radius, one `bit_count(xor)` verify). Eval sets are
    * benchmarks-small, so the eval chunk index is AQE's broadcast to
    * make (never a forced hint — the [[fingerprintDecontam]] r18
    * discipline); nothing corpus-sized crosses an exchange except
    * 16-byte position rows.
    *
    * Witness: per contaminated train doc, the BEST eval match —
    * most aligned positions, ties to the smallest eval id — so the
    * readout is deterministic and replayable. Output (doc_id,
    * n_match, n_frames, eval_id, n_frames_eval) — contaminated train
    * docs only — ordered by doc_id. Inputs carry at most one fp per
    * (id, align), the decode rungs' contract; corrupt frames
    * (`ok = 0`) are the caller's filter. */
  def alignedFingerprintDecontam(train: DataFrame, evalSet: DataFrame,
      idCol: String, alignCol: String, fpCol: String, maxHamming: Int,
      bits: Int, minMatchNum: Int = 1, minMatchDen: Int = 2,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(minMatchNum >= 1 && minMatchDen >= 1 &&
      minMatchNum <= minMatchDen,
      s"bad match share $minMatchNum/$minMatchDen")
    val nChunks = maxHamming + 1
    require(bits % nChunks == 0,
      s"bits=$bits must split evenly into ${nChunks} chunks")
    require(bits >= nChunks && bits <= 64, s"bits=$bits out of range")
    val width = bits / nChunks
    val mask = (1L << width) - 1
    def chunksOf(fp: Column) = explode(array((0 until nChunks).map(c =>
      struct(lit(c).as("chunk_id"),
        shiftright(fp, c * width).bitwiseAND(lit(mask))
          .as("chunk"))): _*))
    val tr = train.select(col(idCol).as("doc_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    val ev = evalSet.select(col(idCol).as("eval_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    // TRAIN: exact-signature collapse — only representatives match
    val members = streamMembers(tr, scope)
    val repFrames = scope.persist(tr.join(
      members.select(col("rep").as("doc_id")), Seq("doc_id"))
      .select(col("doc_id").as("rep"), col("align"), col("fp")))
    // EVAL: per-position chunk index, eval id carried through (the
    // share threshold needs per-(rep, eval) match counts)
    val evCounts = ev.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_frames_eval"))
    val evChunks = ev.select(col("eval_id"), col("align"),
        col("fp").as("fe"), chunksOf(col("fp")).as("cs"))
      .select(col("eval_id"), col("align"), col("fe"),
        col("cs.chunk_id").as("chunk_id"), col("cs.chunk").as("chunk"))
    // rep positions chunk once over DISTINCT (align, fp); candidates
    // never cross positions, the verify is one bit_count
    val repDistinct = repFrames.select(col("align"), col("fp"))
      .distinct()
    val candFp = repDistinct.select(col("align"), col("fp").as("ft"),
        chunksOf(col("fp")).as("cs"))
      .select(col("align"), col("ft"),
        col("cs.chunk_id").as("chunk_id"), col("cs.chunk").as("chunk"))
      .join(evChunks, Seq("align", "chunk_id", "chunk"))
      .select(col("align"), col("ft"), col("fe"), col("eval_id"))
      .distinct()
      .where(bit_count(col("ft").bitwiseXOR(col("fe"))) <= maxHamming)
    // expand fp matches back to rep positions; one fp per (id, align)
    // on both sides => each (rep, eval, align) contributes <= 1
    val repEval = candFp
      .join(repFrames.select(col("align"), col("fp").as("ft"),
        col("rep")), Seq("align", "ft"))
      .groupBy(col("rep"), col("eval_id"))
      .agg(count(lit(1)).as("n_match"))
      .join(members.select(col("rep"), col("n_frames")), Seq("rep"))
      .join(evCounts, Seq("eval_id"))
      .where(col("n_match") * minMatchDen >=
        greatest(col("n_frames"), col("n_frames_eval")) * minMatchNum)
    // deterministic witness: most matched positions, ties to the
    // smallest eval id (carry its frame count through the same fold)
    val best = repEval.groupBy(col("rep"))
      .agg(max(struct(col("n_match").as("m"),
        (-col("eval_id")).as("ne"),
        col("n_frames_eval").as("nfe"))).as("__b"))
      .select(col("rep"), col("__b.m").as("n_match"),
        (-col("__b.ne")).as("eval_id"),
        col("__b.nfe").as("n_frames_eval"))
    members.select(col("rep"), col("n_frames"),
        explode(col("docs")).as("doc_id"))
      .join(best, Seq("rep"))
      .select(col("doc_id"), col("n_match"), col("n_frames"),
        col("eval_id"), col("n_frames_eval"))
      .orderBy(col("doc_id"))
  }

  /** The signature/representative layer shared by
    * [[alignedFingerprintPairs]] and [[alignedFingerprintClusters]]:
    * `members` = one row per DISTINCT sequence ([[streamMembers]] —
    * frame count, min-id representative, member
    * list); `repPairs` = the threshold-passing representative pairs
    * (ra, rb, n_match, n_a, n_b) from the per-position pigeonhole
    * match. Both persisted under `scope`. */
  private def alignedRepGraph(fps: DataFrame, idCol: String,
      alignCol: String, fpCol: String, maxHamming: Int, bits: Int,
      minMatchNum: Int, minMatchDen: Int,
      scope: CacheScope): (DataFrame, DataFrame) = {
    // minMatchNum >= 1: candidates only arise from positions with an
    // actual aligned match, so a 0-share threshold could never admit
    // the zero-match pairs it nominally describes — refuse it
    require(minMatchNum >= 1 && minMatchDen >= 1 &&
      minMatchNum <= minMatchDen,
      s"bad match share $minMatchNum/$minMatchDen")
    val nChunks = maxHamming + 1
    require(bits % nChunks == 0,
      s"bits=$bits must split evenly into ${nChunks} chunks")
    val width = bits / nChunks
    val mask = (1L << width) - 1
    val f = fps.select(col(idCol).as("doc_id"),
      col(alignCol).as("align"), col(fpCol).as("fp"))
    // exact sequence signatures: one row per DISTINCT sequence, with
    // its member list and its min-id representative
    val members = streamMembers(f, scope)
    // representative frames only enter the match join
    val repFrames = scope.persist(f.join(
      members.select(col("rep").as("doc_id")), Seq("doc_id")))
    // per-position pigeonhole over DISTINCT (align, fp)
    val distinctFp = repFrames.select(col("align"), col("fp")).distinct()
    val chunks = distinctFp.select(col("align"), col("fp"),
      explode(array((0 until nChunks).map(c =>
        struct(lit(c).as("chunk_id"),
          shiftright(col("fp"), c * width).bitwiseAND(lit(mask))
            .as("chunk"))): _*)).as("cs"))
      .select(col("align"), col("fp"), col("cs.chunk_id").as("chunk_id"),
        col("cs.chunk").as("chunk"))
    val fpPairs = chunks
      .select(col("align"), col("fp").as("fa"), col("chunk_id"),
        col("chunk"))
      .join(chunks.select(col("align"), col("fp").as("fb"),
        col("chunk_id"), col("chunk")),
        Seq("align", "chunk_id", "chunk"))
      .where(col("fa") < col("fb"))
      .select(col("align"), col("fa"), col("fb")).distinct()
      .where(bit_count(col("fa").bitwiseXOR(col("fb"))) <= maxHamming)
    // identical fp at the same position: one equi-join, Hamming 0
    val sameFp = repFrames
      .select(col("align"), col("fp"), col("doc_id").as("ra"))
      .join(repFrames.select(col("align"), col("fp"),
        col("doc_id").as("rb")), Seq("align", "fp"))
      .where(col("ra") < col("rb"))
      .select(col("align"), col("ra"), col("rb"))
    // near fp pairs expand through the per-(align, fp) rep lists
    val crossFp = fpPairs
      .join(repFrames.select(col("align"), col("fp").as("fa"),
        col("doc_id").as("ia")), Seq("align", "fa"))
      .join(repFrames.select(col("align"), col("fp").as("fb"),
        col("doc_id").as("ib")), Seq("align", "fb"))
      .select(col("align"), least(col("ia"), col("ib")).as("ra"),
        greatest(col("ia"), col("ib")).as("rb"))
    // one fp per (id, align) => each position contributes <= 1 match
    val repPairs = sameFp.unionByName(crossFp)
      .groupBy(col("ra"), col("rb"))
      .agg(count(lit(1)).as("n_match"))
      .join(members.select(col("rep").as("ra"),
        col("n_frames").as("n_a")), Seq("ra"))
      .join(members.select(col("rep").as("rb"),
        col("n_frames").as("n_b")), Seq("rb"))
      .where(col("n_match") * minMatchDen >=
        greatest(col("n_a"), col("n_b")) * minMatchNum)
    (members, repPairs)
  }

  /** The winnowing SELECTION alone: distinct (doc_id, fp) fingerprint
    * rows per document — the per-document-local half of
    * [[winnowingPairs]], exposed so the incremental index
    * ([[graft.etl.WinnowIndex]]) can record a batch's fingerprints
    * without pairing. Same contract: positional `span`-token hashes,
    * `window`-wide sliding min, ties rightmost, docs shorter than one
    * full frame select nothing, ≤ 2²⁰ window positions per doc. */
  def winnowFingerprints(docs: DataFrame, idCol: String,
      textCol: String, span: Int = 3, window: Int = 4): DataFrame = {
    require(span >= 1, s"need span >= 1, got $span")
    require(window >= 1, s"need window >= 1, got $window")
    import org.apache.spark.sql.expressions.Window
    val M = 1L << 20
    val wh = docs
      .select(col(idCol).as("doc_id"),
        TextHash.windowHashesOf(col(textCol), span).as("wh"))
      .where(size(col("wh")).between(window, (M - 1).toInt))
      .select(col("doc_id"), size(col("wh")).as("n_pos"),
        posexplode(col("wh")).as(Seq("p0", "h")))
      .select(col("doc_id"), col("n_pos"), (col("p0") + 1).as("pos"),
        col("h"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    wh.withColumn("combo",
        min(col("h") * M + (lit(M) - col("pos"))).over(frame))
      // only frames fully inside the doc select (pos ≤ n_pos − window + 1)
      .where(col("pos") <= col("n_pos") - (window - 1))
      .select(col("doc_id"), expr(s"combo div $M").as("fp"))
      .distinct()
  }

  /** WINNOWING FINGERPRINT near-dup pairs — the MOSS algorithm
    * (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
    * Document Fingerprinting", SIGMOD 2003): slide a `window`-wide
    * frame over the POSITIONAL `span`-token hash sequence and keep
    * each frame's minimum (ties to the RIGHTMOST position), then pair
    * documents sharing ≥ `minShared` selected fingerprints. The
    * guarantee the sampled families ([[minhashLshPairs]],
    * [[simhashPairs]]) can't give: any shared run of at least
    * `window + span − 1` tokens is DETECTED with certainty, while only
    * ~2/(window+1) of positions are kept — deterministic local
    * sampling, no randomness, robust to where the match sits.
    *
    * Portability: the select is encoded as ONE integer
    * `combo = h·2²⁰ + (2²⁰ − pos)` — `min(combo)` is "min hash, then
    * rightmost position" in a single engine-exact window aggregate,
    * decoded back by nonnegative div/mod (documents are bounded at
    * 2²⁰ window positions by contract; longer inputs should be
    * chunked first — [[graft.operators.Packing]]). Docs shorter than
    * one full frame select nothing (the guarantee only speaks above
    * `window + span − 1` tokens; scoring shorter docs is
    * [[ngramJaccardPairs]]' job).
    *
    * Scale shape: fingerprint selection is per-document local work
    * (the sliding-min window partitions by doc — no corpus-wide
    * sort); the ONLY corpus-sized shuffles are the per-doc window
    * exchange and the inverted-index self-join on the SELECTED
    * fingerprints (a ~2/(window+1) sample of the shingle stream, vs
    * q17 joining every shingle); the df-cap is the shared
    * [[Skew.capHotKeys]] anti-join (AQE-broadcast at
    * any Zipf-shaped scale). */
  def winnowingPairs(docs: DataFrame, idCol: String, textCol: String,
      span: Int = 3, window: Int = 4, maxDf: Int = 100,
      minShared: Int = 2,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    winnowingPairsUnordered(docs, idCol, textCol, span, window, maxDf,
      minShared, scope).orderBy(col("doc_a"), col("doc_b"))

  /** [[winnowingPairs]] without the trailing global sort — the
    * [[ngramJaccardPairsUnordered]] rationale. */
  private[graft] def winnowingPairsUnordered(docs: DataFrame,
      idCol: String, textCol: String,
      span: Int = 3, window: Int = 4, maxDf: Int = 100,
      minShared: Int = 2,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(minShared >= 1, s"need minShared >= 1, got $minShared")
    val picks = winnowFingerprints(docs, idCol, textCol, span, window)
    val kept = Skew.capHotKeys(picks, "fp", maxDf.toLong)
    val a = kept.select(col("doc_id").as("da"), col("fp"))
    val b = kept.select(col("doc_id").as("db"), col("fp"))
    a.join(b, Seq("fp"))
      .where(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("n_shared"))
  }

  /** SORTED-NEIGHBORHOOD fuzzy matching — the OTHER classic record-
    * linkage blocking (Hernández–Stolfo's merge/purge): sort names and
    * compare each against its next `windowSize − 1` sort neighbors,
    * instead of [[fuzzyMatchPairs]]' token-key blocks. The candidate
    * mass is |names|·(windowSize−1) — LINEAR where token blocks are
    * quadratic within a block — and typo families that token blocking
    * scatters (a mutated blocking token) often stay sort-adjacent;
    * conversely a leading-character typo breaks sort adjacency where
    * token blocks survive. The two methods are complementary screens;
    * q178's injected-typo eval measures either's recall.
    *
    * Scale shape: the sort runs WITHIN 2-char-prefix partitions (a
    * partitioned window, never one global sort task); pairs that
    * straddle a prefix boundary are the documented miss (the classic
    * SNM pass over a global sort has the same trade at its window
    * edges). Distinct names collapse first with their row counts (the
    * q92 shape); each unordered pair surfaces once, from its
    * sort-earlier end; `levenshtein` computed ONCE per candidate. */
  def sortedNeighborPairs(rows: DataFrame, nameCol: String,
      windowSize: Int = 4, maxDist: Int = 2): DataFrame = {
    require(windowSize >= 2, s"need windowSize >= 2, got $windowSize")
    require(maxDist >= 1, s"need maxDist >= 1, got $maxDist")
    import org.apache.spark.sql.expressions.Window
    val g = rows.select(col(nameCol).as("name"))
      .where(col("name").isNotNull)
      .groupBy(col("name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", substring(col("name"), 1, 2))
    val w = Window.partitionBy(col("blk")).orderBy(col("name"))
    // leads materialize as plain columns FIRST (a window expression
    // cannot live inside the generator), then explode the struct array
    val withLeads = (1 until windowSize).foldLeft(g) { (df, i) =>
      df.withColumn(s"__m$i", lead(col("name"), i).over(w))
        .withColumn(s"__k$i", lead(col("n_rows"), i).over(w))
    }
    val cands = (1 until windowSize).map(i => struct(
      col(s"__m$i").as("cand"), col(s"__k$i").as("cn")))
    withLeads.select(col("name"), col("n_rows"),
        explode(array(cands: _*)).as("e"))
      .where(col("e.cand").isNotNull)
      .withColumn("distance", levenshtein(col("name"), col("e.cand")))
      .where(col("distance") <= maxDist)
      .select(col("name").as("name_a"), col("e.cand").as("name_b"),
        col("distance").cast("int").as("distance"),
        col("n_rows").as("n_a"), col("e.cn").as("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** DEDUP-METHOD AGREEMENT MATRIX — how consistently the near-dup
    * screens agree, method pair by method pair: given tagged pair
    * frames (each with doc_a/doc_b), every unordered method pair's
    * set sizes, intersection and overlap Jaccard. The ops readout
    * behind choosing an operating point: exact ⊂ every sound screen
    * (a violated subset is a BUG, not a tuning issue), and a
    * probabilistic screen's agreement with the exact-Jaccard
    * reference IS its empirical recall/precision trade (the q144
    * numbers, across ALL screens at once).
    *
    * Scale shape: one union of the (already reduced) pair frames, ONE
    * groupBy(pair) flag fold, then a single ungrouped counter pass
    * unpivoted to |methods|²/2 rows — no joins between pair sets. */
  def pairAgreement(methods: Seq[(String, DataFrame)]): DataFrame = {
    require(methods.size >= 2, s"need >= 2 methods, got ${methods.size}")
    require(methods.map(_._1).distinct.size == methods.size,
      s"method names must be distinct: ${methods.map(_._1)}")
    val tagged = methods.map { case (m, df) =>
      df.select(col("doc_a"), col("doc_b")).distinct()
        .withColumn("m", lit(m))
    }.reduce(_.unionByName(_))
    val idx = methods.indices
    val flagAggs = methods.zipWithIndex.map { case ((m, _), i) =>
      max(when(col("m") === m, 1L).otherwise(0L)).as(s"f$i") }
    val flags = tagged.groupBy(col("doc_a"), col("doc_b"))
      .agg(flagAggs.head, flagAggs.tail: _*)
    val counterAggs =
      idx.map(i => sum(col(s"f$i")).as(s"n$i")) ++
      (for (i <- idx; j <- idx if i < j) yield
        sum(col(s"f$i") * col(s"f$j")).as(s"b${i}_$j"))
    val wide = flags.agg(counterAggs.head, counterAggs.tail: _*)
    val entries = for (i <- idx; j <- idx if i < j) yield struct(
      lit(methods(i)._1).as("method_a"),
      lit(methods(j)._1).as("method_b"),
      coalesce(col(s"n$i"), lit(0L)).as("n_a"),
      coalesce(col(s"n$j"), lit(0L)).as("n_b"),
      coalesce(col(s"b${i}_$j"), lit(0L)).as("n_both"))
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.method_a"), col("e.method_b"), col("e.n_a"),
        col("e.n_b"), col("e.n_both"),
        when(col("e.n_a") + col("e.n_b") - col("e.n_both") > 0,
          col("e.n_both").cast("double") /
            (col("e.n_a") + col("e.n_b") - col("e.n_both"))
              .cast("double")).as("overlap_jaccard"))
      .orderBy(col("method_a"), col("method_b"))
  }

  /** DEDUP DISAGREEMENT DRILL-DOWN — the per-pair reading of
    * [[pairAgreement]]'s matrix: every pair at least one screen
    * fired on where the screens DISAGREE (not all flags equal),
    * with one 0/1 flag column per method — the triage table ("which
    * pairs does winnowing see that jaccard doesn't, and are they
    * real") behind tuning any screen's operating point. Pairs all
    * methods agree on are noise for triage and drop.
    *
    * Same scale shape as the matrix: union + ONE groupBy(pair) flag
    * fold; the disagreement filter is row-local. */
  def pairDisagreements(methods: Seq[(String, DataFrame)]): DataFrame = {
    require(methods.size >= 2, s"need >= 2 methods, got ${methods.size}")
    require(methods.map(_._1).distinct.size == methods.size,
      s"method names must be distinct: ${methods.map(_._1)}")
    val tagged = methods.map { case (m, df) =>
      df.select(col("doc_a"), col("doc_b")).distinct()
        .withColumn("m", lit(m))
    }.reduce(_.unionByName(_))
    val flagAggs = methods.map { case (m, _) =>
      max(when(col("m") === m, 1L).otherwise(0L)).as(s"f_$m") }
    val flagCols = methods.map { case (m, _) => col(s"f_$m") }
    tagged.groupBy(col("doc_a"), col("doc_b"))
      .agg(flagAggs.head, flagAggs.tail: _*)
      // disagreement = some screen fired and some didn't; an
      // all-fired pair is consensus, not triage work
      .where(flagCols.reduce(_ + _) < methods.size)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DEDUP-THRESHOLD CURVE — the pair and document mass removed at
    * each candidate Jaccard threshold, from ONE pipeline run: the
    * readout behind actually CHOOSING a threshold (every pairwise
    * screen here takes one as an input; this is where the number
    * comes from, the [[graft.operators.Skew.keySkewProfile]]
    * argument applied to dedup). For each t in `thresholds`
    * (evaluated against a base pair frame computed once at
    * `min(thresholds)`): the surviving pair count, the count and
    * fraction of documents touched by ≥ 1 pair at that strength —
    * i.e. how much of the corpus a dedup pass at t would consider
    * duplicate-involved.
    *
    * Scale shape: the expensive part (the inverted-index pipeline)
    * runs ONCE at the loosest threshold; the curve itself is two
    * small folds over the PAIR frame — a conditional count per t,
    * and a per-doc max-strength unpivot (2 rows per pair) folded to
    * |docs-in-pairs| rows then conditionally counted per t. No
    * per-threshold re-run, no explosion; the corpus size is the
    * documented one-row broadcast append. */
  def thresholdCurve(docs: DataFrame, idCol: String, textCol: String,
      thresholds: Seq[Double] = Seq(0.5, 0.7, 0.9), maxDf: Int = 100,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(thresholds.nonEmpty && thresholds.distinct == thresholds,
      s"thresholds must be non-empty and distinct: $thresholds")
    val tMin = thresholds.min
    require(tMin > 0.0, s"thresholds must be > 0: $thresholds")
    // the UNordered pair builder: persisting the public query's
    // globally-sorted output would materialize a useless range
    // exchange + sort in the cache build (every consumer below is
    // order-insensitive)
    val pairs = scope.persist(
      ngramJaccardPairsUnordered(docs, idCol, textCol,
        threshold = tMin, maxDf = maxDf, scope = scope)
        .select(col("doc_a"), col("doc_b"), col("jaccard")))
    val nDocs = docs.where(col(idCol).isNotNull)
      .agg(count(lit(1)).as("n_corpus"))
    // '.' in a column name reads as struct access downstream — key the
    // per-threshold columns by INDEX, not by the threshold's rendering
    def pc(i: Int) = s"p_$i"
    def dc(i: Int) = s"d_$i"
    val ts = thresholds.zipWithIndex
    val pAggs = ts.map { case (t, i) =>
      sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(pc(i)) }
    val pairCounts = pairs.agg(pAggs.head, pAggs.tail: _*)
    val docStrength = pairs
      .select(col("doc_a").as("doc"), col("jaccard"))
      .unionByName(pairs.select(col("doc_b").as("doc"), col("jaccard")))
      .groupBy(col("doc")).agg(max(col("jaccard")).as("s"))
    val dAggs = ts.map { case (t, i) =>
      sum(when(col("s") >= t, 1L).otherwise(0L)).as(dc(i)) }
    val docCounts = docStrength.agg(dAggs.head, dAggs.tail: _*)
    val wide = pairCounts.crossJoin(broadcast(docCounts))
      .crossJoin(broadcast(nDocs))
    val rows = ts.map { case (t, i) => struct(
      lit(t).as("threshold"),
      coalesce(col(pc(i)), lit(0L)).as("n_pairs"),
      coalesce(col(dc(i)), lit(0L)).as("n_docs_involved")) }
    wide.select(explode(array(rows: _*)).as("r"), col("n_corpus"))
      .select(col("r.threshold").as("threshold"),
        col("r.n_pairs").as("n_pairs"),
        col("r.n_docs_involved").as("n_docs_involved"),
        when(col("n_corpus") > 0,
          col("r.n_docs_involved").cast("double") / col("n_corpus"))
          .as("involved_frac"))
      .orderBy(col("threshold"))
  }

  /** PAIR-TRANSITIVITY AUDIT — does the similarity graph justify
    * connected-components clustering? [[nearDupClusters]] (q31)
    * merges by CONNECTIVITY, which silently assumes near-dup-ness is
    * roughly transitive; a threshold graph where A~B and B~C rarely
    * implies A~C chains unrelated documents into giant snake
    * clusters. This measures exactly that: of all wedges (A—B—C
    * through a shared endpoint), what fraction close into a triangle
    * (A—C also a pair). A high closure rate says components ≈ cliques
    * (keep-one-per-cluster is safe); a low rate says the threshold is
    * chaining and clustering should tighten (raise the threshold, or
    * cap cluster diameter). One row: (n_pairs, n_wedges, n_closed,
    * closure_rate).
    *
    * Scale shape: everything runs on the PAIR FRAME, never the
    * corpus — pairs are already candidate-reduced by the screen that
    * produced them. The wedge self-join keys on the shared endpoint;
    * a hub of degree d contributes d² wedges (Σ deg² overall), the
    * same mass q31's label propagation already traverses — for
    * screens with super-hubs, df-cap the PAIR SOURCE first (the
    * screens here already do). Closure check is one hash join back
    * to the pair set; the n_pairs scalar is the documented one-row
    * broadcast append. Input pairs are NORMALIZED on intake
    * (least/greatest + self-pair/null drop + distinct), so a caller
    * feeding unordered or doubled edges — (3,1) alongside (1,3) —
    * still gets each undirected edge counted once and every closure
    * found. */
  def pairTransitivityAudit(pairs: DataFrame,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val p = scope.persist(
      pairs.select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        .where(col("doc_a") < col("doc_b"))
        .distinct())
    val e = p.select(col("doc_a").as("ctr"), col("doc_b").as("leaf"))
      .unionByName(p.select(col("doc_b").as("ctr"),
        col("doc_a").as("leaf")))
    val wedges = e.select(col("ctr"), col("leaf").as("a"))
      .join(e.select(col("ctr"), col("leaf").as("c")), Seq("ctr"))
      .where(col("a") < col("c"))
    val nPairs = p.agg(count(lit(1)).as("n_pairs"))
    wedges
      .join(p.select(col("doc_a").as("a"), col("doc_b").as("c"))
        .withColumn("__hit", lit(1)), Seq("a", "c"), "left")
      .agg(count(lit(1)).as("n_wedges"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_closed"))
      .crossJoin(broadcast(nPairs))
      .select(col("n_pairs"), col("n_wedges"), col("n_closed"),
        when(col("n_wedges") > 0,
          col("n_closed").cast("double") / col("n_wedges"))
          .as("closure_rate"))
  }

  /** CONTAMINATION-BY-SPAN SWEEP — how strict the n-gram
    * decontamination screen is as a function of the n-gram LENGTH,
    * the knob real curation teams sweep before fixing a policy
    * (published decontamination setups disagree between ~8-gram and
    * ~13-gram overlap precisely because of this curve): for each
    * span n, the number and fraction of eval-side documents sharing
    * at least ONE distinct n-token window hash with any train-side
    * document. Small n over-flags (stopword runs collide
    * everywhere), large n under-flags (only verbatim spans hit); the
    * output row per n is the operating curve those policies pick
    * from. EXISTS semantics — deliberately NO df-cap: a hash shared
    * by thousands of training docs still contaminates (dropping hot
    * hashes would change the answer, unlike the near-dup screens
    * where hot shingles only add candidate noise).
    *
    * Scale shape: one pass per span (the sweep's honest cost — the
    * q144 rule; spans share nothing because the window hash of
    * length n is not derivable from length m's). Each pass: distinct
    * (doc, hash) partial-aggregates map-side, the train vocabulary
    * distincts to one row per hash, the flag join is a LEFT SEMI on
    * 8-byte hashes (never a pair explosion — semi stops at first
    * match), and the count folds per side. The (n_eval) scalar is
    * the documented one-row broadcast append onto the |spans|-row
    * result. Docs under n tokens have no windows and can never flag
    * (they still count in n_eval). */
  def contaminationBySpan(docs: DataFrame, idCol: String,
      textCol: String, evalSide: Column,
      spans: Seq[Int] = Seq(3, 5, 8)): DataFrame = {
    require(spans.nonEmpty && spans.distinct == spans &&
      spans.forall(_ >= 1), s"spans must be distinct and >= 1: $spans")
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), evalSide.as("__eval"))
    val nEval = base.where(col("__eval"))
      .agg(count(lit(1)).as("n_eval"))
    val perSpan = spans.map { n =>
      val h = base.select(col("doc_id"), col("__eval"),
          explode(TextHash.windowHashesOf(col("text"), n)).as("hs"))
        .distinct()
      val train = h.where(!col("__eval")).select(col("hs")).distinct()
      h.where(col("__eval"))
        .join(train, Seq("hs"), "left_semi")
        .select(col("doc_id")).distinct()
        .agg(count(lit(1)).as("n_contaminated"))
        .select(lit(n).as("n"), col("n_contaminated"))
    }.reduce(_.unionByName(_))
    perSpan.crossJoin(broadcast(nEval))
      .select(col("n"), col("n_eval"), col("n_contaminated"),
        when(col("n_eval") > 0,
          col("n_contaminated").cast("double") /
            col("n_eval").cast("double")).as("contaminated_frac"))
      .orderBy(col("n"))
  }

  /** BACKGROUND JACCARD CALIBRATION — the false-positive floor behind
    * every similarity threshold: [[thresholdCurve]] (q214) shows how
    * much CANDIDATE mass sits above each Jaccard cut, but a threshold
    * is only meaningful against what UNRELATED pairs score. This draws
    * a deterministic k-doc sample (smallest portable affine id-hashes,
    * ties to the lower id — the [[Sampling.priorityKPerStratum]]
    * hash, so the draw is reproducible across engines, runs, and
    * corpus growth), scores ALL pairs within it with the exact q17
    * 3-gram-shingle Jaccard, and reports the pair count per dyadic
    * similarity band. Read against q214: a threshold whose band the
    * background distribution reaches is screening noise.
    *
    * Engine-exact: band boundaries are integer cross-multiplications
    * (`inter·16 ≤ union`), never a float compare; the one IEEE double
    * is the final pair fraction. Pairs with no shingles on either
    * side (docs under 3 tokens) land in the `zero` band.
    *
    * Scale shape: the sample selection is a global top-k on the hash
    * (TakeOrderedAndProject — per-task k-row heap, never a sort); the
    * k×k pair join is BNLJ BY DESIGN over two ≤ k-row broadcast
    * frames (k² ≤ 4096 pairs at the default — corpus-size-
    * independent, the q20 exception family); the band fold and the
    * one-row total append act on ≤ 6 rows. The corpus is scanned
    * once. */
  def backgroundJaccard(docs: DataFrame, idCol: String, textCol: String,
      sampleK: Int = 64,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(sampleK >= 2 && sampleK <= 1024,
      s"sampleK=$sampleK out of [2, 1024]")
    val P = 1000000007L
    val h = ((col(idCol) % P) * lit(2654435761L) % P + lit(12345L)) % P
    // persisted: the band fold and the one-row total both descend from
    // this k-row frame — without the pin the corpus top-k would run
    // twice (two full scans at 100 TB for a ≤ 6-row total)
    val sample = scope.persist(docs.select(col(idCol).as("id"),
        TextHash.shingleHashesOf(col(textCol)).as("sh"), h.as("__h"))
      .orderBy(col("__h"), col("id")).limit(sampleK)
      .select(col("id"), col("sh")))
    val pairs = sample.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(broadcast(
        sample.select(col("id").as("id_b"), col("sh").as("sh_b"))))
      .where(col("id_a") < col("id_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      .cast("long")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("long") -
      inter
    val banded = pairs.select(
      when(inter === 0L, 0)
        .when(inter * 16L <= union, 1)
        .when(inter * 8L <= union, 2)
        .when(inter * 4L <= union, 3)
        .when(inter * 2L <= union, 4)
        .otherwise(5).as("band_id"))
    val counts = banded.groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_pairs"))
    val total = counts.agg(sum(col("n_pairs")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("band_id"),
        element_at(array(lit("zero"), lit("le_1_16"), lit("le_1_8"),
          lit("le_1_4"), lit("le_1_2"), lit("gt_1_2")),
          col("band_id") + 1).as("band"),
        col("n_pairs"),
        (col("n_pairs").cast("double") / col("n_total").cast("double"))
          .as("pair_frac"))
      .orderBy(col("band_id"))
  }

  /** NEIGHBOR-LABEL AUDIT — graph-based label cleaning over a near-dup
    * pair graph: a document whose metadata label (language, source,
    * license…) DISAGREES with the majority label of its near-duplicate
    * neighbors is usually the mislabeled one — near-dups are the same
    * content, so their labels should agree, and the disagreement list
    * is the label-repair worklist (one step of majority label
    * propagation, emitted as an audit instead of applied blindly).
    *
    * `pairs` is any (doc_a, doc_b) frame from the dedup family
    * ([[ngramJaccardPairs]], [[minhashLshPairs]], …); votes flow BOTH
    * ways along each pair. Ties resolve to the smallest label (NULLS
    * FIRST) — deterministic and engine-mirrored, and a doc whose own
    * label ties the winner but sorts later is still flagged
    * (conservative toward review). A NULL neighbor label votes as its
    * own bucket; "disagrees" is null-safe.
    *
    * Scale shape: the pair graph is |pairs|-sized (never corpus²);
    * one hash join attaches neighbor labels, one partial-aggregated
    * (doc, label) vote fold, a keyed window picks the winner over
    * each doc's ≤ |labels| vote rows, two id-joins re-attach totals
    * and the doc's own label. */
  def neighborLabelAudit(docs: DataFrame, idCol: String,
      labelCol: String, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bad = Seq(idCol, labelCol).filterNot(docs.columns.contains)
    require(bad.isEmpty, s"unknown columns: $bad")
    val d = docs.select(col(idCol).cast("long").as("__id"),
      col(labelCol).as("__lab"))
    // both directions from ONE scan of the pair frame: a union of two
    // projections would plan (and pay) the whole upstream pair
    // pipeline twice — the explode is row-local (measured 2× shuffle
    // bytes for the union form on the q17 pipeline, r14)
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a").as("__src"), col("doc_b").as("__dst")),
        struct(col("doc_b").as("__src"), col("doc_a").as("__dst"))))
        .as("__e"))
      .select(col("__e.__src").as("__src"), col("__e.__dst").as("__dst"))
    val votes = edges
      .join(d.select(col("__id").as("__nid"),
        col("__lab").as("__nbr_lab")), col("__dst") === col("__nid"))
      .groupBy(col("__src"), col("__nbr_lab"))
      .agg(count(lit(1)).as("__votes"))
    val w = Window.partitionBy(col("__src"))
      .orderBy(col("__votes").desc, col("__nbr_lab").asc_nulls_first)
    val top = votes.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("__src"), col("__nbr_lab").as("majority_label"),
        col("__votes").as("n_majority"))
    val tot = votes.groupBy(col("__src").as("__tid"))
      .agg(sum(col("__votes")).as("n_neighbors"))
    top.join(tot, col("__src") === col("__tid"))
      .join(d, col("__src") === col("__id"))
      .where(!(col("__lab") <=> col("majority_label")))
      .select(col("__id").as(idCol), col("__lab").as("label"),
        col("majority_label"), col("n_majority"), col("n_neighbors"))
      .orderBy(col(idCol))
  }
}
