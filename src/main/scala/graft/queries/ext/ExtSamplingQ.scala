package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Layout, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** [[Ext]] family: sampling, mixing, splits and sequence packing — queries q32, q37, q40, q41, q42, q47, q51, q68, q90, q94, q103, q145, q171, q186, q203, q224, q227, q260 (BPE budget mix), q265 (BPE packing).
  * Split from the monolithic Ext.scala in round 12
  * (pure relocation; helpers live in [[ExtHelpers]]). */
// the leakage-safe split (q94) nests q31's cluster oracle — hence the
// ExtDedupQ half of the self-type (ExtDedupQ mixes in earlier in Ext's
// linearization, so q31 is initialized before q94 reads it)
private[queries] trait ExtSamplingQ { self: ExtHelpers with ExtDedupQ =>
  // ---------------------------------------------------------------- q32
  /** q32 — deterministic stratified sampling for corpus mixing: keep a
    * per-language percentage chosen by the portable id hash (no rand();
    * same mixture on every engine/run/retry). */
  val q32: Q = Q(
    "q32_stratified_sample",
    (s, d) =>
      Sampling.stratifiedByHash(Tables.documents(s, d), "doc_id", "lang",
        Map("en" -> 75, "es" -> 50, "de" -> 25, "fr" -> 10),
        defaultPct = 5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, lang FROM documents
      WHERE ((doc_id % $P) * 2654435761 % $P + 12345) % $P % 100 <
        CASE lang WHEN 'en' THEN 75 WHEN 'es' THEN 50
                  WHEN 'de' THEN 25 WHEN 'fr' THEN 10 ELSE 5 END
      ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q37
  /** q37 — sequence packing offsets: concatenate documents in doc_id
    * order, cut every 2048 tokens, report where each doc lands. The
    * engine computes the global prefix sum with the two-phase
    * distributed scan (see [[graft.operators.Packing]]); the oracle is
    * the single-window formulation the naive Spark version would have
    * used — identical numbers, only the execution shape differs.
    * DuckDB window SUM over INT returns HUGEINT → cast (memory-noted
    * gotcha); `//` is DuckDB's exact integer division like Spark's
    * `div`. */
  val q37: Q = Q(
    "q37_sequence_packing",
    (s, d) =>
      Packing.contiguousOffsets(Tables.documents(s, d), "doc_id", "text",
        maxTokens = 2048),
    Some(s"""
      WITH $duckWords,
      t AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens FROM words),
      o AS (
        SELECT doc_id, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS global_offset
        FROM t)
      SELECT doc_id, n_tokens, global_offset,
        global_offset // 2048 AS pack_id,
        global_offset % 2048 AS pack_offset,
        (global_offset % 2048) + n_tokens > 2048 AS spans_boundary
      FROM o ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q40
  /** q40 — deterministic training-order shuffle (the corpus pipeline's
    * last step): portable (id, seed)-hash → shard + within-shard
    * position; seed = epoch, so reshuffling between epochs is just a
    * seed change. Row-local assignment, per-shard window — never a
    * global sort. Spark `row_number` is INT32, DuckDB's BIGINT → cast. */
  val q40: Q = Q(
    "q40_training_order",
    (s, d) =>
      Sampling.trainingOrder(Tables.documents(s, d), "doc_id",
        shards = 8, seed = 1L)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos")),
    Some(s"""
      WITH h AS (
        SELECT doc_id,
          ((doc_id % $P) * 2654435761 % $P + (1 % $P) * 40503 % $P) % $P
            AS skey
        FROM documents),
      s AS (SELECT doc_id, skey, CAST(skey % 8 AS INT) AS shard FROM h)
      SELECT doc_id, shard,
        CAST(row_number() OVER (
          PARTITION BY shard ORDER BY skey, doc_id) AS INT) AS pos
      FROM s ORDER BY shard, pos
    """.trim))

  // ---------------------------------------------------------------- q41
  /** q41 — weighted mixing to a token budget: 20k tokens at en 0.5 /
    * es 0.25 / de 0.125 / fr 0.125 (dyadic weights → every double in
    * the keep-fraction arithmetic is exact, so the per-million floor()
    * boundary replays identically in DuckDB; see the operator's
    * scaladoc). The oracle mirrors the arithmetic ORDER too:
    * (budget · w) / Σw, one division by the stratum total, floor. */
  val q41: Q = Q(
    "q41_token_budget_mix",
    (s, d) =>
      Sampling.mixToTokenBudget(Tables.documents(s, d), "doc_id", "lang",
        "text", Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.125,
          "fr" -> 0.125), budgetTokens = 20000L)
        .orderBy(col("doc_id")),
    Some(s"""
      WITH c AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> t <> '')) AS INT) AS n_tokens
        FROM documents),
      tot AS (
        SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
        FROM c GROUP BY lang),
      thr AS (
        SELECT lang,
          CAST(floor(least(1.0,
            (20000.0 * CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25
                       WHEN 'de' THEN 0.125 WHEN 'fr' THEN 0.125
                       ELSE 0.0 END / 1.0) / CAST(t AS DOUBLE))
            * 1000000.0) AS BIGINT) AS thr
        FROM tot)
      SELECT c.doc_id, c.lang, c.n_tokens
      FROM c JOIN thr ON c.lang = thr.lang
      WHERE ((c.doc_id % $P) * 2654435761 % $P + 12345) % $P % 1000000
        < thr.thr
      ORDER BY c.doc_id
    """.trim))

  // ---------------------------------------------------------------- q42
  /** q42 — epoch-sharded packing (q40 ∘ q37): training-order shuffle
    * into 8 shards, then per-shard concat-and-chunk at 2048 tokens —
    * the epoch-ready form a data loader consumes. Sharding bounds the
    * prefix-sum window, so no two-phase scan is needed here; both
    * windows share one hash-exchange on `shard` (PlanAuditSpec pins
    * no single-partition window). DuckDB window SUM over INT returns
    * HUGEINT → cast; `//` is exact BIGINT division like Spark `div`. */
  val q42: Q = Q(
    "q42_epoch_sharded_packing",
    (s, d) =>
      Packing.epochShardedOffsets(Tables.documents(s, d), "doc_id", "text",
        shards = 8, seed = 1L, maxTokens = 2048),
    Some(s"""
      WITH $duckWords,
      t AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens FROM words),
      h AS (
        SELECT doc_id, n_tokens,
          ((doc_id % $P) * 2654435761 % $P + (1 % $P) * 40503 % $P) % $P
            AS skey
        FROM t),
      s AS (SELECT doc_id, n_tokens, skey, CAST(skey % 8 AS INT) AS shard
            FROM h),
      o AS (
        SELECT doc_id, shard,
          CAST(row_number() OVER (
            PARTITION BY shard ORDER BY skey, doc_id) AS INT) AS pos,
          n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (
            PARTITION BY shard ORDER BY skey, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS shard_offset
        FROM s)
      SELECT doc_id, shard, pos, n_tokens, shard_offset,
        shard_offset // 2048 AS pack_id,
        shard_offset % 2048 AS pack_offset,
        (shard_offset % 2048) + n_tokens > 2048 AS spans_boundary
      FROM o ORDER BY shard, pos
    """.trim))

  // ---------------------------------------------------------------- q47
  /** q47 — sliding-window chunking (64-token windows, stride 48): the
    * RAG/embedding-prep step, row-local end to end (see
    * [[graft.operators.Packing.slidingChunks]] for the start-offset
    * rule). The oracle replays tokenize → offset range → slice → join
    * → sha256; DuckDB `range` is exclusive-stop like the Spark
    * sequence's `S-1` inclusive bound, and `list_slice`'s inclusive
    * 1-based [start+1, start+C] is Spark `slice(w, start+1, C)`. */
  val q47: Q = Q(
    "q47_sliding_chunks",
    (s, d) =>
      Packing.slidingChunks(Tables.documents(s, d), "doc_id", "text",
        chunkTokens = 64, stride = 48),
    Some(s"""
      WITH $duckWords,
      t AS (
        SELECT doc_id, w, CAST(len(w) AS INT) AS n FROM words
        WHERE len(w) > 0),
      st AS (
        SELECT doc_id, w, n,
          unnest(range(0, greatest(n - 16, 1), 48)) AS start
        FROM t)
      SELECT doc_id,
        CAST(start // 48 AS INT) AS chunk_idx,
        CAST(start AS INT) AS start_token,
        CAST(least(64, n - start) AS INT) AS n_chunk_tokens,
        sha256(array_to_string(list_slice(w, start + 1, start + 64), ' '))
          AS chunk_hash
      FROM st ORDER BY doc_id, chunk_idx
    """.trim))

  // ---------------------------------------------------------------- q51
  /** q51 — fixed-k priority sample (5 docs per language): the k
    * smallest portable id-hashes per stratum, rank included so any
    * prefix is a nested sub-sample. Plans as WindowGroupLimit
    * (per-task k-row heap before the exchange — plan-pinned like
    * q46); the oracle replays the affine hash verbatim. */
  val q51: Q = Q(
    "q51_priority_sample",
    (s, d) =>
      Sampling.priorityKPerStratum(
        Tables.documents(s, d).select(col("lang"), col("doc_id")),
        "doc_id", "lang", k = 5)
        .orderBy(col("lang"), col("sample_rank")),
    Some(s"""
      SELECT lang, doc_id, CAST(sample_rank AS INT) AS sample_rank FROM (
        SELECT lang, doc_id,
          row_number() OVER (PARTITION BY lang
            ORDER BY ((doc_id % $P) * 2654435761 % $P + 12345) % $P,
              doc_id) AS sample_rank
        FROM documents) t
      WHERE sample_rank <= 5 ORDER BY lang, sample_rank
    """.trim))

  // ---------------------------------------------------------------- q68
  /** q68 — deterministic train/val/test holdout: every doc's split is
    * a pure function of its id through the portable affine hash (docs
    * never migrate splits as the corpus grows), verified as the
    * per-(source, split) census. Row-local assignment; the census
    * groupBy is the only shuffle. */
  val q68: Q = Q(
    "q68_holdout_split",
    (s, d) =>
      Sampling.holdoutSplit(Tables.documents(s, d), "doc_id")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy(col("source"), col("split")),
    Some("""
      WITH s AS (
        SELECT source, n_chars,
          CASE WHEN b < 80 THEN 'train'
               WHEN b < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM (
          SELECT source, n_chars,
            ((doc_id % 1000000007) * 2654435761 % 1000000007 + 12345)
              % 1000000007 % 100 AS b
          FROM documents))
      SELECT source, split, count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM s GROUP BY source, split ORDER BY source, split
    """.trim))

  // ---------------------------------------------------------------- q90
  /** q90 — weighted (PPS) priority sample
    * ([[Sampling.weightedPriorityK]]): 5 docs per lang with selection
    * probability ∝ `n_chars`. The sort key `(h+1)/w` is a single
    * correctly-rounded IEEE division of exact integers, so both
    * engines order identically; q51 is the uniform sibling. */
  val q90: Q = Q(
    "q90_weighted_sample",
    (s, d) =>
      Sampling.weightedPriorityK(
        Tables.documents(s, d).select(col("lang"), col("doc_id"),
          col("n_chars")),
        "doc_id", "lang", "n_chars", k = 5)
        .orderBy(col("lang"), col("sample_rank")),
    Some(s"""
      SELECT lang, doc_id, n_chars, CAST(sample_rank AS INT) AS sample_rank
      FROM (
        SELECT lang, doc_id, n_chars,
          row_number() OVER (PARTITION BY lang ORDER BY
            CAST(((doc_id % $P) * 2654435761 % $P + 12345) % $P + 1 AS DOUBLE)
              / CAST(n_chars AS DOUBLE),
            doc_id) AS sample_rank
        FROM documents WHERE n_chars > 0) t
      WHERE sample_rank <= 5 ORDER BY lang, sample_rank
    """.trim))

  // ---------------------------------------------------------------- q94
  /** q94 — leakage-safe holdout ([[Sampling.leakageSafeSplit]]):
    * q68's split keyed by q31's near-dup CLUSTER, so a near-duplicate
    * family can never straddle the train/eval fence (an id-keyed
    * split would let the eval set "test" paraphrases of training
    * data). The oracle nests q31's recursive-closure replay and
    * applies the identical bucket CASE to the cluster id. */
  val q94: Q = Q(
    "q94_leakage_safe_split",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Sampling.leakageSafeSplit(
        docs.select(col("doc_id"), col("lang")), "doc_id",
        Dedup.nearDupClusters(docs, "doc_id",
          Dedup.minhashLshPairs(docs, "doc_id", "text",
            threshold = 0.5, k = minhashK, bands = minhashBands)))
        .select(col("doc_id"), col("lang"), col("cluster_id"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH c AS (${q31.oracle.get}),
      s AS (
        SELECT d.doc_id, d.lang, c.cluster_id,
          (c.cluster_id % $P) * 2654435761 % $P + 12345 AS h
        FROM documents d JOIN c USING (doc_id))
      SELECT doc_id, lang, cluster_id,
        CASE WHEN h % $P % 100 < 80 THEN 'train'
             WHEN h % $P % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM s ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q103
  /** q103 — temperature-scaled mixture weights
    * ([[Sampling.temperatureMix]]): the `p^α/Σp^α` rebalance of the
    * multilingual pretraining recipes, α on the quarter grid so the
    * tempering composes from IEEE-exact `sqrt` instead of a libm
    * `pow` (q52's transcendental-avoidance argument); both shares are
    * ratios of exact integers. Windows run over the |strata|-row
    * aggregate only. */
  val q103: Q = Q(
    "q103_temperature_mix",
    (s, d) =>
      Sampling.temperatureMix(Tables.documents(s, d), "lang", "text",
        alphaQuarters = 2),
    Some("""
      WITH w AS (
        SELECT lang, list_filter(string_split_regex(trim(text), '\s+'),
          t -> t <> '') AS w
        FROM documents),
      c AS (
        SELECT lang, CAST(sum(len(w)) AS BIGINT) AS n_tokens
        FROM w GROUP BY 1),
      f AS (
        SELECT lang, n_tokens,
          CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1048576.0)
            AS BIGINT) AS w_fp
        FROM c)
      SELECT lang, n_tokens, w_fp,
        CAST(n_tokens AS DOUBLE) /
          CAST(sum(n_tokens) OVER () AS DOUBLE) AS natural_share,
        CAST(w_fp AS DOUBLE) /
          CAST(sum(w_fp) OVER () AS DOUBLE) AS share,
        (CAST(w_fp AS DOUBLE) / CAST(sum(w_fp) OVER () AS DOUBLE)) /
          (CAST(n_tokens AS DOUBLE) /
            CAST(sum(n_tokens) OVER () AS DOUBLE)) AS boost
      FROM f ORDER BY lang
    """.trim))

  // --------------------------------------------------------------- q145
  /** q145 — token-budget truncation ([[Packing.truncateToTokens]]):
    * keep each doc's first 64 tokens, report the cut, ship the kept
    * prefix as a sha-256 (q47's chunk-hash trick) — context-length
    * prep done once instead of silently inside every consumer. Fully
    * row-local. */
  val q145: Q = Q(
    "q145_token_truncation",
    (s, d) =>
      Packing.truncateToTokens(Tables.documents(s, d), "doc_id", "text",
        maxTokens = 64),
    Some("""
      WITH m AS (
        SELECT doc_id, list_filter(string_split_regex(trim(text),
          '\s+'), t -> t <> '') AS w
        FROM documents)
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        CAST(least(len(w), 64) AS BIGINT) AS kept_tokens,
        len(w) > 64 AS truncated,
        sha256(array_to_string(w[1:64], ' ')) AS kept_hash
      FROM m ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q171
  /** q171 — time-embargo temporal split ([[Sampling.temporalSplit]]):
    * train strictly before, test strictly after, a 2-day embargo
    * between — the leakage-safe split for temporal models (q94 guards
    * identity leakage, this guards TIME leakage) — plus the per-split
    * count of users shared with the test period, the identity leak a
    * purely temporal fence leaves open. */
  val q171: Q = Q(
    "q171_temporal_split",
    (s, d) =>
      Sampling.temporalSplit(eventsUs(s, d), col("ts_us"),
        col("user_id"), testDays = 7, embargoDays = 2),
    Some("""
      WITH base AS (
        SELECT CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id AS u
        FROM events),
      a AS (SELECT max(ts_us) AS anchor FROM base),
      pu AS (
        SELECT u,
          sum(CASE WHEN ts_us <= anchor - 9 * 86400000000 THEN 1
            ELSE 0 END) AS n_train,
          sum(CASE WHEN ts_us > anchor - 9 * 86400000000
            AND ts_us <= anchor - 7 * 86400000000 THEN 1
            ELSE 0 END) AS n_embargo,
          sum(CASE WHEN ts_us > anchor - 7 * 86400000000 THEN 1
            ELSE 0 END) AS n_test
        FROM base, a GROUP BY u),
      w AS (
        SELECT
          sum(n_train) AS e_train, sum(n_embargo) AS e_embargo,
          sum(n_test) AS e_test,
          sum(CASE WHEN n_train > 0 THEN 1 ELSE 0 END) AS u_train,
          sum(CASE WHEN n_embargo > 0 THEN 1 ELSE 0 END) AS u_embargo,
          sum(CASE WHEN n_test > 0 THEN 1 ELSE 0 END) AS u_test,
          sum(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
            AS s_train,
          sum(CASE WHEN n_embargo > 0 AND n_test > 0 THEN 1 ELSE 0 END)
            AS s_embargo
        FROM pu)
      SELECT split, CAST(n_events AS BIGINT) AS n_events,
        CAST(n_users AS BIGINT) AS n_users,
        CAST(shared AS BIGINT) AS n_users_shared_with_test
      FROM (
        SELECT 'train' AS split, e_train AS n_events, u_train AS n_users,
          s_train AS shared FROM w
        UNION ALL
        SELECT 'embargo', e_embargo, u_embargo, s_embargo FROM w
        UNION ALL
        SELECT 'test', e_test, u_test, u_test FROM w)
      ORDER BY split
    """.trim))

  // --------------------------------------------------------------- q186
  /** q186 — contrastive triplets ([[Sampling.contrastiveTriplets]]):
    * (anchor, positive, negative) export off the q31 cluster
    * decision — positives same-cluster neighbors, negatives
    * hash-picked different-cluster docs (no rand(); shard-partitioned
    * windows, never a global sort); the lexical rung under q106's
    * embedding-based hard negatives. */
  val q186: Q = Q(
    "q186_contrastive_triplets",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Sampling.contrastiveTriplets(
        Dedup.nearDupClusters(docs, "doc_id",
          Dedup.minhashLshPairs(docs, "doc_id", "text",
            threshold = 0.5, k = minhashK, bands = minhashBands)))
    },
    Some(s"""
      WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ($q18OracleSql) q
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
      ),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
      ),
      cl AS (
        SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
      pos AS (
        SELECT doc_id, cluster_id,
          coalesce(lag(doc_id) OVER cw, lead(doc_id) OVER cw)
            AS positive_id
        FROM cl WINDOW cw AS (PARTITION BY cluster_id ORDER BY doc_id)),
      h AS (
        SELECT doc_id, cluster_id,
          ((doc_id % $P) * 2654435761 % $P + 12345) % $P AS hh
        FROM cl),
      sh AS (SELECT *, hh % 8 AS shard FROM h),
      w AS (
        SELECT doc_id, cluster_id,
          lead(doc_id, 1) OVER win AS n1,
          lead(cluster_id, 1) OVER win AS c1,
          lead(doc_id, 2) OVER win AS n2,
          lead(cluster_id, 2) OVER win AS c2,
          lead(doc_id, 3) OVER win AS n3,
          lead(cluster_id, 3) OVER win AS c3
        FROM sh WINDOW win AS (PARTITION BY shard ORDER BY hh, doc_id))
      SELECT w.doc_id AS anchor_id, w.cluster_id, pos.positive_id,
        CASE WHEN c1 IS NOT NULL AND c1 <> w.cluster_id THEN n1
             WHEN c2 IS NOT NULL AND c2 <> w.cluster_id THEN n2
             WHEN c3 IS NOT NULL AND c3 <> w.cluster_id THEN n3
        END AS negative_id
      FROM w JOIN pos ON w.doc_id = pos.doc_id
      ORDER BY anchor_id
    """.trim))

  // --------------------------------------------------------------- q203
  /** q203 — split balance audit ([[Sampling.splitBalance]] over the
    * q171 fence): per temporal split, mean ± SE of the event value in
    * cents — non-overlapping error bars on a model feature mean the
    * eval measures the SPLIT, not the model. */
  val q203: Q = Q(
    "q203_split_balance",
    (s, d) => {
      val e = eventsUs(s, d)
      val usDay = 86400000000L
      val anchor = e.agg(max(col("ts_us")).as("__anchor"))
      val withSplit = e.crossJoin(broadcast(anchor))
        .withColumn("split",
          when(col("ts_us") > col("__anchor") - 7 * usDay, "test")
          .when(col("ts_us") > col("__anchor") - 9 * usDay, "embargo")
          .otherwise("train"))
      Sampling.splitBalance(withSplit, col("split"),
        (Dec.d2(col("value")) * 100).cast("long"))
    },
    Some("""
      WITH base AS (
        SELECT CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM events),
      a AS (SELECT max(ts_us) AS anchor FROM base),
      sp AS (
        SELECT CASE
          WHEN ts_us > anchor - 7 * 86400000000 THEN 'test'
          WHEN ts_us > anchor - 9 * 86400000000 THEN 'embargo'
          ELSE 'train' END AS split, v
        FROM base, a WHERE v IS NOT NULL),
      agg AS (
        SELECT split, CAST(count(*) AS BIGINT) AS n,
          sum(CAST(v AS HUGEINT)) AS s,
          sum(CAST(v AS HUGEINT) * v) AS q
        FROM sp GROUP BY 1)
      SELECT split, n,
        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        CASE WHEN n >= 2 AND n * q - s * s >= 0 THEN
          sqrt(CAST(n * q - s * s AS DOUBLE))
            / (CAST(n AS DOUBLE) * sqrt(CAST(n - 1 AS DOUBLE)))
        END AS se
      FROM agg ORDER BY split
    """.trim))

  // --------------------------------------------------------------- q227
  /** q227 — effective sample size of the tempered mix
    * ([[Sampling.effectiveSampleSize]]): the Kish
    * `(Σw)²/Σw²` over q103's α = 1/2 per-lang weights — how many
    * equally-weighted documents the weighted corpus is worth (the
    * diversity price of the re-weighting). Exact integer folds; the
    * final ESS is the pinned 3-op IEEE sequence. */
  val q227: Q = Q(
    "q227_effective_sample_size",
    (s, d) =>
      Sampling.effectiveSampleSize(Tables.documents(s, d), "lang",
        "text", alphaQuarters = 2),
    Some("""
      WITH w AS (
        SELECT lang, list_filter(string_split_regex(trim(text), '\s+'),
          t -> t <> '') AS w
        FROM documents),
      c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(len(w)) AS BIGINT) AS n_tokens
        FROM w GROUP BY 1),
      f AS (
        SELECT lang, n_docs,
          CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1048576.0)
            AS BIGINT) AS w_fp
        FROM c),
      a AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_strata,
          sum(CAST(n_docs AS HUGEINT) * w_fp) AS sw,
          sum(CAST(n_docs AS HUGEINT) * w_fp * w_fp) AS sw2
        FROM f)
      SELECT n_docs, n_strata,
        CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE)
          AS ess,
        (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE))
          / CAST(n_docs AS DOUBLE) AS ess_ratio
      FROM a
    """.trim))

  // --------------------------------------------------------------- q224
  /** q224 — shard manifest ([[Packing.shardManifest]]): the
    * writer-side plan of a large export — pack docs in id order into
    * contiguous 16 KB byte shards (fixture-scaled; 256 MB at
    * production) and report per shard the doc count, byte mass,
    * straddle count, id range, and fill. q37's two-phase prefix sum
    * over OCTET lengths; the oracle is the single-window
    * formulation. */
  val q224: Q = Q(
    "q224_shard_manifest",
    (s, d) =>
      Packing.shardManifest(Tables.documents(s, d), "doc_id", "text",
        shardBytes = 16384L),
    Some("""
      WITH b AS (
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nb
        FROM documents),
      o AS (
        SELECT doc_id, nb,
          CAST(COALESCE(SUM(nb) OVER (
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS BIGINT) AS off
        FROM b)
      SELECT off // 16384 AS shard_id,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(nb) AS BIGINT) AS n_bytes,
        CAST(sum(CASE WHEN (off % 16384) + nb > 16384 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_straddle,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        CAST(sum(nb) AS DOUBLE) / 16384.0 AS fill
      FROM o GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q233
  /** q233 — z-order layout manifest ([[Layout.zOrderManifest]]): the
    * zone map a Morton-ordered rewrite of lineitem on (l_partkey,
    * l_suppkey) would produce — per z-cell on the 16×16 data-anchored
    * grid, row count and the bounding box in BOTH dimensions. The
    * write-side answer to "this fact is queried by part AND by
    * supplier": a single-column sort skips files for one predicate
    * only; z-contiguous spans keep both boxes small. Cells and
    * interleave are exact integer arithmetic on a one-row broadcast
    * bounds append (q84 shape); manifest is a ≤ 256-key fold. */
  val q233: Q = Q(
    "q233_zorder_manifest",
    (s, d) =>
      Layout.zOrderManifest(Tables.lineitem(s, d), "l_partkey",
        "l_suppkey", bits = 4),
    Some("""
      WITH r AS (
        SELECT CAST(l_partkey AS BIGINT) AS x,
          CAST(l_suppkey AS BIGINT) AS y
        FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
      b AS (
        SELECT min(x) AS minx, max(x) AS maxx,
          min(y) AS miny, max(y) AS maxy
        FROM r),
      c AS (
        SELECT x, y,
          ((x - minx) * 16) // (maxx - minx + 1) AS cx,
          ((y - miny) * 16) // (maxy - miny + 1) AS cy
        FROM r CROSS JOIN b),
      zv AS (
        SELECT x, y,
          ((cx >> 0) & 1) * 1 + ((cy >> 0) & 1) * 2 +
          ((cx >> 1) & 1) * 4 + ((cy >> 1) & 1) * 8 +
          ((cx >> 2) & 1) * 16 + ((cy >> 2) & 1) * 32 +
          ((cx >> 3) & 1) * 64 + ((cy >> 3) & 1) * 128 AS z
        FROM c)
      SELECT CAST(z AS BIGINT) AS z, CAST(count(*) AS BIGINT) AS n_rows,
        min(x) AS min_x, max(x) AS max_x,
        min(y) AS min_y, max(y) AS max_y
      FROM zv GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q237
  /** q237 — water-filling quota ([[Sampling.waterfillQuota]]): max-min
    * fair division of a 2M-char budget across sources — small sources
    * untouched, every capped source lands at the same level, budget
    * met EXACTLY (`Σ allocated = min(B, Σ mass)`). The closed-form
    * integer solve on the sorted |strata| frame (no search), the
    * remainder distributed +1 to the largest capped strata
    * deterministically. The contract-style companion to q103's
    * tempered shares. */
  val q237: Q = Q(
    "q237_waterfill_quota",
    (s, d) =>
      Sampling.waterfillQuota(Tables.documents(s, d), "source",
        "n_chars", budget = 2000000L),
    Some("""
      WITH m AS (
        SELECT source AS stratum, CAST(sum(n_chars) AS BIGINT) AS mass
        FROM documents GROUP BY 1),
      r AS (
        SELECT stratum, mass,
          CAST(row_number() OVER (ORDER BY mass, stratum NULLS FIRST)
            AS BIGINT) AS j,
          CAST(coalesce(sum(mass) OVER (
            ORDER BY mass, stratum NULLS FIRST
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS s_prev,
          CAST(count(*) OVER () AS BIGINT) AS n
        FROM m),
      f AS (
        SELECT *, (s_prev + (n - j + 1) * mass <= 2000000) AS isfull
        FROM r),
      js AS (
        SELECT coalesce(max(CASE WHEN isfull THEN j END), 0) AS jstar,
          coalesce(sum(CASE WHEN isfull THEN mass END), 0) AS sstar
        FROM f),
      o AS (
        SELECT f.*, jstar, sstar, (n - jstar) AS ncap,
          CASE WHEN n - jstar > 0
            THEN (2000000 - sstar) // (n - jstar) ELSE 0 END AS lvl,
          CASE WHEN n - jstar > 0
            THEN (2000000 - sstar) % (n - jstar) ELSE 0 END AS rem,
          CASE WHEN j > jstar THEN CAST(row_number() OVER (
            ORDER BY mass DESC NULLS LAST, stratum NULLS FIRST)
            AS BIGINT) ELSE 0 END AS caprank
        FROM f CROSS JOIN js)
      SELECT stratum, mass,
        CAST(CASE WHEN j <= jstar THEN mass
          ELSE lvl + CASE WHEN caprank <= rem THEN 1 ELSE 0 END END
          AS BIGINT) AS allocated,
        (j > jstar) AS capped
      FROM o ORDER BY stratum NULLS FIRST
    """.trim))

  // --------------------------------------------------------------- q241
  /** q241 — Poisson-bootstrap CI ([[Sampling.poissonBootstrapCI]]):
    * the standard error and percentile CI of mean document length
    * from 32 one-pass Poisson(1)-weighted replicates — resampling
    * without the per-replicate global shuffle a classic bootstrap
    * needs. The weight ladder runs on the portable (id, replicate)
    * hash against shared fixed-point truncated-Poisson thresholds, so
    * every replicate (and therefore the CI itself) replays
    * bit-for-bit in the oracle. */
  val q241: Q = Q(
    "q241_bootstrap_ci",
    (s, d) =>
      Sampling.poissonBootstrapCI(Tables.documents(s, d), "doc_id",
        "n_chars", replicates = 32, seed = 1L),
    Some({
      val Seq(t0, t1, t2, t3) = Sampling.PoissonT
      s"""
      WITH r AS (
        SELECT doc_id, n_chars, unnest(range(32)) AS b
        FROM documents
        WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
      u AS (
        SELECT b, n_chars,
          ((doc_id % $P) * 2654435761 % $P +
            ((b + 1) % $P) * 40503 % $P) % $P % 1048576 AS u
        FROM r),
      w AS (
        SELECT b, n_chars,
          CASE WHEN u < $t0 THEN 0 WHEN u < $t1 THEN 1
               WHEN u < $t2 THEN 2 WHEN u < $t3 THEN 3
               ELSE 4 END AS w
        FROM u),
      rep AS (
        SELECT b, CAST(sum(w) AS BIGINT) AS n,
          sum(CAST(w AS HUGEINT) * n_chars) AS s
        FROM w GROUP BY 1),
      mf AS (
        SELECT b, CAST((s * 1048576) // CAST(n AS HUGEINT) AS BIGINT)
          AS mean_fp
        FROM rep WHERE n > 0),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_replicates,
          sum(CAST(mean_fp AS HUGEINT)) AS m1,
          sum(CAST(mean_fp AS HUGEINT) * mean_fp) AS m2,
          list_sort(list(mean_fp)) AS sorted
        FROM mf)
      SELECT n_replicates,
        CAST(m1 // n_replicates AS BIGINT) AS boot_mean_fp,
        sqrt(greatest((CAST(m2 AS DOUBLE) -
          CAST(m1 AS DOUBLE) * CAST(m1 AS DOUBLE) /
            CAST(n_replicates AS DOUBLE)) /
          (CAST(n_replicates AS DOUBLE) - 1.0), 0.0)) / 1048576.0
          AS se,
        sorted[2] AS ci_lo_fp,
        sorted[-2] AS ci_hi_fp
      FROM agg
      """.trim
    }))

  // --------------------------------------------------------------- q260
  /** q260 — token-budget mixing under SUBWORD counts: q41's
    * deterministic budget draw re-run with the tokenizer seam set to
    * greedy BPE ([[Sampling.mixToTokenBudget]] with
    * [[graft.functions.Bpe.demoMerges]]) — per-language keep
    * thresholds now derive from the SUBWORD mass each language
    * actually charges the budget, so a language whose words fragment
    * (high fertility) correctly gets fewer documents for the same
    * token share. Same portable affine-hash draw, same floor'd
    * millionths threshold; only the token accounting changed. The
    * oracle charges each word occurrence its recursive-CTE subword
    * count (the q254 distinct-vocab join). */
  val q260: Q = Q(
    "q260_bpe_budget_mix",
    (s, d) =>
      Sampling.mixToTokenBudget(Tables.documents(s, d), "doc_id", "lang",
        "text", Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.125,
          "fr" -> 0.125), budgetTokens = 20000L,
        subwordMerges = Some(graft.functions.Bpe.demoMerges))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE
      d AS (
        SELECT doc_id, lang, text IS NULL AS is_null_text,
          list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            x -> x <> '') w
        FROM documents),
      words AS (SELECT DISTINCT unnest(w) AS w FROM d),
      ${graft.functions.Bpe.bpeCteSql(graft.functions.Bpe.demoMerges)},
      wn AS (SELECT w, CAST(len(toks) AS BIGINT) AS n_sub FROM bpefin),
      tokc AS (
        SELECT d.doc_id, CAST(sum(wn.n_sub) AS BIGINT) AS n_tokens
        FROM d, LATERAL unnest(d.w) AS u(t)
        JOIN wn ON wn.w = u.t
        GROUP BY 1),
      c AS (
        SELECT d.doc_id, d.lang,
          CASE WHEN is_null_text THEN NULL ELSE
            CAST(coalesce(tokc.n_tokens, 0) AS BIGINT) END AS n_tokens
        FROM d LEFT JOIN tokc USING (doc_id)),
      tot AS (
        SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
        FROM c GROUP BY lang),
      thr AS (
        SELECT lang,
          CAST(floor(least(1.0,
            (20000.0 * CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25
                       WHEN 'de' THEN 0.125 WHEN 'fr' THEN 0.125
                       ELSE 0.0 END / 1.0) / CAST(t AS DOUBLE))
            * 1000000.0) AS BIGINT) AS thr
        FROM tot)
      SELECT c.doc_id, c.lang, c.n_tokens
      FROM c JOIN thr ON c.lang = thr.lang
      WHERE ((c.doc_id % $P) * 2654435761 % $P + 12345) % $P % 1000000
        < thr.thr
      ORDER BY c.doc_id
    """.trim))

  // --------------------------------------------------------------- q265
  /** q265 — sequence packing under SUBWORD counts: q37's two-phase
    * prefix-sum packing with the tokenizer seam set to greedy BPE
    * ([[Packing.contiguousOffsets]] with
    * [[graft.functions.Bpe.demoMerges]]) — block boundaries now land
    * where the MODEL's token budget does, not at whitespace-word
    * counts (the difference is exactly the fertility q254 measures:
    * a 2048-budget block holds fewer high-fertility documents). Same
    * distributed prefix sum, same exact `div` bucketing; only the
    * per-doc count changed. */
  val q265: Q = Q(
    "q265_bpe_sequence_packing",
    (s, d) =>
      Packing.contiguousOffsets(Tables.documents(s, d), "doc_id", "text",
        maxTokens = 2048,
        subwordMerges = Some(graft.functions.Bpe.demoMerges)),
    Some(s"""
      WITH RECURSIVE
      d AS (
        SELECT doc_id, text IS NULL AS is_null_text,
          list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            x -> x <> '') w
        FROM documents),
      words AS (SELECT DISTINCT unnest(w) AS w FROM d),
      ${graft.functions.Bpe.bpeCteSql(graft.functions.Bpe.demoMerges)},
      wn AS (SELECT w, CAST(len(toks) AS BIGINT) AS n_sub FROM bpefin),
      tokc AS (
        SELECT d.doc_id, CAST(sum(wn.n_sub) AS BIGINT) AS n_tokens
        FROM d, LATERAL unnest(d.w) AS u(t)
        JOIN wn ON wn.w = u.t
        GROUP BY 1),
      t AS (
        SELECT d.doc_id,
          CASE WHEN is_null_text THEN NULL ELSE
            CAST(coalesce(tokc.n_tokens, 0) AS BIGINT) END AS n_tokens
        FROM d LEFT JOIN tokc USING (doc_id)),
      o AS (
        SELECT doc_id, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS global_offset
        FROM t)
      SELECT doc_id, n_tokens, global_offset,
        global_offset // 2048 AS pack_id,
        global_offset % 2048 AS pack_offset,
        (global_offset % 2048) + n_tokens > 2048 AS spans_boundary
      FROM o ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q274
  /** q274 — TOKEN-budget shard manifest ([[Packing
    * .tokenShardManifest]]): q224's export plan metered in the
    * MODEL's currency — shards sized by greedy-BPE SUBWORD counts
    * against the shipped tokenizer artifact (4096-token shards at
    * fixture scale; ~4M at production), because a training loader
    * buys tokens, not bytes, and byte-sized shards of mixed-fertility
    * corpora deliver uneven step counts per shard. Same deterministic
    * prefix sum; the oracle nests q265's recursive BPE replay under
    * q224's window formulation. */
  val q274: Q = Q(
    "q274_token_shard_manifest",
    (s, d) =>
      Packing.tokenShardManifest(Tables.documents(s, d), "doc_id",
        "text", shardTokens = 4096L,
        subwordMerges = Some(graft.functions.Bpe.demoMerges)),
    Some(s"""
      WITH RECURSIVE
      d AS (
        SELECT doc_id, text IS NULL AS is_null_text,
          list_filter(string_split_regex(trim(lower(text)), \'\\s+\'),
            x -> x <> \'\') w
        FROM documents),
      words AS (SELECT DISTINCT unnest(w) AS w FROM d),
      ${graft.functions.Bpe.bpeCteSql(graft.functions.Bpe.demoMerges)},
      wn AS (SELECT w, CAST(len(toks) AS BIGINT) AS n_sub FROM bpefin),
      tokc AS (
        SELECT d.doc_id, CAST(sum(wn.n_sub) AS BIGINT) AS n_tokens
        FROM d, LATERAL unnest(d.w) AS u(t)
        JOIN wn ON wn.w = u.t
        GROUP BY 1),
      t AS (
        SELECT d.doc_id,
          CASE WHEN is_null_text THEN NULL ELSE
            CAST(coalesce(tokc.n_tokens, 0) AS BIGINT) END AS n_tokens
        FROM d LEFT JOIN tokc USING (doc_id)),
      o AS (
        SELECT doc_id, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS BIGINT) AS off
        FROM t)
      SELECT off // 4096 AS shard_id,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        CAST(sum(CASE WHEN (off % 4096) + n_tokens > 4096 THEN 1 ELSE 0
          END) AS BIGINT) AS n_straddle,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        CAST(sum(n_tokens) AS DOUBLE) / 4096.0 AS fill
      FROM o GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q304
  /** q304 — media BYTE-budget mixture ([[Sampling.mixToByteBudget]] —
    * q41's media sibling): a multimodal training mixture is stated in
    * BYTES per modality (a loader reading payload shards buys octets;
    * token counts do not exist for binary media), realized by the
    * same per-million affine id-hash keep fraction against each
    * modality's byte mass. Strata come from the ROUTER's sniffed
    * modality (never the declared mime), so corrupted-magic rows land
    * in `unknown` — no quota, dropped by construction. The fixture is
    * the byte-ASSEMBLED ISO one, so every payload length is pure id
    * arithmetic (HEIF-family rows are an 84-byte total payload — a
    * 48-byte meta tree between the 20-byte ftyp and 16-byte mdat —
    * the movie-header rows 72 bytes) and the oracle replays masses,
    * thresholds, and the hash filter exactly (dyadic weights — every
    * intermediate double exact). */
  val q304: Q = Q(
    "q304_media_byte_budget_mix",
    (s, d) =>
      Sampling.mixToByteBudget(
        Multimodal.encodeIsoMetaFixture(Tables.documents(s, d),
          "doc_id").toDF()
          .withColumn("modality",
            split(Multimodal.sniffModality(col("payload")), "/")
              .getItem(0)),
        "doc_id", "modality", octet_length(col("payload")),
        Map("image" -> 0.5, "audio" -> 0.25, "video" -> 0.25),
        budgetBytes = 6000L)
        .orderBy(col("doc_id")),
    Some(s"""
      WITH ids AS (
        SELECT doc_id, doc_id % 5 AS fam FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0
          AND doc_id % 10 NOT IN (3, 4)),
      m AS (
        SELECT doc_id,
          CASE WHEN fam IN (1, 2, 3) THEN 'image'
               WHEN fam = 0 THEN 'audio' ELSE 'video' END AS modality,
          CAST(CASE WHEN fam IN (1, 2, 3) THEN 84 ELSE 72 END
            AS BIGINT) AS n_bytes
        FROM ids),
      tot AS (
        SELECT modality, CAST(sum(n_bytes) AS BIGINT) AS b
        FROM m GROUP BY 1),
      thr AS (
        SELECT modality,
          CAST(floor(least(1.0,
            (6000.0 * CASE modality WHEN 'image' THEN 0.5
               WHEN 'audio' THEN 0.25 ELSE 0.25 END / 1.0)
            / CAST(b AS DOUBLE)) * 1000000.0) AS BIGINT) AS thr
        FROM tot)
      SELECT m.doc_id, m.modality, m.n_bytes
      FROM m JOIN thr USING (modality)
      WHERE ((m.doc_id % $P) * 2654435761 % $P + 12345) % $P % 1000000
        < thr.thr
      ORDER BY m.doc_id
    """.trim))

  // --------------------------------------------------------------- q316
  /** q316 — PAIRED byte-budget mixture
    * ([[Sampling.pairedMixToByteBudget]] — q304 for ATOMIC
    * multi-payload rows, the r19 verdict's missing `--mix` sibling
    * for the paired funnel): a (caption, image, audio) training
    * triple carries every modality's bytes at once, so per-stratum
    * keep fractions cannot apply; the mixture statement becomes
    * per-modality byte CAPS and the BINDING modality (largest
    * mass-to-target ratio) fixes ONE uniform deterministic keep
    * fraction — every modality lands at or under its cap, the
    * shortfall visible. The per-row modality masses here are the
    * caption's real octet length plus id-arithmetic payload sizes,
    * so the oracle replays masses, the binding fold, and the affine
    * id-hash filter exactly (dyadic weights — every intermediate
    * double exact). */
  val q316: Q = Q(
    "q316_paired_byte_budget_mix",
    (s, d) =>
      Sampling.pairedMixToByteBudget(
        Tables.documents(s, d)
          .where(col("doc_id").isNotNull && col("doc_id") >= 0)
          .select(col("doc_id"),
            octet_length(col("text")).cast("long").as("tb"),
            (lit(100L) + (col("doc_id") % 7) * 13L).as("ib"),
            (lit(50L) + (col("doc_id") % 5) * 31L).as("ab")),
        "doc_id",
        Seq("text" -> col("tb"), "image" -> col("ib"),
          "audio" -> col("ab")),
        Map("text" -> 0.25, "image" -> 0.5, "audio" -> 0.25),
        budgetBytes = 1000000L)
        .orderBy(col("doc_id")),
    Some(s"""
      WITH m AS (
        SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS text_bytes,
          CAST(100 + (doc_id % 7) * 13 AS BIGINT) AS image_bytes,
          CAST(50 + (doc_id % 5) * 31 AS BIGINT) AS audio_bytes
        FROM documents
        WHERE doc_id IS NOT NULL AND doc_id >= 0),
      tot AS (
        SELECT CAST(sum(text_bytes) AS BIGINT) AS tt,
          CAST(sum(image_bytes) AS BIGINT) AS ti,
          CAST(sum(audio_bytes) AS BIGINT) AS ta
        FROM m),
      thr AS (
        SELECT CAST(floor(least(
            CASE WHEN tt > 0
              THEN (1000000.0 * 0.25 / 1.0) / CAST(tt AS DOUBLE)
              ELSE 1.0 END,
            CASE WHEN ti > 0
              THEN (1000000.0 * 0.5 / 1.0) / CAST(ti AS DOUBLE)
              ELSE 1.0 END,
            CASE WHEN ta > 0
              THEN (1000000.0 * 0.25 / 1.0) / CAST(ta AS DOUBLE)
              ELSE 1.0 END,
            1.0) * 1000000.0) AS BIGINT) AS thr
        FROM tot)
      SELECT m.doc_id, m.text_bytes, m.image_bytes, m.audio_bytes
      FROM m, thr
      WHERE ((m.doc_id % $P) * 2654435761 % $P + 12345) % $P % 1000000
        < thr.thr
      ORDER BY m.doc_id
    """.trim))
}
