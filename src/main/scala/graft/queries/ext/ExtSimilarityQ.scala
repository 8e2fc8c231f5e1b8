package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** [[Ext]] family: embedding similarity / ANN (brute-force, IVF, RP-LSH, PQ) and retrieval evals — queries q20, q21, q30, q39, q52, q53, q55, q56, q57, q61, q84, q96, q98, q106, q107, q113, q114, q123, q125, q129, q140, q142, q179, q226.
  * Split from the monolithic Ext.scala in round 12
  * (pure relocation; helpers live in [[ExtHelpers]]). */
private[queries] trait ExtSimilarityQ { self: ExtHelpers =>
  // ---------------------------------------------------------------- q20
  val q20: Q = Q(
    "q20_embedding_topk",
    (s, d) =>
      Similarity.cosineTopK(Tables.embeddings(s, d), k = 5, queryStride = 50),
    Some("""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        FROM embeddings),
      n0 AS (
        SELECT vec_id, v,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
        FROM e),
      n AS (SELECT * FROM n0 WHERE nrm > 0),
      q AS (SELECT vec_id query_id, v qv, nrm qn FROM n WHERE vec_id % 50 = 0),
      s AS (
        SELECT query_id, c.vec_id neighbor_id,
          (list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])),
             (x, y) -> x + y) / (qn * c.nrm)) AS cosine
        FROM q, n c WHERE c.vec_id <> query_id)
      SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rank
        FROM s) t
      WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim),
    headline = true)

  // ---------------------------------------------------------------- q21
  /** q21 — IVF near-dup with a deterministic k-means coarse quantizer
    * (r3 verdict item 2): C = ⌈√N⌉ centroids hash-seeded from the
    * corpus, ONE fixed-point refinement pass, multi-probe 2, candidate
    * pairs within shared cells only. The oracle replays the identical
    * pipeline — seed selection is integer arithmetic, the refined
    * centroids are integer sums on a 2^-20 grid (order-independent, so
    * Spark's distributed sum and DuckDB's serial sum agree exactly),
    * and every affinity/cosine double comes from the same left-to-right
    * fold, so the argmax/row_number probe selection is
    * bit-reproducible. */
  val q21: Q = Q(
    "q21_embedding_neardup_ivf",
    (s, d) =>
      Similarity.ivfCosinePairs(Tables.embeddings(s, d),
        threshold = 0.3, probes = 2, kmeansIters = 1),
    Some(s"""
      WITH $duckIvfQuantizer,
      assigned AS (
        SELECT cent_id AS cell, vec_id FROM (
          SELECT n.vec_id, c.cent_id,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY
              (list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(n.v) + 1),
                   i -> n.v[i] * c.cv[i])),
                 (x, y) -> x + y) / (n.nrm * c.cn)) DESC, c.cent_id) AS probe
          FROM n, c3 c) t
        WHERE probe <= 2),
      cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, cosine FROM (
        SELECT vec_a, vec_b,
          (list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, len(na.v) + 1), i -> na.v[i] * nb.v[i])),
             (x, y) -> x + y) / (na.nrm * nb.nrm)) AS cosine
        FROM cand
        JOIN n na ON na.vec_id = vec_a
        JOIN n nb ON nb.vec_id = vec_b) t
      WHERE cosine >= 0.3
      ORDER BY vec_a, vec_b
    """.trim))

  // ---------------------------------------------------------------- q30
  /** q30 — the LSH-bucketed ANN variant: random-hyperplane signatures
    * from a deterministic hyperplane family, two 8-bit band buckets,
    * exact cosine verify on candidates only. Complements q21's IVF
    * path (no centroid structure; fully row-local signatures). */
  val q30: Q = Q(
    "q30_embedding_neardup_rplsh",
    (s, d) =>
      Similarity.rpLshCosinePairs(Tables.embeddings(s, d),
        threshold = 0.3, planes = rpPlanes),
    Some(q30OracleSql))

  // ---------------------------------------------------------------- q39
  /** q39 — IVF-probed ANN top-k (q20's scale path): the same
    * deterministic quantizer as q21, but used for SEARCH — the corpus
    * indexed at one cell per vector, each query (q20's `vec_id % 50`
    * set) probing its 4 nearest cells, exact cosine + ranking paid only
    * inside probed cells. Same output schema as q20, so recall@k is a
    * direct row comparison (SimilaritySpec pins it). The oracle replays
    * quantizer, probe choice, and ranking bit-for-bit. */
  val q39: Q = Q(
    "q39_embedding_topk_ivf",
    (s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), k = 5, queryStride = 50,
        probes = 4, kmeansIters = 1),
    Some(s"""
      WITH $duckIvfQuantizer,
      $duckIvfTopK5
      SELECT query_id, neighbor_id, rank, cosine FROM ivf5
      ORDER BY query_id, rank
    """.trim))

  // ---------------------------------------------------------------- q52
  /** q52 — log-free BM25 relevance over a fixed query-term set (the
    * "pull the on-topic slice" operator): tokens filtered to the terms
    * BEFORE any shuffle, |terms|-row document frequency broadcast
    * back, per-term contributions floored to 2^-20-grid longs and
    * summed as integers so the score is engine-exact (the rational
    * idf `(N-df+0.5)/(df+0.5)` replaces `ln` — transcendentals differ
    * across libm; IEEE field ops don't). The oracle replays the exact
    * parenthesization. */
  val q52: Q = Q(
    "q52_bm25_scores",
    (s, d) =>
      Retrieval.bm25Scores(Tables.documents(s, d), "doc_id", "text",
        Seq("spark", "query", "window", "vector", "stream", "shuffle")),
    Some("""
      WITH tok AS (
        SELECT doc_id, t
        FROM documents, LATERAL unnest(
          regexp_extract_all(lower(text), '([a-z]+|[0-9]+)', 1)) AS u(t)),
      dl AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(lower(text), '([a-z]+|[0-9]+)', 1))
            AS INT) AS dl
        FROM documents),
      stats AS (
        SELECT (SELECT count(*) FROM tok) AS tot_tokens,
               (SELECT count(*) FROM documents) AS n_docs),
      tf AS (
        SELECT doc_id, t AS term, count(*) AS tf FROM tok
        WHERE t IN ('spark', 'query', 'window', 'vector', 'stream', 'shuffle')
        GROUP BY doc_id, t),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      scored AS (
        SELECT tf.doc_id,
          CAST(floor(
            ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
              (CAST(df AS DOUBLE) + 0.5)) *
            ((CAST(tf AS DOUBLE) * 2.25) /
              (CAST(tf AS DOUBLE) + 1.25 *
                (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
                  (CAST(tot_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) *
            1048576.0) AS BIGINT) AS fp
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats)
      SELECT doc_id, CAST(count(*) AS INT) AS n_terms_matched,
        CAST(sum(fp) AS BIGINT) AS score_fp
      FROM scored GROUP BY doc_id ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q53
  /** q53 — SEMANTIC near-dup clusters: the dedup decision (q31) lifted
    * from lexical MinHash pairs to embedding-space RP-LSH pairs at a
    * tight 0.6 cosine — "same meaning, different words" duplicates
    * that no shingle method can see. Same min-id label propagation,
    * same recursive-CTE oracle, base set = ALL vectors (zero-norm
    * vectors cluster as singletons). */
  val q53: Q = Q(
    "q53_semantic_clusters",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val pairs = Similarity.rpLshCosinePairs(emb, threshold = 0.6,
        planes = rpPlanes)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      Dedup.nearDupClusters(emb, "vec_id", pairs)
        .select(col("doc_id").as("vec_id"),
          col("cluster_id"), col("is_canonical"))
    },
    Some(s"""
      WITH RECURSIVE pairs AS (
        SELECT vec_a, vec_b FROM (${q30OracleSqlAt(0.6)}) q
      ),
      edges AS (
        SELECT vec_a AS src, vec_b AS dst FROM pairs
        UNION ALL
        SELECT vec_b AS src, vec_a AS dst FROM pairs
      ),
      reach(id, r) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
      )
      SELECT id AS vec_id, min(r) AS cluster_id,
        (id = min(r)) AS is_canonical
      FROM reach GROUP BY id ORDER BY vec_id
    """.trim))

  // ---------------------------------------------------------------- q55
  /** q55 — int8 scalar quantization of the embedding store (the 4×
    * compression rung below any PQ/IVF structure): per-dimension
    * min/max partial-aggregated then BROADCAST back, codes and
    * fixed-point reconstruction errors computed row-locally with
    * pinned IEEE parenthesization. Output is the long-form
    * verification surface. */
  val q55: Q = Q(
    "q55_embedding_quantize",
    (s, d) => Quantize.int8Codes(Tables.embeddings(s, d)),
    Some("""
      WITH xs AS (
        SELECT vec_id, CAST(p - 1 AS INT) AS pos,
          CAST(embedding[p] AS DOUBLE) AS x
        FROM embeddings, LATERAL unnest(
          range(1, len(embedding) + 1)) AS t(p)),
      st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM xs GROUP BY pos),
      c AS (
        SELECT vec_id, xs.pos, x, mn, mx,
          CAST(CASE WHEN mx > mn
            THEN least(floor(((x - mn) * 255.0) / (mx - mn)), 255.0)
            ELSE 0.0 END AS INT) AS code
        FROM xs JOIN st ON xs.pos = st.pos)
      SELECT vec_id, pos, code,
        CAST(floor(
          ((x - (mn + (CAST(code AS DOUBLE) * (mx - mn)) / 255.0)) *
           (x - (mn + (CAST(code AS DOUBLE) * (mx - mn)) / 255.0)))
          * 1048576.0) AS BIGINT) AS err_fp
      FROM c ORDER BY vec_id, pos
    """.trim))

  // ---------------------------------------------------------------- q56
  /** q56 — product quantization (the IVF-PQ encoding rung): m=8
    * subvectors × k=8 per-subspace centroids, trained by the
    * deterministic hash-seeded k-means scheme with one fixed-point
    * refinement pass; row-local assignment over one broadcast
    * centroids row per subspace. Codes keep their seed vec_id as
    * identity. */
  val q56: Q = Q(
    "q56_pq_codes",
    (s, d) => Quantize.pqCodes(Tables.embeddings(s, d), m = 8, k = 8),
    Some(q56OracleSql))

  // ---------------------------------------------------------------- q57
  /** q57 — PQ-ADC approximate top-k search (q56's query path; the
    * approximate sibling of exact q20): per query an (m·k)-entry
    * partial-distance table, broadcast onto the codes frame, summed as
    * 2^-20-grid longs per candidate (order-independent), per-query
    * top-k via WindowGroupLimit. O(m) per candidate instead of
    * O(dim). */
  val q57: Q = Q(
    "q57_pq_adc_topk",
    (s, d) => Quantize.pqTopK(Tables.embeddings(s, d), m = 8, k = 8,
      topK = 5, queryStride = 50),
    Some(q57OracleSql))

  // ---------------------------------------------------------------- q61
  /** q61 — IVF-PQ top-k (the full FAISS-layout composition): coarse
    * whole-vector cells (the PQ training core with m=1, C=⌈√N⌉)
    * restrict each query to its 2 nearest cells; only in-cell
    * candidates pay the O(m) ADC scoring. probes·(N/C)·m work per
    * query vs q57's N·m vs q20's N·dim — three rungs of one ladder,
    * all oracle-replayed. */
  val q61: Q = Q(
    "q61_ivfpq_topk",
    (s, d) => Quantize.ivfPqTopK(Tables.embeddings(s, d), m = 8, k = 8,
      probes = 2, topK = 5, queryStride = 50),
    Some(q61OracleSql))

  // ---------------------------------------------------------------- q84
  /** q84 — inverted-index posting lists over hashed 3-gram shingles
    * (the n-gram contamination/plagiarism lookup index — q17/q36
    * re-derive this stream per run; a serving system reads it from
    * this artifact): every shingle shared by ≥ 2 docs but at most
    * HALF the corpus (a fractional stopword cap — the rule means the
    * same thing at every corpus size), with its sorted posting list.
    * The band filter runs on the df AGGREGATE before any list
    * collects, so boilerplate-scale postings never materialize; the
    * output stringifies the sorted lists (scalar columns hash-verify;
    * arrays don't sort portably in the compare harness). */
  val q84: Q = Q(
    "q84_posting_lists",
    (s, d) =>
      Retrieval.postingLists(Tables.documents(s, d), "doc_id",
          graft.functions.TextHash.shingleHashesOf(col("text")), minDf = 2L)
        .select(col("term").as("shingle"), col("df"),
          expr("array_join(transform(postings, x -> cast(x AS string)), ',')")
            .as("postings"))
        .orderBy(col("shingle")),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      nd AS (SELECT count(*) AS n FROM documents),
      d AS (
        SELECT hs, count(*) AS df FROM sh GROUP BY hs
        HAVING count(*) >= 2 AND count(*) * 2 <= (SELECT n FROM nd))
      SELECT d.hs AS shingle, d.df,
        string_agg(CAST(sh.doc_id AS VARCHAR), ',' ORDER BY sh.doc_id)
          AS postings
      FROM d JOIN sh ON d.hs = sh.hs
      GROUP BY 1, 2
      ORDER BY 1
    """.trim))

  // ---------------------------------------------------------------- q96
  /** q96 — embedding-distribution drift: [[Drift.histogramDrift]] over
    * RP-LSH signature buckets ([[Similarity.rpSignatures]] — row-local
    * integer signatures, no training, already oracle-replayable). The
    * monitoring question is "did the EMBEDDING distribution shift
    * between snapshots" (an encoder change, a domain shift) — raw
    * float centroids can't hash-verify, but signature HISTOGRAMS are
    * exact integers, so the drift score is engine-exact. Width 1 makes
    * each signature its own bucket. */
  val q96: Q = Q(
    "q96_embedding_drift",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      def sigs(side: org.apache.spark.sql.Column) =
        Similarity.rpSignatures(e.where(side), rpPlanes)
          .select(col("sig"))
      Drift.histogramDrift(sigs(col("vec_id") % 2 === 0),
        sigs(col("vec_id") % 2 =!= 0), "sig", 1.0)
    },
    Some(s"""
      WITH $duckRpSigCtes,
      oc AS (SELECT sig AS bucket, count(*) AS c_old FROM sigs
             WHERE vec_id % 2 = 0 GROUP BY 1),
      nc AS (SELECT sig AS bucket, count(*) AS c_new FROM sigs
             WHERE vec_id % 2 <> 0 GROUP BY 1),
      j AS (
        SELECT COALESCE(oc.bucket, nc.bucket) AS bucket,
          COALESCE(c_old, 0) AS c_old, COALESCE(c_new, 0) AS c_new
        FROM oc FULL JOIN nc ON oc.bucket = nc.bucket),
      t AS (SELECT sum(c_old) AS n_old, sum(c_new) AS n_new FROM j)
      SELECT CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
        count(*) AS n_buckets,
        CAST((sum(abs(c_new * n_old - c_old * n_new)) * 1048576)
          // (n_old * n_new) AS BIGINT) AS drift_fp
      FROM j, t GROUP BY n_old, n_new
    """.trim))

  // ---------------------------------------------------------------- q98
  /** q98 — label centroid affinity
    * ([[Similarity.labelCentroidAffinity]]): pairwise cosine between
    * per-label embedding centroids — the embedding-space sibling of
    * q91's shingle source-overlap matrix. Exact fixed-point coordinate
    * sums (the 1/n mean factors cancel under cosine's scale
    * invariance), DECIMAL(38,0) dot/norm folds, and a final
    * cast/sqrt/divide both engines replay bit-for-bit. */
  val q98: Q = Q(
    "q98_label_affinity",
    (s, d) =>
      Similarity.labelCentroidAffinity(Tables.embeddings(s, d)),
    Some("""
      WITH xs AS (
        SELECT label AS lbl, CAST(p - 1 AS INT) AS pos,
          CAST(floor(CAST(embedding[p] AS DOUBLE) * 1048576.0) AS BIGINT) AS f
        FROM embeddings, LATERAL unnest(
          range(1, len(embedding) + 1)) AS t(p)),
      cent AS (SELECT lbl, pos, CAST(sum(f) AS BIGINT) AS fs
               FROM xs GROUP BY 1, 2),
      sizes AS (SELECT label AS lbl, count(*) AS n FROM embeddings GROUP BY 1),
      norms AS (SELECT lbl, sum(fs::HUGEINT * fs::HUGEINT) AS nrm
                FROM cent GROUP BY 1),
      pair AS (
        SELECT a.lbl la, b.lbl lb,
          sum(a.fs::HUGEINT * b.fs::HUGEINT) AS dot
        FROM cent a JOIN cent b ON a.pos = b.pos AND a.lbl < b.lbl
        GROUP BY 1, 2)
      SELECT la AS label_a, lb AS label_b, sa.n AS n_a, sb.n AS n_b,
        CAST(dot AS DOUBLE) /
          sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) AS cosine
      FROM pair
      JOIN norms na ON na.lbl = la
      JOIN norms nb ON nb.lbl = lb
      JOIN sizes sa ON sa.lbl = la
      JOIN sizes sb ON sb.lbl = lb
      ORDER BY label_a, label_b
    """.trim))

  // --------------------------------------------------------------- q106
  /** q106 — hard-negative mining ([[Similarity.hardNegatives]]): for
    * each anchor, the k nearest DIFFERENT-label vectors — the
    * contrastive-training staple. q20's exact brute-force rung with
    * the label-exclusion predicate (BNLJ by design, documented in the
    * sweep); the at-scale route is the frozen PQ index with a
    * post-retrieval label filter. */
  val q106: Q = Q(
    "q106_hard_negatives",
    (s, d) =>
      Similarity.hardNegatives(Tables.embeddings(s, d), k = 5,
        queryStride = 50),
    Some("""
      WITH e AS (
        SELECT vec_id, label, list_transform(embedding,
          x -> CAST(x AS DOUBLE)) v
        FROM embeddings),
      n0 AS (
        SELECT vec_id, label, v,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
        FROM e),
      n AS (SELECT * FROM n0 WHERE nrm > 0),
      q AS (SELECT vec_id query_id, label query_label, v qv, nrm qn
            FROM n WHERE vec_id % 50 = 0),
      s AS (
        SELECT query_id, query_label, c.vec_id neighbor_id,
          c.label neighbor_label,
          (list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])),
             (x, y) -> x + y) / (qn * c.nrm)) AS cosine
        FROM q, n c WHERE c.label <> query_label)
      SELECT query_id, query_label, neighbor_id, neighbor_label,
        CAST(rank AS INT) AS rank, cosine FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rank
        FROM s) t
      WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  // --------------------------------------------------------------- q107
  /** q107 — intra-label diversity ([[Similarity.intraLabelDiversity]]):
    * mean pairwise cosine INSIDE each label via the sum identity
    * `Σ_{i≠j}⟨vᵢ,vⱼ⟩ = ‖Σv‖² − Σ‖v‖²` — no pairwise join anywhere,
    * which is what makes "how collapsed is this slice" computable at
    * corpus scale. Normalized coordinates are floored to fixed-point
    * longs, so both sums are exact integers. */
  val q107: Q = Q(
    "q107_intra_label_diversity",
    (s, d) =>
      Similarity.intraLabelDiversity(Tables.embeddings(s, d)),
    Some("""
      WITH e AS (
        SELECT label AS lbl, list_transform(embedding,
          x -> CAST(x AS DOUBLE)) v
        FROM embeddings),
      n0 AS (
        SELECT lbl, v,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
        FROM e),
      fv AS (
        SELECT lbl, list_transform(v,
          x -> CAST(floor(x / nrm * 1048576.0) AS BIGINT)) fv
        FROM n0 WHERE nrm > 0),
      coords AS (
        SELECT lbl, p - 1 AS pos, fv[p] AS f
        FROM fv, LATERAL unnest(range(1, len(fv) + 1)) AS t(p)),
      perdim AS (
        SELECT lbl, pos, CAST(sum(f) AS BIGINT) s
        FROM coords GROUP BY 1, 2),
      sumsq AS (
        SELECT lbl, sum(s::HUGEINT * s) sum_sq FROM perdim GROUP BY 1),
      self AS (
        SELECT lbl,
          sum(list_reduce(list_prepend(CAST(0 AS HUGEINT),
            list_transform(fv, e -> CAST(e AS HUGEINT) * e)),
            (a, b) -> a + b)) self_sq,
          count(*) n_vectors
        FROM fv GROUP BY 1 HAVING count(*) >= 2)
      SELECT lbl AS label, CAST(n_vectors AS BIGINT) AS n_vectors,
        (CAST(sum_sq - self_sq AS DOUBLE) /
          CAST(n_vectors * (n_vectors - 1) AS DOUBLE))
          / 1099511627776.0 AS mean_pair_cosine,
        1.0 - ((CAST(sum_sq - self_sq AS DOUBLE) /
          CAST(n_vectors * (n_vectors - 1) AS DOUBLE))
          / 1099511627776.0) AS diversity
      FROM sumsq JOIN self USING (lbl) ORDER BY label
    """.trim))

  // --------------------------------------------------------------- q113
  /** q113 — semantic eval-overlap decontamination
    * ([[Similarity.semanticOverlap]]): flag train vectors whose cosine
    * against any eval vector (here the `vec_id % 100 = 0` holdout)
    * reaches 0.2 — the paraphrase-leakage rung the n-gram gates
    * (q36/q49/q76/q101) cannot see. Eval side broadcasts whole
    * (benchmarks are small by nature); BNLJ by design, the q20/q106
    * sweep exception; the fold-ordered q20 doubles make the threshold
    * and rank engine-exact. */
  val q113: Q = Q(
    "q113_semantic_decontam",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.semanticOverlap(
        emb.where(col("vec_id") % 100 =!= 0),
        emb.where(col("vec_id") % 100 === 0), threshold = 0.2)
    },
    Some("""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        FROM embeddings),
      n0 AS (
        SELECT vec_id, v,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
        FROM e),
      n AS (SELECT * FROM n0 WHERE nrm > 0),
      ev AS (SELECT vec_id eval_id, v ev, nrm en FROM n
        WHERE vec_id % 100 = 0),
      tr AS (SELECT vec_id train_id, v tv, nrm tn FROM n
        WHERE vec_id % 100 <> 0),
      hits AS (
        SELECT * FROM (
          SELECT train_id, eval_id,
            (list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(range(1, len(tv) + 1), i -> tv[i] * ev[i])),
               (x, y) -> x + y) / (tn * en)) AS cosine
          FROM tr, ev) s0
        WHERE cosine >= 0.2e0)
      SELECT train_id,
        CAST(n_eval_hits AS BIGINT) AS n_eval_hits,
        eval_id AS top_eval_id, cosine AS top_cosine
      FROM (
        SELECT train_id, eval_id, cosine,
          row_number() OVER (PARTITION BY train_id
            ORDER BY cosine DESC, eval_id) rnk,
          count(*) OVER (PARTITION BY train_id) n_eval_hits
        FROM hits) t
      WHERE rnk = 1
      ORDER BY train_id
    """.trim))

  // --------------------------------------------------------------- q114
  /** q114 — nearest-centroid confusion matrix
    * ([[Similarity.nearestCentroidConfusion]]): classify every vector
    * to its nearest label centroid by cosine, cross-tabulate
    * (true, predicted, n) — the member-level complement of q98's
    * centroid-pair affinity. Deterministic throughout: fixed-point
    * centroid sums (q21's quantizer discipline) and the
    * `struct(-affinity, label)` row-local argmin the oracle replays
    * as `row_number() OVER (ORDER BY affinity DESC, label)`. */
  val q114: Q = Q(
    "q114_centroid_confusion",
    (s, d) =>
      Similarity.nearestCentroidConfusion(Tables.embeddings(s, d)),
    Some("""
      WITH e AS (
        SELECT vec_id, label AS lbl,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        FROM embeddings WHERE label IS NOT NULL),
      n0 AS (
        SELECT vec_id, lbl, v,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
        FROM e),
      n AS (SELECT * FROM n0 WHERE nrm > 0),
      dims AS (
        SELECT lbl, u.d d, u.f f FROM (
          SELECT lbl, unnest(list_transform(range(1, len(v) + 1),
            i -> {'d': i,
              'f': CAST(floor(v[i] * 1048576.0) AS BIGINT)})) u
          FROM n) t),
      cd AS (
        SELECT lbl, d, sum(f) fs, count(*) cnt
        FROM dims GROUP BY 1, 2),
      c1 AS (
        SELECT lbl cent_lbl,
          list(CAST(fs AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1048576.0)
            ORDER BY d) cv
        FROM cd GROUP BY 1),
      c2 AS (
        SELECT cent_lbl, cv,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(cv, x -> x * x)), (a, b) -> a + b)) cn
        FROM c1),
      c3 AS (SELECT * FROM c2 WHERE cn > 0),
      assign AS (
        SELECT lbl, pred FROM (
          SELECT n.lbl, c.cent_lbl pred,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY
              (list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(n.v) + 1),
                   i -> n.v[i] * c.cv[i])),
                 (x, y) -> x + y) / (n.nrm * c.cn)) DESC,
              c.cent_lbl) rnk
          FROM n, c3 c) t
        WHERE rnk = 1)
      SELECT lbl AS true_label, pred AS predicted_label,
        CAST(count(*) AS BIGINT) AS n
      FROM assign GROUP BY 1, 2 ORDER BY true_label, predicted_label
    """.trim))

  // --------------------------------------------------------------- q123
  /** q123 — hybrid retrieval with reciprocal-rank fusion
    * ([[Retrieval.rrfFuse]]): for each stride query doc, fuse its
    * SEMANTIC ranking (q20's exact cosine top-10) with its LEXICAL
    * ranking (shingle-Jaccard top-10 via the q36 inverted index,
    * self-match excluded) by `Σ 1/(60 + rank)` — the modern
    * lexical+semantic search stack's default merge. Fusion cost is
    * rank-based and corpus-size-independent; both upstream rankings
    * reuse their operators' plans unchanged. The oracle replays all
    * three stages from the shared fragments. */
  val q123: Q = Q(
    "q123_hybrid_rrf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d)
      val sem = Similarity.cosineTopK(emb, k = 10, queryStride = 100)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      val queries = docs.where(col("doc_id") % 100 === 0)
      val lex = Dedup.crossNgramJaccardPairs(queries, docs, "doc_id",
          "text", threshold = 0.0, maxDf = 100)
        .where(col("left_id") =!= col("right_id"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("left_id"))
            .orderBy(col("jaccard").desc, col("right_id"))))
        .where(col("rank") <= 10)
        .select(col("left_id").as("query_id"),
          col("right_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(sem, lex, k = 60, topK = 10)
    },
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      hot AS (
        SELECT hs FROM (
          SELECT doc_id, hs FROM sh WHERE doc_id % 100 = 0
          UNION ALL SELECT doc_id, hs FROM sh) u
        GROUP BY hs HAVING count(*) > 100),
      qa AS (
        SELECT doc_id, hs FROM sh
        WHERE doc_id % 100 = 0 AND hs NOT IN (SELECT hs FROM hot)),
      cb AS (
        SELECT doc_id, hs FROM sh
        WHERE hs NOT IN (SELECT hs FROM hot)),
      sza AS (SELECT doc_id, count(*) n FROM qa GROUP BY doc_id),
      szb AS (SELECT doc_id, count(*) n FROM cb GROUP BY doc_id),
      inter AS (
        SELECT qa.doc_id da, cb.doc_id db, count(*) i
        FROM qa JOIN cb USING (hs) GROUP BY 1, 2),
      jac AS (
        SELECT da, db,
          (CAST(i AS DOUBLE) / (sza.n + szb.n - i)) AS jaccard
        FROM inter
        JOIN sza ON sza.doc_id = da
        JOIN szb ON szb.doc_id = db
        WHERE da <> db),
      lex AS (
        SELECT da AS query_id, db AS doc_id, rnk AS rank_b FROM (
          SELECT da, db, row_number() OVER (PARTITION BY da
            ORDER BY jaccard DESC, db) rnk
          FROM jac) t
        WHERE rnk <= 10),
      e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        FROM embeddings),
      n0 AS (
        SELECT vec_id, v,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
        FROM e),
      nn AS (SELECT * FROM n0 WHERE nrm > 0),
      q AS (SELECT vec_id query_id, v qv, nrm qn FROM nn
        WHERE vec_id % 100 = 0),
      sc AS (
        SELECT query_id, c.vec_id doc_id,
          (list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])),
             (x, y) -> x + y) / (qn * c.nrm)) AS cosine
        FROM q, nn c WHERE c.vec_id <> query_id),
      sem AS (
        SELECT query_id, doc_id, rnk AS rank_a FROM (
          SELECT query_id, doc_id, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, doc_id) rnk
          FROM sc) t
        WHERE rnk <= 10),
      fused AS (
        SELECT COALESCE(sem.query_id, lex.query_id) query_id,
          COALESCE(sem.doc_id, lex.doc_id) doc_id,
          CAST(sem.rank_a AS INT) rank_a, CAST(lex.rank_b AS INT) rank_b,
          (COALESCE(1.0e0 / (60 + sem.rank_a), 0.0e0) +
           COALESCE(1.0e0 / (60 + lex.rank_b), 0.0e0)) AS rrf_score
        FROM sem FULL OUTER JOIN lex
          ON sem.query_id = lex.query_id AND sem.doc_id = lex.doc_id)
      SELECT query_id, doc_id, CAST(rnk AS INT) AS rank, rrf_score,
        rank_a, rank_b
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY rrf_score DESC, doc_id) rnk
        FROM fused) t
      WHERE rnk <= 10
      ORDER BY query_id, rank
    """.trim))

  // --------------------------------------------------------------- q125
  /** q125 — embedding health audit ([[Similarity.embeddingHealth]]):
    * per label, NULL / NaN / zero-norm / ragged-dimension counts and
    * the fixed-point mean L2 norm — the pre-flight that says how many
    * rows the ANN ladder's zero-norm drop contract will discard and
    * whether an encoder mix poisoned a slice. One partial-aggregated
    * pass; the norm mean sums 2^-20 longs, never doubles. */
  val q125: Q = Q(
    "q125_embedding_health",
    (s, d) =>
      Similarity.embeddingHealth(Tables.embeddings(s, d)),
    Some("""
      WITH e AS (
        SELECT label, embedding,
          (embedding IS NULL) AS is_null,
          (embedding IS NOT NULL AND len(list_filter(embedding,
             x -> isnan(CAST(x AS DOUBLE)))) > 0) AS has_nan
        FROM embeddings),
      n AS (
        SELECT label, is_null, has_nan,
          (NOT is_null AND NOT has_nan) AS clean,
          CASE WHEN NOT is_null AND NOT has_nan THEN
            sqrt(list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (a, b) -> a + b)) END AS nrm,
          CASE WHEN NOT is_null AND NOT has_nan
            THEN CAST(len(embedding) AS INT) END AS dim
        FROM e)
      SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null,
        CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT)
          AS n_nan,
        CAST(sum(CASE WHEN clean AND nrm = 0.0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_zero,
        min(dim) AS dim_min, max(dim) AS dim_max,
        CASE WHEN sum(CASE WHEN clean THEN 1 ELSE 0 END) > 0 THEN
          (CAST(sum(CASE WHEN clean
              THEN CAST(floor(nrm * 1048576.0) AS BIGINT) END)
            AS DOUBLE) /
           CAST(sum(CASE WHEN clean THEN 1 ELSE 0 END) AS DOUBLE))
          / 1048576.0 END AS mean_norm
      FROM n GROUP BY label ORDER BY label NULLS FIRST
    """.trim))

  // --------------------------------------------------------------- q129
  /** q129 — ANN recall@5 ([[Similarity.topKRecall]]): per query, the
    * fraction of q20's exact top-5 the q39 IVF-probed index recovers —
    * the number that justifies an approximate index in production and
    * re-measures after every maintenance cycle. The oracle replays
    * BOTH rankings (the shared quantizer + ivf5 fragments and the q20
    * exact ranking) and joins them, so index quality itself is under
    * the correctness gate. */
  val q129: Q = Q(
    "q129_ann_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.topKRecall(
        Similarity.cosineTopK(emb, k = 5, queryStride = 50),
        Similarity.ivfTopK(emb, k = 5, queryStride = 50, probes = 4,
          kmeansIters = 1))
    },
    Some(s"""
      WITH $duckIvfQuantizer,
      $duckIvfTopK5,
      exact AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id query_id, c.vec_id neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id ORDER BY
              (list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(q.v) + 1),
                   i -> q.v[i] * c.v[i])),
                 (x, y) -> x + y) / (q.nrm * c.nrm)) DESC, c.vec_id) rnk
          FROM n q, n c
          WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id) t
        WHERE rnk <= 5)
      SELECT e.query_id,
        CAST(count(*) AS BIGINT) AS n_ref,
        CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_hit,
        CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
      FROM exact e LEFT JOIN ivf5 i
        ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
      GROUP BY e.query_id ORDER BY e.query_id
    """.trim))

  // --------------------------------------------------------------- q226
  /** q226 — label-relevance retrieval eval ([[Similarity.labelMrr]]):
    * the user-facing half of q129 — per IVF query, how many same-label
    * results surfaced, the first relevant rank, and its reciprocal
    * (MRR's per-query term; 0 when none). Relevance is null-safe
    * label equality; the oracle reuses the shared ivf5 CTE. */
  val q226: Q = Q(
    "q226_search_mrr",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.labelMrr(
        Similarity.ivfTopK(emb, k = 5, queryStride = 50, probes = 4,
          kmeansIters = 1),
        emb, "vec_id", "label")
    },
    Some(s"""
      WITH $duckIvfQuantizer,
      $duckIvfTopK5,
      lab AS (SELECT vec_id, label FROM embeddings),
      j AS (
        SELECT i.query_id, i.rank,
          (ql.label IS NOT DISTINCT FROM nl.label) AS rel
        FROM ivf5 i
        JOIN lab ql ON ql.vec_id = i.query_id
        JOIN lab nl ON nl.vec_id = i.neighbor_id)
      SELECT query_id,
        CAST(count(*) AS BIGINT) AS n_results,
        CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
          AS n_relevant,
        CAST(min(CASE WHEN rel THEN rank END) AS INT)
          AS first_rel_rank,
        CASE WHEN min(CASE WHEN rel THEN rank END) IS NOT NULL THEN
          1.0 / CAST(min(CASE WHEN rel THEN rank END) AS DOUBLE)
        ELSE 0.0 END AS reciprocal_rank
      FROM j GROUP BY query_id ORDER BY query_id
    """.trim))

  // --------------------------------------------------------------- q140
  /** q140 — IVF cell-balance report ([[Similarity.cellBalance]]): per
    * refined coarse cell, population, corpus share, and fixed-point
    * mean / raw min member-to-centroid cosine — the index-health gauge
    * under q129's recall number (population skew = probe tail latency;
    * low affinity = codebook drift, retraining due). The oracle
    * replays the shared quantizer CTE. */
  val q140: Q = Q(
    "q140_ivf_cell_balance",
    (s, d) =>
      Similarity.cellBalance(Tables.embeddings(s, d), kmeansIters = 1),
    Some(s"""
      WITH $duckIvfQuantizer,
      bal AS (
        SELECT cell, vec_id, aff FROM (
          SELECT c.cent_id cell, n.vec_id,
            (list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(range(1, len(n.v) + 1),
                 i -> n.v[i] * c.cv[i])),
               (x, y) -> x + y) / (n.nrm * c.cn)) aff,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY
              (list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(n.v) + 1),
                   i -> n.v[i] * c.cv[i])),
                 (x, y) -> x + y) / (n.nrm * c.cn)) DESC,
              c.cent_id) probe
          FROM n, c3 c) t
        WHERE probe = 1),
      agg AS (
        SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
          sum(CAST(floor(aff * 1048576.0) AS HUGEINT)) AS sfp,
          min(aff) AS min_affinity
        FROM bal GROUP BY 1)
      SELECT cell, n_vectors,
        CAST(n_vectors AS DOUBLE) /
          CAST(sum(n_vectors) OVER () AS DOUBLE) AS share,
        CAST(sfp AS DOUBLE) / (CAST(n_vectors AS DOUBLE) * 1048576.0)
          AS mean_affinity,
        min_affinity
      FROM agg ORDER BY cell
    """.trim))

  // --------------------------------------------------------------- q142
  /** q142 — embedding duplicate report
    * ([[Similarity.embeddingDupReport]]): per label, vectors vs
    * distinct vectors by exact float-array equality — the encoder-
    * cache-bug / re-ingest / default-vector detector (q130's dedup
    * impact lifted to vector space); near-dup stays q30/q21's job. */
  val q142: Q = Q(
    "q142_embedding_dups",
    (s, d) => Similarity.embeddingDupReport(Tables.embeddings(s, d),
      "label"),
    Some("""
      SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        CAST(count(DISTINCT embedding) AS BIGINT) AS n_distinct,
        CAST(count(*) - count(DISTINCT embedding) AS BIGINT) AS n_dupes,
        CAST(count(*) - count(DISTINCT embedding) AS DOUBLE) /
          CAST(count(*) AS DOUBLE) AS dup_rate
      FROM embeddings GROUP BY label ORDER BY label
    """.trim))

  // --------------------------------------------------------------- q179
  /** q179 — TF-IDF keywords ([[Retrieval.tfIdfKeywords]]): top-3
    * terms per document by tf × log-free fixed-point reciprocal idf
    * (the q52/q97 no-transcendentals rule) — the per-doc "what is
    * this about" readout; ties pinned (score DESC, term ASC). */
  val q179: Q = Q(
    "q179_tfidf_keywords",
    (s, d) =>
      Retrieval.tfIdfKeywords(Tables.documents(s, d), "doc_id", "text",
        k = 3),
    Some(s"""
      WITH $duckWords,
      t AS (SELECT doc_id, unnest(w) AS term FROM words),
      tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM t GROUP BY 1, 2),
      dfq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      sc AS (
        SELECT doc_id, term, tf, df,
          CAST(tf AS HUGEINT) * (((n + 1) * 1048576) // (df + 1))
            AS score_fp
        FROM tf JOIN dfq USING (term), n),
      r AS (
        SELECT doc_id, term, tf, df, score_fp,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score_fp DESC, term) AS kw_rank
        FROM sc)
      SELECT doc_id, term, tf, df, CAST(score_fp AS DOUBLE) AS score,
        CAST(kw_rank AS INT) AS kw_rank
      FROM r WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank
    """.trim))

  // --------------------------------------------------------------- q244
  /** q244 — background cosine calibration
    * ([[Similarity.backgroundCosine]]): the noise floor every ANN
    * threshold stands on — 64 hash-sampled vectors, all pairs, the
    * pair-count distribution over fixed cosine bands. q222 asks this
    * of the shingle space; this asks it of the embedding space, where
    * a fat top band means anisotropy and no separating threshold.
    * Zero shuffle by design (broadcast K² pairs); the pinned-order
    * dot fold makes every band edge replay exactly. */
  val q244: Q = Q(
    "q244_background_cosine",
    (s, d) =>
      Similarity.backgroundCosine(Tables.embeddings(s, d), sampleK = 64),
    Some("""
      WITH e AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        FROM embeddings),
      n0 AS (
        SELECT vec_id, v,
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
        FROM e),
      n AS (SELECT * FROM n0 WHERE nrm > 0),
      smp AS (
        SELECT vec_id, v, nrm FROM n
        ORDER BY ((vec_id % 1000000007) * 2654435761 % 1000000007
          + 12345) % 1000000007, vec_id
        LIMIT 64),
      pr AS (
        SELECT (list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(range(1, len(a.v) + 1),
              i -> a.v[i] * b.v[i])),
            (x, y) -> x + y) / (a.nrm * b.nrm)) AS cosine
        FROM smp a JOIN smp b ON a.vec_id < b.vec_id),
      banded AS (
        SELECT CASE WHEN cosine <= -0.25 THEN 0
                    WHEN cosine <= 0.0 THEN 1
                    WHEN cosine <= 0.25 THEN 2
                    WHEN cosine <= 0.5 THEN 3
                    WHEN cosine <= 0.75 THEN 4
                    ELSE 5 END AS band_id
        FROM pr),
      counts AS (
        SELECT band_id, CAST(count(*) AS BIGINT) AS n_pairs
        FROM banded GROUP BY 1),
      tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n_total FROM counts)
      SELECT band_id,
        CASE band_id WHEN 0 THEN 'le_m025' WHEN 1 THEN 'le_0'
          WHEN 2 THEN 'le_025' WHEN 3 THEN 'le_05'
          WHEN 4 THEN 'le_075' ELSE 'gt_075' END AS band,
        n_pairs,
        CAST(n_pairs AS DOUBLE) / CAST(n_total AS DOUBLE) AS pair_frac
      FROM counts, tot ORDER BY band_id
    """.trim))
}
