package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** EXT — the LLM-training-data-pipeline operators (SURVEY.md §2.11;
  * BASELINE.json north star) over the `documents` / `embeddings`
  * fixtures: dedup (exact, n-gram Jaccard, MinHash-LSH, SimHash),
  * embedding similarity (brute-force top-k, bucketed near-dup), text
  * analysis (language-ID, quality, token stats, fingerprints) and
  * multimodal column plumbing.
  *
  * Every query has a full DuckDB oracle — including MinHash-LSH and
  * SimHash, which are usually "unverifiable": the portable arithmetic
  * hashes in [[graft.functions.TextHash]] make the whole pipeline
  * reproducible bit-for-bit in any engine with list lambdas, so the
  * oracle replays signature building, banding, candidate generation and
  * verification and must land on the identical pair set.
  *
  * Oracle type discipline (learned from the driver's exact compare):
  * Spark `size`/`length`/`row_number`/`bit_count` are INT32 while
  * DuckDB's are INT64 — every such column is cast explicitly on the
  * DuckDB side; doubles come only from order-pinned folds or single
  * divisions of exact integers.
  */
object Ext {

  private val P = graft.functions.TextHash.P // 1000000007

  /** `events` with `ts_us` (BIGINT µs since epoch) appended — the
    * encoding-adaptive [[Tables.tsUs]] form every temporal query keys
    * on, so µs gap/tolerance/interval arithmetic stays integer-exact
    * whichever way the fixture encodes `ts`. */
  private def eventsUs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = Tables.events(s, d)
    e.withColumn("ts_us", Tables.tsUs(e))
  }

  /** DuckDB fragment: tokens array per doc (mirrors TextHash.tokens). */
  private val duckWords =
    """words AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') w
      |  FROM documents
      |)""".stripMargin

  /** DuckDB fragment: per-token char-fold hashes (mirrors
    * TextHash.tokenHashes). */
  private val duckTokenHashes =
    s"""wh AS (
      |  SELECT doc_id, len(w) n_tokens, list_transform(w, t ->
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, length(t) + 1), j -> ascii(t[j]))),
      |      (h, c) -> ((h * 31) + c) % $P)) whl
      |  FROM words WHERE len(w) >= 3
      |)""".stripMargin

  /** DuckDB fragment: distinct hashed 3-gram shingles per doc (mirrors
    * TextHash.shingleHashes; 1-based DuckDB indexing). */
  private val duckHashShingles =
    s"""sh AS (
      |  SELECT DISTINCT doc_id, hs
      |  FROM wh, LATERAL unnest(list_transform(range(1, len(whl) - 1),
      |    i -> ((((((whl[i] * 31) + whl[i+1]) % $P) * 31) + whl[i+2]) % $P))) AS t(hs)
      |)""".stripMargin

  // ---------------------------------------------------------------- q16

  val q16: Q = Q(
    "q16_exact_dedup",
    (s, d) => Dedup.exact(Tables.documents(s, d), "doc_id", "text"),
    Some("""
      SELECT sha256(text) AS content_hash,
        min(sha256(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash,
        min(doc_id) AS keep_id,
        count(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY keep_id
    """.trim))

  // ---------------------------------------------------------------- q17

  /** q17 oracle mirrors the hashed inverted index (r2 verdict item 5):
    * shingle hashes, the maxDf hot-shingle cap, and the intersection
    * counts all replay on the same portable hashes, so the pair set —
    * including any deterministic hash collisions — is identical. */
  val q17: Q = Q(
    "q17_ngram_jaccard_neardup",
    (s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.5, maxDf = 100),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      shf AS (
        SELECT doc_id, hs FROM sh
        QUALIFY count(*) OVER (PARTITION BY hs) <= 100
      ),
      sz AS (SELECT doc_id, count(*) n FROM shf GROUP BY 1),
      inter AS (
        SELECT a.doc_id da, b.doc_id db, count(*) i
        FROM shf a JOIN shf b ON a.hs = b.hs AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT da AS doc_a, db AS doc_b, i AS n_common,
        (sa.n + sb.n - i) AS n_union,
        (CAST(i AS DOUBLE) / (sa.n + sb.n - i)) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = da
      JOIN sz sb ON sb.doc_id = db
      WHERE (CAST(i AS DOUBLE) / (sa.n + sb.n - i)) >= 0.5
      ORDER BY doc_a, doc_b
    """.trim),
    headline = true)

  // ---------------------------------------------------------------- q18

  private val minhashK = 16
  private val minhashBands = 4

  /** DuckDB fragment: minhash band CANDIDATES over the `sh` shingle
    * frame (mirrors Dedup.minhashLshPairs' banding) — shared by q18
    * and the q144 operating-point evaluation. */
  private def duckMinhashCand: String = {
    val rows = minhashK / minhashBands
    val mhCols = (0 until minhashK).map(i =>
      s"min((${2 * i + 1} * hs + ${1000003 * i + 12345}) % $P) AS mh$i")
      .mkString(",\n        ")
    val bandSigs = (0 until minhashBands).map(b =>
      "concat_ws('|', " +
        (0 until rows).map(r => s"mh${b * rows + r}").mkString(", ") +
        s") AS sig$b").mkString(",\n        ")
    val bandRows = (0 until minhashBands).map(b =>
      s"SELECT doc_id, $b AS band, sig$b AS sig FROM sigs2")
      .mkString(" UNION ALL ")
    s"""sigs AS (
      SELECT doc_id,
        $mhCols
        FROM sh GROUP BY doc_id
      ),
      sigs2 AS (
        SELECT doc_id,
        $bandSigs
        FROM sigs
      ),
      bands AS ($bandRows),
      cand AS (
        SELECT DISTINCT a.doc_id da, b.doc_id db
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
          AND a.doc_id < b.doc_id
      )"""
  }

  private def q18OracleSql: String = {
    s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      $duckMinhashCand,
      sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
      inter AS (
        SELECT da, db, count(*) i
        FROM cand
        JOIN sh a ON a.doc_id = da
        JOIN sh b ON b.doc_id = db AND b.hs = a.hs
        GROUP BY da, db
      )
      SELECT da AS doc_a, db AS doc_b,
        (CAST(i AS DOUBLE) / (sa.n + sb.n - i)) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = da
      JOIN sz sb ON sb.doc_id = db
      WHERE (CAST(i AS DOUBLE) / (sa.n + sb.n - i)) >= 0.5
      ORDER BY doc_a, doc_b
    """.trim
  }

  val q18: Q = Q(
    "q18_minhash_lsh_neardup",
    (s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.5, k = minhashK, bands = minhashBands),
    Some(q18OracleSql),
    headline = true)

  // ---------------------------------------------------------------- q19

  private val simhashBits = 48

  private def q19OracleSql: String = {
    val bitSums = (0 until simhashBits).map(j =>
      s"sum(CASE WHEN (((${2 * j + 3} * hs + ${7 * j + 1}) % $P) & 1) = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n        ")
    val fp = (0 until simhashBits).map(j =>
      s"(CASE WHEN s$j > 0 THEN ${1L << j}::BIGINT ELSE 0 END)")
      .mkString(" + ")
    s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      bits AS (
        SELECT doc_id,
        $bitSums
        FROM sh GROUP BY doc_id
      ),
      fps AS (SELECT doc_id, ($fp) AS simhash FROM bits),
      chunks AS (
        SELECT doc_id, simhash, c AS chunk_id,
          ((simhash >> (c * 12)) & 4095) AS chunk
        FROM fps, LATERAL unnest([0, 1, 2, 3]) AS u(c)
      ),
      cand AS (
        SELECT DISTINCT a.doc_id da, a.simhash fa, b.doc_id db, b.simhash fb
        FROM chunks a JOIN chunks b
          ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id
      )
      SELECT da AS doc_a, db AS doc_b,
        CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
      FROM cand
      WHERE bit_count(xor(fa, fb)) <= 3
      ORDER BY doc_a, doc_b
    """.trim
  }

  val q19: Q = Q(
    "q19_simhash_neardup",
    (s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3),
    Some(q19OracleSql))

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

  /** DuckDB fragment: the deterministic k-means coarse quantizer replay
    * shared by q21 and q39 — normed vectors (`n`), hash-seeded init,
    * one fixed-point refinement pass, refined centroid table (`c3`). */
  private val duckIvfQuantizer =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |n0 AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
      |  FROM e),
      |n AS (SELECT * FROM n0 WHERE nrm > 0),
      |seeds AS (
      |  SELECT vec_id FROM (
      |    SELECT vec_id, row_number() OVER (
      |      ORDER BY ((vec_id % 2147483648) * 2654435761) % 2147483648,
      |        vec_id) rn
      |    FROM n) t
      |  WHERE rn <= (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM n)),
      |c0 AS (
      |  SELECT n.vec_id cent_id, n.v cv, n.nrm cn
      |  FROM n JOIN seeds ON n.vec_id = seeds.vec_id),
      |a1 AS (
      |  SELECT cell, vec_id FROM (
      |    SELECT c.cent_id cell, n.vec_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        (list_reduce(list_prepend(0.0::DOUBLE,
      |           list_transform(range(1, len(n.v) + 1),
      |             i -> n.v[i] * c.cv[i])),
      |           (x, y) -> x + y) / (n.nrm * c.cn)) DESC, c.cent_id) probe
      |    FROM n, c0 c) t
      |  WHERE probe = 1),
      |dims AS (
      |  SELECT cell, u.d d, u.f f FROM (
      |    SELECT a1.cell,
      |      unnest(list_transform(range(1, len(n.v) + 1),
      |        i -> {'d': i, 'f': CAST(floor(n.v[i] * 1048576.0) AS BIGINT)})) u
      |    FROM a1 JOIN n ON n.vec_id = a1.vec_id) t),
      |cd AS (
      |  SELECT cell, d, sum(f) fs, count(*) cnt FROM dims GROUP BY cell, d),
      |c1 AS (
      |  SELECT cell cent_id,
      |    list(CAST(fs AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1048576.0)
      |      ORDER BY d) cv
      |  FROM cd GROUP BY cell),
      |c2 AS (
      |  SELECT cent_id, cv,
      |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(cv, x -> x * x)), (a, b) -> a + b)) cn
      |  FROM c1),
      |c3 AS (SELECT * FROM c2 WHERE cn > 0)""".stripMargin

  /** DuckDB fragment: the q39 IVF-probed top-5 ranking over the
    * [[duckIvfQuantizer]] frames — shared by q39 and the q129 recall
    * evaluation (which compares it against the exact ranking). */
  private val duckIvfTopK5 =
    """idx AS (
      |  SELECT cell, vec_id AS neighbor_id FROM (
      |    SELECT c.cent_id cell, n.vec_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        (list_reduce(list_prepend(0.0::DOUBLE,
      |           list_transform(range(1, len(n.v) + 1),
      |             i -> n.v[i] * c.cv[i])),
      |           (x, y) -> x + y) / (n.nrm * c.cn)) DESC, c.cent_id) AS probe
      |    FROM n, c3 c) t
      |  WHERE probe = 1),
      |qa AS (
      |  SELECT cell, vec_id AS query_id FROM (
      |    SELECT c.cent_id cell, n.vec_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        (list_reduce(list_prepend(0.0::DOUBLE,
      |           list_transform(range(1, len(n.v) + 1),
      |             i -> n.v[i] * c.cv[i])),
      |           (x, y) -> x + y) / (n.nrm * c.cn)) DESC, c.cent_id) AS probe
      |    FROM n, c3 c WHERE n.vec_id % 50 = 0) t
      |  WHERE probe <= 4),
      |cand AS (
      |  SELECT DISTINCT qa.query_id, idx.neighbor_id
      |  FROM qa JOIN idx ON qa.cell = idx.cell
      |  WHERE qa.query_id <> idx.neighbor_id),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    (list_reduce(list_prepend(0.0::DOUBLE,
      |       list_transform(range(1, len(nq.v) + 1), i -> nq.v[i] * nc.v[i])),
      |       (x, y) -> x + y) / (nq.nrm * nc.nrm)) AS cosine
      |  FROM cand
      |  JOIN n nq ON nq.vec_id = query_id
      |  JOIN n nc ON nc.vec_id = neighbor_id),
      |ivf5 AS (
      |  SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
      |  FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rank
      |    FROM scored) t
      |  WHERE rank <= 5)""".stripMargin

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

  // ---------------------------------------------------------------- q22

  val q22: Q = Q(
    "q22_lang_id",
    (s, d) =>
      TextAnalysis.langIdMatrix(Tables.documents(s, d), "text", "lang"),
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
          list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') w
        FROM documents),
      sc AS (
        SELECT doc_id, lang, len(w) n_tokens,
          len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is'))) c_en,
          len(list_filter(w, x -> x IN ('el', 'la', 'los', 'y', 'es'))) c_es,
          len(list_filter(w, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) c_de,
          len(list_filter(w, x -> x IN ('le', 'les', 'et', 'est', 'une'))) c_fr
        FROM t),
      pred AS (
        SELECT *,
          CASE WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'und'
               WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
               WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
               WHEN c_de >= c_fr THEN 'de'
               ELSE 'fr' END AS lang_pred
        FROM sc)
      SELECT lang, lang_pred, count(*) AS n_docs,
        CAST(sum(c_en + c_es + c_de + c_fr) AS BIGINT) AS marker_tokens,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        (CAST(sum(c_en + c_es + c_de + c_fr) AS DOUBLE) / sum(n_tokens))
          AS marker_ratio
      FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """.trim))

  // ---------------------------------------------------------------- q23

  val q23: Q = Q(
    "q23_quality_score",
    (s, d) =>
      TextAnalysis.qualityScores(Tables.documents(s, d), "doc_id", "text"),
    Some("""
      WITH t AS (
        SELECT doc_id, text, length(text) AS n_chars,
          list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') w
        FROM documents),
      m AS (
        SELECT doc_id, n_chars, len(w) n_tokens,
          list_reduce(list_prepend(0::BIGINT,
            list_transform(w, x -> length(x))), (a, b) -> a + b) sum_tok_len,
          len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) n_stop,
          length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) n_punct
        FROM t)
      SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
        CAST(n_tokens AS INT) AS n_tokens,
        CASE WHEN n_tokens > 0
          THEN (CAST(sum_tok_len AS DOUBLE) / n_tokens) END AS avg_token_len,
        CASE WHEN n_tokens > 0
          THEN (CAST(n_stop AS DOUBLE) / n_tokens) END AS stopword_ratio,
        CASE WHEN n_chars > 0
          THEN (CAST(n_punct AS DOUBLE) / n_chars) END AS punct_ratio,
        CASE WHEN n_tokens >= 40 AND n_tokens > 0
               AND (CAST(n_stop AS DOUBLE) / n_tokens) >= 0.05 THEN 'high'
             WHEN n_tokens >= 15 THEN 'medium'
             ELSE 'low' END AS quality_band
      FROM m ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q24

  val q24: Q = Q(
    "q24_token_stats",
    (s, d) =>
      TextAnalysis.tokenStats(Tables.documents(s, d), "doc_id", "text",
        limit = 50),
    Some("""
      WITH tok AS (
        SELECT doc_id, t
        FROM documents, LATERAL unnest(
          regexp_extract_all(lower(text), '([a-z]+|[0-9]+|[^a-z0-9\s])', 1)) AS u(t))
      SELECT t AS token, count(*) AS n_occurrences,
        count(DISTINCT doc_id) AS n_docs
      FROM tok GROUP BY t
      ORDER BY n_occurrences DESC, token
      LIMIT 50
    """.trim))

  // ---------------------------------------------------------------- q25

  val q25: Q = Q(
    "q25_doc_fingerprint",
    (s, d) =>
      TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text"),
    Some(s"""
      WITH $duckWords,
      wh AS (
        SELECT doc_id, len(w) n_tokens, list_transform(w, t ->
          list_reduce(list_prepend(0::BIGINT,
            list_transform(range(1, length(t) + 1), j -> ascii(t[j]))),
            (h, c) -> ((h * 31) + c) % $P)) whl
        FROM words)
      SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        list_reduce(list_prepend(0::BIGINT, whl),
          (a, x) -> ((a * 131) + x) % $P) AS rolling_fp,
        CASE WHEN n_tokens >= 8 THEN
          list_min(list_transform(range(1, n_tokens - 6),
            i -> list_reduce(list_prepend(0::BIGINT, array_slice(whl, i, i + 7)),
              (a, x) -> ((a * 131) + x) % $P)))
        ELSE NULL END AS min_gram_fp
      FROM wh ORDER BY doc_id
    """.trim))

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

  // ---------------------------------------------------------------- q30

  private val rpPlanes = 16

  private def q30OracleSql: String = q30OracleSqlAt(0.3)

  /** DuckDB CTE chain `e, n0, n, sigs` replaying
    * [[graft.operators.Similarity.rpSignatures]] (mirrors
    * Similarity.rpBit: left fold of v[i] * (±1 from the affine parity
    * hash), bit j set when the projection is positive) — shared by the
    * q30 pair replay and the q96 drift replay. */
  private def duckRpSigCtes: String = {
    def bit(j: Int): String = {
      val base = j * 8192L
      s"""(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
         |  list_transform(range(0, len(v)),
         |    i -> v[i+1] * (1 - 2 * (((1000003 * ($base + i) + 12345)
         |         % 1000000007) & 1)))),
         |  (acc, p) -> acc + p) > 0 THEN ${1L << j} ELSE 0 END)""".stripMargin
    }
    val sig = (0 until rpPlanes).map(bit).mkString(" + ")
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
       |  FROM embeddings),
       |n0 AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(v, x -> x * x)), (a, b) -> a + b)) nrm
       |  FROM e),
       |n AS (SELECT * FROM n0 WHERE nrm > 0),
       |sigs AS (SELECT vec_id, ($sig) AS sig FROM n)""".stripMargin
  }

  private def q30OracleSqlAt(threshold: Double): String = {
    // band layout DERIVED from rpPlanes, like the Scala side — a
    // hardcoded 255/8 here would silently diverge if the knob changes
    val half = rpPlanes / 2
    val mask = (1L << half) - 1
    s"""
      WITH $duckRpSigCtes,
      bands AS (
        SELECT vec_id, 0 AS band, sig & $mask AS bv FROM sigs
        UNION ALL
        SELECT vec_id, 1 AS band, (sig >> $half) & $mask AS bv FROM sigs),
      cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, cosine FROM (
        SELECT vec_a, vec_b,
          (list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, len(na.v) + 1), i -> na.v[i] * nb.v[i])),
             (x, y) -> x + y) / (na.nrm * nb.nrm)) AS cosine
        FROM cand
        JOIN n na ON na.vec_id = vec_a
        JOIN n nb ON nb.vec_id = vec_b) t
      WHERE cosine >= $threshold
      ORDER BY vec_a, vec_b
    """.trim
  }

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

  // ---------------------------------------------------------------- q31

  /** q31 — near-dup clusters: MinHash-LSH pairs closed into connected
    * components (min-id label propagation), singletons included — the
    * actual KEEP/DROP decision a dedup pipeline emits. The oracle
    * computes the same components with a recursive CTE over the same
    * replayed pair set: min reachable id ≡ the propagation fixpoint. */
  val q31: Q = Q(
    "q31_neardup_clusters",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.nearDupClusters(docs, "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text",
          threshold = 0.5, k = minhashK, bands = minhashBands))
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
      )
      SELECT id AS doc_id, min(r) AS cluster_id,
        (id = min(r)) AS is_canonical
      FROM reach GROUP BY id ORDER BY doc_id
    """.trim))

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

  // ---------------------------------------------------------------- q33

  /** q33 — PII redaction: synthetic addresses/numbers are woven into a
    * slice of the fixture text (it contains none naturally), then
    * scrubbed; output pins counts and the redacted text's hash. */
  val q33: Q = Q(
    "q33_pii_redact",
    (s, d) => {
      val seeded = Tables.documents(s, d).select(
        col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" Contact user"), col("doc_id"),
            lit("@example.com or call 555123"), col("doc_id"), lit(".")))
          .otherwise(col("text")).as("text"))
      Scrub.redactPii(seeded, "doc_id", "text")
        .select(col("doc_id"), col("n_emails"), col("n_digit_runs"),
          sha2(col("redacted"), 256).as("redacted_hash"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH seeded AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0
            THEN text || ' Contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555123' || CAST(doc_id AS VARCHAR) || '.'
            ELSE text END AS text
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '${Scrub.emailRe}')) AS INT)
          AS n_emails,
        CAST(len(regexp_extract_all(
          regexp_replace(text, '${Scrub.emailRe}', '<EMAIL>', 'g'),
          '${Scrub.longDigitsRe}')) AS INT) AS n_digit_runs,
        sha256(regexp_replace(
          regexp_replace(text, '${Scrub.emailRe}', '<EMAIL>', 'g'),
          '${Scrub.longDigitsRe}', '<NUM>', 'g')) AS redacted_hash
      FROM seeded ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q34

  /** q34 — event sessionization over the `events` stream table: a gap
    * > 30 min opens a new session (lag + running-sum window pair, the
    * standard sessionize idiom). Timestamps run as MICROSECOND LONGS on
    * both sides: Spark converts `ts` via the encoding-adaptive
    * [[Tables.tsUs]] (long nanos or TIMESTAMP parquet both land on µs);
    * DuckDB's timestamps are natively µs — so the gap arithmetic
    * is integer-exact and unit-identical in both engines (ns would
    * silently truncate on the DuckDB side). One shuffle on user_id;
    * windows are per-user ordered scans. */
  val q34: Q = Q(
    "q34_event_sessionize",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gapUs = 30L * 60 * 1000 * 1000
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val newSess = when(lag(col("ts_us"), 1).over(byUser).isNull
        || col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs, 1)
        .otherwise(0)
      eventsUs(s, d)
        .withColumn("new_sess", newSess)
        .withColumn("session_idx",
          sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"),
          sum(Dec.d2(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("user_id"), col("session_idx"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          value
        FROM events),
      flagged AS (
        SELECT user_id, event_id, ts_us, value,
          CASE WHEN lag(ts_us) OVER w IS NULL
                 OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
               ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      sess AS (
        SELECT user_id, ts_us, value,
          CAST(SUM(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM flagged)
      SELECT user_id, session_idx, count(*) AS n_events,
        min(ts_us) AS start_us, max(ts_us) AS end_us,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM sess
      GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx
    """.trim))

  // ---------------------------------------------------------------- q35

  /** q35 — within-document repetition signals (duplicate token / 3-gram
    * ratios, the pretraining boilerplate filter). Fully row-local from
    * the compiled hash passes; the oracle replays the same folds with
    * list lambdas. Hash-collision parity: a 3-gram collision dedupes
    * identically in both engines because both count DISTINCT HASHES,
    * never distinct gram strings. */
  val q35: Q = Q(
    "q35_repetition_signals",
    (s, d) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, d), "doc_id", "text"),
    Some(s"""
      WITH $duckWords,
      wh AS (
        SELECT doc_id, list_transform(w, t ->
          list_reduce(list_prepend(0::BIGINT,
            list_transform(range(1, length(t) + 1), j -> ascii(t[j]))),
            (h, c) -> ((h * 31) + c) % $P)) whl
        FROM words),
      g AS (
        SELECT doc_id,
          CAST(len(whl) AS INT) n_tokens,
          CAST(len(list_distinct(whl)) AS INT) n_distinct_tokens,
          CAST(greatest(len(whl) - 2, 0) AS INT) n_grams,
          CAST(len(list_distinct(list_transform(range(1, len(whl) - 1),
            i -> ((((((whl[i] * 31) + whl[i+1]) % $P) * 31) + whl[i+2]) % $P))))
            AS INT) n_distinct_grams
        FROM wh)
      SELECT doc_id, n_tokens, n_distinct_tokens, n_grams, n_distinct_grams,
        CASE WHEN n_tokens > 0 THEN CAST(1 AS DOUBLE)
          - (CAST(n_distinct_tokens AS DOUBLE) / n_tokens) END AS dup_token_ratio,
        CASE WHEN n_grams > 0 THEN CAST(1 AS DOUBLE)
          - (CAST(n_distinct_grams AS DOUBLE) / n_grams) END AS dup_gram_ratio
      FROM g ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q36

  /** q36 — cross-corpus contamination: even-id docs play the training
    * corpus, odd-id docs the eval set; report eval docs that
    * near-duplicate a training doc (the decontamination join). The
    * oracle replays the split, the combined-corpus df cap, and the
    * cross-side index join; thresholds match q17's so the fixture's
    * known near-dup families surface wherever they straddle the
    * parity split. */
  val q36: Q = Q(
    "q36_cross_contamination",
    (s, d) =>
      // same-table parity split → the single-cache variant: the shingle
      // index is built and persisted once, both sides filter it
      Dedup.crossNgramJaccardPairsSplit(Tables.documents(s, d),
        "doc_id", "text", leftSide = col("doc_id") % 2 === 0,
        threshold = 0.5, maxDf = 100),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      hot AS (
        SELECT hs FROM sh GROUP BY hs HAVING count(*) > 100),
      capped AS (
        SELECT doc_id, hs FROM sh WHERE hs NOT IN (SELECT hs FROM hot)),
      a AS (SELECT doc_id, hs FROM capped WHERE doc_id % 2 = 0),
      b AS (SELECT doc_id, hs FROM capped WHERE doc_id % 2 = 1),
      sza AS (SELECT doc_id, count(*) n FROM a GROUP BY doc_id),
      szb AS (SELECT doc_id, count(*) n FROM b GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id da, b.doc_id db, count(*) i
        FROM a JOIN b USING (hs)
        GROUP BY a.doc_id, b.doc_id)
      SELECT da AS left_id, db AS right_id,
        i AS n_common, CAST(sza.n + szb.n - i AS BIGINT) AS n_union,
        (CAST(i AS DOUBLE) / (sza.n + szb.n - i)) AS jaccard
      FROM inter
      JOIN sza ON sza.doc_id = da
      JOIN szb ON szb.doc_id = db
      WHERE (CAST(i AS DOUBLE) / (sza.n + szb.n - i)) >= 0.5
      ORDER BY left_id, right_id
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

  // ---------------------------------------------------------------- q38

  /** q38 — network-identifier redaction (q33's sibling): synthetic URLs
    * and dotted-quad IPs are woven into a slice of the fixture text,
    * then scrubbed URL-first (a dotted-quad URL host must come out as
    * one `<URL>`). Output pins counts and the redacted text's hash. */
  val q38: Q = Q(
    "q38_network_redact",
    (s, d) => {
      val seeded = Tables.documents(s, d).select(
        col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" See https://host"), col("doc_id"),
            lit(".example.com/p?src="), col("doc_id"),
            lit(" or ping 10.0."), col("doc_id") % 256, lit(".7 now.")))
          .otherwise(col("text")).as("text"))
      Scrub.redactNetwork(seeded, "doc_id", "text")
        .select(col("doc_id"), col("n_urls"), col("n_ips"),
          sha2(col("redacted"), 256).as("redacted_hash"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH seeded AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0
            THEN text || ' See https://host' || CAST(doc_id AS VARCHAR)
              || '.example.com/p?src=' || CAST(doc_id AS VARCHAR)
              || ' or ping 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 now.'
            ELSE text END AS text
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '${Scrub.urlRe}')) AS INT)
          AS n_urls,
        CAST(len(regexp_extract_all(
          regexp_replace(text, '${Scrub.urlRe}', '<URL>', 'g'),
          '${Scrub.ipv4Re}')) AS INT) AS n_ips,
        sha256(regexp_replace(
          regexp_replace(text, '${Scrub.urlRe}', '<URL>', 'g'),
          '${Scrub.ipv4Re}', '<IP>', 'g')) AS redacted_hash
      FROM seeded ORDER BY doc_id
    """.trim))

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

  // ---------------------------------------------------------------- q43

  /** q43 — as-of join over the event stream: each purchase matched to
    * the user's most recent view at-or-before it (the
    * attribution/feature-lookup join). Runs on µs longs like q34. The
    * right side is pre-aggregated to one row per (user, ts) — the
    * determinism contract [[graft.operators.Joins.asOf]] documents and
    * DuckDB's ASOF shares — so the oracle can be DuckDB's own native
    * `ASOF LEFT JOIN`, an implementation-independent check (not a
    * replay of our union-window trick). */
  val q43: Q = Q(
    "q43_asof_join",
    (s, d) => {
      val e = eventsUs(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val views = e.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("view_event_id"))
        .withColumn("view_ts_us", col("ts_us"))
      Joins.asOf(purchases, views, "user_id", "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("view_event_id"), col("view_ts_us"),
          (col("ts_us") - col("view_ts_us")).as("gap_us"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events),
      p AS (
        SELECT event_id, user_id, ts_us FROM e
        WHERE event_type = 'purchase'),
      v AS (
        SELECT user_id, ts_us AS view_ts_us, max(event_id) AS view_event_id
        FROM e WHERE event_type = 'view' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, p.ts_us, v.view_event_id, v.view_ts_us,
        p.ts_us - v.view_ts_us AS gap_us
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us
      ORDER BY p.event_id
    """.trim))

  // ---------------------------------------------------------------- q44

  /** q44 — interval join with NO equi-key: the 20 highest-value events
    * define ±10-minute incident windows; count and sum every event
    * falling inside each window, across all users. Catalyst's native
    * plan for this predicate is BroadcastNestedLoopJoin (O(N·M));
    * [[graft.operators.Joins.intervalJoin]] buckets time to make it a
    * hash join (PlanAuditSpec pins the shape). The oracle is DuckDB's
    * own inequality join — engine-independent. Money sums ride
    * DECIMAL(12,2) like q34, so they are order-exact in both engines. */
  val q44: Q = Q(
    "q44_interval_join",
    (s, d) => {
      val halfUs = 600000000L // ±10 min in µs
      val e = eventsUs(s, d).select(col("event_id"),
        col("ts_us"), col("value"))
      val windows = e.orderBy(col("value").desc, col("event_id")).limit(20)
        .select(col("event_id").as("wid"), col("ts_us").as("w_ts_us"),
          (col("ts_us") - halfUs).as("w_start"),
          (col("ts_us") + halfUs).as("w_end"))
      Joins.intervalJoin(windows, "w_start", "w_end", e, "ts_us",
        bucketWidth = 2 * halfUs)
        .groupBy(col("wid"), col("w_ts_us"))
        .agg(count(lit(1)).as("n_events"),
          Dec.outD(sum(Dec.d2(col("value")))).as("sum_value"))
        .orderBy(col("wid"))
    },
    Some("""
      WITH e AS (
        SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
        FROM events),
      w AS (
        SELECT event_id AS wid, ts_us AS w_ts_us
        FROM e ORDER BY value DESC, event_id LIMIT 20)
      SELECT wid, w_ts_us, count(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM w JOIN e
        ON e.ts_us BETWEEN w_ts_us - 600000000 AND w_ts_us + 600000000
      GROUP BY wid, w_ts_us
      ORDER BY wid
    """.trim))

  // ---------------------------------------------------------------- q45

  /** q45 — per-language corpus length profile: the distributional
    * snapshot read before setting length filters or mixing weights.
    * The percentile points are dyadic on purpose — integer token
    * counts + dyadic `p` make the linear interpolation exact in both
    * engines, so a CONTINUOUS quantile hash-verifies (see
    * [[graft.operators.TextAnalysis.lengthProfile]]). The approx
    * (Greenwald-Khanna sketch) variant is the 100 TB path, like q24's
    * HLL flag. */
  val q45: Q = Q(
    "q45_length_profile",
    (s, d) =>
      TextAnalysis.lengthProfile(Tables.documents(s, d), "text", "lang"),
    Some("""
      WITH w AS (
        SELECT lang,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> t <> '')) AS INT) AS n_tokens
        FROM documents)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        avg(n_tokens) AS mean_tokens,
        CAST(min(n_tokens) AS INT) AS min_tokens,
        CAST(max(n_tokens) AS INT) AS max_tokens,
        quantile_cont(n_tokens, 0.25) AS p25_tokens,
        quantile_cont(n_tokens, 0.5) AS p50_tokens,
        quantile_cont(n_tokens, 0.75) AS p75_tokens,
        quantile_cont(n_tokens, 0.875) AS p875_tokens
      FROM w GROUP BY lang ORDER BY lang
    """.trim))

  // ---------------------------------------------------------------- q46

  /** q46 — grouped top-k (the per-group sibling of q12's global top-k):
    * the 3 longest documents per language. The scale property is rank
    * PUSHDOWN: Spark plans `row_number() <= k` as WindowGroupLimit —
    * each task keeps a k-row heap per group BEFORE the shuffle, so the
    * exchange carries ≤ k·groups·partitions rows instead of the corpus
    * (the window itself then ranks a k-bounded set). PlanAuditSpec pins
    * the node's presence; without it this query shuffles 100 TB to rank
    * it. Spark `row_number` is INT32, DuckDB's BIGINT → cast. */
  val q46: Q = Q(
    "q46_grouped_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .orderBy(col("lang"), col("rank"))
    },
    Some("""
      SELECT lang, doc_id, n_chars, CAST(rank AS INT) AS rank FROM (
        SELECT lang, doc_id, n_chars,
          row_number() OVER (
            PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents) t
      WHERE rank <= 3
      ORDER BY lang, rank
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

  // ---------------------------------------------------------------- q48

  /** q48 — keep-best normalized dedup (q16's promised downstream pass):
    * collapse case/whitespace variants, keeping the most token-rich
    * one (ties → min id). The Spark side is the partial-aggregable
    * `max_by` over an ordering struct — one shuffle of ≤ |groups| rows
    * per partition; the oracle is the window formulation that would
    * have shuffled the corpus (same winner — the ordering is total). */
  val q48: Q = Q(
    "q48_keepbest_dedup",
    (s, d) => Dedup.keepBest(Tables.documents(s, d), "doc_id", "text"),
    Some(s"""
      WITH $duckWords,
      n AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens FROM words),
      g AS (
        SELECT d.doc_id,
          sha256(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))
            AS norm_hash,
          n.n_tokens
        FROM documents d JOIN n USING (doc_id))
      SELECT norm_hash, best_id, best_tokens, n_variants FROM (
        SELECT norm_hash, doc_id AS best_id, n_tokens AS best_tokens,
          row_number() OVER (
            PARTITION BY norm_hash ORDER BY n_tokens DESC, doc_id) AS rk,
          count(*) OVER (PARTITION BY norm_hash) AS n_variants
        FROM g) t
      WHERE rk = 1 ORDER BY best_id
    """.trim))

  // ---------------------------------------------------------------- q49

  /** q49 — one-sided eval-overlap contamination rate (the PaLM-style
    * per-doc rule; q36 is the pairwise view): fraction of each even
    * (train) doc's distinct shingles appearing anywhere in the odd
    * (eval) half's union set, flagged at 0.2. The engine probes a
    * BROADCAST distinct eval set — the train side never shuffles;
    * PlanAuditSpec pins the broadcast. */
  private lazy val q49OracleSql: String = s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      tr AS (SELECT doc_id, hs FROM sh WHERE doc_id % 2 = 0),
      ev AS (SELECT DISTINCT hs FROM sh WHERE doc_id % 2 = 1)
      SELECT tr.doc_id,
        count(*) AS n_shingles,
        count(ev.hs) AS n_hit,
        CAST(count(ev.hs) AS DOUBLE) / count(*) AS overlap_rate,
        CAST(CASE WHEN CAST(count(ev.hs) AS DOUBLE) / count(*) >= 0.2
          THEN 1 ELSE 0 END AS INT) AS contaminated
      FROM tr LEFT JOIN ev ON tr.hs = ev.hs
      GROUP BY tr.doc_id ORDER BY tr.doc_id
    """.trim

  val q49: Q = Q(
    "q49_eval_overlap",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.evalOverlapRate(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", contaminatedAt = 0.2)
    },
    Some(q49OracleSql))

  // ---------------------------------------------------------------- q50

  /** q50 — curriculum binning: per-language length QUARTILE buckets
    * (exact dyadic 25/50/75 thresholds — the q45 trick — broadcast
    * back onto a row-local assignment), rolled up per (lang, bucket).
    * The corpus is never shuffled; the one wide exchange carries
    * ≤ 4·|langs| rows. */
  val q50: Q = Q(
    "q50_curriculum_bins",
    (s, d) =>
      TextAnalysis.curriculumBins(Tables.documents(s, d), "text", "lang"),
    Some("""
      WITH w AS (
        SELECT lang,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> t <> '')) AS INT) AS n_tokens
        FROM documents),
      th AS (
        SELECT lang,
          quantile_cont(n_tokens, 0.25) AS p25,
          quantile_cont(n_tokens, 0.5) AS p50,
          quantile_cont(n_tokens, 0.75) AS p75
        FROM w GROUP BY lang),
      b AS (
        SELECT w.lang,
          CAST(CASE WHEN n_tokens <= p25 THEN 0
                    WHEN n_tokens <= p50 THEN 1
                    WHEN n_tokens <= p75 THEN 2
                    ELSE 3 END AS INT) AS bucket,
          n_tokens
        FROM w JOIN th ON w.lang = th.lang)
      SELECT lang, bucket, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        CAST(min(n_tokens) AS INT) AS min_tokens,
        CAST(max(n_tokens) AS INT) AS max_tokens
      FROM b GROUP BY lang, bucket ORDER BY lang, bucket
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

  // ---------------------------------------------------------------- q54

  /** q54 — cross-corpus shingle commonness: q35's repetition rule
    * measured ACROSS the corpus (boilerplate/template detection). One
    * df groupBy over 8-byte shingle hashes + the join back — q17's
    * index shape without the pair blowup. */
  val q54: Q = Q(
    "q54_shingle_novelty",
    (s, d) =>
      TextAnalysis.shingleNovelty(Tables.documents(s, d), "doc_id",
        "text", minDf = 3),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      df AS (SELECT hs, count(*) AS df FROM sh GROUP BY hs)
      SELECT sh.doc_id, count(*) AS n_shingles,
        CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*) AS common_ratio
      FROM sh JOIN df USING (hs)
      GROUP BY sh.doc_id ORDER BY sh.doc_id
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

  /** DuckDB fragment: ordered-fold dot product of two `w`-element list
    * expressions (mirrors the codegen'd VectorOps.dot ascending-index
    * loop). */
  private def duckDot(a: String, b: String, w: Int): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |  list_transform(range(1, ${w + 1}), i -> $a[i] * $b[i])),
       |  (x, y) -> x + y)""".stripMargin

  private def q56OracleSql: String = pqOracleSql(adc = false)

  private def q57OracleSql: String = pqOracleSql(adc = true)

  private def pqOracleSql(adc: Boolean): String = {
    val m = 8; val w = 8; val k = 8
    // ((sv·sv − 2·sv·cv) + cv·cv): the exact parenthesization of the
    // engine's squared-L2 identity
    def dist(sv: String, cv: String): String =
      s"((${duckDot(sv, sv, w)} - 2.0 * ${duckDot(sv, cv, w)})" +
        s" + ${duckDot(cv, cv, w)})"
    def assignFrom(cents: String): String =
      s"""SELECT vec_id, sub, sv, cent_id AS code, dist FROM (
         |  SELECT s.vec_id, s.sub, s.sv, c.cent_id,
         |    ${dist("s.sv", "c.cv")} AS dist,
         |    row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
         |      ${dist("s.sv", "c.cv")}, c.cent_id) AS rn
         |  FROM sv s JOIN $cents c ON s.sub = c.sub) t
         |WHERE rn = 1""".stripMargin
    s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        FROM embeddings),
      sv AS (
        SELECT vec_id, CAST(u.s AS INT) AS sub,
          v[CAST(u.s AS INT) * $w + 1 : CAST(u.s AS INT) * $w + $w] AS sv
        FROM e, LATERAL unnest(range(0, $m)) AS u(s)),
      seeds AS (
        SELECT vec_id FROM (
          SELECT vec_id, row_number() OVER (
            ORDER BY ((vec_id % 2147483648) * 2654435761) % 2147483648,
              vec_id) rn
          FROM e) t
        WHERE rn <= $k),
      c0 AS (
        SELECT s.sub, s.vec_id AS cent_id, s.sv AS cv
        FROM sv s JOIN seeds ON s.vec_id = seeds.vec_id),
      a1 AS (${assignFrom("c0")}),
      dims1 AS (
        SELECT sub, code AS cell, u.d, u.f FROM (
          SELECT sub, code, unnest(list_transform(range(1, ${w + 1}),
            i -> {'d': i,
                  'f': CAST(floor(sv[i] * 1048576.0) AS BIGINT)})) u
          FROM a1) t),
      cd AS (
        SELECT sub, cell, d, sum(f) AS fs, count(*) AS cnt
        FROM dims1 GROUP BY sub, cell, d),
      c1 AS (
        SELECT sub, cell AS cent_id,
          list(CAST(fs AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1048576.0)
            ORDER BY d) AS cv
        FROM cd GROUP BY sub, cell),
      a2 AS (${assignFrom("c1")})
      ${if (!adc) s"""
      SELECT vec_id, sub, code,
        CAST(floor(greatest(dist, 0.0) * 1048576.0) AS BIGINT) AS err_fp
      FROM a2 ORDER BY vec_id, sub
      """.trim
      else s"""
      , tbl AS (
        SELECT q.query_id, q.sub, c.cent_id AS code,
          CAST(floor(greatest(${dist("q.qsv", "c.cv")}, 0.0)
            * 1048576.0) AS BIGINT) AS pd_fp
        FROM (SELECT vec_id AS query_id, sub, sv AS qsv FROM sv
              WHERE vec_id % 50 = 0) q
        JOIN c1 c ON q.sub = c.sub),
      adc AS (
        SELECT query_id, a2.vec_id, CAST(sum(pd_fp) AS BIGINT) AS adist_fp
        FROM a2 JOIN tbl ON a2.sub = tbl.sub AND a2.code = tbl.code
        WHERE query_id <> a2.vec_id
        GROUP BY query_id, a2.vec_id)
      SELECT query_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank,
        adist_fp
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adist_fp, vec_id) AS rank
        FROM adc) t
      WHERE rank <= 5
      ORDER BY query_id, rank
      """.trim}
    """.trim
  }

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

  // ---------------------------------------------------------------- q58

  /** q58 — ROLLUP subtotal hierarchy (relational breadth beyond the
    * reference: multi-level report totals in ONE aggregate pass —
    * Spark plans rollup as a single Expand + hash aggregate, partial-
    * aggregable map-side, not one scan per level). grouping_id
    * disambiguates a real NULL key from a rolled-up level, exactly as
    * DuckDB's GROUPING_ID replays. Money stays exact decimal until the
    * DOUBLE output boundary (the q14 discipline). */
  val q58: Q = Q(
    "q58_rollup_revenue",
    (s, d) =>
      Tables.orders(s, d)
        .rollup(year(col("o_orderdate")).as("anio"),
          col("o_orderstatus").as("estado"))
        .agg(grouping_id().cast("int").as("nivel"),
          Dec.outD(sum(Dec.d2(col("o_totalprice")))).as("ingresos"),
          count(lit(1)).as("n_ordenes"))
        .orderBy(col("nivel"), col("anio").asc_nulls_first,
          col("estado").asc_nulls_first),
    Some("""
      SELECT CAST(year(o_orderdate) AS INT) AS anio, o_orderstatus AS estado,
        CAST(GROUPING_ID(year(o_orderdate), o_orderstatus) AS INT) AS nivel,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ingresos,
        COUNT(*) AS n_ordenes
      FROM orders
      GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
      ORDER BY nivel, anio NULLS FIRST, estado NULLS FIRST
    """.trim))

  // ---------------------------------------------------------------- q59

  /** q59 — PIVOT to a fixed column set (the report-matrix shape BI
    * tools ask of an engine): monthly revenue split by return flag
    * into columns. Spark's pivot with an EXPLICIT value list plans as
    * one conditional aggregate (no second pass to discover values —
    * the only shape that works on 100 TB); the oracle replays it as
    * CASE sums. Missing (month, flag) combos are NULL in both. */
  val q59: Q = Q(
    "q59_pivot_returnflag",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date")
          .as("mes"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(Dec.outD(sum(Dec.d2(col("l_extendedprice")))))
        .orderBy(col("mes")),
    Some("""
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mes,
        CAST(SUM(CASE WHEN l_returnflag = 'A'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "A",
        CAST(SUM(CASE WHEN l_returnflag = 'N'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "N",
        CAST(SUM(CASE WHEN l_returnflag = 'R'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "R"
      FROM lineitem
      GROUP BY 1
      ORDER BY mes
    """.trim))

  // ---------------------------------------------------------------- q60

  /** q60 — paragraph-level boilerplate removal (the C4-style
    * sub-document dedup): the fixture text is single-paragraph, so —
    * the q33 seeding pattern — a hot boilerplate footer is woven onto
    * every 5th doc (df ≈ N/5, dropped at any SF) and a cold one onto
    * every 97th (df scale-dependent: kept at the gate SF, dropped at
    * 10× — both engines replay the same rule, so the boundary is
    * exercised, not dodged). */
  val q60: Q = Q(
    "q60_paragraph_dedup",
    (s, d) => {
      val seeded = Tables.documents(s, d).select(
        col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            lit("\n\nCALL NOW limited offer - unsubscribe footer"))
            .otherwise(lit("")),
          when(col("doc_id") % 97 === 0,
            lit("\n\nmirror hosted by example archive"))
            .otherwise(lit(""))).as("text"))
      Dedup.dropBoilerplateParagraphs(seeded, "doc_id", "text", maxDf = 10)
    },
    Some(s"""
      WITH seeded AS (
        SELECT doc_id,
          text ||
          CASE WHEN doc_id % 5 = 0
            THEN chr(10) || chr(10) ||
              'CALL NOW limited offer - unsubscribe footer'
            ELSE '' END ||
          CASE WHEN doc_id % 97 = 0
            THEN chr(10) || chr(10) || 'mirror hosted by example archive'
            ELSE '' END AS text
        FROM documents),
      p AS (
        SELECT doc_id, CAST(u.i - 1 AS INT) AS idx, paras[u.i] AS para
        FROM (SELECT doc_id,
                string_split_regex(text, chr(10) || chr(10)) AS paras
              FROM seeded) s,
        LATERAL unnest(range(1, len(paras) + 1)) AS u(i)),
      d AS (
        SELECT h, count(*) AS df FROM (
          SELECT DISTINCT doc_id, sha256(para) AS h FROM p) t
        GROUP BY h)
      SELECT p.doc_id, count(*) AS n_paras,
        CAST(sum(CASE WHEN df < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        sha256(COALESCE(string_agg(CASE WHEN df < 10 THEN para END,
          chr(10) || chr(10) ORDER BY idx), '')) AS cleaned_hash
      FROM p JOIN d ON sha256(p.para) = d.h
      GROUP BY p.doc_id ORDER BY p.doc_id
    """.trim))

  // ---------------------------------------------------------------- q61

  /** DuckDB fragment: one full PQ-quantizer replay (subvector split,
    * hash seeding, one fixed-point refinement, final assignment) with
    * every CTE name prefixed `p` — so q61 can replay TWO quantizers
    * (coarse cells + fine codes) in one statement. `kSel` is a SQL
    * expression for the seed count (a literal for fine, ⌈√N⌉ for
    * coarse). Mirrors pqOracleSql's fragments exactly. */
  private def duckPqCtes(p: String, m: Int, w: Int, kSel: String): String = {
    def dist(sv: String, cv: String): String =
      s"((${duckDot(sv, sv, w)} - 2.0 * ${duckDot(sv, cv, w)})" +
        s" + ${duckDot(cv, cv, w)})"
    def assignFrom(cents: String): String =
      s"""SELECT vec_id, sub, sv, cent_id AS code, dist FROM (
         |  SELECT s.vec_id, s.sub, s.sv, c.cent_id,
         |    ${dist("s.sv", "c.cv")} AS dist,
         |    row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
         |      ${dist("s.sv", "c.cv")}, c.cent_id) AS rn
         |  FROM ${p}sv s JOIN $cents c ON s.sub = c.sub) t
         |WHERE rn = 1""".stripMargin
    s"""${p}sv AS (
      |  SELECT vec_id, CAST(u.s AS INT) AS sub,
      |    v[CAST(u.s AS INT) * $w + 1 : CAST(u.s AS INT) * $w + $w] AS sv
      |  FROM e, LATERAL unnest(range(0, $m)) AS u(s)),
      |${p}seeds AS (
      |  SELECT vec_id FROM (
      |    SELECT vec_id, row_number() OVER (
      |      ORDER BY ((vec_id % 2147483648) * 2654435761) % 2147483648,
      |        vec_id) rn
      |    FROM e) t
      |  WHERE rn <= $kSel),
      |${p}c0 AS (
      |  SELECT s.sub, s.vec_id AS cent_id, s.sv AS cv
      |  FROM ${p}sv s JOIN ${p}seeds ON s.vec_id = ${p}seeds.vec_id),
      |${p}a1 AS (${assignFrom(p + "c0")}),
      |${p}dims1 AS (
      |  SELECT sub, code AS cell, u.d, u.f FROM (
      |    SELECT sub, code, unnest(list_transform(range(1, ${w + 1}),
      |      i -> {'d': i,
      |            'f': CAST(floor(sv[i] * 1048576.0) AS BIGINT)})) u
      |    FROM ${p}a1) t),
      |${p}cd AS (
      |  SELECT sub, cell, d, sum(f) AS fs, count(*) AS cnt
      |  FROM ${p}dims1 GROUP BY sub, cell, d),
      |${p}c1 AS (
      |  SELECT sub, cell AS cent_id,
      |    list(CAST(fs AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1048576.0)
      |      ORDER BY d) AS cv
      |  FROM ${p}cd GROUP BY sub, cell),
      |${p}a2 AS (${assignFrom(p + "c1")})""".stripMargin
  }

  private def q61OracleSql: String = {
    def dist(sv: String, cv: String, w: Int): String =
      s"((${duckDot(sv, sv, w)} - 2.0 * ${duckDot(sv, cv, w)})" +
        s" + ${duckDot(cv, cv, w)})"
    val sqrtSel = "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM e)"
    s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        FROM embeddings),
      ${duckPqCtes("c_", 1, 64, sqrtSel)},
      ${duckPqCtes("f_", 8, 8, "8")},
      qc AS (
        SELECT query_id, cell FROM (
          SELECT s.vec_id AS query_id, c.cent_id AS cell,
            row_number() OVER (PARTITION BY s.vec_id ORDER BY
              ${dist("s.sv", "c.cv", 64)}, c.cent_id) AS rn
          FROM c_sv s JOIN c_c1 c ON s.sub = c.sub
          WHERE s.vec_id % 50 = 0) t
        WHERE rn <= 2),
      cand AS (
        SELECT DISTINCT qc.query_id, a.vec_id
        FROM qc JOIN c_a2 a ON a.code = qc.cell
        WHERE a.vec_id <> qc.query_id),
      tbl AS (
        SELECT q.query_id, q.sub, c.cent_id AS code,
          CAST(floor(greatest(${dist("q.qsv", "c.cv", 8)}, 0.0)
            * 1048576.0) AS BIGINT) AS pd_fp
        FROM (SELECT vec_id AS query_id, sub, sv AS qsv FROM f_sv
              WHERE vec_id % 50 = 0) q
        JOIN f_c1 c ON q.sub = c.sub),
      adc AS (
        SELECT cand.query_id, cand.vec_id,
          CAST(sum(pd_fp) AS BIGINT) AS adist_fp
        FROM cand
        JOIN f_a2 codes ON codes.vec_id = cand.vec_id
        JOIN tbl ON tbl.query_id = cand.query_id
          AND tbl.sub = codes.sub AND tbl.code = codes.code
        GROUP BY cand.query_id, cand.vec_id)
      SELECT query_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank,
        adist_fp
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adist_fp, vec_id) AS rank
        FROM adc) t
      WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim
  }

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

  // ---------------------------------------------------------------- q62

  /** q62 — data-quality column profile (the pre-flight before trusting
    * a new table): per column, row/null/exact-distinct counts from ONE
    * partial-aggregable pass; the unpivot to long form happens on the
    * 1-row aggregate, never the table. Counts only — min/max would
    * need per-type rendering to stay engine-portable. */
  val q62: Q = Q(
    "q62_column_profile",
    (s, d) =>
      Profiling.columnProfile(Tables.orders(s, d),
        Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
          "o_orderpriority")),
    Some("""
      WITH m AS (
        SELECT 'o_custkey' AS column_name,
          CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_nulls,
          count(DISTINCT o_custkey) AS n_distinct, count(*) AS n_rows
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
          CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
          count(DISTINCT o_orderstatus), count(*) FROM orders
        UNION ALL
        SELECT 'o_totalprice',
          CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
          count(DISTINCT o_totalprice), count(*) FROM orders
        UNION ALL
        SELECT 'o_orderdate',
          CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
          count(DISTINCT o_orderdate), count(*) FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
          CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
          count(DISTINCT o_orderpriority), count(*) FROM orders)
      SELECT column_name, n_rows, n_nulls, n_distinct
      FROM m ORDER BY column_name
    """.trim))

  // ---------------------------------------------------------------- q63

  /** q63 — tolerance-bounded as-of (the feature-store staleness rule):
    * q43's lookup but matches older than 1 h are nulled as if absent.
    * Compositional — one null-out over the carried match timestamp,
    * no new join shape; the oracle is DuckDB's native ASOF plus the
    * same CASE. */
  val q63: Q = Q(
    "q63_asof_tolerance",
    (s, d) => {
      val tolUs = 3600000000L // 1 h
      val e = eventsUs(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val views = e.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("view_event_id"))
        .withColumn("view_ts_us", col("ts_us"))
      Joins.asOfWithin(purchases, views, "user_id", "ts_us", tolUs)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("view_event_id"), col("view_ts_us"),
          (col("ts_us") - col("view_ts_us")).as("gap_us"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events),
      p AS (
        SELECT event_id, user_id, ts_us FROM e
        WHERE event_type = 'purchase'),
      v AS (
        SELECT user_id, ts_us AS view_ts_us, max(event_id) AS view_event_id
        FROM e WHERE event_type = 'view' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, p.ts_us,
        CASE WHEN v.view_ts_us >= p.ts_us - 3600000000
          THEN v.view_event_id END AS view_event_id,
        CASE WHEN v.view_ts_us >= p.ts_us - 3600000000
          THEN v.view_ts_us END AS view_ts_us,
        CASE WHEN v.view_ts_us >= p.ts_us - 3600000000
          THEN p.ts_us - v.view_ts_us END AS gap_us
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us
      ORDER BY p.event_id
    """.trim))

  // ---------------------------------------------------------------- q64

  /** q64 — CUBE over (year, priority): the full 2^n grouping lattice
    * (q58's rollup is the hierarchical subset) — cross-tab totals in
    * the same ONE Expand + partial hash aggregate pass, never a scan
    * per grouping set. grouping_id separates the four levels. */
  val q64: Q = Q(
    "q64_cube_revenue",
    (s, d) =>
      Tables.orders(s, d)
        .cube(year(col("o_orderdate")).as("anio"),
          col("o_orderpriority").as("prioridad"))
        .agg(grouping_id().cast("int").as("nivel"),
          Dec.outD(sum(Dec.d2(col("o_totalprice")))).as("ingresos"),
          count(lit(1)).as("n_ordenes"))
        .orderBy(col("nivel"), col("anio").asc_nulls_first,
          col("prioridad").asc_nulls_first),
    Some("""
      SELECT CAST(year(o_orderdate) AS INT) AS anio,
        o_orderpriority AS prioridad,
        CAST(GROUPING_ID(year(o_orderdate), o_orderpriority) AS INT)
          AS nivel,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          AS ingresos,
        COUNT(*) AS n_ordenes
      FROM orders
      GROUP BY CUBE(year(o_orderdate), o_orderpriority)
      ORDER BY nivel, anio NULLS FIRST, prioridad NULLS FIRST
    """.trim))

  // ---------------------------------------------------------------- q65

  /** q65 — corpus vocabulary head (Zipf profile): top-100 terms by
    * collection frequency with document frequency and rank. One
    * partial-aggregable vocabulary groupBy; the global top-k is
    * TakeOrderedAndProject and the rank window touches only the
    * already-limited 100-row frame. */
  val q65: Q = Q(
    "q65_term_zipf",
    (s, d) =>
      TextAnalysis.zipfProfile(Tables.documents(s, d), "doc_id", "text",
        topK = 100),
    Some("""
      WITH tok AS (
        SELECT doc_id, t
        FROM documents, LATERAL unnest(
          regexp_extract_all(lower(text), '([a-z]+|[0-9]+)', 1)) AS u(t)),
      c AS (
        SELECT t AS term, count(*) AS cf, count(DISTINCT doc_id) AS df
        FROM tok GROUP BY t)
      SELECT CAST(row_number() OVER (ORDER BY cf DESC, term) AS INT)
        AS rank, term, cf, df
      FROM c ORDER BY cf DESC, term LIMIT 100
    """.trim))

  // ---------------------------------------------------------------- q66

  /** q66 — per-document lexical richness: token/type/hapax counts and
    * the type-token ratio as an INTEGER-division fixed-point (no
    * doubles anywhere — `div` on both engines). Same (doc, term)
    * shuffle shape as q52's tf stream. */
  val q66: Q = Q(
    "q66_lexical_richness",
    (s, d) =>
      TextAnalysis.lexicalRichness(Tables.documents(s, d), "doc_id", "text"),
    Some("""
      WITH tok AS (
        SELECT doc_id, t
        FROM documents, LATERAL unnest(
          regexp_extract_all(lower(text), '([a-z]+|[0-9]+)', 1)) AS u(t)),
      tf AS (
        SELECT doc_id, t AS term, count(*) AS cnt
        FROM tok GROUP BY doc_id, t)
      SELECT doc_id,
        CAST(sum(cnt) AS BIGINT) AS n_tokens,
        count(*) AS n_distinct,
        CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hapax,
        CAST((count(*) * 1048576) // sum(cnt) AS BIGINT) AS ttr_fp
      FROM tf GROUP BY doc_id ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q67

  /** q67 — novelty decay: fraction of each doc's distinct 3-gram
    * shingles FIRST seen in an earlier doc (id = ingest order) — q54's
    * commonness signal made ORDER-AWARE. One min-aggregating shingle
    * groupBy + the join back; integer-division fixed-point ratio. */
  val q67: Q = Q(
    "q67_novelty_decay",
    (s, d) =>
      TextAnalysis.noveltyDecay(Tables.documents(s, d), "doc_id", "text"),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      fs AS (SELECT hs, min(doc_id) AS first_id FROM sh GROUP BY hs)
      SELECT sh.doc_id, count(*) AS n_shingles,
        CAST(sum(CASE WHEN first_id < sh.doc_id THEN 1 ELSE 0 END)
          AS BIGINT) AS n_seen_before,
        CAST((sum(CASE WHEN first_id < sh.doc_id THEN 1 ELSE 0 END)
          * 1048576) // count(*) AS BIGINT) AS seen_fp
      FROM sh JOIN fs USING (hs)
      GROUP BY sh.doc_id ORDER BY sh.doc_id
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

  // ---------------------------------------------------------------- q69

  /** q69 — daily event-mix drift: exact integer L1 distance between
    * consecutive days' event-type distributions (the ingest-health
    * alarm). Timestamps follow q34's ns-long → µs lift; the day is cut
    * in UTC on both engines. */
  val q69: Q = Q(
    "q69_event_drift",
    (s, d) =>
      Drift.dailyMixDrift(
        eventsUs(s, d),
        to_date(timestamp_micros(col("ts_us"))), "event_type"),
    Some("""
      WITH bd AS (
        SELECT CAST(ts AS DATE) AS day, event_type AS t, count(*) AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT day, CAST(sum(c) AS BIGINT) AS n FROM bd GROUP BY day),
      pv AS (SELECT day + 1 AS day, t, c AS cp FROM bd),
      pt AS (SELECT day + 1 AS day, n AS np FROM tot),
      pairs AS (
        SELECT day, t, COALESCE(c, 0) AS c, COALESCE(cp, 0) AS cp
        FROM bd FULL JOIN pv USING (day, t)),
      j AS (SELECT pairs.day AS day, c, cp, n, np
            FROM pairs JOIN tot USING (day) JOIN pt USING (day))
      SELECT day, n AS n_events,
        CAST((sum(abs(c * np - cp * n)) * 1048576) // (n * np) AS BIGINT)
          AS drift_fp
      FROM j GROUP BY day, n, np ORDER BY day
    """.trim))

  // ---------------------------------------------------------------- q70

  /** q70 — the INCREMENTAL novelty path under the driver oracle: the
    * corpus is scored through [[graft.etl.NoveltyStore]] in two
    * id-ordered batches (a fresh store per run, split at the id
    * midpoint), and the per-doc scores must hash-match the ONE-SHOT
    * q67 CTE — the batch-split-invariance contract
    * (NoveltyStoreProps) as a green CORRECTNESS row. The store's
    * append/score machinery (hash equi-join + left_anti append, no
    * window, no driver state) is exactly what a live ingest runs. */
  val q70: Q = Q(
    "q70_novelty_store",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val mm = docs.agg(min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi")).head()
      val cut = (mm.getLong(0) + mm.getLong(1)) / 2
      val dir = java.nio.file.Files
        .createTempDirectory("graft_q70_store").toString + "/store"
      val store = new graft.etl.NoveltyStore(s, dir)
      val first = store.scoreAndRecord(
        docs.where(col("doc_id") <= cut), "doc_id", "text")
      val second = store.scoreAndRecord(
        docs.where(col("doc_id") > cut), "doc_id", "text")
      first.unionByName(second)
        .withColumnRenamed("n_seen", "n_seen_before")
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      fs AS (SELECT hs, min(doc_id) AS first_id FROM sh GROUP BY hs)
      SELECT sh.doc_id, count(*) AS n_shingles,
        CAST(sum(CASE WHEN first_id < sh.doc_id THEN 1 ELSE 0 END)
          AS BIGINT) AS n_seen_before,
        CAST((sum(CASE WHEN first_id < sh.doc_id THEN 1 ELSE 0 END)
          * 1048576) // count(*) AS BIGINT) AS seen_fp
      FROM sh JOIN fs USING (hs)
      GROUP BY sh.doc_id ORDER BY sh.doc_id
    """.trim))

  // ---------------------------------------------------------------- q71

  /** q71 — exact substring-level dedup profile (keep-first, 20-token
    * spans): per doc, how many window positions repeat an earlier
    * corpus occurrence and how many tokens the merged repeated spans
    * cover. The oracle replays the positional rolling-window hashes on
    * the same portable fold, picks the first occurrence with the same
    * lexicographic (doc_id, pos) rule (two-step min in SQL ==
    * min(struct) on the engine side), and merges cover intervals with
    * a lag window (== the engine's sorted positional fold — both are
    * the union length of fixed-length intervals). */
  val q71: Q = Q(
    "q71_span_dedup",
    (s, d) => Dedup.repeatedSpanProfile(Tables.documents(s, d),
      "doc_id", "text", spanTokens = 20),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      win AS (
        SELECT doc_id, i - 1 AS pos,
          list_reduce(list_prepend(0::BIGINT, whl[i : i + 19]),
            (h, c) -> ((h * 31) + c) % $P) AS w
        FROM wh, LATERAL unnest(range(1, len(whl) - 18)) AS t(i)
        WHERE len(whl) >= 20
      ),
      occ AS (SELECT w, min(doc_id) AS fdoc, count(*) AS n_occ
              FROM win GROUP BY 1),
      f2 AS (
        SELECT win.w, min(pos) AS fpos
        FROM win JOIN occ ON win.w = occ.w AND win.doc_id = occ.fdoc
        WHERE occ.n_occ >= 2 GROUP BY win.w
      ),
      rep AS (
        SELECT win.doc_id, win.pos
        FROM win JOIN occ ON win.w = occ.w JOIN f2 ON win.w = f2.w
        WHERE occ.n_occ >= 2
          AND (win.doc_id > occ.fdoc
            OR (win.doc_id = occ.fdoc AND win.pos > f2.fpos))
      ),
      cov AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rep_windows,
          CAST(sum(CASE WHEN ppos IS NULL THEN 20
            ELSE least(pos - ppos, 20) END) AS BIGINT) AS n_masked
        FROM (SELECT doc_id, pos,
                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) ppos
              FROM rep)
        GROUP BY 1
      ),
      base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM words)
      SELECT base.doc_id, n_tokens,
        CAST(greatest(n_tokens - 19, 0) AS BIGINT) AS n_windows,
        coalesce(n_rep_windows, 0) AS n_rep_windows,
        coalesce(n_masked, 0) AS n_masked_tokens,
        CASE WHEN n_tokens > 0
          THEN (coalesce(n_masked, 0) * 1048576) // n_tokens
          ELSE 0 END AS masked_fp
      FROM base LEFT JOIN cov USING (doc_id)
      ORDER BY doc_id
    """.trim))

  // ---------------------------------------------------------------- q72

  /** q72 — weekly retention cohort matrix over the event stream: for
    * each acquisition cohort (a user's FIRST active week), how many of
    * its users were active again k weeks later. The product-analytics
    * staple (every BI export job exists to answer this); here it runs
    * where the events already live. Week = days-since-epoch div 7 —
    * NO weekofyear/date_trunc('week'): week-start and year-boundary
    * conventions differ across engines, integer day arithmetic
    * doesn't. One corpus-sized distinct on (user, week); everything
    * after is |users| rows hash-partitioned on the same key. */
  val q72: Q = Q(
    "q72_retention_cohorts",
    (s, d) =>
      Cohorts.retentionMatrix(
        eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH uw AS (
        SELECT DISTINCT user_id AS u,
          (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS w
        FROM events),
      ch AS (SELECT u, min(w) AS cohort_week FROM uw GROUP BY u)
      SELECT cohort_week, w - cohort_week AS week_offset,
        count(*) AS n_active
      FROM uw JOIN ch USING (u)
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  // ---------------------------------------------------------------- q73

  /** q73 — ordered-step conversion funnel (view → click → purchase):
    * users counted at the DEEPEST step reached, each step strictly
    * after the user's earliest completion of the previous one.
    * Strictly-after (`>`) is deliberate: a same-microsecond pair must
    * not advance the funnel, because equal-timestamp ordering would be
    * engine-dependent tie-breaking (the q34 lesson applied to
    * cross-event causality). Cascade of ≤|users|-row per-step min
    * aggregates, all keyed on user — no window, no event sort. */
  val q73: Q = Q(
    "q73_conversion_funnel",
    (s, d) =>
      Cohorts.funnel(eventsUs(s, d), "user_id",
        col("ts_us"), "event_type",
        Seq("view", "click", "purchase")),
    Some("""
      WITH e AS (
        SELECT user_id AS u, event_type AS t,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events),
      s0 AS (SELECT u, min(ts_us) AS t0 FROM e WHERE t = 'view' GROUP BY u),
      s1 AS (SELECT e.u, min(ts_us) AS t1
             FROM e JOIN s0 ON e.u = s0.u AND e.ts_us > s0.t0
             WHERE t = 'click' GROUP BY e.u),
      s2 AS (SELECT e.u, min(ts_us) AS t2
             FROM e JOIN s1 ON e.u = s1.u AND e.ts_us > s1.t1
             WHERE t = 'purchase' GROUP BY e.u),
      depth AS (
        SELECT CAST(CASE WHEN t2 IS NOT NULL THEN 3
                         WHEN t1 IS NOT NULL THEN 2
                         WHEN t0 IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS funnel_depth,
          CASE WHEN t2 IS NOT NULL THEN 'purchase'
               WHEN t1 IS NOT NULL THEN 'click'
               WHEN t0 IS NOT NULL THEN 'view'
               ELSE '(none)' END AS step
        FROM (SELECT DISTINCT u FROM e) u0
        LEFT JOIN s0 USING (u) LEFT JOIN s1 USING (u) LEFT JOIN s2 USING (u))
      SELECT funnel_depth, step, count(*) AS n_users
      FROM depth GROUP BY 1, 2 ORDER BY 1
    """.trim))

  // ---------------------------------------------------------------- q74

  /** q74 — equi-width histograms over the fact's numeric columns (the
    * distribution half of q62's profile; optimizer-stats / skew-
    * diagnosis input). Widths are powers of two so bucket assignment
    * is a pure IEEE exponent shift — exact on every engine; ONE scan,
    * row-local explode, one tiny (column, bucket) aggregate. */
  val q74: Q = Q(
    "q74_histogram",
    (s, d) =>
      Profiling.histogram(Tables.lineitem(s, d), Seq(
        "l_quantity" -> 8.0, "l_extendedprice" -> 4096.0,
        "l_discount" -> 0.015625, "l_tax" -> 0.015625)),
    Some("""
      SELECT column_name, bucket, bucket_lo, count(*) AS n_rows FROM (
        SELECT 'l_quantity' AS column_name,
          CAST(floor(l_quantity / 8.0) AS BIGINT) AS bucket,
          CAST(floor(l_quantity / 8.0) AS BIGINT) * 8.0 AS bucket_lo
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
          CAST(floor(l_extendedprice / 4096.0) AS BIGINT),
          CAST(floor(l_extendedprice / 4096.0) AS BIGINT) * 4096.0
        FROM lineitem
        UNION ALL
        SELECT 'l_discount',
          CAST(floor(l_discount / 0.015625) AS BIGINT),
          CAST(floor(l_discount / 0.015625) AS BIGINT) * 0.015625
        FROM lineitem
        UNION ALL
        SELECT 'l_tax',
          CAST(floor(l_tax / 0.015625) AS BIGINT),
          CAST(floor(l_tax / 0.015625) AS BIGINT) * 0.015625
        FROM lineitem)
      GROUP BY 1, 2, 3
      ORDER BY column_name, bucket NULLS FIRST
    """.trim))

  // ---------------------------------------------------------------- q75

  /** q75 — GROUPING SETS: the arbitrary-set member of the q58/q64/q59
    * family (ROLLUP is the hierarchical prefix chain, CUBE the full
    * lattice; GROUPING SETS expresses what neither can — here both
    * one-dimension marginals WITHOUT the grand total or the pair).
    * Same execution shape: ONE Expand + partial hash aggregate, one
    * scan; grouping_id disambiguates set membership from real NULLs.
    * SQL API on both engines — Spark's Dataset API deliberately only
    * exposes rollup/cube, so the SQL surface IS the idiomatic form. */
  val q75: Q = {
    val sql = """
      SELECT l_returnflag, l_linestatus,
        CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS nivel,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
          AS ingresos,
        COUNT(*) AS n_rows
      FROM lineitem_q75
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        (l_returnflag), (l_linestatus))
      ORDER BY nivel, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """.trim
    Q(
      "q75_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q75")
        s.sql(sql)
      },
      Some(sql.replace("lineitem_q75", "lineitem").replace(
        "grouping_id(l_returnflag, l_linestatus)",
        "GROUPING_ID(l_returnflag, l_linestatus)")))
  }

  // ---------------------------------------------------------------- q76

  /** q76 — q49's decontamination through the BLOOM-PREFILTER rung (the
    * middle of the three scale paths: broadcast hash set → Bloom +
    * confirm join → plain shuffle join). The train side is filtered
    * row-locally through the codegen'd `might_contain` before anything
    * shuffles; the exact confirm join removes the false-positive
    * trickle, so the output — and therefore the oracle — is
    * IDENTICAL to q49's. A deliberately UNDERSIZED filter (expected
    * items far below the fixture's shingle count) keeps the fpp real
    * in the verified path rather than vanishingly small. */
  val q76: Q = Q(
    "q76_eval_overlap_bloom",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.evalOverlapRate(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", contaminatedAt = 0.2,
        broadcastEval = false, bloomPrefilter = true,
        bloomExpectedItems = 1L << 14, bloomFpp = 0.05)
    },
    Some(q49OracleSql))

  // ---------------------------------------------------------------- q77

  /** q77 — snapshot diff between two corpus versions (the post-ingest
    * audit): old = docs outside residue 4 (mod 5), new = docs outside
    * residue 3 with every 7th text amended — so the fixture
    * deterministically exercises all four change kinds. The engine
    * joins 32-byte sha-256 fingerprints through ONE full-outer hash
    * join; the oracle reaches the same verdicts by comparing text
    * directly with IS DISTINCT FROM — the NULL ≡ NULL, NULL ≠ value
    * contract the per-column fingerprint implements (collision-free ≡
    * identical decisions). */
  val q77: Q = Q(
    "q77_snapshot_diff",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Diff.snapshotDiff(
        docs.where(col("doc_id") % 5 =!= 4),
        docs.where(col("doc_id") % 5 =!= 3)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))),
        "doc_id", "source", Seq("text"))
    },
    Some("""
      WITH o AS (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 5 <> 4),
      n AS (
        SELECT doc_id, source,
          CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id % 5 <> 3)
      SELECT COALESCE(n.source, o.source) AS source,
        CASE WHEN o.doc_id IS NULL THEN 'added'
             WHEN n.doc_id IS NULL THEN 'removed'
             WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
             ELSE 'unchanged' END AS change,
        count(*) AS n_docs
      FROM o FULL JOIN n ON o.doc_id = n.doc_id
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  // ---------------------------------------------------------------- q78

  /** q78 — FORWARD as-of join: for each click, the same user's next
    * purchase at-or-after it (time-to-convert — the attribution
    * counterpart of q43's look-back enrichment). Same single-window
    * union machinery run in reverse time order; the oracle is DuckDB's
    * native forward ASOF (`<=`). Right side deduplicated per
    * (user, ts) with max(event_id), the shared determinism contract. */
  val q78: Q = Q(
    "q78_asof_forward",
    (s, d) => {
      val e = eventsUs(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("purch_event_id"))
        .withColumn("purch_ts_us", col("ts_us"))
      Joins.asOf(clicks, purchases, "user_id", "ts_us", forward = true)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("purch_event_id"), col("purch_ts_us"),
          (col("purch_ts_us") - col("ts_us")).as("wait_us"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events),
      c AS (
        SELECT event_id, user_id, ts_us FROM e
        WHERE event_type = 'click'),
      p AS (
        SELECT user_id, ts_us AS purch_ts_us, max(event_id) AS purch_event_id
        FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT c.event_id, c.user_id, c.ts_us, p.purch_event_id,
        p.purch_ts_us, p.purch_ts_us - c.ts_us AS wait_us
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts_us <= p.purch_ts_us
      ORDER BY c.event_id
    """.trim))

  // ---------------------------------------------------------------- q79

  /** q79 — ingest-completeness matrix over the high-value event stream
    * (value ≥ 300 keeps the grid SPARSE, so the zero-fill path — the
    * whole point of the operator — is exercised, not just present):
    * one row per (event_type, day) across the observed span, zero
    * cells included. The q69 drift alarm's prior question: before
    * asking whether the mix shifted, ask whether anything arrived. */
  val q79: Q = Q(
    "q79_ingest_gaps",
    (s, d) =>
      Drift.ingestCompleteness(
        eventsUs(s, d).where(col("value") >= 300),
        to_date(timestamp_micros(col("ts_us"))), "event_type"),
    Some("""
      WITH b AS (
        SELECT CAST(ts AS DATE) AS day, event_type AS t
        FROM events WHERE value >= 300),
      obs AS (SELECT day, t, count(*) AS n FROM b GROUP BY 1, 2),
      span AS (SELECT min(day) AS lo, max(day) AS hi FROM b),
      types AS (SELECT DISTINCT t FROM b),
      alld AS (
        SELECT t, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
          AS day
        FROM types, span)
      SELECT alld.t AS event_type, alld.day AS day,
        CAST(COALESCE(n, 0) AS BIGINT) AS n_events
      FROM alld LEFT JOIN obs ON alld.day = obs.day AND alld.t = obs.t
      ORDER BY 1, 2
    """.trim))

  // ---------------------------------------------------------------- q80

  /** q80 — count-min sketch heavy-hitter estimates: exact top-20
    * whitespace-token frequencies side-by-side with their CMS
    * estimates (`est_cf` ≥ `cf` always — a counter is a superset sum).
    * The sketch's (r, b) groupBy key space is the fixed d·w grid, so
    * the shuffle is constant-size regardless of corpus OR vocabulary —
    * the scale rung under q65's |vocab|-key profile. The portable
    * affine bucket hashes are what let an "approximate" sketch
    * hash-verify: the estimate is a deterministic function of the
    * corpus, replayed bit-for-bit by the oracle. */
  val q80: Q = Q(
    "q80_cms_heavy_hitters",
    (s, d) =>
      Sketch.heavyHittersEstimate(Tables.documents(s, d), "text",
        topK = 20, width = 1024),
    Some(s"""
      WITH words AS (
        SELECT list_filter(string_split_regex(trim(text), '\\s+'),
          t -> t <> '') w
        FROM documents),
      tok AS (
        SELECT t, list_reduce(list_prepend(0::BIGINT,
          list_transform(range(1, length(t) + 1), j -> ascii(t[j]))),
          (h, c) -> ((h * 31) + c) % $P) AS h
        FROM words, LATERAL unnest(w) AS u(t)),
      rs AS (SELECT unnest(range(4)) AS r),
      sk AS (
        SELECT r, ((h * (2*r + 1) + (1000003*r + 12345)) % $P) % 1024 AS b,
          count(*) AS cnt
        FROM tok, rs GROUP BY 1, 2),
      top AS (
        SELECT t AS term, h, count(*) AS cf FROM tok GROUP BY 1, 2
        ORDER BY cf DESC, term LIMIT 20),
      pb AS (
        SELECT term, cf, r,
          ((h * (2*r + 1) + (1000003*r + 12345)) % $P) % 1024 AS b
        FROM top, rs)
      SELECT term, cf, CAST(min(COALESCE(cnt, 0)) AS BIGINT) AS est_cf
      FROM pb LEFT JOIN sk USING (r, b)
      GROUP BY term, cf
      ORDER BY cf DESC, term
    """.trim))

  // ---------------------------------------------------------------- q81

  /** q81 — trailing 7-day moving revenue per nation: the RANGE-frame
    * window surface (value distance, not row count — missing days must
    * NOT stretch the window). The window sees only the |nations|·|days|
    * daily-total frame; money is exact decimal end-to-end and the
    * frame axis is integer days-since-epoch, both engine-portable. */
  val q81: Q = Q(
    "q81_moving_revenue",
    (s, d) => {
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
      Rolling.movingDailySum(j, col("n_name"),
          col("o_orderdate").cast("date"), col("o_totalprice"), 7)
        .select(col("key").as("nation"), col("day"),
          col("total").as("rev"), col("moving").as("rev_7d"))
        .orderBy(col("nation"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS day,
          SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT nation, day, CAST(rev AS DOUBLE) AS rev,
        CAST(SUM(rev) OVER (PARTITION BY nation
          ORDER BY day - DATE '1970-01-01'
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
      FROM daily ORDER BY nation, day
    """.trim))

  // ---------------------------------------------------------------- q82

  /** q82 — SCD2 validity intervals from the event stream: each user's
    * event_type reigns [valid_from, valid_to) with consecutive equal
    * values collapsed and the latest interval open (NULL). One shuffle
    * on user_id; both windows share it (plan-pinned). Microsecond-long
    * timestamps keep the interval arithmetic integer-exact. */
  val q82: Q = Q(
    "q82_scd2_intervals",
    (s, d) =>
      Scd.intervals(
          eventsUs(s, d),
          col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .select(col("key").as("user_id"), col("tie").as("event_id"),
          col("value").as("event_type"),
          col("valid_from"), col("valid_to"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id")),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          event_type
        FROM events),
      c AS (
        SELECT user_id, event_id, ts_us, event_type,
          lag(event_type) OVER
            (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
          row_number() OVER
            (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        FROM e),
      ch AS (
        SELECT * FROM c
        WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
      SELECT user_id, event_id, event_type, ts_us AS valid_from,
        lead(ts_us) OVER
          (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
      FROM ch ORDER BY user_id, valid_from, event_id
    """.trim))

  // ---------------------------------------------------------------- q83

  /** q83 — robust daily-volume anomaly per event type: the median/MAD
    * robust z-score ((n − median) / MAD), the third monitoring rung
    * after q69 (mix shift) and q79 (delivery gaps). Median and MAD of
    * integer counts land on the 0.5/0.25 dyadic grids (the q45 trick),
    * so the score is one IEEE division of exact values — portable.
    * Constant-history types (MAD 0) score NULL. */
  val q83: Q = Q(
    "q83_volume_anomaly",
    (s, d) =>
      Drift.dailyVolumeAnomaly(
        eventsUs(s, d),
        to_date(timestamp_micros(col("ts_us"))), "event_type"),
    Some("""
      WITH b AS (
        SELECT CAST(ts AS DATE) AS day, event_type AS t FROM events),
      c AS (SELECT t, day, count(*) AS n FROM b GROUP BY 1, 2),
      med AS (SELECT t, quantile_cont(n, 0.5) AS m FROM c GROUP BY 1),
      dev AS (
        SELECT c.t, c.day, n, m, abs(n - m) AS d
        FROM c JOIN med USING (t)),
      mad AS (SELECT t, quantile_cont(d, 0.5) AS md FROM dev GROUP BY 1)
      SELECT dev.t AS event_type, dev.day AS day,
        CAST(n AS BIGINT) AS n_events,
        CASE WHEN md = 0 THEN NULL ELSE (n - m) / md END AS score
      FROM dev JOIN mad USING (t)
      ORDER BY 1, 2
    """.trim))

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

  // ---------------------------------------------------------------- q85

  /** q85 — state dwell-time rollup over q82's SCD2 intervals: per
    * event_type, how many closed reigns and how long they lasted
    * (total + mean dwell in µs, mean as INTEGER division — `div` both
    * engines, no doubles). Open intervals are censored, not clocked. */
  val q85: Q = Q(
    "q85_state_dwell",
    (s, d) =>
      Scd.dwellByValue(
        eventsUs(s, d),
        col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .select(col("value").as("event_type"), col("n_intervals"),
          col("total_dwell"), col("mean_dwell"))
        .orderBy(col("event_type")),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          event_type
        FROM events),
      c AS (
        SELECT user_id, event_id, ts_us, event_type,
          lag(event_type) OVER
            (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev,
          row_number() OVER
            (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        FROM e),
      ch AS (
        SELECT * FROM c
        WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
      iv AS (
        SELECT user_id, event_type, ts_us AS valid_from,
          lead(ts_us) OVER
            (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
        FROM ch)
      SELECT event_type, count(*) AS n_intervals,
        CAST(sum(valid_to - valid_from) AS BIGINT) AS total_dwell,
        CAST(sum(valid_to - valid_from) // count(*) AS BIGINT)
          AS mean_dwell
      FROM iv WHERE valid_to IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type
    """.trim))

  // ---------------------------------------------------------------- q86

  /** q86 — user growth curve: per day, DAU, first-seen users, and the
    * cumulative distinct user count as a running SUM of first-seens
    * ("distinct ever as of d" ≡ "first day ≤ d" — never a running
    * distinct over events). The running window is \|days\|-row
    * bounded. */
  val q86: Q = Q(
    "q86_growth_curve",
    (s, d) =>
      Cohorts.growthCurve(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH b AS (
        SELECT CAST(ts AS DATE) AS day, user_id AS u FROM events),
      dau AS (SELECT day, count(DISTINCT u) AS dau FROM b GROUP BY 1),
      f AS (SELECT u, min(day) AS day FROM b GROUP BY 1),
      nu AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
      SELECT dau.day AS day, CAST(dau.dau AS BIGINT) AS dau,
        CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
        CAST(sum(COALESCE(nu.new_users, 0)) OVER (ORDER BY dau.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_users
      FROM dau LEFT JOIN nu ON dau.day = nu.day
      ORDER BY dau.day
    """.trim))

  // ---------------------------------------------------------------- q87

  /** q87 — trailing 7-day distinct active users (WAU) per observed
    * day, by the contribution-interval trick: explode each distinct
    * (user, day) into the `windowDays` days it covers, re-distinct,
    * count — a sliding DISTINCT as two partial-aggregable passes with
    * a bounded ×7 blowup of the reduced frame, never per-frame window
    * state. */
  val q87: Q = Q(
    "q87_sliding_wau",
    (s, d) =>
      Cohorts.slidingActiveUsers(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us"))), windowDays = 7),
    Some("""
      WITH b AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        FROM events),
      cov AS (
        SELECT DISTINCT u, unnest(generate_series(day,
          day + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE AS day
        FROM b),
      days AS (SELECT DISTINCT day FROM b)
      SELECT days.day AS day, CAST(count(*) AS BIGINT) AS active_users
      FROM days JOIN cov ON days.day = cov.day
      GROUP BY 1 ORDER BY 1
    """.trim))

  // ---------------------------------------------------------------- q88

  /** q88 — equi-depth histograms over lineitem's integer-valued
    * columns: ~25% of rows per bucket split at the exact dyadic
    * 25/50/75 percentiles (integer-valued inputs ⇒ the interpolated
    * threshold is an exact rational on both engines — the q45/q50
    * trick one step further); NULLs in the accounted −1 bucket. */
  val q88: Q = Q(
    "q88_equidepth_histogram",
    (s, d) =>
      Profiling.equiDepthHistogram(Tables.lineitem(s, d),
        Seq("l_quantity", "l_linenumber", "l_suppkey")),
    Some("""
      WITH th AS (
        SELECT quantile_cont(l_quantity, [0.25, 0.5, 0.75]) AS qq,
          quantile_cont(l_linenumber, [0.25, 0.5, 0.75]) AS ql,
          quantile_cont(l_suppkey, [0.25, 0.5, 0.75]) AS qs
        FROM lineitem),
      e AS (
        SELECT 'l_quantity' AS column_name, CASE
          WHEN l_quantity IS NULL THEN -1
          WHEN l_quantity <= qq[1] THEN 0
          WHEN l_quantity <= qq[2] THEN 1
          WHEN l_quantity <= qq[3] THEN 2 ELSE 3 END AS bucket
        FROM lineitem, th
        UNION ALL
        SELECT 'l_linenumber', CASE
          WHEN l_linenumber IS NULL THEN -1
          WHEN l_linenumber <= ql[1] THEN 0
          WHEN l_linenumber <= ql[2] THEN 1
          WHEN l_linenumber <= ql[3] THEN 2 ELSE 3 END
        FROM lineitem, th
        UNION ALL
        SELECT 'l_suppkey', CASE
          WHEN l_suppkey IS NULL THEN -1
          WHEN l_suppkey <= qs[1] THEN 0
          WHEN l_suppkey <= qs[2] THEN 1
          WHEN l_suppkey <= qs[3] THEN 2 ELSE 3 END
        FROM lineitem, th)
      SELECT column_name, CAST(bucket AS INT) AS bucket,
        count(*) AS n_rows
      FROM e GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  // ---------------------------------------------------------------- q89

  /** q89 — HyperLogLog distinct users per event type
    * ([[Sketch.hllDistinct]]): the fixed-memory cardinality rung under
    * exact count(distinct). The 64-bit-ish key is built from two
    * independent affine-mod-P hashes SQUARED mod P before combining —
    * sequential ids under a purely affine map are MORE equidistributed
    * than random (too few bucket collisions), which biases the
    * occupancy-based estimator; the quadratic step restores hash-like
    * statistics while staying exact BIGINT arithmetic both engines
    * replay. The oracle rebuilds registers bit-for-bit and applies the
    * identical literal constants (α, the m·ln(m/V) linear-counting
    * table) — see [[Sketch.hllLinearLut]] for why the literals, not
    * each engine's libm, carry the transcendentals. */
  /** A Double as SQL text DuckDB will type as DOUBLE, not DECIMAL: an
    * exponent forces the double parser, which is correctly-rounded on
    * the shortest round-trip form `Double.toString` emits — the plain
    * form would be read as DECIMAL(18,_) and both quantize and
    * overflow. */
  private def sqlDouble(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "E0"
  }

  /** DuckDB fragment: the full HLL replay over events/user_id — the
    * squared-affine hashing, register build, and the estimate fold —
    * ending in `hll (event_type, n_filled, n_empty, est_distinct)`.
    * Shared by q89 and the q148 accuracy evaluation. */
  private def duckHllEvents(m: Int, wBits: Int): String = {
    val k = wBits + 1
    val alpha = Sketch.hllAlpha(m)
    val lut = Sketch.hllLinearLut(m)
    s"""e AS (
          SELECT event_type,
            (user_id % $P * 2654435761 % $P + 12345) % $P AS h1,
            (user_id % $P * 1779033703 % $P + 54321) % $P AS h2
          FROM events),
        h AS (
          SELECT event_type, (h1*h1 % $P) * $P + (h2*h2 % $P) AS h FROM e),
        b AS (
          SELECT event_type, h % $m AS b, h // $m AS w FROM h),
        r AS (
          SELECT event_type, b, CASE WHEN w = 0 THEN ${wBits + 1}
            ELSE $wBits - length(bin(w)) + 1 END AS rho FROM b),
        reg AS (
          SELECT event_type, b, max(rho) AS mj FROM r GROUP BY 1, 2),
        agg AS (
          SELECT event_type, count(*) AS n_filled,
            sum(1::BIGINT << ($k - mj)) AS s_present
          FROM reg GROUP BY 1),
        sc AS (
          SELECT event_type, n_filled, ($m - n_filled) AS n_empty,
            ($m::BIGINT - n_filled) * (1::BIGINT << $k) + s_present AS s
          FROM agg),
        hll AS (
          SELECT event_type, n_filled, n_empty,
            CASE WHEN n_empty > 0 AND
                ((${sqlDouble(alpha)} * ${sqlDouble((m.toLong * m).toDouble)}) *
                  ${sqlDouble(math.pow(2.0, k))}) / CAST(s AS DOUBLE)
                  <= ${sqlDouble(2.5 * m)}
              THEN list_extract([${lut.map(sqlDouble).mkString(", ")}],
                CAST(n_empty AS INT))
              ELSE ((${sqlDouble(alpha)} * ${sqlDouble((m.toLong * m).toDouble)}) *
                ${sqlDouble(math.pow(2.0, k))}) / CAST(s AS DOUBLE)
            END AS est_distinct
          FROM sc)"""
  }

  val q89: Q = {
    val m = 256
    val wBits = 52
    Q(
      "q89_hll_distinct",
      (s, d) => {
        val h1 = (col("user_id") % P * 2654435761L % P + 12345L) % P
        val h2 = (col("user_id") % P * 1779033703L % P + 54321L) % P
        val hashed = Tables.events(s, d).select(col("event_type"),
          ((h1 * h1 % P) * P + (h2 * h2 % P)).as("h"))
        Sketch.hllDistinct(hashed, "event_type", "h", m, wBits)
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH ${duckHllEvents(m, wBits)}
        SELECT event_type, n_filled, n_empty, est_distinct
        FROM hll ORDER BY event_type
      """.trim))
  }

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

  // ---------------------------------------------------------------- q91

  /** q91 — source-overlap matrix ([[Dedup.sourceOverlapMatrix]]):
    * exact shingle-vocabulary Jaccard for every source pair — the
    * corpus-composition signal (which feeds republish each other)
    * ahead of any per-doc dedup. Intersection fan-out is bounded by
    * the SOURCE count, never the corpus. */
  val q91: Q = Q(
    "q91_source_overlap",
    (s, d) =>
      Dedup.sourceOverlapMatrix(Tables.documents(s, d), "source", "text"),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      srcsh AS (
        SELECT DISTINCT d.source AS src, s.hs
        FROM sh s JOIN documents d USING (doc_id)),
      sz AS (SELECT src, count(*) AS n FROM srcsh GROUP BY 1),
      inter AS (
        SELECT a.src sa, b.src sb, count(*) AS c
        FROM srcsh a JOIN srcsh b ON a.hs = b.hs AND a.src < b.src
        GROUP BY 1, 2)
      SELECT sa AS source_a, sb AS source_b, c AS n_common,
        (na.n + nb.n - c) AS n_union,
        (CAST(c AS DOUBLE) / (na.n + nb.n - c)) AS jaccard
      FROM inter
      JOIN sz na ON na.src = sa
      JOIN sz nb ON nb.src = sb
      ORDER BY source_a, source_b
    """.trim))

  // ---------------------------------------------------------------- q92

  /** q92 — fuzzy entity matching ([[Dedup.fuzzyMatchPairs]]): part
    * names within two edits of each other, blocked on the second
    * token (4-char-prefix fallback for single-token names) so the
    * quadratic edit distance only runs inside blocks of the DISTINCT
    * name set — record linkage that shingle dedup can't express at
    * name length. The oracle replays the block key, the 4096-name
    * block cap (a no-op at fixture scale, mirrored anyway so the
    * contract is checked, not assumed), and the post-join distance
    * filter identically. */
  val q92: Q = Q(
    "q92_fuzzy_match",
    (s, d) =>
      Dedup.fuzzyMatchPairs(Tables.part(s, d), "p_name", maxDist = 2),
    Some("""
      WITH g AS (
        SELECT p_name AS name, count(*) AS n_rows FROM part GROUP BY 1),
      b AS (
        SELECT name, n_rows,
          CASE WHEN strpos(name, ' ') = 0 THEN substr(name, 1, 4)
               ELSE split_part(name, ' ', 2) END AS blk
        FROM g),
      k AS (
        SELECT name, n_rows, blk FROM (
          SELECT b.*, count(*) OVER (PARTITION BY blk) AS c_blk FROM b)
        WHERE c_blk <= 4096)
      SELECT a.name AS name_a, c.name AS name_b,
        CAST(levenshtein(a.name, c.name) AS INT) AS distance,
        a.n_rows AS n_a, c.n_rows AS n_b
      FROM k a JOIN k c ON a.blk = c.blk AND a.name < c.name
      WHERE levenshtein(a.name, c.name) <= 2
      ORDER BY name_a, name_b
    """.trim))

  // ---------------------------------------------------------------- q93

  /** q93 — per-stratum percentile normalization
    * ([[Profiling.stratumPercentile]]): each doc's length percentile
    * WITHIN its language — the per-stratum rank that makes "keep each
    * language's top quartile" a one-filter curation policy where a
    * global cut would starve compact-alphabet languages. Exact-integer
    * rank arithmetic, one IEEE division, identical percent_rank
    * definition on both engines. */
  val q93: Q = Q(
    "q93_stratum_percentile",
    (s, d) =>
      Profiling.stratumPercentile(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          col("n_chars")),
        "lang", "n_chars")
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, lang, n_chars,
        percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pct
      FROM documents ORDER BY doc_id
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

  // ---------------------------------------------------------------- q95

  /** q95 — numeric distribution drift ([[Drift.histogramDrift]]):
    * value-distribution L1 between two event slices on a shared
    * dyadic bucket grid — q69's alarm for CONTINUOUS signals (loss
    * spikes, unit changes). PSI/KL deliberately avoided: `ln` is not
    * engine-portable, the exact-integer L1 carries the alarm. */
  val q95: Q = Q(
    "q95_value_drift",
    (s, d) => {
      val e = Tables.events(s, d)
      Drift.histogramDrift(
        e.where(col("event_type") === "view").select(col("value")),
        e.where(col("event_type") === "purchase").select(col("value")),
        "value", 64.0)
    },
    Some("""
      WITH o AS (
        SELECT CAST(COALESCE(floor(value / 64.0),
          -9223372036854775808) AS BIGINT) AS bucket
        FROM events WHERE event_type = 'view'),
      n AS (
        SELECT CAST(COALESCE(floor(value / 64.0),
          -9223372036854775808) AS BIGINT) AS bucket
        FROM events WHERE event_type = 'purchase'),
      oc AS (SELECT bucket, count(*) AS c_old FROM o GROUP BY 1),
      nc AS (SELECT bucket, count(*) AS c_new FROM n GROUP BY 1),
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

  // ---------------------------------------------------------------- q97

  /** q97 — collocation lift ([[TextAnalysis.collocationLift]]): top
    * bigrams by `c_ab·N / (c_a·c_b)` — PMI without the log (log is
    * monotone, the ranking is identical, and `ln` isn't
    * engine-portable), support floor ≥ 5 keeping hapax pairs out. */
  val q97: Q = Q(
    "q97_collocations",
    (s, d) =>
      TextAnalysis.collocationLift(Tables.documents(s, d), "text",
        topK = 20, minCount = 5L),
    Some("""
      WITH w AS (
        SELECT list_filter(string_split_regex(trim(text), '\s+'),
          t -> t <> '') AS w
        FROM documents),
      uni AS (
        SELECT t, count(*) AS c
        FROM w, LATERAL unnest(w) AS u(t) GROUP BY 1),
      n AS (SELECT sum(c) AS n_tokens FROM uni),
      bi AS (
        SELECT bigram, count(*) AS c_ab FROM (
          SELECT unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i + 1])) AS bigram
          FROM w) t
        GROUP BY 1 HAVING count(*) >= 5)
      SELECT bigram, c_ab, ua.c AS c_a, ub.c AS c_b,
        CAST(((c_ab * 1048576) * n_tokens)
          // (ua.c * ub.c) AS BIGINT) AS lift_fp
      FROM bi
      JOIN uni ua ON ua.t = split_part(bigram, ' ', 1)
      JOIN uni ub ON ub.t = split_part(bigram, ' ', 2)
      CROSS JOIN n
      ORDER BY lift_fp DESC, bigram LIMIT 20
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

  // ---------------------------------------------------------------- q99

  /** q99 — vocabulary coverage ([[TextAnalysis.vocabCoverage]]):
    * per-doc OOV rate against the corpus's top-1000 terms — the
    * tokenizer-coverage pre-flight. One explode pass, TakeOrdered
    * top-K, K-row broadcast membership join. */
  val q99: Q = Q(
    "q99_vocab_coverage",
    (s, d) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, d), "doc_id",
        "text", topK = 1000),
    Some("""
      WITH words AS (
        SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
          t -> t <> '') w
        FROM documents),
      tok AS (SELECT doc_id, t AS term FROM words, LATERAL unnest(w) AS u(t)),
      vocab AS (
        SELECT term FROM (
          SELECT term, count(*) AS cf FROM tok GROUP BY 1
          ORDER BY cf DESC, term LIMIT 1000))
      SELECT doc_id, count(*) AS n_tokens,
        CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_oov,
        CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*) AS oov_rate
      FROM tok LEFT JOIN vocab v ON tok.term = v.term
      GROUP BY doc_id ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q100

  /** q100 — shingle containment pairs ([[Dedup.containmentPairs]]):
    * the ASYMMETRIC near-dup rung — `i / min(na, nb)` — that catches a
    * short document quoted inside a long one, where q17's symmetric
    * Jaccard stays under threshold because the long doc's mass
    * dominates the union. The decontamination gap this closes is the
    * common real-world one: benchmark questions embedded in crawled
    * pages. Same inverted-index/df-cap shape as q17; the oracle
    * replays the metric with `least`. */
  val q100: Q = Q(
    "q100_containment_pairs",
    (s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.8, maxDf = 100),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      shf AS (
        SELECT doc_id, hs FROM sh
        QUALIFY count(*) OVER (PARTITION BY hs) <= 100
      ),
      sz AS (SELECT doc_id, count(*) n FROM shf GROUP BY 1),
      inter AS (
        SELECT a.doc_id da, b.doc_id db, count(*) i
        FROM shf a JOIN shf b ON a.hs = b.hs AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT da AS doc_a, db AS doc_b, i AS n_common,
        least(sa.n, sb.n) AS n_small,
        (CAST(i AS DOUBLE) / least(sa.n, sb.n)) AS containment
      FROM inter
      JOIN sz sa ON sa.doc_id = da
      JOIN sz sb ON sb.doc_id = db
      WHERE (CAST(i AS DOUBLE) / least(sa.n, sb.n)) >= 0.8
      ORDER BY doc_a, doc_b
    """.trim))

  // --------------------------------------------------------------- q101

  /** q101 — cross-corpus containment
    * ([[Dedup.crossContainmentPairsSplit]]): the decontamination gate
    * asked with the RIGHT metric — what fraction of each eval doc's
    * shingles appears in a training doc (`i / n_eval`), q100's
    * asymmetric argument pointed across the train/eval fence. Same
    * parity split and single-cache shape as q36; the oracle swaps the
    * Jaccard for the right-normalized containment. */
  val q101: Q = Q(
    "q101_cross_containment",
    (s, d) =>
      Dedup.crossContainmentPairsSplit(Tables.documents(s, d),
        "doc_id", "text", leftSide = col("doc_id") % 2 === 0,
        threshold = 0.6, maxDf = 100),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      hot AS (
        SELECT hs FROM sh GROUP BY hs HAVING count(*) > 100),
      capped AS (
        SELECT doc_id, hs FROM sh WHERE hs NOT IN (SELECT hs FROM hot)),
      a AS (SELECT doc_id, hs FROM capped WHERE doc_id % 2 = 0),
      b AS (SELECT doc_id, hs FROM capped WHERE doc_id % 2 = 1),
      szb AS (SELECT doc_id, count(*) n FROM b GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id da, b.doc_id db, count(*) i
        FROM a JOIN b USING (hs)
        GROUP BY a.doc_id, b.doc_id)
      SELECT da AS left_id, db AS right_id,
        i AS n_common, szb.n AS n_right,
        (CAST(i AS DOUBLE) / szb.n) AS containment
      FROM inter
      JOIN szb ON szb.doc_id = db
      WHERE (CAST(i AS DOUBLE) / szb.n) >= 0.6
      ORDER BY left_id, right_id
    """.trim))

  // --------------------------------------------------------------- q102

  /** q102 — winsorization ([[Profiling.winsorize]]): clamp
    * `events.value` to its exact [p01, p99] interpolated percentiles —
    * robust outlier damping that keeps the rows (unlike a filter),
    * the cleaning step between profiling and training. The percentile
    * is q88's proven-portable aggregate; the clip is a row-local CASE
    * over the broadcast one-row bounds. */
  val q102: Q = Q(
    "q102_winsorize",
    (s, d) =>
      Profiling.winsorize(
        Tables.events(s, d).select(col("event_id"), col("value")),
        "value", pLo = 0.01, pHi = 0.99)
        .orderBy(col("event_id")),
    Some("""
      WITH th AS (
        SELECT quantile_cont(value, [0.01, 0.99]) AS t FROM events)
      SELECT event_id, value, t[1] AS lo, t[2] AS hi,
        CASE WHEN value < t[1] THEN t[1]
             WHEN value > t[2] THEN t[2]
             ELSE value END AS clipped
      FROM events, th ORDER BY event_id
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

  // --------------------------------------------------------------- q104

  /** q104 — data-quality rule audit ([[Rules.audit]] +
    * [[Rules.refAudit]]): the declarative constraint suite (Deequ's
    * role) — three row-local rules in ONE scan of orders plus an FK
    * rule against broadcast customer keys, one report row per rule.
    * NULL predicates count as violations (coalesce(pred, false) — the
    * 3VL trap the scaladoc documents). */
  val q104: Q = Q(
    "q104_rule_audit",
    (s, d) => {
      val orders = Tables.orders(s, d)
      Rules.audit(orders, Seq(
        Rules.Rule("orderdate_not_null", col("o_orderdate").isNotNull),
        Rules.Rule("orderstatus_domain",
          col("o_orderstatus").isin("O", "F", "P")),
        Rules.Rule("totalprice_positive", col("o_totalprice") > 0)))
        .unionByName(Rules.refAudit(orders, "o_custkey",
          Tables.customer(s, d), "c_custkey", "custkey_fk"))
        .orderBy(col("rule"))
    },
    Some("""
      WITH s AS (
        SELECT count(*) AS n_rows,
          sum(CASE WHEN coalesce(o_orderdate IS NOT NULL, FALSE)
                THEN 0 ELSE 1 END) AS v0,
          sum(CASE WHEN coalesce(o_orderstatus IN ('O','F','P'), FALSE)
                THEN 0 ELSE 1 END) AS v1,
          sum(CASE WHEN coalesce(o_totalprice > 0, FALSE)
                THEN 0 ELSE 1 END) AS v2
        FROM orders),
      fk AS (
        SELECT count(*) AS n_rows,
          sum(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END) AS v
        FROM orders o LEFT JOIN (
          SELECT DISTINCT c_custkey AS k FROM customer
          WHERE c_custkey IS NOT NULL) c
          ON o.o_custkey = c.k)
      SELECT rule, n_rows, CAST(n_violations AS BIGINT) AS n_violations,
        CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE)
          AS violation_rate
      FROM (
        SELECT 'orderdate_not_null' AS rule, n_rows, v0 AS n_violations
          FROM s
        UNION ALL SELECT 'orderstatus_domain', n_rows, v1 FROM s
        UNION ALL SELECT 'totalprice_positive', n_rows, v2 FROM s
        UNION ALL SELECT 'custkey_fk', n_rows, v FROM fk)
      ORDER BY rule
    """.trim))

  // --------------------------------------------------------------- q105

  /** q105 — bigram fluency ([[TextAnalysis.bigramFluency]]): the
    * LM-quality gate (CCNet/Gopher perplexity filtering) with a
    * log-free surrogate — mean add-one-smoothed bigram probability on
    * a 2^-20 fixed-point grid, so the per-doc sum is an exact integer
    * and the score replays bit-for-bit (`ln` would not — q52's
    * argument). One persisted row-local bigram explode feeds model,
    * context and scoring; the one-row vocab size is a q84-shape
    * scalar append. */
  val q105: Q = Q(
    "q105_bigram_fluency",
    (s, d) =>
      TextAnalysis.bigramFluency(Tables.documents(s, d), "doc_id", "text"),
    Some("""
      WITH w AS (
        SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
          t -> t <> '') AS w
        FROM documents),
      bi AS (
        SELECT doc_id, w[i] AS a, w[i + 1] AS b
        FROM w, LATERAL unnest(range(1, len(w))) AS t(i)
        WHERE len(w) >= 2),
      model AS (SELECT a, b, count(*) AS c_ab FROM bi GROUP BY 1, 2),
      ctx AS (SELECT a, count(*) AS c_a FROM bi GROUP BY 1),
      v AS (SELECT count(DISTINCT a) AS vsz FROM bi),
      fp AS (
        SELECT m.a, m.b,
          CAST(floor(1048576.0 *
            ((CAST(c_ab AS DOUBLE) + 1.0) /
              (CAST(c_a AS DOUBLE) + CAST(vsz AS DOUBLE))))
            AS BIGINT) AS f
        FROM model m JOIN ctx USING (a) CROSS JOIN v)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        CAST(sum(f) AS BIGINT) AS sum_fp,
        CAST(sum(f) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS fluency_fp
      FROM bi JOIN fp USING (a, b)
      GROUP BY doc_id ORDER BY doc_id
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

  // --------------------------------------------------------------- q108

  /** q108 — MAD outlier flags ([[Profiling.madOutliers]]): the robust
    * `|x − median| > k·MAD` labeller — both center and spread are
    * interpolated percentiles (the q88/q102-proven portable pair), the
    * flag one IEEE comparison; rows are kept, not dropped ([[q102]]
    * clips, this one labels). */
  val q108: Q = Q(
    "q108_mad_outliers",
    (s, d) =>
      Profiling.madOutliers(
        Tables.events(s, d).select(col("event_id"), col("value")),
        "value", k = 3.0)
        .orderBy(col("event_id")),
    Some("""
      WITH m AS (SELECT quantile_cont(value, 0.5) med FROM events),
      s AS (
        SELECT quantile_cont(abs(value - med), 0.5) mad, min(med) med
        FROM events, m)
      SELECT event_id, value, mad, med,
        (abs(value - med) > 3.0 * mad) AS is_outlier
      FROM events, s ORDER BY event_id
    """.trim))

  // --------------------------------------------------------------- q109

  /** q109 — JSON payload field stats ([[SemiStructured.jsonFieldStats]]):
    * schema-on-read over `events.props` — `get_json_object` (codegen'd
    * JSONPath walk, no UDF, malformed → NULL) extracts `$.k`, then one
    * partial-aggregated pass profiles presence/sum/mean per event
    * type. The capability this lands is the semi-structured column
    * class itself. */
  val q109: Q = Q(
    "q109_json_field_stats",
    (s, d) =>
      SemiStructured.jsonFieldStats(Tables.events(s, d), "props", "k",
        "event_type"),
    Some("""
      SELECT event_type,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS n_present,
        CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_value,
        CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE) /
          CAST(count(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE)
          AS mean_value
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim))

  // --------------------------------------------------------------- q110

  /** q110 — curation funnel ([[TextAnalysis.curationFunnel]]): the
    * per-source survival report of the standard quality-gate stack
    * (non-empty → char window → min tokens → distinct-token ratio),
    * each stage cumulative — the first page of every curation writeup
    * and the per-feed health gate of an ingest pipeline. Row-local
    * gates, one |sources|-row shuffle, stage unpivot on the aggregate
    * only. */
  val q110: Q = Q(
    "q110_curation_funnel",
    (s, d) =>
      TextAnalysis.curationFunnel(Tables.documents(s, d), "text",
        "source", minChars = 100, maxChars = 20000, minTokens = 20,
        minDistinctRatio = 0.25),
    Some("""
      WITH g AS (
        SELECT source,
          (length(trim(text)) > 0) AS g1,
          (length(trim(text)) > 0
            AND length(text) BETWEEN 100 AND 20000) AS g2,
          (length(trim(text)) > 0
            AND length(text) BETWEEN 100 AND 20000
            AND len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> t <> '')) >= 20) AS g3,
          (length(trim(text)) > 0
            AND length(text) BETWEEN 100 AND 20000
            AND len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> t <> '')) >= 20
            AND (CAST(len(list_distinct(list_filter(
                  string_split_regex(trim(text), '\s+'), t -> t <> '')))
                AS DOUBLE) /
              CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                t -> t <> '')) AS DOUBLE)) >= 0.25) AS g4
        FROM documents),
      sums AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
          CAST(sum(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
          CAST(sum(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
          CAST(sum(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
        FROM g GROUP BY 1)
      SELECT source, stage, gate, n_docs, survivors,
        CAST(survivors AS DOUBLE) / CAST(n_docs AS DOUBLE)
          AS survival_rate
      FROM (
        SELECT source, 1 AS stage, 'nonempty' AS gate, n_docs,
          s1 AS survivors FROM sums
        UNION ALL SELECT source, 2, 'chars_in_range', n_docs, s2 FROM sums
        UNION ALL SELECT source, 3, 'min_tokens', n_docs, s3 FROM sums
        UNION ALL SELECT source, 4, 'distinct_ratio', n_docs, s4
          FROM sums)
      ORDER BY source, stage
    """.trim))

  // --------------------------------------------------------------- q111

  /** q111 — mergeable grid percentile ([[Profiling.gridPercentile]]):
    * the bounded-state percentile — dyadic-width bin counters (the
    * q74 histogram contract), answer = lower edge of the first bin
    * whose cumulative count reaches `ceil(p·N)`, error ≤ width by
    * construction. The state is one counter per non-empty bin, so the
    * same sketch serves single-pass 100 TB profiling, incremental
    * stores, and streaming accumulation where the exact `percentile`
    * aggregate's value-multiset state would spill
    * (GridPercentileSpec pins bin-count mergeability:
    * batch-split ≡ one-shot). Engine-exact throughout: dyadic bins,
    * long counters, one IEEE multiply before `ceil`. */
  val q111: Q = Q(
    "q111_grid_percentile",
    (s, d) =>
      Profiling.gridPercentile(Tables.events(s, d), "value",
        width = 0.25, ps = Seq(0.25, 0.5, 0.9, 0.99)),
    Some("""
      WITH b AS (
        SELECT CAST(floor(value / 0.25e0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      c AS (
        SELECT bin, n, CAST(sum(n) OVER (ORDER BY bin
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM b),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS n_values FROM b),
      p AS (SELECT CAST(unnest([0.25e0, 0.5e0, 0.9e0, 0.99e0])
        AS DOUBLE) AS p),
      x AS (
        SELECT p.p, t.n_values,
          CAST(ceil(p.p * t.n_values) AS BIGINT) AS target_rank,
          min(c.bin) AS bin
        FROM p CROSS JOIN t
        JOIN c ON c.cum >= CAST(ceil(p.p * t.n_values) AS BIGINT)
        GROUP BY 1, 2, 3)
      SELECT p, n_values, target_rank,
        CAST(bin AS DOUBLE) * 0.25e0 AS est_percentile
      FROM x ORDER BY p
    """.trim))

  // --------------------------------------------------------------- q112

  /** q112 — unigram distribution divergence
    * ([[TextAnalysis.unigramDivergence]]): pairwise total-variation
    * distance between sources' unigram distributions — the
    * corpus-composition shift q91's set overlap can't see (same
    * vocabulary, different weights). Log-free by design (TV, not
    * KL/JS): exact `|c_a·N_b − c_b·N_a|` integer sums, closed-form
    * union-vocab tail, one IEEE division. */
  val q112: Q = Q(
    "q112_unigram_divergence",
    (s, d) =>
      TextAnalysis.unigramDivergence(Tables.documents(s, d), "source",
        "text"),
    Some("""
      WITH tok AS (
        SELECT source AS g, t
        FROM documents, LATERAL unnest(
          regexp_extract_all(lower(text), '([a-z]+|[0-9]+)', 1)) AS u(t)),
      counts AS (
        SELECT g, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
      totals AS (
        SELECT g, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
      pairs AS (
        SELECT a.g ga, b.g gb, ta.n na, tb.n nb, a.c ca, b.c cb
        FROM counts a JOIN counts b ON a.t = b.t AND a.g < b.g
        JOIN totals ta ON ta.g = a.g
        JOIN totals tb ON tb.g = b.g),
      agg AS (
        SELECT ga, gb, na, nb,
          sum(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na))
            AS shared_abs,
          CAST(sum(ca) AS BIGINT) AS sa, CAST(sum(cb) AS BIGINT) AS sb
        FROM pairs GROUP BY 1, 2, 3, 4)
      SELECT ga AS group_a, gb AS group_b,
        na AS n_tokens_a, nb AS n_tokens_b,
        CAST(shared_abs + CAST(na - sa AS HUGEINT) * nb
            + CAST(nb - sb AS HUGEINT) * na AS DOUBLE) /
          ((2.0e0 * CAST(na AS DOUBLE)) * CAST(nb AS DOUBLE))
          AS tv_distance
      FROM agg ORDER BY group_a, group_b
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

  // --------------------------------------------------------------- q115

  /** q115 — one-pass correlation matrix
    * ([[Profiling.correlationMatrix]]): Pearson r for every numeric
    * column pair from exact fixed-point moment sums — the redundancy
    * map read before feature selection. NOT Spark's `corr` (running
    * float means whose accumulation order a distributed engine can't
    * pin): integer moments on the 2^-20 grid, three IEEE ops at the
    * end, ONE pass for all pairs. */
  val q115: Q = Q(
    "q115_correlation_matrix",
    (s, d) =>
      Profiling.correlationMatrix(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount")),
    Some("""
      WITH c AS (
        SELECT CAST(floor(l_quantity * 1048576.0) AS BIGINT) f0,
          CAST(floor(l_extendedprice * 1048576.0) AS BIGINT) f1,
          CAST(floor(l_discount * 1048576.0) AS BIGINT) f2
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL),
      m AS (
        SELECT CAST(count(*) AS HUGEINT) n,
          sum(CAST(f0 AS HUGEINT)) s0, sum(CAST(f1 AS HUGEINT)) s1,
          sum(CAST(f2 AS HUGEINT)) s2,
          sum(CAST(f0 AS HUGEINT) * f0) q0,
          sum(CAST(f1 AS HUGEINT) * f1) q1,
          sum(CAST(f2 AS HUGEINT) * f2) q2,
          sum(CAST(f0 AS HUGEINT) * f1) p01,
          sum(CAST(f0 AS HUGEINT) * f2) p02,
          sum(CAST(f1 AS HUGEINT) * f2) p12
        FROM c),
      e AS (
        SELECT 'l_quantity' a, 'l_extendedprice' b, n,
          n * p01 - s0 * s1 num, n * q0 - s0 * s0 dx,
          n * q1 - s1 * s1 dy FROM m
        UNION ALL SELECT 'l_quantity', 'l_discount', n,
          n * p02 - s0 * s2, n * q0 - s0 * s0, n * q2 - s2 * s2 FROM m
        UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
          n * p12 - s1 * s2, n * q1 - s1 * s1, n * q2 - s2 * s2 FROM m)
      SELECT a AS column_a, b AS column_b, CAST(n AS BIGINT) AS n,
        CAST(num AS DOUBLE) /
          (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))) AS r
      FROM e WHERE dx > 0 AND dy > 0
      ORDER BY column_a, column_b
    """.trim))

  // --------------------------------------------------------------- q116

  /** q116 — mixed-language detection
    * ([[TextAnalysis.mixedLanguageFlags]]): chunk each doc's token
    * stream into 16-token windows, replay the q22 marker vote per
    * chunk, and flag docs whose chunks vote for ≥ 2 languages — the
    * code-switching / embedded-boilerplate docs a whole-doc language
    * filter mis-gates. Token explode partial-aggregates to chunk
    * counters; majorities window over ≤ 4-row per-doc vote frames. */
  val q116: Q = Q(
    "q116_mixed_language",
    (s, d) =>
      TextAnalysis.mixedLanguageFlags(Tables.documents(s, d), "doc_id",
        "text", chunkTokens = 16),
    Some("""
      WITH t AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(lower(text)), '\s+'),
            x -> x <> '') w
        FROM documents),
      toks AS (
        SELECT doc_id,
          CAST(floor((p - 1) / 16.0) AS BIGINT) chunk, w[p] tk
        FROM t, LATERAL unnest(range(1, len(w) + 1)) AS u(p)),
      pc AS (
        SELECT doc_id, chunk,
          CAST(sum(CASE WHEN tk IN ('the', 'a', 'of', 'and', 'is')
            THEN 1 ELSE 0 END) AS BIGINT) c_en,
          CAST(sum(CASE WHEN tk IN ('el', 'la', 'los', 'y', 'es')
            THEN 1 ELSE 0 END) AS BIGINT) c_es,
          CAST(sum(CASE WHEN tk IN ('der', 'die', 'das', 'und', 'ist')
            THEN 1 ELSE 0 END) AS BIGINT) c_de,
          CAST(sum(CASE WHEN tk IN ('le', 'les', 'et', 'est', 'une')
            THEN 1 ELSE 0 END) AS BIGINT) c_fr
        FROM toks GROUP BY 1, 2),
      pred AS (
        SELECT *,
          CASE WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0
                 THEN 'und'
               WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr
                 THEN 'en'
               WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
               WHEN c_de >= c_fr THEN 'de'
               ELSE 'fr' END AS lang_pred
        FROM pc),
      tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) n_chunks,
          CAST(sum(CASE WHEN lang_pred <> 'und' THEN 1 ELSE 0 END)
            AS BIGINT) n_lang_chunks
        FROM pred GROUP BY 1),
      bl AS (
        SELECT doc_id, lang_pred, CAST(count(*) AS BIGINT) c
        FROM pred WHERE lang_pred <> 'und' GROUP BY 1, 2),
      mj AS (
        SELECT doc_id, n_distinct_langs, lang_pred majority_lang,
          c majority_chunks
        FROM (
          SELECT doc_id, lang_pred, c,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY c DESC, lang_pred) rnk,
            CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT)
              n_distinct_langs
          FROM bl) x
        WHERE rnk = 1)
      SELECT doc_id, n_chunks, n_lang_chunks,
        COALESCE(n_distinct_langs, CAST(0 AS BIGINT))
          AS n_distinct_langs,
        majority_lang,
        CASE WHEN n_lang_chunks > 0 THEN
          CAST(majority_chunks AS DOUBLE) / CAST(n_lang_chunks AS DOUBLE)
          END AS majority_share,
        (COALESCE(n_distinct_langs, CAST(0 AS BIGINT)) > 1) AS is_mixed
      FROM tot LEFT JOIN mj USING (doc_id)
      ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q117

  /** q117 — functional-dependency audit ([[Rules.fdAudit]]): the
    * cross-row constraint q104's row-local rules can't express —
    * report every determinant of `source → lang` that maps to more
    * than one language, with its distinct-value span and row blast
    * radius ("is this feed monolingual"). Two partial-aggregated
    * folds; the shuffle carries pair cardinality, never rows. */
  val q117: Q = Q(
    "q117_fd_audit",
    (s, d) =>
      Rules.fdAudit(Tables.documents(s, d), "source", "lang"),
    Some("""
      WITH p AS (
        SELECT source AS determinant, lang, CAST(count(*) AS BIGINT) r
        FROM documents GROUP BY 1, 2)
      SELECT determinant, CAST(count(*) AS BIGINT) AS n_distinct_rhs,
        CAST(sum(r) AS BIGINT) AS n_rows
      FROM p GROUP BY 1 HAVING count(*) > 1 ORDER BY determinant
    """.trim))

  // --------------------------------------------------------------- q118

  /** q118 — last-touch channel attribution: attribute every purchase
    * to the user's most recent click or view within a 24 h window and
    * roll up per channel (purchases, revenue, gap stats) — the
    * standard marketing-attribution report, and the composition
    * showcase for [[graft.operators.Joins.asOfWithin]]: one
    * windowed as-of per channel, a row-local later-of pick (ties to
    * 'click', pinned), no new join machinery. Revenue sums ride
    * DECIMAL ([[graft.engine.Dec]]) — never floating accumulation —
    * and gaps are exact µs-long sums. The DuckDB oracle is its native
    * `ASOF LEFT JOIN` with a staleness CASE — an
    * implementation-independent check, q43's argument. */
  val q118: Q = Q(
    "q118_touch_attribution",
    (s, d) => {
      val e = eventsUs(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us"), col("value"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("value"))
      def touches(t: String, p: String) =
        e.where(col("event_type") === t)
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("event_id")).as(s"${p}_id"))
          .withColumn(s"${p}_ts", col("ts_us"))
      val windowUs = 24L * 3600 * 1000000L
      val withClick = Joins.asOfWithin(purchases,
        touches("click", "click"), "user_id", "ts_us", windowUs)
      val withBoth = Joins.asOfWithin(withClick,
        touches("view", "view"), "user_id", "ts_us", windowUs)
      val attributed = withBoth
        .withColumn("channel",
          when(col("click_ts").isNotNull &&
            (col("view_ts").isNull || col("click_ts") >= col("view_ts")),
            "click")
          .when(col("view_ts").isNotNull, "view")
          .otherwise("unattributed"))
        .withColumn("touch_ts",
          when(col("channel") === "click", col("click_ts"))
            .when(col("channel") === "view", col("view_ts")))
      attributed.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          Dec.outD(sum(Dec.d2(col("value")))).as("attributed_value"),
          sum(col("ts_us") - col("touch_ts")).as("total_gap_us"))
        .withColumn("mean_gap_us",
          col("total_gap_us").cast("double") / col("n_purchases"))
        .orderBy(col("channel"))
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(epoch_us(ts) AS BIGINT) ts_us, value
        FROM events),
      p AS (
        SELECT event_id, user_id, ts_us, value FROM e
        WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, ts_us AS c_ts, max(event_id) c_id
        FROM e WHERE event_type = 'click' GROUP BY 1, 2),
      v AS (
        SELECT user_id, ts_us AS v_ts, max(event_id) v_id
        FROM e WHERE event_type = 'view' GROUP BY 1, 2),
      pc AS (
        SELECT p.event_id, p.user_id, p.ts_us, p.value,
          CASE WHEN c.c_ts >= p.ts_us - 86400000000 THEN c.c_ts END
            AS click_ts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts_us >= c.c_ts),
      pv AS (
        SELECT pc.event_id, pc.user_id, pc.ts_us, pc.value, pc.click_ts,
          CASE WHEN v.v_ts >= pc.ts_us - 86400000000 THEN v.v_ts END
            AS view_ts
        FROM pc ASOF LEFT JOIN v
          ON pc.user_id = v.user_id AND pc.ts_us >= v.v_ts),
      ch AS (
        SELECT *,
          CASE WHEN click_ts IS NOT NULL
                 AND (view_ts IS NULL OR click_ts >= view_ts)
                 THEN 'click'
               WHEN view_ts IS NOT NULL THEN 'view'
               ELSE 'unattributed' END AS channel,
          CASE WHEN click_ts IS NOT NULL
                 AND (view_ts IS NULL OR click_ts >= view_ts)
                 THEN click_ts
               WHEN view_ts IS NOT NULL THEN view_ts END AS touch_ts
        FROM pv)
      SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
          AS attributed_value,
        CAST(sum(ts_us - touch_ts) AS BIGINT) AS total_gap_us,
        CAST(sum(ts_us - touch_ts) AS DOUBLE) / count(*) AS mean_gap_us
      FROM ch GROUP BY 1 ORDER BY channel
    """.trim))

  // --------------------------------------------------------------- q119

  /** q119 — join-blowup profiler ([[Skew.joinBlowupProfile]]): the
    * pre-flight for a planned events self-join (sessionization /
    * co-occurrence shapes) — per user, rows on each side and the
    * exact pair mass the key would emit, top 20. The number that
    * picks plain vs salted vs capped BEFORE the join runs; two
    * partial-aggregated counts and a TakeOrderedAndProject, never the
    * join itself. */
  val q119: Q = Q(
    "q119_join_blowup",
    (s, d) => {
      val e = Tables.events(s, d)
      Skew.joinBlowupProfile(e, e, "user_id", topK = 20)
    },
    Some("""
      WITH l AS (
        SELECT user_id, CAST(count(*) AS BIGINT) n_left
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      r AS (
        SELECT user_id, CAST(count(*) AS BIGINT) n_right
        FROM events WHERE user_id IS NOT NULL GROUP BY 1)
      SELECT l.user_id, n_left, n_right,
        n_left * n_right AS est_pairs
      FROM l JOIN r USING (user_id)
      ORDER BY est_pairs DESC, user_id LIMIT 20
    """.trim))

  // --------------------------------------------------------------- q120

  /** q120 — Benford first-digit profile ([[Profiling.benfordProfile]]):
    * observed vs expected first-significant-digit shares, the
    * data-forensics screen for fabricated / clipped / unit-glitched
    * feeds. Profiles the multi-decade `l_extendedprice` (tracks
    * Benford) beside the bounded `l_quantity` (legitimately doesn't) —
    * the screen-not-verdict contrast. Digit from exact-integer decimal
    * rendering, expectations as fixed literals — no libm log10 in
    * either engine. */
  val q120: Q = Q(
    "q120_benford_profile",
    (s, d) =>
      Profiling.benfordProfile(Tables.lineitem(s, d),
        Seq("l_extendedprice", "l_quantity")),
    Some("""
      WITH e AS (
        SELECT col, CAST(substring(CAST(CAST(floor(v) AS BIGINT)
          AS VARCHAR), 1, 1) AS INT) digit
        FROM (
          SELECT 'l_extendedprice' col, l_extendedprice v FROM lineitem
          UNION ALL SELECT 'l_quantity', l_quantity FROM lineitem) t
        WHERE v >= 1),
      c AS (
        SELECT col column_name, digit, CAST(count(*) AS BIGINT) n_rows
        FROM e GROUP BY 1, 2),
      w AS (
        SELECT *, CAST(sum(n_rows) OVER (PARTITION BY column_name)
          AS BIGINT) n_col
        FROM c),
      x AS (
        SELECT column_name, digit, n_rows,
          CAST(n_rows AS DOUBLE) / CAST(n_col AS DOUBLE) AS share,
          CASE digit
            WHEN 1 THEN 0.3010299956639812e0
            WHEN 2 THEN 0.17609125905568124e0
            WHEN 3 THEN 0.12493873660829992e0
            WHEN 4 THEN 0.09691001300805642e0
            WHEN 5 THEN 0.07918124604762482e0
            WHEN 6 THEN 0.06694678963061322e0
            WHEN 7 THEN 0.05799194697768673e0
            WHEN 8 THEN 0.05115252244738129e0
            WHEN 9 THEN 0.04575749056067514e0 END AS benford_share
        FROM w)
      SELECT column_name, digit, n_rows, share, benford_share,
        abs(share - benford_share) AS abs_dev
      FROM x ORDER BY column_name, digit
    """.trim))

  // --------------------------------------------------------------- q121

  /** q121 — k-anonymity / l-diversity audit
    * ([[Scrub.kAnonymityAudit]]): the privacy gate's measurement half
    * (q33 masks direct identifiers; this measures re-identification
    * risk from what remains) — every (lang, source) quasi-group with
    * fewer than 5 rows or fewer than 2 distinct sensitive values is a
    * release-gate worklist row. Pair-fold shuffle carries cardinality,
    * not rows; NULL sensitive counts as distinct (conservative in the
    * safe direction). */
  val q121: Q = Q(
    "q121_k_anonymity",
    (s, d) =>
      Scrub.kAnonymityAudit(Tables.documents(s, d),
        Seq("lang", "source"), "n_chars", k = 5L, l = 2L),
    Some("""
      WITH p AS (
        SELECT lang, source, n_chars AS sv, CAST(count(*) AS BIGINT) r
        FROM documents GROUP BY 1, 2, 3),
      g AS (
        SELECT lang, source, CAST(sum(r) AS BIGINT) n_rows,
          CAST(count(*) AS BIGINT) n_distinct_sensitive
        FROM p GROUP BY 1, 2)
      SELECT lang, source, n_rows, n_distinct_sensitive,
        (n_rows < 5) AS k_violation,
        (n_distinct_sensitive < 2) AS l_violation
      FROM g WHERE n_rows < 5 OR n_distinct_sensitive < 2
      ORDER BY lang NULLS FIRST, source NULLS FIRST
    """.trim))

  // --------------------------------------------------------------- q122

  /** q122 — event transition matrix ([[Cohorts.transitionMatrix]]):
    * the first-order Markov view of the event stream — per
    * (from_type, to_type), consecutive-pair counts and `P(to|from)`.
    * One user-keyed exchange + sort (the q34 sessionize shape), then
    * everything runs on the ≤ |types|² aggregate; the (ts, event_id)
    * tiebreak pins simultaneous events on both engines. */
  val q122: Q = Q(
    "q122_transition_matrix",
    (s, d) =>
      Cohorts.transitionMatrix(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id"),
    Some("""
      WITH o AS (
        SELECT user_id, event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      c AS (
        SELECT prev AS from_type, event_type AS to_type,
          CAST(count(*) AS BIGINT) n
        FROM o WHERE prev IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(n AS DOUBLE) /
          CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      FROM c ORDER BY from_type, to_type
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

  // --------------------------------------------------------------- q124

  /** q124 — distinct-n diversity
    * ([[TextAnalysis.distinctNgramDiversity]]): per-source total vs
    * distinct 1/2/3-gram counts and ratios — the generation-QA
    * lexical-diversity report, and the template-mass signal q35's
    * within-doc repetition can't see (each doc looks fine; the GROUP
    * repeats). Row-local n-gram assembly, one explode, one
    * partial-aggregated groupBy; `approx_count_distinct` is the
    * documented 100 TB switch. */
  val q124: Q = Q(
    "q124_distinct_ngrams",
    (s, d) =>
      TextAnalysis.distinctNgramDiversity(Tables.documents(s, d),
        "source", "text"),
    Some("""
      WITH t AS (
        SELECT source AS g,
          list_filter(string_split_regex(trim(text), '\s+'),
            x -> x <> '') w
        FROM documents),
      e AS (
        SELECT g, 1 AS n, u.gram FROM t, LATERAL unnest(w) AS u(gram)
        UNION ALL
        SELECT g, 2, u.gram FROM t, LATERAL unnest(
          CASE WHEN len(w) >= 2 THEN
            list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i + 1])
          ELSE [] END) AS u(gram)
        UNION ALL
        SELECT g, 3, u.gram FROM t, LATERAL unnest(
          CASE WHEN len(w) >= 3 THEN
            list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
          ELSE [] END) AS u(gram))
      SELECT g AS source, n, CAST(count(*) AS BIGINT) AS total_ngrams,
        CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
        CAST(count(DISTINCT gram) AS DOUBLE) / count(*)
          AS distinct_ratio
      FROM e GROUP BY 1, 2 ORDER BY source, n
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

  // --------------------------------------------------------------- q126

  /** q126 — CUSUM changepoint ([[Drift.cusumChangepoint]]): the
    * sustained-shift detector q83's robust z deliberately is not — a
    * feed drifting up 20% posts many slightly-high days, never one
    * extreme one; the cumulative sum accumulates them. The sequential
    * `max(0, S+x)` recurrence runs as its exact prefix-sum closed form
    * (`P − min(0, runmin P)`): two same-keyed windows, ONE exchange,
    * doubled integers end to end. */
  val q126: Q = Q(
    "q126_cusum_changepoint",
    (s, d) =>
      Drift.cusumChangepoint(eventsUs(s, d),
        to_date(timestamp_micros(col("ts_us"))), "event_type",
        slack = 1L, threshold = 10L),
    Some("""
      WITH b AS (
        SELECT CAST(ts AS DATE) AS day, event_type AS t FROM events),
      c AS (
        SELECT t, day, CAST(count(*) AS BIGINT) n FROM b GROUP BY 1, 2),
      med AS (SELECT t, quantile_cont(n, 0.5) m FROM c GROUP BY 1),
      x AS (
        SELECT c.t, c.day, n,
          CAST(2 * n - CAST(2.0e0 * m AS BIGINT) - 2 AS BIGINT) AS x
        FROM c JOIN med ON med.t = c.t),
      p AS (
        SELECT t, day, n, CAST(sum(x) OVER (PARTITION BY t ORDER BY day
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp
        FROM x),
      q AS (
        SELECT t, day, n, pp, CAST(min(pp) OVER (PARTITION BY t
          ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS minpp
        FROM p)
      SELECT t AS event_type, day, n AS n_events,
        CAST(pp - least(minpp, 0) AS DOUBLE) / 2.0e0 AS cusum,
        (pp - least(minpp, 0) > 20) AS is_alarm
      FROM q ORDER BY event_type, day
    """.trim))

  // --------------------------------------------------------------- q127

  /** q127 — grid KS distance ([[Drift.gridKsDistance]]): the largest
    * CDF gap between the view and purchase value distributions on a
    * dyadic quarter grid — q95's L1 totals moved mass, KS catches the
    * one localized shift (a changed clip bound) that L1 dilutes.
    * Exact cross-multiplied integer cumulatives, one IEEE division. */
  val q127: Q = Q(
    "q127_ks_drift",
    (s, d) => {
      val e = Tables.events(s, d)
      Drift.gridKsDistance(
        e.where(col("event_type") === "view").select(col("value")),
        e.where(col("event_type") === "purchase").select(col("value")),
        "value", 0.25)
    },
    Some("""
      WITH o AS (
        SELECT CAST(floor(value / 0.25e0) AS BIGINT) bin
        FROM events WHERE event_type = 'view' AND value IS NOT NULL),
      nn AS (
        SELECT CAST(floor(value / 0.25e0) AS BIGINT) bin
        FROM events WHERE event_type = 'purchase'
          AND value IS NOT NULL),
      oc AS (SELECT bin, CAST(count(*) AS BIGINT) na FROM o GROUP BY 1),
      nc AS (SELECT bin, CAST(count(*) AS BIGINT) nb FROM nn GROUP BY 1),
      j AS (
        SELECT COALESCE(oc.bin, nc.bin) AS bin,
          COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
        FROM oc FULL OUTER JOIN nc ON oc.bin = nc.bin),
      t AS (
        SELECT CAST(COALESCE(sum(na), 0) AS BIGINT) n_old,
          CAST(COALESCE(sum(nb), 0) AS BIGINT) n_new
        FROM j),
      c AS (
        SELECT bin,
          CAST(sum(na) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
            AS BIGINT) ca,
          CAST(sum(nb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
            AS BIGINT) cb
        FROM j),
      f AS (
        SELECT max(abs(CAST(ca AS HUGEINT) * t.n_new -
          CAST(cb AS HUGEINT) * t.n_old)) AS num
        FROM c CROSS JOIN t)
      SELECT n_old, n_new,
        CASE WHEN n_old > 0 AND n_new > 0 THEN
          CAST(num AS DOUBLE) /
            (CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE)) END
          AS ks_distance
      FROM t CROSS JOIN f
    """.trim))

  // --------------------------------------------------------------- q128

  /** q128 — RFM segmentation ([[Cohorts.rfmSegments]]) over purchase
    * events: per-user recency/frequency/monetary folded in one pass,
    * quartile-binned against exact integer percentiles (µs, counts,
    * CENTS — the Dec money rule, no float accumulation), segment =
    * r·100 + f·10 + m. One-row thresholds on the q88 broadcast
    * scalar-append shape. */
  val q128: Q = Q(
    "q128_rfm_segments",
    (s, d) =>
      Cohorts.rfmSegments(
        eventsUs(s, d).where(col("event_type") === "purchase"),
        "user_id", "ts_us", "value"),
    Some("""
      WITH p AS (
        SELECT user_id,
          CAST(max(epoch_us(ts)) AS BIGINT) recency_us,
          CAST(count(*) AS BIGINT) frequency,
          CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
            AS BIGINT) monetary_cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      t AS (
        SELECT quantile_cont(recency_us, [0.25, 0.5, 0.75]) qr,
          quantile_cont(frequency, [0.25, 0.5, 0.75]) qf,
          quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) qm
        FROM p),
      b AS (
        SELECT user_id, recency_us, frequency, monetary_cents,
          CAST(CASE WHEN recency_us <= qr[1] THEN 0
            WHEN recency_us <= qr[2] THEN 1
            WHEN recency_us <= qr[3] THEN 2 ELSE 3 END AS INT) r_bin,
          CAST(CASE WHEN frequency <= qf[1] THEN 0
            WHEN frequency <= qf[2] THEN 1
            WHEN frequency <= qf[3] THEN 2 ELSE 3 END AS INT) f_bin,
          CAST(CASE WHEN monetary_cents <= qm[1] THEN 0
            WHEN monetary_cents <= qm[2] THEN 1
            WHEN monetary_cents <= qm[3] THEN 2 ELSE 3 END AS INT) m_bin
        FROM p CROSS JOIN t)
      SELECT user_id, recency_us, frequency, monetary_cents,
        r_bin, f_bin, m_bin,
        CAST(r_bin * 100 + f_bin * 10 + m_bin AS INT) AS segment
      FROM b ORDER BY user_id
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

  // --------------------------------------------------------------- q130

  /** q130 — dedup impact report ([[Dedup.dedupImpact]]): per source,
    * docs vs distinct contents vs whitespace-normalized distincts and
    * the dup rate — WHERE the duplication lives (q16 says which rows
    * to keep). One partial-aggregated sha-256 pass. */
  val q130: Q = Q(
    "q130_dedup_impact",
    (s, d) =>
      Dedup.dedupImpact(Tables.documents(s, d), "source", "text"),
    Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_unique,
        CAST(count(DISTINCT sha256(regexp_replace(lower(text),
          '\s+', ' ', 'g'))) AS BIGINT) AS n_unique_norm,
        CAST(count(*) - count(DISTINCT sha256(text)) AS BIGINT)
          AS n_dupes,
        CAST(count(*) - count(DISTINCT sha256(text)) AS DOUBLE) /
          CAST(count(*) AS DOUBLE) AS dup_rate
      FROM documents GROUP BY source ORDER BY source
    """.trim))

  // --------------------------------------------------------------- q131

  /** q131 — encoding health audit ([[Scrub.encodingHealth]]): per
    * source, docs carrying C0 control chars, U+FFFD replacement
    * chars, or zero-width chars — the mojibake screen whose
    * replacement-char rate is a SOURCE defect counter (transcode the
    * feed, don't filter it). Row-local rlike probes, one counter
    * pass. */
  val q131: Q = Q(
    "q131_encoding_health",
    (s, d) =>
      Scrub.encodingHealth(Tables.documents(s, d), "source", "text"),
    Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN regexp_matches(text,
          '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END)
          AS BIGINT) AS n_control,
        CAST(sum(CASE WHEN regexp_matches(text, '\x{FFFD}')
          THEN 1 ELSE 0 END) AS BIGINT) AS n_replacement,
        CAST(sum(CASE WHEN regexp_matches(text,
          '[\x{200B}-\x{200D}\x{FEFF}]') THEN 1 ELSE 0 END)
          AS BIGINT) AS n_zero_width,
        CAST(sum(CASE WHEN regexp_matches(text,
            '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END) +
          sum(CASE WHEN regexp_matches(text, '\x{FFFD}')
            THEN 1 ELSE 0 END) +
          sum(CASE WHEN regexp_matches(text,
            '[\x{200B}-\x{200D}\x{FEFF}]') THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS defect_rate
      FROM documents GROUP BY source ORDER BY source
    """.trim))

  // --------------------------------------------------------------- q132

  /** q132 — length-bias curve ([[TextAnalysis.lengthBiasCurve]]):
    * micro-averaged stopword / punctuation ratios per 128-char
    * length bucket — the table that says whether one global quality
    * threshold over-filters short docs (the length confound). Exact
    * integer numerators and denominators; one partial-aggregated
    * pass. */
  val q132: Q = Q(
    "q132_length_bias",
    (s, d) =>
      TextAnalysis.lengthBiasCurve(Tables.documents(s, d), "text",
        bucketChars = 128),
    Some("""
      WITH m AS (
        SELECT CAST(floor(length(text) / 128.0e0) AS BIGINT) bucket,
          CAST(length(text) AS BIGINT) n_chars,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> t <> '')) AS BIGINT) n_tokens,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in')))
            AS BIGINT) n_stop,
          CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
            AS BIGINT) n_punct
        FROM documents)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        CAST(sum(n_stop) AS BIGINT) AS total_stop,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(sum(n_punct) AS BIGINT) AS total_punct,
        CASE WHEN sum(n_tokens) > 0 THEN CAST(sum(n_stop) AS DOUBLE) /
          CAST(sum(n_tokens) AS DOUBLE) END AS stop_ratio_micro,
        CASE WHEN sum(n_chars) > 0 THEN CAST(sum(n_punct) AS DOUBLE) /
          CAST(sum(n_chars) AS DOUBLE) END AS punct_ratio_micro
      FROM m GROUP BY bucket ORDER BY bucket
    """.trim))

  // --------------------------------------------------------------- q133

  /** q133 — unigram Simpson concentration
    * ([[TextAnalysis.simpsonConcentration]]): per source, the
    * probability two token draws are the same term — the
    * diversity-vs-template dial WITHOUT entropy's `log` (collision
    * probability is exact rational arithmetic); `top_share` rides
    * along. One partial-aggregated (source, term) pass, DECIMAL(38,0)
    * folds, one IEEE division. */
  val q133: Q = Q(
    "q133_simpson_concentration",
    (s, d) =>
      TextAnalysis.simpsonConcentration(Tables.documents(s, d),
        "source", "text"),
    Some("""
      WITH tok AS (
        SELECT source, t
        FROM documents, LATERAL unnest(
          regexp_extract_all(lower(text), '([a-z]+|[0-9]+)', 1)) AS u(t)),
      c AS (
        SELECT source, t, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2)
      SELECT source,
        CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        CAST(max(c) AS BIGINT) AS n_top,
        CASE WHEN sum(c) >= 2 THEN
          CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS DOUBLE) /
            CAST(CAST(sum(c) AS HUGEINT) * (sum(c) - 1) AS DOUBLE)
        END AS simpson_idx,
        CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_share
      FROM c GROUP BY source ORDER BY source
    """.trim))

  // --------------------------------------------------------------- q134

  /** q134 — soft (sqrt-law) dedup ([[Dedup.softDedup]]): keep ⌈√n⌉
    * members of each exact-duplicate family — the middle ground
    * between keep-all (over-weights boilerplate) and keep-one (erases
    * the frequency signal); members chosen by the portable affine
    * id-hash so every engine keeps the same rows. */
  val q134: Q = Q(
    "q134_soft_dedup",
    (s, d) => Dedup.softDedup(Tables.documents(s, d), "doc_id", "text"),
    Some("""
      WITH f AS (
        SELECT doc_id, sha256(text) AS content_hash FROM documents),
      r AS (
        SELECT doc_id, content_hash,
          CAST(row_number() OVER (PARTITION BY content_hash
            ORDER BY ((doc_id % 1000000007) * 2654435761 % 1000000007
              + 12345) % 1000000007, doc_id) AS INT) AS sample_rank,
          CAST(count(*) OVER (PARTITION BY content_hash) AS BIGINT)
            AS n_copies
        FROM f)
      SELECT doc_id, content_hash, n_copies,
        CAST(ceil(sqrt(CAST(n_copies AS DOUBLE))) AS BIGINT)
          AS keep_quota,
        sample_rank
      FROM r
      WHERE sample_rank <= ceil(sqrt(CAST(n_copies AS DOUBLE)))
      ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q135

  /** q135 — Cramér's V ([[Profiling.cramersV]]): association strength
    * between two categorical columns (does `lang` predict `source`),
    * log-free and grid-free — `χ² = N·Σ o²/(r·c) − N` folds the
    * zero-observed cells in closed form, each observed cell pays one
    * integral division of DECIMAL(38,0) products, and the only IEEE
    * ops are the final casts, two divisions, and one sqrt. */
  val q135: Q = Q(
    "q135_cramers_v",
    (s, d) =>
      Profiling.cramersV(Tables.documents(s, d), "lang", "source"),
    Some("""
      WITH obs AS (
        SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS o
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY 1, 2),
      rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
      ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
      cells AS (
        SELECT o,
          (CAST(o AS HUGEINT) * o * 1048576)
            // (CAST(r AS HUGEINT) * c) AS t_fp
        FROM obs JOIN rt USING (a) JOIN ct USING (b)),
      agg AS (
        SELECT coalesce(CAST(sum(o) AS BIGINT), 0) AS n_rows,
          (SELECT CAST(count(*) AS BIGINT) FROM rt) AS n_a,
          (SELECT CAST(count(*) AS BIGINT) FROM ct) AS n_b,
          sum(t_fp) AS st
        FROM cells)
      SELECT n_rows, n_a, n_b,
        CASE WHEN n_a >= 2 AND n_b >= 2
          THEN least(n_a - 1, n_b - 1) END AS dof,
        CASE WHEN n_a >= 2 AND n_b >= 2 THEN
          CAST(CAST(n_rows AS HUGEINT) * st
            - CAST(n_rows AS HUGEINT) * 1048576 AS DOUBLE) / 1048576.0e0
        END AS chi2,
        CASE WHEN n_a >= 2 AND n_b >= 2 THEN
          sqrt((CAST(CAST(n_rows AS HUGEINT) * st
              - CAST(n_rows AS HUGEINT) * 1048576 AS DOUBLE)
              / 1048576.0e0) /
            (CAST(n_rows AS DOUBLE) *
              CAST(least(n_a - 1, n_b - 1) AS DOUBLE)))
        END AS cramers_v
      FROM agg
    """.trim))

  // --------------------------------------------------------------- q136

  /** q136 — group-concentration profile
    * ([[Profiling.concentrationProfile]]): top-1 share, HHI, and Gini
    * of the docs-per-source distribution — the corpus-composition
    * alarm ("a handful of feeds ARE the corpus") read before trusting
    * per-group mixing weights. One groupBy reduces to |groups| rows;
    * exact integer folds, one IEEE division per reading. */
  val q136: Q = Q(
    "q136_source_concentration",
    (s, d) =>
      Profiling.concentrationProfile(Tables.documents(s, d), "source"),
    Some("""
      WITH s AS (
        SELECT source AS g, CAST(count(*) AS BIGINT) AS x
        FROM documents GROUP BY 1),
      r AS (SELECT g, x, row_number() OVER (ORDER BY x, g) AS i FROM s)
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
        coalesce(CAST(sum(x) AS BIGINT), 0) AS n_rows,
        CAST(max(x) AS DOUBLE) / CAST(sum(x) AS DOUBLE) AS top1_share,
        CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) /
          CAST(CAST(sum(x) AS HUGEINT) * sum(x) AS DOUBLE) AS hhi,
        CAST(2 * sum(CAST(i AS HUGEINT) * x)
            - (count(*) + 1) * CAST(sum(x) AS HUGEINT) AS DOUBLE) /
          CAST(CAST(count(*) AS HUGEINT) * sum(x) AS DOUBLE) AS gini
      FROM r
    """.trim))

  // --------------------------------------------------------------- q137

  /** q137 — inter-event gap profile ([[Cohorts.interEventGaps]]): per
    * event type, quartiles of a user's consecutive same-type gaps in
    * exact integer µs — the cadence table that calibrates q34's
    * session gap and any retention-period choice. One (user, type)
    * exchange; dyadic-on-integers quartile interpolation. */
  val q137: Q = Q(
    "q137_interevent_gaps",
    (s, d) =>
      Cohorts.interEventGaps(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type"),
    Some("""
      WITH o AS (
        SELECT event_type,
          epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type
            ORDER BY epoch_us(ts), event_id) AS gap
        FROM events)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        CAST(min(gap) AS BIGINT) AS min_gap_us,
        quantile_cont(gap, 0.25) AS p25_us,
        quantile_cont(gap, 0.5) AS p50_us,
        quantile_cont(gap, 0.75) AS p75_us,
        CAST(max(gap) AS BIGINT) AS max_gap_us
      FROM o WHERE gap IS NOT NULL
      GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q138

  /** q138 — stickiness (DAU/WAU) ([[Cohorts.stickiness]]): per
    * observed day, the fraction of trailing-7-day actives who showed
    * up that day — q86's DAU over q87's contribution-interval WAU,
    * one IEEE division of exact counts. */
  val q138: Q = Q(
    "q138_stickiness",
    (s, d) =>
      Cohorts.stickiness(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us"))), windowDays = 7),
    Some("""
      WITH b AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        FROM events),
      dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM b GROUP BY 1),
      cov AS (
        SELECT DISTINCT u, unnest(generate_series(day,
          day + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE AS day
        FROM b),
      wau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS wau FROM cov GROUP BY 1)
      SELECT dau.day AS day, dau, wau,
        CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
      FROM dau JOIN wau ON dau.day = wau.day
      ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q139

  /** q139 — session co-occurrence lift ([[Cohorts.sessionCooccurrence]]):
    * market-basket over q34's sessions — event-type pairs co-present
    * in one sitting beyond chance, q97's log-free fixed-point lift
    * with sessions as the documents; set semantics per session,
    * minSupport hygiene. */
  val q139: Q = Q(
    "q139_session_cooccurrence",
    (s, d) =>
      Cohorts.sessionCooccurrence(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type"),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          event_type
        FROM events),
      flagged AS (
        SELECT user_id, event_id, ts_us, event_type,
          CASE WHEN lag(ts_us) OVER w IS NULL
                 OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
               ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      st AS (
        SELECT DISTINCT user_id AS u,
          SUM(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS sid,
          event_type AS t
        FROM flagged),
      ns AS (
        SELECT count(*) AS n FROM (SELECT DISTINCT u, sid FROM st) q),
      tc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM st GROUP BY 1),
      p AS (
        SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS n_ab
        FROM st a JOIN st b ON a.u = b.u AND a.sid = b.sid AND a.t < b.t
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT ta AS type_a, tb AS type_b, n_ab, ca.c AS n_a, cb.c AS n_b,
        CAST(((n_ab * 1048576) * n) // (ca.c * cb.c) AS BIGINT)
          AS lift_fp
      FROM p
      JOIN tc ca ON ca.t = p.ta
      JOIN tc cb ON cb.t = p.tb
      CROSS JOIN ns
      ORDER BY 1, 2
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

  // --------------------------------------------------------------- q141

  /** q141 — key-candidate profile ([[Profiling.keyCandidates]]): per
    * column, row/null/distinct counts plus the largest duplicate group
    * and the candidate-key verdict — the pre-flight before trusting a
    * join key or the §2.9 sink PK. One row-local unpivot, one
    * (column, value) partial count, per-column fold over the reduced
    * frame. */
  val q141: Q = Q(
    "q141_key_candidates",
    (s, d) =>
      Profiling.keyCandidates(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus")),
    Some("""
      WITH u AS (
        SELECT 'o_orderkey' AS column_name,
          CAST(o_orderkey AS VARCHAR) AS v FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus FROM orders),
      c AS (
        SELECT column_name, v, CAST(count(*) AS BIGINT) AS c
        FROM u GROUP BY 1, 2)
      SELECT column_name,
        CAST(sum(c) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN v IS NULL THEN c ELSE 0 END) AS BIGINT)
          AS n_nulls,
        CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT)
          AS n_distinct,
        CAST(max(CASE WHEN v IS NOT NULL THEN c END) AS BIGINT)
          AS max_dup,
        (sum(CASE WHEN v IS NULL THEN c ELSE 0 END) = 0 AND
          count(CASE WHEN v IS NOT NULL THEN 1 END) = sum(c))
          AS is_candidate_key
      FROM c GROUP BY 1 ORDER BY 1
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

  // --------------------------------------------------------------- q143

  /** q143 — readability signals ([[TextAnalysis.readabilitySignals]]):
    * per doc, sentence count, mean word length, mean sentence length,
    * long-word ratio — the syllable-free Flesch surrogate, every
    * signal an integer-division fixed-point of row-local counts. */
  val q143: Q = Q(
    "q143_readability",
    (s, d) =>
      TextAnalysis.readabilitySignals(Tables.documents(s, d), "doc_id",
        "text"),
    Some("""
      WITH m AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'),
            t -> t <> '') AS w,
          CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
            AS n_sentences
        FROM documents)
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, n_sentences,
        CASE WHEN len(w) > 0 THEN
          (list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(w, t -> CAST(length(t) AS BIGINT))),
            (a, b) -> a + b) * 1048576) // len(w)
        END AS mean_word_len_fp,
        CASE WHEN n_sentences > 0 THEN
          (CAST(len(w) AS BIGINT) * 1048576) // n_sentences
        END AS mean_sentence_tokens_fp,
        CASE WHEN len(w) > 0 THEN
          (CAST(len(list_filter(w, t -> length(t) >= 7)) AS BIGINT)
            * 1048576) // len(w)
        END AS long_word_ratio_fp
      FROM m ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q144

  /** q144 — LSH operating-point evaluation ([[Dedup.pairsEval]]):
    * measured precision/recall of q18's banded MinHash rung against
    * the exact n-gram Jaccard pair set at the same threshold — the
    * q129 discipline applied to the dedup family (precision is 1.0 by
    * construction since the LSH rung exact-verifies; recall IS the
    * band guarantee's measured value, the number that picks bands ×
    * rows). The reference side runs uncapped (the honest exact rung);
    * the oracle replays BOTH pipelines from one shared shingle
    * frame. */
  val q144: Q = Q(
    "q144_lsh_operating_point",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.pairsEval(
        Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5,
          k = minhashK, bands = minhashBands),
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5,
          maxDf = Int.MaxValue))
    },
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      $duckMinhashCand,
      sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
      ig AS (
        SELECT da, db, count(*) i
        FROM cand
        JOIN sh a ON a.doc_id = da
        JOIN sh b ON b.doc_id = db AND b.hs = a.hs
        GROUP BY da, db),
      got AS (
        SELECT da, db FROM ig
        JOIN sz sa ON sa.doc_id = da
        JOIN sz sb ON sb.doc_id = db
        WHERE (CAST(i AS DOUBLE) / (sa.n + sb.n - i)) >= 0.5),
      iw AS (
        SELECT a.doc_id da, b.doc_id db, count(*) i
        FROM sh a JOIN sh b ON a.hs = b.hs AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      want AS (
        SELECT da, db FROM iw
        JOIN sz sa ON sa.doc_id = da
        JOIN sz sb ON sb.doc_id = db
        WHERE (CAST(i AS DOUBLE) / (sa.n + sb.n - i)) >= 0.5),
      m AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM got) AS n_got,
          (SELECT CAST(count(*) AS BIGINT) FROM want) AS n_want,
          (SELECT CAST(count(*) AS BIGINT) FROM got
            JOIN want ON got.da = want.da AND got.db = want.db)
            AS n_hit)
      SELECT n_got, n_want, n_hit,
        CASE WHEN n_got > 0 THEN
          CAST(n_hit AS DOUBLE) / CAST(n_got AS DOUBLE)
        END AS pair_precision,
        CASE WHEN n_want > 0 THEN
          CAST(n_hit AS DOUBLE) / CAST(n_want AS DOUBLE)
        END AS pair_recall
      FROM m
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

  // --------------------------------------------------------------- q146

  /** q146 — label purity ([[Drift.labelPurity]]): per source, the
    * majority language and its mass share — the feed-routing health
    * gauge (q116 flags mixed DOCS; this flags mixed FEEDS) and the
    * label-noise pre-flight before per-label statistics. Tie order
    * pinned label-ascending NULLS FIRST on both engines. */
  val q146: Q = Q(
    "q146_source_lang_purity",
    (s, d) => Drift.labelPurity(Tables.documents(s, d), "source", "lang"),
    Some("""
      WITH c AS (
        SELECT source AS g, lang AS l, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
      r AS (
        SELECT g, l, c,
          row_number() OVER (PARTITION BY g
            ORDER BY c DESC, l ASC NULLS FIRST) AS rn,
          CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n_rows,
          CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n_labels
        FROM c)
      SELECT g AS source, n_rows, n_labels, l AS majority_label,
        CAST(c AS DOUBLE) / CAST(n_rows AS DOUBLE) AS purity
      FROM r WHERE rn = 1 ORDER BY source
    """.trim))

  // --------------------------------------------------------------- q147

  /** q147 — interquartile mean of order value
    * ([[Profiling.trimmedMean]]): per order priority, the mean of
    * [Q1, Q3]-band order totals in exact CENTS — the robust "typical
    * order" a fat tail can't drag; exact dyadic thresholds on
    * integer-valued money (the q88 argument), DECIMAL(38,0) kept-sum,
    * one IEEE division. */
  val q147: Q = Q(
    "q147_trimmed_order_value",
    (s, d) =>
      Profiling.trimmedMean(
        Tables.orders(s, d).select(col("o_orderpriority"),
          (Dec.d2(col("o_totalprice")) * 100).cast("long").as("cents")),
        "o_orderpriority", "cents"),
    Some("""
      WITH b AS (
        SELECT o_orderpriority AS g,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM orders WHERE o_totalprice IS NOT NULL),
      th AS (
        SELECT g, quantile_cont(v, [0.25, 0.75]) AS q FROM b GROUP BY 1)
      SELECT b.g AS o_orderpriority,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN v >= q[1] AND v <= q[2] THEN 1 ELSE 0 END)
          AS BIGINT) AS n_kept,
        q[1] AS lo, q[2] AS hi,
        CASE WHEN sum(CASE WHEN v >= q[1] AND v <= q[2] THEN 1 ELSE 0
          END) > 0 THEN
          CAST(sum(CASE WHEN v >= q[1] AND v <= q[2] THEN CAST(v AS
            HUGEINT) ELSE 0 END) AS DOUBLE) /
          CAST(sum(CASE WHEN v >= q[1] AND v <= q[2] THEN 1 ELSE 0 END)
            AS DOUBLE)
        END AS trimmed_mean
      FROM b JOIN th ON b.g = th.g
      GROUP BY b.g, q[1], q[2]
      ORDER BY o_orderpriority
    """.trim))

  // --------------------------------------------------------------- q148

  /** q148 — HLL accuracy evaluation ([[Sketch.hllAccuracy]]): per
    * event type, the exact distinct user count next to q89's HLL
    * estimate and the signed relative error — the q129/q144 eval
    * discipline applied to the sketch family (±1.04/√m is the
    * EXPECTED error; this measures it on YOUR keys). The oracle
    * replays the shared HLL fragment plus the exact side. */
  val q148: Q = {
    val m = 256
    val wBits = 52
    Q(
      "q148_hll_accuracy",
      (s, d) => {
        val h1 = (col("user_id") % P * 2654435761L % P + 12345L) % P
        val h2 = (col("user_id") % P * 1779033703L % P + 54321L) % P
        val hashed = Tables.events(s, d).select(col("event_type"),
          col("user_id"),
          ((h1 * h1 % P) * P + (h2 * h2 % P)).as("h"))
        Sketch.hllAccuracy(hashed, "event_type", "h", "user_id", m, wBits)
      },
      Some(s"""
        WITH ${duckHllEvents(m, wBits)},
        ex AS (
          SELECT event_type,
            CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
          FROM events GROUP BY 1)
        SELECT ex.event_type AS event_type, exact_distinct, est_distinct,
          est_distinct / CAST(exact_distinct AS DOUBLE) - 1.0e0
            AS rel_error
        FROM ex JOIN hll ON ex.event_type = hll.event_type
        ORDER BY 1
      """.trim))
  }

  // --------------------------------------------------------------- q149

  /** q149 — daily carry-forward snapshot ([[Rolling.dailySnapshot]]):
    * the value current at end of each day per event type, gaps filled
    * by last observation carried forward — the feature-store daily
    * table (q43 answers one as-of lookup; this writes the calendar);
    * `is_filled` keeps staleness visible. */
  val q149: Q = Q(
    "q149_daily_snapshot",
    (s, d) =>
      Rolling.dailySnapshot(eventsUs(s, d), col("event_type"),
        col("ts_us"), col("event_id"), col("value")),
    Some("""
      WITH o AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
          CAST(value AS DECIMAL(12,2)) AS v
        FROM events),
      lastv AS (
        SELECT key, day, v AS obs_v FROM (
          SELECT key, day, v, row_number() OVER (
            PARTITION BY key, day
            ORDER BY ts_us DESC, event_id DESC) AS rn
          FROM o) t
        WHERE rn = 1),
      g AS (
        SELECT key, unnest(generate_series(first_day, last_day,
          INTERVAL 1 DAY))::DATE AS day
        FROM (
          SELECT key, min(day) AS first_day,
            (SELECT max(day) FROM lastv) AS last_day
          FROM lastv GROUP BY 1) t),
      f AS (
        SELECT g.key, g.day, lastv.obs_v
        FROM g LEFT JOIN lastv ON g.key = lastv.key AND g.day = lastv.day)
      SELECT key, day,
        CAST(last_value(obs_v IGNORE NULLS) OVER (
          PARTITION BY key ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS value,
        obs_v IS NULL AS is_filled
      FROM f ORDER BY key, day
    """.trim))

  // --------------------------------------------------------------- q150

  /** q150 — cohort revenue / LTV curve ([[Cohorts.cohortRevenue]]):
    * per acquisition cohort and week offset, purchase revenue,
    * exact-decimal cumulative, and LTV per cohort user — cohorts from
    * ALL activity, revenue from purchase events only (the decoupling
    * the operator's valueCol contract exists for); dense zero-filled
    * offsets to the global last week. */
  val q150: Q = Q(
    "q150_cohort_ltv",
    (s, d) =>
      Cohorts.cohortRevenue(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us"))),
        when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))),
    Some("""
      WITH b AS (
        SELECT user_id AS u,
          (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS w,
          CAST(CASE WHEN event_type = 'purchase' THEN value
            ELSE 0 END AS DECIMAL(12,2)) AS v
        FROM events),
      ch AS (SELECT u, min(w) AS cohort_week FROM b GROUP BY 1),
      sz AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
        FROM ch GROUP BY 1),
      mw AS (SELECT max(w) AS mw FROM b),
      dense AS (
        SELECT cohort_week, cohort_users,
          unnest(generate_series(0, mw - cohort_week)) AS week_offset
        FROM sz CROSS JOIN mw),
      rev AS (
        SELECT cohort_week, w - cohort_week AS week_offset,
          sum(v) AS rev
        FROM b JOIN ch USING (u) GROUP BY 1, 2)
      SELECT d.cohort_week, d.week_offset, d.cohort_users,
        CAST(coalesce(rev, 0) AS DOUBLE) AS revenue,
        CAST(sum(coalesce(rev, 0)) OVER (
          PARTITION BY d.cohort_week ORDER BY d.week_offset
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue,
        CAST(sum(coalesce(rev, 0)) OVER (
          PARTITION BY d.cohort_week ORDER BY d.week_offset
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
          CAST(d.cohort_users AS DOUBLE) AS ltv_per_user
      FROM dense d
      LEFT JOIN rev ON d.cohort_week = rev.cohort_week
        AND d.week_offset = rev.week_offset
      ORDER BY d.cohort_week, d.week_offset
    """.trim))

  // --------------------------------------------------------------- q151

  /** q151 — daily value bands ([[Rolling.dailyValueBands]]): per
    * (event type, day), count/min/quartiles/max of the event value in
    * exact cents — the box-plot-over-time a daily SUM can't show (mix
    * shift vs price cut). Dyadic-on-integers quartiles. */
  val q151: Q = Q(
    "q151_daily_value_bands",
    (s, d) =>
      Rolling.dailyValueBands(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))),
        (Dec.d2(col("value")) * 100).cast("long")),
    Some("""
      WITH b AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day,
          CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL)
      SELECT key, day, CAST(count(*) AS BIGINT) AS n,
        CAST(min(v) AS BIGINT) AS min_cents,
        quantile_cont(v, 0.25) AS p25_cents,
        quantile_cont(v, 0.5) AS p50_cents,
        quantile_cont(v, 0.75) AS p75_cents,
        CAST(max(v) AS BIGINT) AS max_cents
      FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  // --------------------------------------------------------------- q152

  /** q152 — funnel step timing ([[Cohorts.funnelTiming]]): per
    * consecutive step pair, how long converting users took (exact µs
    * quartiles over the shared strictly-after cascade) — "drop at
    * checkout" vs "slow at checkout", and the empirical input to
    * q118's attribution-window choice. */
  val q152: Q = Q(
    "q152_funnel_timing",
    (s, d) =>
      Cohorts.funnelTiming(eventsUs(s, d), "user_id", col("ts_us"),
        "event_type", Seq("view", "click", "purchase")),
    Some("""
      WITH e AS (
        SELECT user_id AS u, event_type AS t,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events),
      s0 AS (SELECT u, min(ts_us) AS t0 FROM e WHERE t = 'view' GROUP BY u),
      s1 AS (SELECT e.u, min(ts_us) AS t1
             FROM e JOIN s0 ON e.u = s0.u AND e.ts_us > s0.t0
             WHERE t = 'click' GROUP BY e.u),
      s2 AS (SELECT e.u, min(ts_us) AS t2
             FROM e JOIN s1 ON e.u = s1.u AND e.ts_us > s1.t1
             WHERE t = 'purchase' GROUP BY e.u),
      d AS (
        SELECT 1 AS step_idx, 'view' AS step_from, 'click' AS step_to,
          t1 - t0 AS gap
        FROM s0 JOIN s1 USING (u)
        UNION ALL
        SELECT 2, 'click', 'purchase', t2 - t1
        FROM s1 JOIN s2 USING (u))
      SELECT CAST(step_idx AS INT) AS step_idx, step_from, step_to,
        CAST(count(*) AS BIGINT) AS n_users,
        CAST(min(gap) AS BIGINT) AS min_us,
        quantile_cont(gap, 0.25) AS p25_us,
        quantile_cont(gap, 0.5) AS p50_us,
        quantile_cont(gap, 0.75) AS p75_us,
        CAST(max(gap) AS BIGINT) AS max_us
      FROM d GROUP BY 1, 2, 3 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q153

  /** q153 — URL domain profile ([[TextAnalysis.domainProfile]]): per
    * lowercased host (plus the documented last-two-labels apex), URL
    * mentions and distinct citing docs — the census behind domain
    * block/allowlists. URLs seeded like q38 (doc_id % 7 picks one of
    * three hosts, mixed case pins the lowercasing). */
  val q153: Q = Q(
    "q153_domain_profile",
    (s, d) => {
      val host = when(col("doc_id") % 7 === 0, lit("Ads.SPAM.example"))
        .when(col("doc_id") % 7 === 1, lit("docs.example.org"))
        .otherwise(lit("a.b.news.example.com"))
      val seeded = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 =!= 0,
          concat(col("text"), lit(" https://"), host, lit("/p/"),
            col("doc_id"), lit(" and https://"), host, lit("/q")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.domainProfile(seeded, "doc_id", "text")
    },
    Some("""
      WITH seeded AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 <> 0 THEN text || ' https://' ||
            CASE WHEN doc_id % 7 = 0 THEN 'Ads.SPAM.example'
                 WHEN doc_id % 7 = 1 THEN 'docs.example.org'
                 ELSE 'a.b.news.example.com' END ||
            '/p/' || CAST(doc_id AS VARCHAR) || ' and https://' ||
            CASE WHEN doc_id % 7 = 0 THEN 'Ads.SPAM.example'
                 WHEN doc_id % 7 = 1 THEN 'docs.example.org'
                 ELSE 'a.b.news.example.com' END || '/q'
          ELSE text END AS text
        FROM documents),
      u AS (
        SELECT doc_id, lower(regexp_extract(url,
          'https?://([A-Za-z0-9.%-]+)', 1)) AS domain
        FROM seeded, LATERAL unnest(regexp_extract_all(text,
          'https?://[A-Za-z0-9./_%?=&#-]+', 0)) AS t(url))
      SELECT domain,
        regexp_extract(domain, '([A-Za-z0-9-]+[.][A-Za-z0-9-]+)$', 1)
          AS apex,
        CAST(count(*) AS BIGINT) AS n_urls,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM u GROUP BY 1 ORDER BY domain
    """.trim))

  // --------------------------------------------------------------- q154

  /** q154 — casing profile ([[TextAnalysis.casingProfile]]): per doc,
    * uppercase-letter ratio and ALL-CAPS token share — the
    * SHOUTING/headline-spam screen; ASCII-only by design (locale case
    * folding is not engine-portable), integer fixed-point ratios,
    * fully row-local. */
  val q154: Q = Q(
    "q154_casing_profile",
    (s, d) =>
      TextAnalysis.casingProfile(Tables.documents(s, d), "doc_id",
        "text"),
    Some("""
      WITH m AS (
        SELECT doc_id,
          CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
            AS BIGINT) AS n_letters,
          CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
            AS BIGINT) AS n_upper,
          list_filter(string_split_regex(trim(text), '\s+'),
            t -> t <> '') AS w
        FROM documents)
      SELECT doc_id, n_letters, n_upper,
        CAST(len(w) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(w, t -> regexp_matches(t, '^[A-Z]{2,}$')))
          AS BIGINT) AS n_caps_tokens,
        CASE WHEN n_letters > 0 THEN
          (n_upper * 1048576) // n_letters END AS upper_ratio_fp,
        CASE WHEN len(w) > 0 THEN
          (CAST(len(list_filter(w, t -> regexp_matches(t,
            '^[A-Z]{2,}$'))) AS BIGINT) * 1048576) // len(w)
        END AS caps_token_ratio_fp
      FROM m ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q155

  /** q155 — regional local-supplier volume (the TPC-H Q5 SHAPE on the
    * fixture star): revenue by nation for ASIA customers served by
    * same-nation suppliers in 1996 — the 6-table join that exercises
    * the planner's join-size laddering. Only the CONSTANT-size dims
    * (region, nation) are explicitly broadcast; customer and supplier
    * SCALE with the corpus, so their joins are left to
    * Catalyst/AQE — at fixture SF they auto-broadcast, at 100 TB they
    * shuffle on their keys, and the code is correct either way (the
    * q9 discipline one rung up). Money exact decimal end-to-end. */
  val q155: Q = Q(
    "q155_regional_volume",
    (s, d) => {
      val nat = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_suppkey"),
        (Dec.d2(col("l_extendedprice")) *
          (lit(1) - Dec.d2(col("l_discount")))).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(Dec.outD(sum(col("rev"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """.trim))

  // --------------------------------------------------------------- q156

  /** q156 — unshipped-order priority (the TPC-H Q3 SHAPE): top-10
    * revenue among BUILDING-segment orders placed before the cut
    * whose items shipped after it — filter-pushdown on BOTH fact
    * predicates, one orderkey-keyed aggregate, top-k as
    * TakeOrderedAndProject (per-partition heaps, never a global
    * sort); ties pinned (revenue desc, date, orderkey). */
  val q156: Q = Q(
    "q156_order_priority",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = Tables.lineitem(s, d)
        .where(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"),
          (Dec.d2(col("l_extendedprice")) *
            (lit(1) - Dec.d2(col("l_discount")))).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(Dec.outD(sum(col("rev"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"),
          col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_shipdate > TIMESTAMP '1997-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10
    """.trim))

  // --------------------------------------------------------------- q157

  /** q157 — period-over-period growth ([[Rolling.periodGrowth]]): per
    * event type, each observed day's value total vs the previous
    * observed day, growth rate and day_gap — the dashboard staple
    * with gaps kept honest; exact decimal totals, one IEEE division
    * at the boundary. */
  val q157: Q = Q(
    "q157_period_growth",
    (s, d) =>
      Rolling.periodGrowth(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))), col("value")),
    Some("""
      WITH daily AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day,
          sum(CAST(value AS DECIMAL(12,2))) AS total
        FROM events GROUP BY 1, 2),
      l AS (
        SELECT key, day, total,
          lag(total) OVER w AS prev_total,
          lag(day) OVER w AS prev_day
        FROM daily WINDOW w AS (PARTITION BY key ORDER BY day))
      SELECT key, day, CAST(total AS DOUBLE) AS total,
        CAST(prev_total AS DOUBLE) AS prev_total,
        CAST(day - prev_day AS INT) AS day_gap,
        CASE WHEN prev_total IS NOT NULL AND prev_total <> 0 THEN
          CAST(total - prev_total AS DOUBLE) / CAST(prev_total AS DOUBLE)
        END AS growth
      FROM l ORDER BY key, day
    """.trim))

  // --------------------------------------------------------------- q158

  /** q158 — JSON field top-k ([[SemiStructured.jsonFieldTopK]]): per
    * event type, the 3 most frequent values of `props.k` — the value
    * census of a semi-structured field, missing payloads surfacing as
    * the NULL row; ties pinned (count desc, value asc NULLS FIRST);
    * rank filter plans as WindowGroupLimit. */
  val q158: Q = Q(
    "q158_json_topk",
    (s, d) =>
      SemiStructured.jsonFieldTopK(Tables.events(s, d), "props", "k",
        "event_type", k = 3),
    Some("""
      WITH c AS (
        SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS value,
          CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT event_type, value, n,
          CAST(row_number() OVER (PARTITION BY event_type
            ORDER BY n DESC, value ASC NULLS FIRST) AS INT) AS rank
        FROM c)
      SELECT event_type, value, n, rank
      FROM r WHERE rank <= 3
      ORDER BY event_type, rank
    """.trim))

  // --------------------------------------------------------------- q159

  /** q159 — vocabulary coverage curve ([[TextAnalysis.coverageCurve]]):
    * token-mass share carried by the top-10/100/1000 terms — the
    * table that sizes a vocabulary and flags template corpora (q133's
    * concentration seen cumulatively). TakeOrdered head, exact
    * integer cumulative, one division per reading. */
  val q159: Q = Q(
    "q159_coverage_curve",
    (s, d) =>
      TextAnalysis.coverageCurve(Tables.documents(s, d), "text",
        ks = Seq(5, 10, 25)),
    Some("""
      WITH tok AS (
        SELECT t
        FROM documents, LATERAL unnest(
          regexp_extract_all(lower(text), '([a-z]+|[0-9]+)', 1)) AS u(t)),
      uni AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_cf FROM uni),
      r AS (
        SELECT c, CAST(row_number() OVER (ORDER BY c DESC, t)
          AS BIGINT) AS k
        FROM uni),
      cum AS (
        SELECT k, CAST(sum(c) OVER (ORDER BY k
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS covered_cf
        FROM r WHERE k <= 25)
      SELECT k, covered_cf, total_cf,
        CAST(covered_cf AS DOUBLE) / CAST(total_cf AS DOUBLE) AS share
      FROM cum CROSS JOIN tot
      WHERE k IN (5, 10, 25) ORDER BY k
    """.trim))

  // --------------------------------------------------------------- q160

  /** q160 — near-dup cluster impact by source
    * ([[Dedup.clusterImpact]]): per source, member docs vs distinct
    * families vs canonical survivors under q31's clustering — "this
    * feed is 70% redundant against the corpus", the per-feed reading
    * of the dedup decision. The oracle composes the q31 recursive
    * closure with a source rollup. */
  val q160: Q = Q(
    "q160_cluster_impact",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.clusterImpact(docs, "doc_id", "source",
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
      cl AS (SELECT id AS doc_id, min(r) AS cluster_id
             FROM reach GROUP BY id)
      SELECT d.source,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT cl.cluster_id) AS BIGINT) AS n_families,
        CAST(sum(CASE WHEN cl.doc_id = cl.cluster_id THEN 1 ELSE 0 END)
          AS BIGINT) AS n_canonical,
        CAST(sum(CASE WHEN cl.doc_id = cl.cluster_id THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS survival_rate
      FROM documents d JOIN cl ON d.doc_id = cl.doc_id
      GROUP BY d.source ORDER BY d.source
    """.trim))

  // --------------------------------------------------------------- q161

  /** q161 — Pareto / ABC classification ([[Cohorts.paretoClasses]]):
    * brands ranked by exact-decimal revenue mass, classed by
    * cumulative share (A ≤ 0.8, B ≤ 0.95, C the tail) — which brands
    * get premium treatment, which SKUs get end-of-lifed; windows sort
    * only the |brands|-row reduced frame. */
  val q161: Q = Q(
    "q161_abc_classes",
    (s, d) =>
      Cohorts.paretoClasses(
        Tables.lineitem(s, d).join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey")),
        col("p_brand"), col("l_extendedprice")),
    Some("""
      WITH byk AS (
        SELECT p_brand AS key,
          sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS value
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1),
      r AS (
        SELECT key, value,
          CAST(row_number() OVER w AS INT) AS rank,
          sum(value) OVER (w ROWS UNBOUNDED PRECEDING) AS cum,
          sum(value) OVER () AS total
        FROM byk WINDOW w AS (ORDER BY value DESC, key))
      SELECT key, CAST(value AS DOUBLE) AS value, rank,
        CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
        CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
          THEN 'A'
          WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95
          THEN 'B' ELSE 'C' END AS abc_class
      FROM r ORDER BY rank
    """.trim))

  // --------------------------------------------------------------- q162

  /** q162 — catalog staleness audit ([[Rules.stalenessAudit]]): per
    * brand, parts that ever shipped and parts that shipped within 365
    * days of the corpus's LAST ship date — anchored to the data's own
    * clock, never now() (hash-verifiable, rerun-stable); the dead-SKU
    * report. */
  val q162: Q = Q(
    "q162_staleness_audit",
    (s, d) =>
      Rules.stalenessAudit(Tables.part(s, d), "p_partkey", "p_brand",
        Tables.lineitem(s, d), "l_partkey", col("l_shipdate"),
        horizonDays = 365),
    Some("""
      WITH last AS (
        SELECT l_partkey AS k, max(l_shipdate) AS last_ts
        FROM lineitem GROUP BY 1),
      j AS (
        SELECT p_brand AS g, last.last_ts,
          (SELECT max(last_ts) FROM last) AS gl
        FROM part LEFT JOIN last ON p_partkey = last.k)
      SELECT g AS p_brand, CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(CASE WHEN last_ts IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_active,
        CAST(sum(CASE WHEN last_ts IS NOT NULL AND
          CAST(gl AS DATE) - CAST(last_ts AS DATE) <= 365
          THEN 1 ELSE 0 END) AS BIGINT) AS n_recent,
        CAST(count(*) - sum(CASE WHEN last_ts IS NOT NULL AND
          CAST(gl AS DATE) - CAST(last_ts AS DATE) <= 365
          THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
          AS stale_rate
      FROM j GROUP BY g ORDER BY p_brand
    """.trim))

  // --------------------------------------------------------------- q163

  /** q163 — day-of-week volume anomaly ([[Drift.dowVolumeAnomaly]]):
    * q83's robust z conditioned on the weekly season (days-since-epoch
    * mod 7 — integer arithmetic, no locale calendar) so a weekend/
    * weekday volume split stops posting two false alarms a week. */
  val q163: Q = Q(
    "q163_dow_anomaly",
    (s, d) =>
      Drift.dowVolumeAnomaly(eventsUs(s, d),
        to_date(timestamp_micros(col("ts_us"))), "event_type"),
    Some("""
      WITH c AS (
        SELECT event_type AS t, CAST(ts AS DATE) AS day,
          CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2),
      c2 AS (
        SELECT t, day, n_events,
          CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow
        FROM c),
      med AS (
        SELECT t, dow, quantile_cont(n_events, 0.5) AS m
        FROM c2 GROUP BY 1, 2),
      dev AS (
        SELECT c2.t, c2.day, c2.dow, c2.n_events, med.m,
          abs(c2.n_events - med.m) AS dd
        FROM c2 JOIN med ON c2.t = med.t AND c2.dow = med.dow),
      mad AS (
        SELECT t, dow, quantile_cont(dd, 0.5) AS md
        FROM dev GROUP BY 1, 2)
      SELECT dev.t AS event_type, dev.day, dev.dow, dev.n_events,
        CASE WHEN mad.md = 0 THEN NULL
          ELSE (dev.n_events - dev.m) / mad.md END AS score
      FROM dev JOIN mad ON dev.t = mad.t AND dev.dow = mad.dow
      ORDER BY event_type, day
    """.trim))

  // --------------------------------------------------------------- q164

  /** q164 — running drawdown ([[Rolling.drawdown]]): per event type,
    * each day's value total against the running peak — sustained
    * decline WITH magnitude (CUSUM alarms, this sizes); exact decimal
    * peak, one boundary division. */
  val q164: Q = Q(
    "q164_drawdown",
    (s, d) =>
      Rolling.drawdown(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))), col("value")),
    Some("""
      WITH daily AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS day,
          sum(CAST(value AS DECIMAL(12,2))) AS total
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT key, day, total,
          max(total) OVER (PARTITION BY key ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS peak
        FROM daily)
      SELECT key, day, CAST(total AS DOUBLE) AS total,
        CAST(peak AS DOUBLE) AS peak,
        CASE WHEN peak > 0 THEN
          1.0e0 - CAST(total AS DOUBLE) / CAST(peak AS DOUBLE)
        END AS drawdown
      FROM p ORDER BY key, day
    """.trim))

  // --------------------------------------------------------------- q165

  /** q165 — co-missingness lift ([[Profiling.missingnessLift]]): do
    * fields go null TOGETHER — the one-broken-extractor signature
    * (lift ≫ 1) vs mutually-exclusive variants (lift ≪ 1); nulls
    * seeded deterministically (a ∧ b co-missing on id % 4, c
    * independent on id % 5). One pass, all pairs, fixed-point lift. */
  val q165: Q = Q(
    "q165_missingness_lift",
    (s, d) => {
      val seeded = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 4 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("a"),
        when(col("doc_id") % 4 === 0, lit(null).cast("string"))
          .otherwise(col("source")).as("b"),
        when(col("doc_id") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("n_chars")).as("c"))
      Profiling.missingnessLift(seeded, Seq("a", "b", "c"))
    },
    Some("""
      WITH seeded AS (
        SELECT doc_id,
          CASE WHEN doc_id % 4 = 0 THEN NULL ELSE lang END AS a,
          CASE WHEN doc_id % 4 = 0 THEN NULL ELSE source END AS b,
          CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars END AS c
        FROM documents),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS na,
          CAST(sum(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS nb,
          CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS nc,
          CAST(sum(CASE WHEN a IS NULL AND b IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS nab,
          CAST(sum(CASE WHEN a IS NULL AND c IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS nac,
          CAST(sum(CASE WHEN b IS NULL AND c IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS nbc
        FROM seeded)
      SELECT * FROM (
        SELECT 'a' AS column_a, 'b' AS column_b, n AS n_rows,
          na AS n_null_a, nb AS n_null_b, nab AS n_null_both,
          CASE WHEN na > 0 AND nb > 0 THEN
            CAST(((CAST(nab AS HUGEINT) * 1048576) * n)
              // (CAST(na AS HUGEINT) * nb) AS BIGINT) END AS lift_fp
        FROM m
        UNION ALL
        SELECT 'a', 'c', n, na, nc, nac,
          CASE WHEN na > 0 AND nc > 0 THEN
            CAST(((CAST(nac AS HUGEINT) * 1048576) * n)
              // (CAST(na AS HUGEINT) * nc) AS BIGINT) END
        FROM m
        UNION ALL
        SELECT 'b', 'c', n, nb, nc, nbc,
          CASE WHEN nb > 0 AND nc > 0 THEN
            CAST(((CAST(nbc AS HUGEINT) * 1048576) * n)
              // (CAST(nb AS HUGEINT) * nc) AS BIGINT) END
        FROM m) t
      ORDER BY column_a, column_b
    """.trim))

  // --------------------------------------------------------------- q166

  /** q166 — peak-rate profile ([[Drift.peakRateProfile]]): per event
    * type, minute-bucket count distribution (median, peak,
    * burstiness) — the queue-vs-bigger-average capacity number the
    * day-scale monitors can't see; integer buckets, exact median,
    * one division. */
  val q166: Q = Q(
    "q166_peak_rate",
    (s, d) =>
      Drift.peakRateProfile(eventsUs(s, d), col("ts_us"), "event_type"),
    Some("""
      WITH b AS (
        SELECT event_type AS t,
          CAST(epoch_us(ts) AS BIGINT) // 60000000 AS b,
          CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2)
      SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        quantile_cont(n, 0.5) AS p50_rate,
        CAST(max(n) AS BIGINT) AS peak_rate,
        CASE WHEN quantile_cont(n, 0.5) > 0 THEN
          CAST(max(n) AS DOUBLE) / quantile_cont(n, 0.5)
        END AS burstiness
      FROM b GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q167

  /** q167 — order-to-ship latency bands ([[Profiling.valueBands]]):
    * per order priority, the distribution of integer ship-latency
    * days (lineitem ship date minus order date) — the logistics SLO
    * table; exact quartiles on integer days. */
  val q167: Q = Q(
    "q167_ship_latency",
    (s, d) =>
      Profiling.valueBands(
        Tables.lineitem(s, d).join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey")),
        col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long")),
    Some("""
      WITH g AS (
        SELECT o_orderpriority AS g,
          CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
            AS BIGINT) AS v
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      SELECT g, CAST(count(*) AS BIGINT) AS n,
        CAST(min(v) AS BIGINT) AS min_v,
        quantile_cont(v, 0.25) AS p25_v,
        quantile_cont(v, 0.5) AS p50_v,
        quantile_cont(v, 0.75) AS p75_v,
        CAST(max(v) AS BIGINT) AS max_v
      FROM g GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q168

  /** q168 — customer order-count distribution (the TPC-H Q13 SHAPE):
    * how many customers placed exactly k orders, INCLUDING the
    * zero-order customers the fact table alone can't show (the LEFT
    * join is the point — churn/inactive analysis dies without the
    * empty bucket); two partial-aggregable levels (per-customer count,
    * then the count-of-counts), the second over the ≤ |customers|-row
    * reduced frame. */
  val q168: Q = Q(
    "q168_order_distribution",
    (s, d) =>
      Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_orders")),
    Some("""
      SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
      FROM (
        SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey) t
      GROUP BY n_orders ORDER BY n_orders
    """.trim))

  // --------------------------------------------------------------- q169

  /** q169 — activity streaks ([[Cohorts.activityStreaks]]): per user,
    * runs of consecutive active days via gaps-and-islands (day −
    * row_number is constant within a run — pure integer arithmetic);
    * longest-streak ties pinned to the earliest start. The habit
    * signal q138's DAU/WAU ratio can't see. */
  val q169: Q = Q(
    "q169_activity_streaks",
    (s, d) =>
      Cohorts.activityStreaks(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id AS u,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d
        FROM events),
      isl AS (
        SELECT u, d,
          d - row_number() OVER (PARTITION BY u ORDER BY d) AS island
        FROM days),
      st AS (
        SELECT u, island, CAST(count(*) AS BIGINT) AS len,
          min(d) AS start_d
        FROM isl GROUP BY 1, 2),
      fl AS (
        SELECT u, len, start_d,
          sum(len) OVER (PARTITION BY u) AS active_days,
          count(*) OVER (PARTITION BY u) AS n_streaks,
          max(len) OVER (PARTITION BY u) AS mx
        FROM st)
      SELECT u AS "user",
        CAST(max(active_days) AS BIGINT) AS active_days,
        CAST(max(n_streaks) AS BIGINT) AS n_streaks,
        CAST(max(mx) AS BIGINT) AS max_streak,
        DATE '1970-01-01' + CAST(min(start_d) AS INTEGER)
          AS max_streak_start
      FROM fl WHERE len = mx GROUP BY u ORDER BY u
    """.trim))

  // --------------------------------------------------------------- q170

  /** q170 — trending rank shift ([[Rolling.rankShift]]): the
    * leaderboard movement report — parts ranked by exact-decimal
    * revenue in the trailing 30 shipping days vs the 30 before,
    * rank delta for the current top 20; anchored to the data's own
    * clock, ranks pinned by (value DESC, key ASC) row_number. */
  val q170: Q = Q(
    "q170_rank_shift",
    (s, d) =>
      Rolling.rankShift(Tables.lineitem(s, d), col("l_partkey"),
        to_date(col("l_shipdate")), col("l_extendedprice"),
        windowDays = 30, topK = 20),
    Some("""
      WITH daily AS (
        SELECT l_partkey AS key, CAST(l_shipdate AS DATE) AS day,
          sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS total
        FROM lineitem GROUP BY 1, 2),
      aged AS (
        SELECT key, total,
          (max(day) OVER ()) - day AS age
        FROM daily),
      periods AS (
        SELECT key,
          sum(CASE WHEN age < 30 THEN total END) AS cur_v,
          sum(CASE WHEN age >= 30 AND age < 60 THEN total END) AS prev_v
        FROM aged GROUP BY 1),
      cur AS (
        SELECT key, cur_v,
          row_number() OVER (ORDER BY cur_v DESC, key) AS cur_rank
        FROM periods WHERE cur_v IS NOT NULL
        QUALIFY cur_rank <= 20),
      prev AS (
        SELECT key, prev_v,
          row_number() OVER (ORDER BY prev_v DESC, key) AS prev_rank
        FROM periods WHERE prev_v IS NOT NULL)
      SELECT cur.key AS key, CAST(cur_rank AS INTEGER) AS cur_rank,
        CAST(cur_v AS DOUBLE) AS cur_value,
        CAST(prev_rank AS INTEGER) AS prev_rank,
        CAST(prev_v AS DOUBLE) AS prev_value,
        CAST(prev_rank - cur_rank AS INTEGER) AS rank_gain
      FROM cur LEFT JOIN prev ON cur.key = prev.key
      ORDER BY cur_rank
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

  // --------------------------------------------------------------- q172

  /** q172 — causal expanding z-score ([[Rolling.causalZScore]]):
    * leakage-safe standardization — each event's value scored against
    * its user's STRICTLY PRIOR history only (the training feature
    * that never reads the future); exact-integer window sums, the
    * z a fixed IEEE expression tree over exact scalars. */
  val q172: Q = Q(
    "q172_causal_zscore",
    (s, d) =>
      Rolling.causalZScore(eventsUs(s, d), col("user_id"),
        col("ts_us"), col("event_id"), col("value")),
    Some("""
      WITH base AS (
        SELECT user_id AS key, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          event_id AS id,
          CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) AS c
        FROM events),
      w AS (
        SELECT key, id, c,
          count(c) OVER win AS n_prior,
          sum(c) OVER win AS s,
          sum(c * c) OVER win AS q
        FROM base
        WINDOW win AS (PARTITION BY key ORDER BY ts_us, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT key, id, CAST(n_prior AS BIGINT) AS n_prior,
        CAST(c AS DOUBLE) / 100.0 AS value,
        CASE WHEN n_prior >= 2
          AND CAST(n_prior * q - s * s AS DOUBLE) > 0 THEN
          CAST(n_prior * c - s AS DOUBLE)
            / sqrt(CAST(n_prior * q - s * s AS DOUBLE))
            * sqrt(CAST(n_prior - 1 AS DOUBLE) / CAST(n_prior AS DOUBLE))
        END AS z
      FROM w ORDER BY key, id
    """.trim))

  // --------------------------------------------------------------- q173

  /** q173 — seasonal-naive forecast error ([[Drift.seasonalNaiveError]]):
    * per stream, the WMAPE of the "same day last week" forecast on
    * daily counts — how tight an alarm band the stream supports;
    * exact-integer sums with ONE boundary division (never a mean of
    * per-day ratios), only days with an observed t−7 predecessor
    * score. */
  val q173: Q = Q(
    "q173_seasonal_naive",
    (s, d) =>
      Drift.seasonalNaiveError(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))), lagDays = 7),
    Some("""
      WITH daily AS (
        SELECT event_type AS key,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d,
          CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2)
      SELECT c.key AS key, CAST(count(*) AS BIGINT) AS n_days_scored,
        CAST(sum(abs(c.n - p.n)) AS BIGINT) AS abs_err,
        CAST(sum(p.n) AS BIGINT) AS base,
        CAST(sum(abs(c.n - p.n)) AS DOUBLE) / CAST(sum(p.n) AS DOUBLE)
          AS wmape
      FROM daily c JOIN daily p ON c.key = p.key AND c.d = p.d + 7
      GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q174

  /** q174 — winnowing fingerprint near-dup ([[Dedup.winnowingPairs]]):
    * MOSS-style deterministic local sampling — per window-of-4
    * positional 3-token hashes keep the min (ties rightmost, encoded
    * as one integer min so both engines agree), pair docs sharing ≥ 2
    * selected fingerprints; any shared run of ≥ 6 tokens is caught
    * with certainty while only ~2/5 of positions are kept. */
  val q174: Q = Q(
    "q174_winnowing_neardup",
    (s, d) =>
      Dedup.winnowingPairs(Tables.documents(s, d), "doc_id", "text",
        span = 3, window = 4, maxDf = 100, minShared = 2),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      win AS (
        SELECT doc_id, i AS pos, len(whl) - 2 AS n_pos,
          list_reduce(list_prepend(0::BIGINT, whl[i : i + 2]),
            (h, c) -> ((h * 31) + c) % $P) AS h
        FROM wh, LATERAL unnest(range(1, len(whl) - 1)) AS t(i)
        WHERE len(whl) - 2 BETWEEN 4 AND 1048575
      ),
      mins AS (
        SELECT doc_id, pos, n_pos,
          min(h * 1048576 + (1048576 - pos)) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS combo
        FROM win),
      picks AS (
        SELECT DISTINCT doc_id, combo // 1048576 AS fp
        FROM mins WHERE pos <= n_pos - 3),
      kept AS (
        SELECT doc_id, fp FROM picks
        QUALIFY count(*) OVER (PARTITION BY fp) <= 100)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(count(*) AS BIGINT) AS n_shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2
      ORDER BY doc_a, doc_b
    """.trim))

  // --------------------------------------------------------------- q175

  /** q175 — snapshot profile drift ([[Drift.profileDrift]]): per
    * column, the schema-health diff between two corpus snapshots —
    * null-rate delta and distinct-count ratio over exact counts; the
    * "did the new crawl break an extractor" report before any
    * value-level drift test. Nulls seeded deterministically on the
    * new side (doc_id % 3). */
  val q175: Q = Q(
    "q175_profile_drift",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val oldSnap = docs.where(col("doc_id") % 2 === 0)
      val newSnap = docs.where(col("doc_id") % 2 === 1)
        .withColumn("lang",
          when(col("doc_id") % 3 === 0, lit(null).cast("string"))
            .otherwise(col("lang")))
      Drift.profileDrift(oldSnap, newSnap, Seq("lang", "source"))
    },
    Some("""
      WITH o AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
      n AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS lang,
          source
        FROM documents WHERE doc_id % 2 = 1),
      op AS (
        SELECT 'lang' AS column_name, count(*) AS r,
          sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nl,
          count(DISTINCT lang) AS nd FROM o
        UNION ALL
        SELECT 'source', count(*),
          sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
          count(DISTINCT source) FROM o),
      np AS (
        SELECT 'lang' AS column_name, count(*) AS r,
          sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nl,
          count(DISTINCT lang) AS nd FROM n
        UNION ALL
        SELECT 'source', count(*),
          sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
          count(DISTINCT source) FROM n)
      SELECT op.column_name AS column_name,
        CAST(op.r AS BIGINT) AS n_rows_old,
        CAST(op.nl AS BIGINT) AS n_nulls_old,
        CAST(op.nd AS BIGINT) AS n_distinct_old,
        CAST(np.r AS BIGINT) AS n_rows_new,
        CAST(np.nl AS BIGINT) AS n_nulls_new,
        CAST(np.nd AS BIGINT) AS n_distinct_new,
        CASE WHEN op.r > 0 AND np.r > 0 THEN
          CAST(np.nl AS DOUBLE) / CAST(np.r AS DOUBLE)
            - CAST(op.nl AS DOUBLE) / CAST(op.r AS DOUBLE)
        END AS null_rate_delta,
        CASE WHEN op.nd > 0 THEN
          CAST(np.nd AS DOUBLE) / CAST(op.nd AS DOUBLE)
        END AS ndv_ratio
      FROM op JOIN np USING (column_name) ORDER BY column_name
    """.trim))

  // --------------------------------------------------------------- q176

  /** q176 — transaction-value tail bands ([[Profiling.tailBands]]):
    * per event type, the exact dyadic tail ladder (1/2 … 63/64) of
    * integer-cent values — the SLO tail q167's quartiles can't see,
    * at percentile points whose interpolation weights are exponent
    * shifts (engine-exact on integers, never a decimal p99). */
  val q176: Q = Q(
    "q176_value_tail_bands",
    (s, d) =>
      Profiling.tailBands(eventsUs(s, d), col("event_type"),
        (Dec.d2(col("value")) * 100).cast("long")),
    Some("""
      WITH g AS (
        SELECT event_type AS g,
          CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL)
      SELECT g, CAST(count(*) AS BIGINT) AS n,
        quantile_cont(v, 0.5) AS p50,
        quantile_cont(v, 0.75) AS p75,
        quantile_cont(v, 0.875) AS p875,
        quantile_cont(v, 0.9375) AS p9375,
        quantile_cont(v, 0.96875) AS p96875,
        quantile_cont(v, 0.984375) AS p984375,
        CAST(max(v) AS BIGINT) AS max_v
      FROM g GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q177

  /** One unrolled fixed-point PageRank iteration for the q177 oracle
    * (mirrors [[Cohorts.transitionPageRank]]'s loop body exactly:
    * integer products, floor divisions, leaky dangling mass). */
  private def prIter(prev: String, cur: String): String = s"""
      |$cur AS (
      |  SELECT nodes.t AS t,
      |    ((1099511627776 * 15) // 100) // (SELECT n FROM nn)
      |      + (85 * coalesce(m.s, 0)) // 100 AS r
      |  FROM nodes LEFT JOIN (
      |    SELECT ew.dst AS t, sum(($prev.r * ew.n) // ew.n_src) AS s
      |    FROM ew JOIN $prev ON $prev.t = ew.src GROUP BY 1) m
      |  ON nodes.t = m.t)""".stripMargin

  /** q177 — event-type PageRank ([[Cohorts.transitionPageRank]]):
    * random-surfer importance over the q122 transition graph in
    * fixed-point 2⁴⁰ integer arithmetic — every product, sum and
    * floor-div engine-exact, so even an ITERATIVE analytic sits under
    * the oracle gate (a float power iteration could not hash-verify);
    * 3 iterations, damping 0.85, leaky dangling mass (documented). */
  val q177: Q = Q(
    "q177_type_pagerank",
    (s, d) =>
      Cohorts.transitionPageRank(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id", iters = 3),
    Some(s"""
      WITH tr AS (
        SELECT event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      e AS (
        SELECT prev AS src, event_type AS dst,
          CAST(count(*) AS BIGINT) AS n
        FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
      ot AS (SELECT src, sum(n) AS n_src FROM e GROUP BY 1),
      ew AS (SELECT e.src, e.dst, e.n, ot.n_src FROM e JOIN ot USING (src)),
      nodes AS (SELECT DISTINCT event_type AS t FROM events),
      nn AS (SELECT count(*) AS n FROM nodes),
      r0 AS (SELECT t, 1099511627776 // (SELECT n FROM nn) AS r
             FROM nodes),
      ${prIter("r0", "r1").trim},
      ${prIter("r1", "r2").trim},
      ${prIter("r2", "r3").trim}
      SELECT t AS event_type, CAST(r AS BIGINT) AS rank_fp,
        CAST(r AS DOUBLE) / 1099511627776.0 AS rank
      FROM r3 ORDER BY rank_fp DESC, event_type
    """.trim))

  // --------------------------------------------------------------- q178

  /** q178 — fuzzy-match operating point (q92 ∘ [[Dedup.pairsEval]],
    * completing the eval quartet with q129/q144/q148): inject
    * deterministic typos into part names — every 10th key drops the
    * FIRST character (lev 1, block-preserving: the blocking key is
    * the second token), every 20th drops a character from the SECOND
    * token instead (lev 1 but BLOCK-BREAKING) — and measure the
    * blocked matcher's pair recall
    * against the injected truth. The blocking trade q92's scaladoc
    * promises, MEASURED: recall ≈ the block-preserving share, so a
    * blocking-key change shows up as a number, not an opinion. */
  val q178: Q = Q(
    "q178_fuzzy_operating_point",
    (s, d) => {
      val base = Tables.part(s, d)
        .select(col("p_partkey").as("k"), col("p_name").as("name"))
      val toks = split(col("name"), " ")
      val t2 = element_at(toks, 2)
      val rebuilt = concat_ws(" ", concat(
        slice(toks, 1, 1),
        array(t2.substr(lit(1), length(t2) - 1)),
        slice(toks, lit(3), greatest(size(toks) - 2, lit(0)))))
      val dirty = base.where(col("k") % 10 === 0)
        .select(col("name"),
          when(col("k") % 20 === 0 && size(toks) >= 2, rebuilt)
            .otherwise(expr("substring(name, 2)")).as("dirty"))
      val union = base.select(col("name"))
        .unionByName(dirty.select(col("dirty").as("name")))
      val got = Dedup.fuzzyMatchPairs(union, "name", maxDist = 2)
        .select(col("name_a").as("doc_a"), col("name_b").as("doc_b"))
      val want = dirty.select(
        least(col("name"), col("dirty")).as("doc_a"),
        greatest(col("name"), col("dirty")).as("doc_b"))
      Dedup.pairsEval(got, want)
    },
    Some("""
      WITH base AS (SELECT p_partkey AS k, p_name AS name FROM part),
      dirty AS (
        SELECT name,
          CASE WHEN k % 20 = 0 AND len(l) >= 2 THEN
            array_to_string(list_concat(list_concat(l[1:1],
              [substr(l[2], 1, length(l[2]) - 1)]), l[3:]), ' ')
          ELSE substr(name, 2) END AS dirty
        FROM (SELECT k, name, string_split(name, ' ') AS l FROM base)
        WHERE k % 10 = 0),
      u AS (SELECT name FROM base UNION ALL SELECT dirty FROM dirty),
      g AS (SELECT name, count(*) AS n_rows FROM u GROUP BY 1),
      b AS (
        SELECT name,
          CASE WHEN strpos(name, ' ') = 0 THEN substr(name, 1, 4)
               ELSE split_part(name, ' ', 2) END AS blk
        FROM g),
      k2 AS (
        SELECT name, blk FROM (
          SELECT b.*, count(*) OVER (PARTITION BY blk) AS c_blk FROM b)
        WHERE c_blk <= 4096),
      got AS (
        SELECT DISTINCT a.name AS doc_a, c.name AS doc_b
        FROM k2 a JOIN k2 c ON a.blk = c.blk AND a.name < c.name
        WHERE levenshtein(a.name, c.name) <= 2),
      want AS (
        SELECT DISTINCT least(name, dirty) AS doc_a,
          greatest(name, dirty) AS doc_b
        FROM dirty),
      hit AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
              FROM got JOIN want USING (doc_a, doc_b)),
      ng AS (SELECT CAST(count(*) AS BIGINT) AS n_got FROM got),
      nw AS (SELECT CAST(count(*) AS BIGINT) AS n_want FROM want)
      SELECT n_got, n_want, n_hit,
        CASE WHEN n_got > 0 THEN
          CAST(n_hit AS DOUBLE) / CAST(n_got AS DOUBLE)
        END AS pair_precision,
        CASE WHEN n_want > 0 THEN
          CAST(n_hit AS DOUBLE) / CAST(n_want AS DOUBLE)
        END AS pair_recall
      FROM ng, nw, hit
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

  // --------------------------------------------------------------- q180

  /** q180 — grid-percentile accuracy ([[Profiling.gridPercentileAccuracy]]):
    * the eval rung for the percentile sketch — per point, q111's grid
    * estimate vs the exact rank-based percentile, signed error, and
    * the `0 ≤ err < width` guarantee check; the exact side is the
    * documented eval-time reference cost. */
  val q180: Q = Q(
    "q180_grid_accuracy",
    (s, d) =>
      Profiling.gridPercentileAccuracy(Tables.events(s, d), "value",
        width = 0.25, ps = Seq(0.25, 0.5, 0.9, 0.99)),
    Some("""
      WITH b AS (
        SELECT CAST(floor(value / 0.25e0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      c AS (
        SELECT bin, n, CAST(sum(n) OVER (ORDER BY bin
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM b),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS n_values FROM b),
      p AS (SELECT CAST(unnest([0.25e0, 0.5e0, 0.9e0, 0.99e0])
        AS DOUBLE) AS p),
      x AS (
        SELECT p.p, t.n_values,
          CAST(ceil(p.p * t.n_values) AS BIGINT) AS target_rank,
          min(c.bin) AS bin
        FROM p CROSS JOIN t
        JOIN c ON c.cum >= CAST(ceil(p.p * t.n_values) AS BIGINT)
        GROUP BY 1, 2, 3),
      vals AS (
        SELECT value AS v, CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      vc AS (
        SELECT v, CAST(sum(n) OVER (ORDER BY v
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM vals),
      ex AS (
        SELECT x.p, x.target_rank, min(vc.v) AS exact_percentile
        FROM x JOIN vc ON vc.cum >= x.target_rank GROUP BY 1, 2)
      SELECT x.p AS p, x.n_values, x.target_rank,
        CAST(x.bin AS DOUBLE) * 0.25e0 AS est_percentile,
        ex.exact_percentile,
        ex.exact_percentile - CAST(x.bin AS DOUBLE) * 0.25e0 AS err,
        (ex.exact_percentile - CAST(x.bin AS DOUBLE) * 0.25e0 >= 0
          AND ex.exact_percentile - CAST(x.bin AS DOUBLE) * 0.25e0
            < 0.25e0) AS within_width
      FROM x JOIN ex ON x.p = ex.p AND x.target_rank = ex.target_rank
      ORDER BY p
    """.trim))

  // --------------------------------------------------------------- q181

  /** q181 — transition predictability
    * ([[Cohorts.transitionPredictability]]): per from-type, the
    * majority-baseline accuracy — the share of transitions going to
    * the single most common successor; "does a sequence model beat a
    * lookup table" as a measured number, ties pinned to the smallest
    * to-type. */
  val q181: Q = Q(
    "q181_transition_predictability",
    (s, d) =>
      Cohorts.transitionPredictability(Tables.events(s, d), "user_id",
        "ts", "event_type", "event_id"),
    Some("""
      WITH tr AS (
        SELECT event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      e AS (
        SELECT prev AS from_type, event_type AS to_type,
          CAST(count(*) AS BIGINT) AS n
        FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
      r AS (
        SELECT from_type, to_type, n,
          CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
            AS n_transitions,
          row_number() OVER (PARTITION BY from_type
            ORDER BY n DESC, to_type) AS rr
        FROM e)
      SELECT from_type, n_transitions, to_type AS top_to_type,
        n AS n_top,
        CAST(n AS DOUBLE) / CAST(n_transitions AS DOUBLE) AS hit_rate
      FROM r WHERE rr = 1 ORDER BY from_type
    """.trim))

  // --------------------------------------------------------------- q182

  /** q182 — key-sequence gap audit ([[Profiling.keyGapAudit]]): holes
    * in a supposedly-dense key space — total missing mass, gap count,
    * the largest gap and its start; gaps seeded deterministically
    * (every (k div 10) % 7 = 3 decade removed → periodic 10-wide
    * holes). The two-level bucketed lag replays the naive single
    * window exactly. */
  val q182: Q = Q(
    "q182_key_gap_audit",
    (s, d) =>
      Profiling.keyGapAudit(
        Tables.orders(s, d)
          .where(!(expr("o_orderkey div 10") % 7 === 3)),
        col("o_orderkey")),
    Some("""
      WITH k AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
        WHERE (o_orderkey // 10) % 7 <> 3),
      g AS (SELECT k, lag(k) OVER (ORDER BY k) AS pk FROM k),
      gg AS (
        SELECT k - pk - 1 AS gap, pk + 1 AS gs
        FROM g WHERE pk IS NOT NULL)
      SELECT CAST((SELECT min(k) FROM k) AS BIGINT) AS min_key,
        CAST((SELECT max(k) FROM k) AS BIGINT) AS max_key,
        CAST((SELECT count(*) FROM k) AS BIGINT) AS n_keys,
        CAST((SELECT max(k) FROM k) - (SELECT min(k) FROM k) + 1
          - (SELECT count(*) FROM k) AS BIGINT) AS n_missing,
        CAST((SELECT count(*) FROM gg WHERE gap > 0) AS BIGINT)
          AS n_gaps,
        CAST((SELECT coalesce(max(gap), 0) FROM gg) AS BIGINT)
          AS max_gap,
        CAST((SELECT min(gs) FROM gg WHERE gap > 0
          AND gap = (SELECT max(gap) FROM gg)) AS BIGINT)
          AS max_gap_start
    """.trim))

  // --------------------------------------------------------------- q183

  /** q183 — OLS daily trend ([[Trend.olsTrend]]): least-squares
    * counts/day slope per stream from the five classical sums — one
    * partial-aggregable pass, exact-integer sums, ONE boundary
    * division; the cheap rung under q184's robust estimator. */
  val q183: Q = Q(
    "q183_ols_trend",
    (s, d) =>
      Trend.olsTrend(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH daily AS (
        SELECT event_type AS key,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d,
          CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      a AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_days,
          sum(CAST(d AS HUGEINT)) AS sx, sum(CAST(c AS HUGEINT)) AS sy,
          sum(CAST(d AS HUGEINT) * c) AS sxy,
          sum(CAST(d AS HUGEINT) * d) AS sxx
        FROM daily GROUP BY 1)
      SELECT key, n_days,
        CASE WHEN n_days >= 2 THEN
          CAST(n_days * sxy - sx * sy AS DOUBLE)
            / CAST(n_days * sxx - sx * sx AS DOUBLE)
        END AS slope
      FROM a ORDER BY key
    """.trim))

  // --------------------------------------------------------------- q184

  /** q184 — robust trend ([[Trend.theilSenTrend]]): Theil–Sen median
    * slope + Mann–Kendall S per stream — the outlier-proof reading
    * of q183's fit; pairwise over the calendar-bounded daily frame
    * (the documented profile-time cost), each slope one IEEE division
    * of exact ints, the sign-sum exact-integer. */
  val q184: Q = Q(
    "q184_robust_trend",
    (s, d) =>
      Trend.theilSenTrend(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH daily AS (
        SELECT event_type AS key,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d,
          CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT a.key AS key,
          CAST(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
            ELSE 0 END AS BIGINT) AS sgn,
          CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
            AS slope
        FROM daily a JOIN daily b ON a.key = b.key AND a.d < b.d),
      st AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(sum(sgn) AS BIGINT) AS mk_s,
          quantile_cont(slope, 0.5) AS sen_slope
        FROM p GROUP BY 1),
      nd AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1)
      SELECT nd.key AS key, n_days,
        CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
        CAST(coalesce(mk_s, 0) AS BIGINT) AS mk_s, sen_slope
      FROM nd LEFT JOIN st USING (key) ORDER BY key
    """.trim))

  // --------------------------------------------------------------- q185

  /** q185 — head-tail rollup ([[Profiling.headTailRollup]]): the top-5
    * part brands by line volume plus ONE "(other)" residual row with
    * its category count and mass — the report-footer readout; ties
    * pinned (count DESC, category ASC), shares one division each. */
  val q185: Q = Q(
    "q185_head_tail_rollup",
    (s, d) =>
      Profiling.headTailRollup(
        Tables.lineitem(s, d).join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey")),
        col("p_brand"), k = 5),
    Some("""
      WITH counts AS (
        SELECT coalesce(CAST(p_brand AS VARCHAR), '(null)') AS cat,
          CAST(count(*) AS BIGINT) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1),
      ranked AS (
        SELECT cat, n,
          row_number() OVER (ORDER BY n DESC, cat) AS r
        FROM counts),
      head AS (
        SELECT cat AS bucket, CAST(r AS INT) AS rank, n AS n_rows,
          CAST(1 AS BIGINT) AS n_categories
        FROM ranked WHERE r <= 5),
      tail AS (
        SELECT '(other)' AS bucket, CAST(6 AS INT) AS rank,
          CAST(sum(n) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_categories
        FROM ranked WHERE r > 5
        HAVING sum(n) IS NOT NULL),
      u AS (SELECT * FROM head UNION ALL SELECT * FROM tail),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM counts)
      SELECT bucket, rank, n_rows, n_categories,
        CAST(n_rows AS DOUBLE) / CAST(tt AS DOUBLE) AS share
      FROM u, t ORDER BY rank
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

  // --------------------------------------------------------------- q187

  /** q187 — sorted-neighborhood matching ([[Dedup.sortedNeighborPairs]]):
    * the merge/purge blocking — each name vs its next 3 sort
    * neighbors within 2-char-prefix partitions; linear candidate
    * mass where q92's token blocks are block-quadratic; the
    * complementary record-linkage screen. */
  val q187: Q = Q(
    "q187_sorted_neighbor_match",
    (s, d) => {
      // inject the LAST-char typos q92's token blocking misses (the
      // mutated token IS its block key there) — they stay
      // sort-adjacent, so the SNM screen catches exactly the variant
      // the other method loses: the complementarity, demonstrated
      val base = Tables.part(s, d)
        .select(col("p_partkey").as("k"), col("p_name").as("name"))
      val withTypos = base.select(col("name"))
        .unionByName(base.where(col("k") % 10 === 0)
          .select(expr("substring(name, 1, length(name) - 1)")
            .as("name")))
      Dedup.sortedNeighborPairs(withTypos, "name",
        windowSize = 4, maxDist = 2)
    },
    Some("""
      WITH src AS (
        SELECT p_name AS name FROM part
        UNION ALL
        SELECT substr(p_name, 1, length(p_name) - 1) FROM part
        WHERE p_partkey % 10 = 0),
      g AS (
        SELECT name, CAST(count(*) AS BIGINT) AS n_rows
        FROM src WHERE name IS NOT NULL GROUP BY 1),
      b AS (SELECT name, n_rows, substr(name, 1, 2) AS blk FROM g),
      w AS (
        SELECT name, n_rows,
          lead(name, 1) OVER win AS m1, lead(n_rows, 1) OVER win AS k1,
          lead(name, 2) OVER win AS m2, lead(n_rows, 2) OVER win AS k2,
          lead(name, 3) OVER win AS m3, lead(n_rows, 3) OVER win AS k3
        FROM b WINDOW win AS (PARTITION BY blk ORDER BY name)),
      u AS (
        SELECT name, n_rows, m1 AS cand, k1 AS cn FROM w
        WHERE m1 IS NOT NULL
        UNION ALL
        SELECT name, n_rows, m2, k2 FROM w WHERE m2 IS NOT NULL
        UNION ALL
        SELECT name, n_rows, m3, k3 FROM w WHERE m3 IS NOT NULL)
      SELECT name AS name_a, cand AS name_b,
        CAST(levenshtein(name, cand) AS INT) AS distance,
        n_rows AS n_a, cn AS n_b
      FROM u WHERE levenshtein(name, cand) <= 2
      ORDER BY name_a, name_b
    """.trim))

  // --------------------------------------------------------------- q188

  /** q188 — dedup-method agreement ([[Dedup.pairAgreement]]): the
    * four near-dup screens (exact text, n-gram Jaccard, MinHash-LSH,
    * winnowing) compared pair-set against pair-set — sizes,
    * intersections, overlap Jaccard per method pair; exact ⊂ every
    * sound screen, and each screen's agreement with the exact-Jaccard
    * reference is its measured operating point. */
  val q188: Q = Q(
    "q188_dedup_agreement",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val byHash = docs.select(col("doc_id"),
        sha2(col("text"), 256).as("h"))
      val exactPairs = byHash.select(col("doc_id").as("doc_a"), col("h"))
        .join(byHash.select(col("doc_id").as("doc_b"), col("h")),
          Seq("h"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
      Dedup.pairAgreement(Seq(
        "exact" -> exactPairs,
        "jaccard" -> Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          threshold = 0.5, maxDf = 100),
        "minhash" -> Dedup.minhashLshPairs(docs, "doc_id", "text",
          threshold = 0.5, k = minhashK, bands = minhashBands),
        "winnow" -> Dedup.winnowingPairs(docs, "doc_id", "text",
          span = 3, window = 4, maxDf = 100, minShared = 2)))
    },
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      shf AS (
        SELECT doc_id, hs FROM sh
        QUALIFY count(*) OVER (PARTITION BY hs) <= 100
      ),
      sz AS (SELECT doc_id, count(*) n FROM shf GROUP BY 1),
      jacp AS (
        SELECT da AS doc_a, db AS doc_b
        FROM (
          SELECT a.doc_id da, b.doc_id db, count(*) i
          FROM shf a JOIN shf b ON a.hs = b.hs AND a.doc_id < b.doc_id
          GROUP BY 1, 2) inter
        JOIN sz sa ON sa.doc_id = da
        JOIN sz sb ON sb.doc_id = db
        WHERE (CAST(i AS DOUBLE) / (sa.n + sb.n - i)) >= 0.5),
      wpos AS (
        SELECT doc_id, i AS pos, len(whl) - 2 AS n_pos,
          list_reduce(list_prepend(0::BIGINT, whl[i : i + 2]),
            (h, c) -> ((h * 31) + c) % $P) AS h
        FROM wh, LATERAL unnest(range(1, len(whl) - 1)) AS t(i)
        WHERE len(whl) - 2 BETWEEN 4 AND 1048575),
      wmins AS (
        SELECT doc_id, pos, n_pos,
          min(h * 1048576 + (1048576 - pos)) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS combo
        FROM wpos),
      wpicks AS (
        SELECT DISTINCT doc_id, combo // 1048576 AS fp
        FROM wmins WHERE pos <= n_pos - 3),
      wkept AS (
        SELECT doc_id, fp FROM wpicks
        QUALIFY count(*) OVER (PARTITION BY fp) <= 100),
      winp AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM wkept a JOIN wkept b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2),
      exactp AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM documents a JOIN documents b
          ON a.text = b.text AND a.doc_id < b.doc_id),
      tag AS (
        SELECT 'exact' AS m, doc_a, doc_b FROM exactp
        UNION ALL
        SELECT 'jaccard', doc_a, doc_b FROM jacp
        UNION ALL
        SELECT 'minhash', doc_a, doc_b FROM ($q18OracleSql) mh
        UNION ALL
        SELECT 'winnow', doc_a, doc_b FROM winp),
      flags AS (
        SELECT doc_a, doc_b,
          max(CASE WHEN m = 'exact' THEN 1 ELSE 0 END) AS f0,
          max(CASE WHEN m = 'jaccard' THEN 1 ELSE 0 END) AS f1,
          max(CASE WHEN m = 'minhash' THEN 1 ELSE 0 END) AS f2,
          max(CASE WHEN m = 'winnow' THEN 1 ELSE 0 END) AS f3
        FROM tag GROUP BY 1, 2),
      wide AS (
        SELECT sum(f0) AS n0, sum(f1) AS n1, sum(f2) AS n2,
          sum(f3) AS n3,
          sum(f0 * f1) AS b0_1, sum(f0 * f2) AS b0_2,
          sum(f0 * f3) AS b0_3, sum(f1 * f2) AS b1_2,
          sum(f1 * f3) AS b1_3, sum(f2 * f3) AS b2_3
        FROM flags),
      rowsx AS (
        SELECT 'exact' AS method_a, 'jaccard' AS method_b,
          n0 AS n_a, n1 AS n_b, b0_1 AS n_both FROM wide
        UNION ALL SELECT 'exact', 'minhash', n0, n2, b0_2 FROM wide
        UNION ALL SELECT 'exact', 'winnow', n0, n3, b0_3 FROM wide
        UNION ALL SELECT 'jaccard', 'minhash', n1, n2, b1_2 FROM wide
        UNION ALL SELECT 'jaccard', 'winnow', n1, n3, b1_3 FROM wide
        UNION ALL SELECT 'minhash', 'winnow', n2, n3, b2_3 FROM wide)
      SELECT method_a, method_b,
        CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
        CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
        CAST(coalesce(n_both, 0) AS BIGINT) AS n_both,
        CASE WHEN coalesce(n_a, 0) + coalesce(n_b, 0)
          - coalesce(n_both, 0) > 0 THEN
          CAST(coalesce(n_both, 0) AS DOUBLE) /
            CAST(coalesce(n_a, 0) + coalesce(n_b, 0)
              - coalesce(n_both, 0) AS DOUBLE)
        END AS overlap_jaccard
      FROM rowsx ORDER BY method_a, method_b
    """.trim))

  // --------------------------------------------------------------- q189

  /** q189 — skip-gram PMI pairs ([[TextAnalysis.skipgramLift]]): term
    * pairs co-occurring within ±3 positions, unordered — the
    * non-adjacent association q97's bigrams lose to one insertion;
    * the same log-free fixed-point lift, support floor before the
    * joins, pinned top-k ties. */
  val q189: Q = Q(
    "q189_skipgram_pairs",
    (s, d) =>
      TextAnalysis.skipgramLift(Tables.documents(s, d), "text",
        window = 3, topK = 20, minCount = 5L),
    Some("""
      WITH w AS (
        SELECT list_filter(string_split_regex(trim(text), '\s+'),
          t -> t <> '') AS w
        FROM documents),
      uni AS (
        SELECT t, count(*) AS c
        FROM w, LATERAL unnest(w) AS u(t) GROUP BY 1),
      n AS (SELECT sum(c) AS n_tokens FROM uni),
      pr AS (
        SELECT pair, count(*) AS c_ab FROM (
          SELECT CASE WHEN w[i] <= w[i + o] THEN w[i] || ' ' || w[i + o]
                      ELSE w[i + o] || ' ' || w[i] END AS pair
          FROM w, LATERAL unnest([1, 2]) AS ot(o),
            LATERAL unnest(range(1, len(w) - o + 1)) AS it(i)
          WHERE len(w) >= o + 1) t
        GROUP BY 1 HAVING count(*) >= 5)
      SELECT pair, c_ab, ua.c AS c_a, ub.c AS c_b,
        CAST(((c_ab * 1048576) * n_tokens)
          // (ua.c * ub.c) AS BIGINT) AS lift_fp
      FROM pr
      JOIN uni ua ON ua.t = split_part(pair, ' ', 1)
      JOIN uni ub ON ub.t = split_part(pair, ' ', 2)
      CROSS JOIN n
      ORDER BY lift_fp DESC, pair LIMIT 20
    """.trim))

  // --------------------------------------------------------------- q190

  /** q190 — Heaps-law vocab growth ([[TextAnalysis.heapsCurve]]):
    * distinct terms after the first N corpus tokens on a dyadic grid
    * of N — the sublinear vocab-vs-corpus curve; token order is the
    * deterministic (doc_id, position) order via Packing's two-phase
    * offset, first occurrences one min per term, the curve one
    * conditional fold. */
  val q190: Q = Q(
    "q190_heaps_curve",
    (s, d) =>
      TextAnalysis.heapsCurve(Tables.documents(s, d), "doc_id", "text",
        points = Seq(256L, 1024L, 4096L, 16384L, 65536L, 262144L)),
    Some("""
      WITH d AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'),
            t -> t <> '') AS w
        FROM documents),
      offs AS (
        SELECT doc_id, w,
          CAST(coalesce(sum(len(w)) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS off
        FROM d),
      pos AS (
        SELECT off + i AS gpos, w[i] AS t
        FROM offs, LATERAL unnest(range(1, len(w) + 1)) AS x(i)),
      f AS (SELECT t, min(gpos) AS fp FROM pos GROUP BY 1),
      tot AS (SELECT CAST(sum(len(w)) AS BIGINT) AS n_total FROM d),
      p AS (SELECT CAST(unnest([256, 1024, 4096, 16384, 65536, 262144])
        AS BIGINT) AS point),
      v AS (
        SELECT p.point, CAST(count(*) AS BIGINT) AS vocab_size
        FROM p JOIN f ON f.fp <= p.point GROUP BY 1)
      SELECT p.point AS point,
        CAST(least(p.point, tot.n_total) AS BIGINT) AS n_tokens_seen,
        coalesce(v.vocab_size, 0) AS vocab_size,
        CAST(coalesce(v.vocab_size, 0) AS DOUBLE)
          / CAST(least(p.point, tot.n_total) AS DOUBLE)
          AS type_token_ratio
      FROM p CROSS JOIN tot LEFT JOIN v ON v.point = p.point
      ORDER BY point
    """.trim))

  // --------------------------------------------------------------- q191

  /** q191 — lag-7 autocorrelation ([[Trend.lagAutocorrelation]]):
    * per stream, the Pearson r between each day's count and the count
    * a week earlier — the seasonality STRENGTH behind q173's WMAPE
    * and q163's dow conditioning; six exact sums, one fixed IEEE
    * tree, zero variance keeps NULL. */
  val q191: Q = Q(
    "q191_lag_autocorrelation",
    (s, d) =>
      Trend.lagAutocorrelation(eventsUs(s, d), col("event_type"),
        to_date(timestamp_micros(col("ts_us"))), lagDays = 7),
    Some("""
      WITH daily AS (
        SELECT event_type AS key,
          CAST(ts AS DATE) - DATE '1970-01-01' AS d,
          CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      j AS (
        SELECT cur.key AS key, p.c AS x, cur.c AS y
        FROM daily cur JOIN daily p
          ON cur.key = p.key AND cur.d = p.d + 7),
      a AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n_days,
          sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
          sum(CAST(x AS HUGEINT) * y) AS sxy,
          sum(CAST(x AS HUGEINT) * x) AS sxx,
          sum(CAST(y AS HUGEINT) * y) AS syy
        FROM j GROUP BY 1)
      SELECT key, n_days,
        CASE WHEN n_days >= 2 AND n_days * sxx - sx * sx > 0
          AND n_days * syy - sy * sy > 0 THEN
          CAST(n_days * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)))
        END AS autocorr
      FROM a ORDER BY key
    """.trim))

  // --------------------------------------------------------------- q192

  /** q192 — fact reconciliation ([[Rules.factReconciliation]]): order
    * headers vs the exact decimal sum of their lineitem prices — the
    * top-10 worst relative discrepancies (fixed-point ranking, ties
    * pinned), parents with no details surfacing with NULL totals; the
    * classic header-vs-lines closing audit. */
  val q192: Q = Q(
    "q192_fact_reconciliation",
    (s, d) =>
      Rules.factReconciliation(
        Tables.orders(s, d), "o_orderkey", col("o_totalprice"),
        Tables.lineitem(s, d), "l_orderkey", col("l_extendedprice"),
        topK = 10),
    Some("""
      WITH p AS (
        SELECT o_orderkey AS key,
          CAST(o_totalprice AS DECIMAL(12,2)) AS pv
        FROM orders),
      dsum AS (
        SELECT l_orderkey AS key,
          sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS dv
        FROM lineitem GROUP BY 1),
      j AS (
        SELECT p.key AS key, pv, dv,
          pv - coalesce(dv, CAST(0 AS DECIMAL(12,2))) AS diff
        FROM p LEFT JOIN dsum ON p.key = dsum.key),
      f AS (
        SELECT key, pv, dv, diff,
          CASE WHEN pv <> 0 THEN
            (CAST(abs(diff) * 100 AS BIGINT) * 1048576)
              // CAST(abs(pv) * 100 AS BIGINT)
          END AS rel_fp
        FROM j WHERE diff <> 0 OR dv IS NULL
        ORDER BY abs(diff) DESC, key LIMIT 10)
      SELECT key, CAST(pv AS DOUBLE) AS parent_value,
        CAST(dv AS DOUBLE) AS detail_total,
        CAST(diff AS DOUBLE) AS diff, rel_fp
      FROM f
    """.trim))

  // --------------------------------------------------------------- q193

  /** q193 — contribution shares ([[Profiling.contributionShares]]):
    * order revenue by (region, nation) with each nation's share of
    * its region and of the total — the drill-down "percent of parent"
    * readout; exact decimal sums, boundary divisions only. */
  val q193: Q = Q(
    "q193_contribution_shares",
    (s, d) =>
      Profiling.contributionShares(
        Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, d),
            col("c_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, d),
            col("n_regionkey") === col("r_regionkey")),
        col("r_name"), col("n_name"), col("o_totalprice")),
    Some("""
      WITH g AS (
        SELECT r_name AS parent, n_name AS child,
          sum(CAST(o_totalprice AS DECIMAL(12,2))) AS v
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2),
      w AS (
        SELECT parent, child, v,
          sum(v) OVER (PARTITION BY parent) AS pv,
          sum(v) OVER () AS tv
        FROM g)
      SELECT parent, child, CAST(v AS DOUBLE) AS value,
        CASE WHEN pv <> 0 THEN
          CAST(v AS DOUBLE) / CAST(pv AS DOUBLE) END AS share_of_parent,
        CASE WHEN tv <> 0 THEN
          CAST(v AS DOUBLE) / CAST(tv AS DOUBLE) END AS share_of_total
      FROM w ORDER BY parent, child
    """.trim))

  // --------------------------------------------------------------- q194

  /** q194 — event trigram mining ([[Cohorts.eventTrigrams]]): 3-step
    * sequential patterns with support floor and share — funnel
    * DISCOVERY where q73 measures a named funnel; one user-keyed
    * window, |types|³-bounded counts, pinned ties. */
  val q194: Q = Q(
    "q194_event_trigrams",
    (s, d) =>
      Cohorts.eventTrigrams(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id", minCount = 5L),
    Some("""
      WITH o AS (
        SELECT event_type,
          lag(event_type, 1) OVER w AS p1,
          lag(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      tri AS (
        SELECT p2 || ' > ' || p1 || ' > ' || event_type AS trigram,
          CAST(count(*) AS BIGINT) AS n
        FROM o WHERE p2 IS NOT NULL GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM tri)
      SELECT trigram, n,
        CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) AS share
      FROM tri, t WHERE n >= 5
      ORDER BY n DESC, trigram
    """.trim))

  // --------------------------------------------------------------- q195

  /** q195 — dedup disagreement drill-down ([[Dedup.pairDisagreements]]):
    * the per-pair triage table under q188's matrix — every pair the
    * screens disagree on, one 0/1 flag per method; consensus pairs
    * drop. */
  val q195: Q = Q(
    "q195_dedup_disagreements",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.pairDisagreements(Seq(
        "jaccard" -> Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          threshold = 0.5, maxDf = 100),
        "minhash" -> Dedup.minhashLshPairs(docs, "doc_id", "text",
          threshold = 0.5, k = minhashK, bands = minhashBands),
        "winnow" -> Dedup.winnowingPairs(docs, "doc_id", "text",
          span = 3, window = 4, maxDf = 100, minShared = 2)))
    },
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      $duckHashShingles,
      shf AS (
        SELECT doc_id, hs FROM sh
        QUALIFY count(*) OVER (PARTITION BY hs) <= 100
      ),
      sz AS (SELECT doc_id, count(*) n FROM shf GROUP BY 1),
      jacp AS (
        SELECT da AS doc_a, db AS doc_b
        FROM (
          SELECT a.doc_id da, b.doc_id db, count(*) i
          FROM shf a JOIN shf b ON a.hs = b.hs AND a.doc_id < b.doc_id
          GROUP BY 1, 2) inter
        JOIN sz sa ON sa.doc_id = da
        JOIN sz sb ON sb.doc_id = db
        WHERE (CAST(i AS DOUBLE) / (sa.n + sb.n - i)) >= 0.5),
      wpos AS (
        SELECT doc_id, i AS pos, len(whl) - 2 AS n_pos,
          list_reduce(list_prepend(0::BIGINT, whl[i : i + 2]),
            (h, c) -> ((h * 31) + c) % $P) AS h
        FROM wh, LATERAL unnest(range(1, len(whl) - 1)) AS t(i)
        WHERE len(whl) - 2 BETWEEN 4 AND 1048575),
      wmins AS (
        SELECT doc_id, pos, n_pos,
          min(h * 1048576 + (1048576 - pos)) OVER (
            PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS combo
        FROM wpos),
      wpicks AS (
        SELECT DISTINCT doc_id, combo // 1048576 AS fp
        FROM wmins WHERE pos <= n_pos - 3),
      wkept AS (
        SELECT doc_id, fp FROM wpicks
        QUALIFY count(*) OVER (PARTITION BY fp) <= 100),
      winp AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM wkept a JOIN wkept b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2),
      tag AS (
        SELECT 'jaccard' AS m, doc_a, doc_b FROM jacp
        UNION ALL
        SELECT 'minhash', doc_a, doc_b FROM ($q18OracleSql) mh
        UNION ALL
        SELECT 'winnow', doc_a, doc_b FROM winp),
      flags AS (
        SELECT doc_a, doc_b,
          max(CASE WHEN m = 'jaccard' THEN 1 ELSE 0 END) AS f_jaccard,
          max(CASE WHEN m = 'minhash' THEN 1 ELSE 0 END) AS f_minhash,
          max(CASE WHEN m = 'winnow' THEN 1 ELSE 0 END) AS f_winnow
        FROM tag GROUP BY 1, 2)
      SELECT doc_a, doc_b, CAST(f_jaccard AS BIGINT) AS f_jaccard,
        CAST(f_minhash AS BIGINT) AS f_minhash,
        CAST(f_winnow AS BIGINT) AS f_winnow
      FROM flags WHERE f_jaccard + f_minhash + f_winnow < 3
      ORDER BY doc_a, doc_b
    """.trim))

  // --------------------------------------------------------------- q196

  /** q196 — daily next-day retention ([[Cohorts.dailyRetention]]):
    * per day, the share of actives returning the very next day — the
    * D1 launch-day readout under q72's weekly matrix; the last
    * observed day drops (its next day hasn't happened). */
  val q196: Q = Q(
    "q196_daily_retention",
    (s, d) =>
      Cohorts.dailyRetention(eventsUs(s, d), "user_id",
        to_date(timestamp_micros(col("ts_us")))),
    Some("""
      WITH b AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        FROM events),
      nxt AS (
        SELECT day - INTERVAL 1 DAY AS day, u, 1 AS r FROM b),
      j AS (
        SELECT b.day AS day, CAST(count(*) AS BIGINT) AS n_active,
          CAST(coalesce(sum(r), 0) AS BIGINT) AS n_retained
        FROM b LEFT JOIN nxt ON b.day = nxt.day AND b.u = nxt.u
        GROUP BY 1),
      mx AS (SELECT max(day) AS m FROM b)
      SELECT day, n_active, n_retained,
        CAST(n_retained AS DOUBLE) / CAST(n_active AS DOUBLE)
          AS d1_retention
      FROM j, mx WHERE day < m ORDER BY day
    """.trim))

  // --------------------------------------------------------------- q197

  /** q197 — dup-family size distribution: how big are the near-dup
    * families q31 finds — the count-of-counts (the q168 shape) over
    * cluster sizes: family size 1 = unique docs, the tail = template
    * farms; the shape that decides keep-one vs down-weight
    * ([[Dedup.nearDupClusters]] ∘ size histogram). */
  val q197: Q = Q(
    "q197_cluster_sizes",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.nearDupClusters(docs, "doc_id",
          Dedup.minhashLshPairs(docs, "doc_id", "text",
            threshold = 0.5, k = minhashK, bands = minhashBands))
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("family_size"))
        .groupBy(col("family_size"))
        .agg(count(lit(1)).as("n_families"))
        .orderBy(col("family_size"))
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
        SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
      fam AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS family_size
        FROM cl GROUP BY 1)
      SELECT family_size, CAST(count(*) AS BIGINT) AS n_families
      FROM fam GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q198

  /** q198 — scrub closure audit ([[Scrub.redactPii]] ∘ itself): run
    * the redaction twice and count what the SECOND pass still finds —
    * the idempotence/completeness gate a privacy review actually
    * asks for ("is anything left after scrubbing?"), as one
    * oracle-checked row; residual counts must read zero. */
  val q198: Q = Q(
    "q198_scrub_closure",
    (s, d) => {
      val seeded = Tables.documents(s, d).select(
        col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" Contact user"), col("doc_id"),
            lit("@example.com or call 555123"), col("doc_id"), lit(".")))
          .otherwise(col("text")).as("text"))
      val pass1 = Scrub.redactPii(seeded, "doc_id", "text")
      val pass2 = Scrub.redactPii(
        pass1.select(col("doc_id"), col("redacted").as("text")),
        "doc_id", "text")
      val a1 = pass1.agg(count(lit(1)).as("n_docs"),
        sum(col("n_emails").cast("long")).as("n_emails_pass1"),
        sum(col("n_digit_runs").cast("long")).as("n_digits_pass1"))
      val a2 = pass2.agg(
        sum(col("n_emails").cast("long")).as("n_emails_residual"),
        sum(col("n_digit_runs").cast("long")).as("n_digits_residual"))
      a1.crossJoin(broadcast(a2))
    },
    Some(s"""
      WITH seeded AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0
            THEN text || ' Contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555123'
              || CAST(doc_id AS VARCHAR) || '.'
            ELSE text END AS text
        FROM documents),
      p1 AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '${Scrub.emailRe}')) AS INT)
            AS n_emails,
          CAST(len(regexp_extract_all(
            regexp_replace(text, '${Scrub.emailRe}', '<EMAIL>', 'g'),
            '${Scrub.longDigitsRe}')) AS INT) AS n_digit_runs,
          regexp_replace(
            regexp_replace(text, '${Scrub.emailRe}', '<EMAIL>', 'g'),
            '${Scrub.longDigitsRe}', '<NUM>', 'g') AS redacted
        FROM seeded),
      p2 AS (
        SELECT
          CAST(len(regexp_extract_all(redacted, '${Scrub.emailRe}'))
            AS INT) AS n_emails,
          CAST(len(regexp_extract_all(
            regexp_replace(redacted, '${Scrub.emailRe}', '<EMAIL>', 'g'),
            '${Scrub.longDigitsRe}')) AS INT) AS n_digit_runs
        FROM p1)
      SELECT
        CAST((SELECT count(*) FROM p1) AS BIGINT) AS n_docs,
        CAST((SELECT sum(n_emails) FROM p1) AS BIGINT) AS n_emails_pass1,
        CAST((SELECT sum(n_digit_runs) FROM p1) AS BIGINT)
          AS n_digits_pass1,
        CAST((SELECT sum(n_emails) FROM p2) AS BIGINT)
          AS n_emails_residual,
        CAST((SELECT sum(n_digit_runs) FROM p2) AS BIGINT)
          AS n_digits_residual
    """.trim))

  // --------------------------------------------------------------- q199

  /** q199 — 2-D skyline ([[Profiling.skyline2D]]): parts no other
    * part dominates on (retail price, size) — the Pareto frontier via
    * sorted cumulative maxima over the per-x reduced frame, never a
    * pairwise join; oracle is the literal NOT-EXISTS dominance
    * definition. */
  val q199: Q = Q(
    "q199_skyline",
    (s, d) =>
      Profiling.skyline2D(Tables.part(s, d), col("p_partkey"),
        col("p_retailprice"), col("p_size").cast("long")),
    Some("""
      WITH pts AS (
        SELECT p_partkey AS id, p_retailprice AS x,
          CAST(p_size AS BIGINT) AS y
        FROM part WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL)
      SELECT id, x, y FROM pts b
      WHERE NOT EXISTS (
        SELECT 1 FROM pts a
        WHERE a.x >= b.x AND a.y >= b.y AND (a.x > b.x OR a.y > b.y))
      ORDER BY x DESC, id
    """.trim))

  // --------------------------------------------------------------- q200

  /** q200 — sample representativeness
    * ([[Profiling.sampleRepresentativeness]]): q32's hash sample vs
    * the full corpus, stratum mix on the fixed-point grid with signed
    * distortion — the audit that validates a sampling policy before
    * training on its output. */
  val q200: Q = Q(
    "q200_sample_representativeness",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sample = Sampling.stratifiedByHash(docs, "doc_id", "lang",
        Map("en" -> 75, "es" -> 50, "de" -> 25, "fr" -> 10),
        defaultPct = 5)
      Profiling.sampleRepresentativeness(docs, sample, "lang")
    },
    Some(s"""
      WITH smp AS (
        SELECT doc_id, lang FROM documents
        WHERE ((doc_id % $P) * 2654435761 % $P + 12345) % $P % 100 <
          CASE lang WHEN 'en' THEN 75 WHEN 'es' THEN 50
                    WHEN 'de' THEN 25 WHEN 'fr' THEN 10 ELSE 5 END),
      f AS (
        SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_full
        FROM documents GROUP BY 1),
      sm AS (
        SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_sample
        FROM smp GROUP BY 1),
      ft AS (SELECT sum(n_full) AS tf FROM f),
      st AS (SELECT coalesce(sum(n_sample), 0) AS ts FROM sm)
      SELECT f.stratum AS stratum, n_full,
        CAST(coalesce(n_sample, 0) AS BIGINT) AS n_sample,
        CAST((n_full * 1048576) // tf AS BIGINT) AS share_full_fp,
        CAST(CASE WHEN ts > 0 THEN
          (coalesce(n_sample, 0) * 1048576) // ts ELSE 0 END AS BIGINT)
          AS share_sample_fp,
        CAST(CASE WHEN ts > 0 THEN
          (coalesce(n_sample, 0) * 1048576) // ts ELSE 0 END
          - (n_full * 1048576) // tf AS BIGINT) AS distortion_fp
      FROM f LEFT JOIN sm ON f.stratum = sm.stratum
      CROSS JOIN ft CROSS JOIN st
      ORDER BY stratum
    """.trim))

  // --------------------------------------------------------------- q201

  /** q201 — stratum mean ± SE ([[Trend.stratumMeanSE]]): per
    * language, mean doc length with its standard error — the survey
    * estimator that gives small-stratum stats an honest error bar;
    * exact sums, one division, one fixed sqrt tree. */
  val q201: Q = Q(
    "q201_stratum_mean_se",
    (s, d) =>
      Trend.stratumMeanSE(Tables.documents(s, d), col("lang"),
        col("n_chars")),
    Some("""
      WITH a AS (
        SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n,
          sum(CAST(n_chars AS HUGEINT)) AS s,
          sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
        FROM documents WHERE n_chars IS NOT NULL GROUP BY 1)
      SELECT stratum, n,
        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        CASE WHEN n >= 2 AND n * q - s * s >= 0 THEN
          sqrt(CAST(n * q - s * s AS DOUBLE))
            / (CAST(n AS DOUBLE) * sqrt(CAST(n - 1 AS DOUBLE)))
        END AS se
      FROM a ORDER BY stratum
    """.trim))

  // --------------------------------------------------------------- q202

  /** q202 — metric correlation ([[Trend.groupCorrelation]]): per
    * order priority, Pearson r between line quantity and discount
    * cents — q191's six-sum machinery off the time axis; exact-int
    * sums, one fixed IEEE tree. */
  val q202: Q = Q(
    "q202_metric_correlation",
    (s, d) =>
      Trend.groupCorrelation(
        Tables.lineitem(s, d).join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey")),
        col("o_orderpriority"),
        col("l_quantity").cast("long"),
        (Dec.d2(col("l_discount")) * 100).cast("long")),
    Some("""
      WITH b AS (
        SELECT o_orderpriority AS key,
          CAST(l_quantity AS BIGINT) AS x,
          CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
      a AS (
        SELECT key, CAST(count(*) AS BIGINT) AS n,
          sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
          sum(CAST(x AS HUGEINT) * y) AS sxy,
          sum(CAST(x AS HUGEINT) * x) AS sxx,
          sum(CAST(y AS HUGEINT) * y) AS syy
        FROM b GROUP BY 1)
      SELECT key, n,
        CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
          AND n * syy - sy * sy > 0 THEN
          CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        END AS r
      FROM a ORDER BY key
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

  // --------------------------------------------------------------- q204

  /** q204 — A/B conversion z-test ([[Cohorts.abConversionZ]]): users
    * hash-split into two arms (no rand(); the assignment reproduces
    * everywhere), purchase conversion per arm, the two-proportion z
    * under the pooled null — |z| ≳ 2 says the difference is probably
    * real; on a hash split of ONE population it should hover near 0
    * (the A/A sanity reading). */
  val q204: Q = Q(
    "q204_ab_conversion_z",
    (s, d) =>
      Cohorts.abConversionZ(Tables.events(s, d), "user_id",
        "event_type", "purchase"),
    Some(s"""
      WITH pu AS (
        SELECT user_id AS u,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS conv
        FROM events GROUP BY 1),
      arm AS (
        SELECT ((u % $P) * 2654435761 % $P + 12345) % $P % 2 AS arm,
          conv
        FROM pu),
      st AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(conv) AS BIGINT) AS k
        FROM arm GROUP BY 1),
      ab AS (
        SELECT
          (SELECT n FROM st WHERE arm = 0) AS n_a,
          (SELECT k FROM st WHERE arm = 0) AS k_a,
          (SELECT n FROM st WHERE arm = 1) AS n_b,
          (SELECT k FROM st WHERE arm = 1) AS k_b),
      r AS (
        SELECT n_a, k_a, n_b, k_b,
          CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
          CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
          CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p
        FROM ab),
      r2 AS (
        SELECT *, sqrt(p * (1.0e0 - p) *
          (1.0e0 / CAST(n_a AS DOUBLE) + 1.0e0 / CAST(n_b AS DOUBLE)))
          AS se
        FROM r)
      SELECT n_a, k_a, n_b, k_b, rate_a, rate_b,
        CASE WHEN se > 0 THEN (rate_a - rate_b) / se END AS z
      FROM r2
    """.trim))

  // --------------------------------------------------------------- q205

  /** q205 — price-volume-mix bridge ([[Rolling.priceVolumeMix]]): per
    * order priority, the revenue change between trailing 30-day
    * windows split into volume and price effects — q170 says WHO
    * moved, this says WHY; exact decimal Δrevenue, fixed-tree
    * effects, NULL where no unit price exists. */
  val q205: Q = Q(
    "q205_price_volume_mix",
    (s, d) =>
      Rolling.priceVolumeMix(
        Tables.lineitem(s, d).join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey")),
        col("o_orderpriority"), to_date(col("l_shipdate")),
        col("l_quantity"), col("l_extendedprice"), windowDays = 30),
    Some("""
      WITH base AS (
        SELECT o_orderpriority AS key, CAST(l_shipdate AS DATE) AS day,
          CAST(l_quantity AS BIGINT) AS q,
          CAST(l_extendedprice AS DECIMAL(12,2)) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      a AS (SELECT max(day) AS anchor FROM base),
      per AS (
        SELECT key,
          sum(CASE WHEN anchor - day < 30 THEN q END) AS q2,
          sum(CASE WHEN anchor - day < 30 THEN r END) AS r2,
          sum(CASE WHEN anchor - day >= 30 AND anchor - day < 60
            THEN q END) AS q1,
          sum(CASE WHEN anchor - day >= 30 AND anchor - day < 60
            THEN r END) AS r1
        FROM base, a GROUP BY 1
        HAVING q1 IS NOT NULL OR q2 IS NOT NULL)
      SELECT key, CAST(q1 AS BIGINT) AS q1, CAST(r1 AS DOUBLE) AS r1,
        CAST(q2 AS BIGINT) AS q2, CAST(r2 AS DOUBLE) AS r2,
        CAST(coalesce(r2, CAST(0 AS DECIMAL(12,2)))
          - coalesce(r1, CAST(0 AS DECIMAL(12,2))) AS DOUBLE)
          AS delta_revenue,
        CASE WHEN q1 > 0 AND q2 > 0 THEN
          CAST(q2 - q1 AS DOUBLE)
            * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
        END AS volume_effect,
        CASE WHEN q1 > 0 AND q2 > 0 THEN
          CAST(q2 AS DOUBLE)
            * (CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
               - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
        END AS price_effect
      FROM per ORDER BY key
    """.trim))

  def all: Seq[Q] =
    Seq(q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q30, q31,
      q32, q33, q34, q35, q36, q37, q38, q39, q40, q41, q42, q43, q44,
      q45, q46, q47, q48, q49, q50, q51, q52, q53, q54, q55, q56, q57,
      q58, q59, q60, q61, q62, q63, q64, q65, q66, q67, q68, q69, q70,
      q71, q72, q73, q74, q75, q76, q77, q78, q79, q80, q81, q82, q83,
      q84, q85, q86, q87, q88, q89, q90, q91, q92, q93, q94, q95, q96,
      q97, q98, q99, q100, q101, q102, q103, q104, q105, q106, q107,
      q108, q109, q110, q111, q112, q113, q114, q115, q116, q117,
      q118, q119, q120, q121, q122, q123, q124, q125, q126, q127, q128,
      q129, q130, q131, q132, q133, q134, q135, q136, q137, q138,
      q139, q140, q141, q142, q143, q144, q145, q146, q147, q148,
      q149, q150, q151, q152, q153, q154, q155, q156, q157, q158,
      q159, q160, q161, q162, q163, q164, q165, q166, q167, q168,
      q169, q170, q171, q172, q173, q174, q175, q176, q177, q178, q179, q180,
      q181, q182, q183, q184, q185, q186, q187, q188, q189, q190,
      q191, q192, q193, q194, q195, q196, q197, q198, q199, q200, q201, q202, q203, q204, q205)
}
