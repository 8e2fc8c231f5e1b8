package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** [[Ext]] family: text analysis (language-ID, quality, tokens, fingerprints, n-gram stats) — queries q22, q23, q24, q25, q35, q45, q50, q54, q65, q66, q67, q97, q99, q105, q110, q112, q116, q124, q132, q133, q143, q153, q154, q159, q189, q190, q212, q217, q218, q219, q253 (BPE vocab), q254 (BPE fertility).
  * Split from the monolithic Ext.scala in round 12
  * (pure relocation; helpers live in [[ExtHelpers]]). */
private[queries] trait ExtTextQ { self: ExtHelpers =>
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
          CASE WHEN c_en IS NULL THEN 'und'
               WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'und'
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

  // --------------------------------------------------------------- q212
  /** q212 — tokenizer fertility by language
    * ([[TextAnalysis.tokenFertility]]): bytes per whitespace token and
    * tokens per doc, bucketed by the q22 marker-heuristic language —
    * the conversion table between a byte-budgeted corpus mix and the
    * per-language token budgets it actually buys. Byte counts off the
    * ORIGINAL text (strlen = bytes in DuckDB; lowering can change
    * byte length under Unicode). */
  val q212: Q = Q(
    "q212_token_fertility",
    (s, d) =>
      TextAnalysis.tokenFertility(Tables.documents(s, d), "text"),
    Some("""
      WITH t AS (
        SELECT CAST(strlen(text) AS BIGINT) AS n_bytes,
          list_filter(string_split_regex(trim(lower(text)), '\s+'),
            x -> x <> '') w
        FROM documents),
      sc AS (
        SELECT n_bytes, len(w) n_tokens,
          len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is'))) c_en,
          len(list_filter(w, x -> x IN ('el', 'la', 'los', 'y', 'es'))) c_es,
          len(list_filter(w, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) c_de,
          len(list_filter(w, x -> x IN ('le', 'les', 'et', 'est', 'une'))) c_fr
        FROM t),
      pred AS (
        SELECT *,
          CASE WHEN c_en IS NULL THEN 'und'
               WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'und'
               WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
               WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
               WHEN c_de >= c_fr THEN 'de'
               ELSE 'fr' END AS lang
        FROM sc)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        CASE WHEN sum(n_tokens) > 0 THEN
          CAST(sum(n_bytes) AS DOUBLE) / sum(n_tokens)
        END AS bytes_per_token,
        CAST(sum(n_tokens) AS DOUBLE) / count(*) AS tokens_per_doc
      FROM pred GROUP BY lang ORDER BY lang
    """.trim))

  // --------------------------------------------------------------- q217
  /** The floor-log2 ratio-band CASE ladder q217's oracle shares with
    * [[TextAnalysis.importanceWeights]]: max k ∈ [-20, 20] with
    * a ≥ b·2^k, scanned downward, exact integer comparisons only —
    * generated here so the two engines can never disagree on a branch
    * boundary. */
  private def bandLadderSql(a: String, b: String): String =
    ((20 to -19 by -1).map { k =>
      if (k >= 0) s"WHEN $a >= $b * ${1L << k} THEN $k"
      else s"WHEN $a * ${1L << -k} >= $b THEN $k"
    } :+ "ELSE -20").mkString("CASE ", " ", " END")

  /** q217 — DSIR-style importance weights
    * ([[TextAnalysis.importanceWeights]]): per-document
    * target-vs-raw likelihood score over hashed unigrams with the
    * floor-log2 band ladder standing in for `log` (a SUM of logs has
    * no monotone rational surrogate — the band quantization is the
    * engine-exact replacement). Target domain here: the fixture's
    * `lang = 'en'` slice. */
  val q217: Q = Q(
    "q217_importance_weights",
    (s, d) =>
      TextAnalysis.importanceWeights(Tables.documents(s, d), "doc_id",
        "text", col("lang") === "en"),
    Some(s"""
      WITH tok AS (
        SELECT doc_id, lang = 'en' AS is_t, t
        FROM documents, LATERAL unnest(
          regexp_extract_all(lower(text), '([a-z]+|[0-9]+)', 1)) AS u(t)),
      dtc AS (
        SELECT doc_id, is_t, t, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2, 3),
      feat AS (
        SELECT t,
          CAST(sum(CASE WHEN is_t THEN c ELSE 0 END) AS BIGINT) AS ct,
          CAST(sum(CASE WHEN is_t THEN 0 ELSE c END) AS BIGINT) AS cr
        FROM dtc GROUP BY 1),
      tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS nt,
          CAST(sum(cr) AS BIGINT) AS nr,
          CAST(count(*) AS BIGINT) AS v FROM feat),
      band AS (
        SELECT t, CAST(${bandLadderSql("a", "b")} AS BIGINT) AS band
        FROM (
          SELECT t,
            CAST(ct + 1 AS HUGEINT) * CAST(nr + v AS HUGEINT) AS a,
            CAST(cr + 1 AS HUGEINT) * CAST(nt + v AS HUGEINT) AS b
          FROM feat, tot) s)
      SELECT doc_id,
        CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(sum(c * band) AS BIGINT) AS score_sum,
        CAST(sum(c * band) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
          AS avg_band
      FROM dtc JOIN band USING (t)
      GROUP BY doc_id ORDER BY doc_id
    """.trim))

  // --------------------------------------------------------------- q218
  /** q218 — gate overlap matrix ([[TextAnalysis.gateOverlap]]):
    * q110's funnel charges each doc to the FIRST failing gate; this
    * is the order-independent diagnosis — per gate pair, how much
    * their standalone failure sets overlap (Jaccard ≈ 1 ⇒ redundant
    * gates, ≈ 0 ⇒ genuinely multiplicative stack). Same thresholds
    * as q110, de-cascaded. */
  val q218: Q = Q(
    "q218_gate_overlap",
    (s, d) =>
      TextAnalysis.gateOverlap(Tables.documents(s, d), "text",
        minChars = 100, maxChars = 20000, minTokens = 20,
        minDistinctRatio = 0.25),
    Some("""
      WITH f AS (
        SELECT
          (text IS NULL OR length(trim(text)) = 0) AS f0,
          (text IS NULL
            OR NOT (length(text) BETWEEN 100 AND 20000)) AS f1,
          (text IS NULL
            OR len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> t <> '')) < 20) AS f2,
          (text IS NULL
            OR len(list_filter(string_split_regex(trim(text), '\s+'),
              t -> t <> '')) = 0
            OR (CAST(len(list_distinct(list_filter(
                  string_split_regex(trim(text), '\s+'), t -> t <> '')))
                AS DOUBLE) /
              CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                t -> t <> '')) AS DOUBLE)) < 0.25) AS f3
        FROM documents),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN f0 THEN 1 ELSE 0 END) AS BIGINT) AS s0,
          CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
          CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
          CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
          CAST(sum(CASE WHEN f0 AND f1 THEN 1 ELSE 0 END) AS BIGINT) AS s01,
          CAST(sum(CASE WHEN f0 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s02,
          CAST(sum(CASE WHEN f0 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s03,
          CAST(sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s12,
          CAST(sum(CASE WHEN f1 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s13,
          CAST(sum(CASE WHEN f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s23
        FROM f),
      m AS (
        SELECT 'empty' AS gate_a, 'chars_out_of_range' AS gate_b,
          n_docs, s0 AS fail_a, s1 AS fail_b, s01 AS fail_both FROM s
        UNION ALL SELECT 'empty', 'few_tokens', n_docs, s0, s2, s02 FROM s
        UNION ALL SELECT 'empty', 'low_distinct_ratio', n_docs, s0, s3,
          s03 FROM s
        UNION ALL SELECT 'chars_out_of_range', 'few_tokens', n_docs, s1,
          s2, s12 FROM s
        UNION ALL SELECT 'chars_out_of_range', 'low_distinct_ratio',
          n_docs, s1, s3, s13 FROM s
        UNION ALL SELECT 'few_tokens', 'low_distinct_ratio', n_docs, s2,
          s3, s23 FROM s
        UNION ALL SELECT 'empty', 'empty', n_docs, s0, s0, s0 FROM s
        UNION ALL SELECT 'chars_out_of_range', 'chars_out_of_range',
          n_docs, s1, s1, s1 FROM s
        UNION ALL SELECT 'few_tokens', 'few_tokens', n_docs, s2, s2, s2
          FROM s
        UNION ALL SELECT 'low_distinct_ratio', 'low_distinct_ratio',
          n_docs, s3, s3, s3 FROM s)
      SELECT gate_a, gate_b, n_docs, fail_a, fail_b, fail_both,
        fail_a + fail_b - fail_both AS fail_either,
        CASE WHEN fail_a + fail_b - fail_both > 0 THEN
          CAST(fail_both AS DOUBLE) /
            CAST(fail_a + fail_b - fail_both AS DOUBLE)
        END AS jaccard
      FROM m ORDER BY gate_a, gate_b
    """.trim))

  // --------------------------------------------------------------- q219
  /** q219 — boilerplate n-gram fraction
    * ([[TextAnalysis.boilerplateFraction]]): per document, the share
    * of its 5-token window hashes that at least 2 distinct documents
    * contain — the cross-doc boilerplate signal (q35 is the
    * within-doc one). Oracle replays the q211 rolling window hash;
    * occurrences (not distinct windows) are scored, matching the
    * "how much of THIS doc is chrome" reading. */
  val q219: Q = Q(
    "q219_boilerplate_ngrams",
    (s, d) =>
      TextAnalysis.boilerplateFraction(Tables.documents(s, d),
        "doc_id", "text", n = 5, minDf = 2),
    Some(s"""
      WITH $duckWords,
      $duckTokenHashes,
      occ AS (
        SELECT doc_id,
          list_reduce(list_prepend(0::BIGINT, whl[i : i + 4]),
            (h, c) -> ((h * 31) + c) % $P) AS hs
        FROM wh, LATERAL unnest(range(1, len(whl) - 3)) AS t(i)),
      freq AS (
        SELECT hs FROM (
          SELECT hs, count(DISTINCT doc_id) AS df
          FROM occ GROUP BY 1)
        WHERE df >= 2),
      tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
        FROM occ GROUP BY 1),
      boiler AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
        FROM occ WHERE hs IN (SELECT hs FROM freq) GROUP BY 1)
      SELECT t.doc_id, t.n_windows,
        COALESCE(b.n_boiler, 0) AS n_boiler,
        CAST(COALESCE(b.n_boiler, 0) AS DOUBLE) /
          CAST(t.n_windows AS DOUBLE) AS boiler_frac
      FROM tot t LEFT JOIN boiler b ON t.doc_id = b.doc_id
      ORDER BY t.doc_id
    """.trim))

  // --------------------------------------------------------------- q253
  /** q253 — BPE subword vocabulary table
    * ([[TextAnalysis.bpeVocab]] over the pinned
    * [[graft.functions.Bpe.demoMerges]] table): greedy-BPE
    * segmentation of every distinct corpus word — occurrence count,
    * char length, subword count, and the segmentation itself. The
    * oracle REPLAYS the greedy merge step-for-step in a recursive CTE
    * generated from the SAME merge Seq (one leftmost-lowest-rank merge
    * per recursion step; final state per word = fewest tokens), so the
    * hash compare pins the merge ORDER semantics, not just counts. */
  val q253: Q = Q(
    "q253_bpe_vocab",
    (s, d) =>
      TextAnalysis.bpeVocab(Tables.documents(s, d),
        "text", graft.functions.Bpe.demoMerges),
    Some(s"""
      WITH RECURSIVE
      wordcounts AS (
        SELECT t AS w, CAST(count(*) AS BIGINT) AS n_occurrences FROM (
          SELECT unnest(list_filter(
            string_split_regex(trim(lower(text)), '\\s+'),
            x -> x <> '')) t
          FROM documents WHERE text IS NOT NULL) GROUP BY 1),
      words AS (SELECT w FROM wordcounts),
      ${graft.functions.Bpe.bpeCteSql(graft.functions.Bpe.demoMerges)}
      SELECT f.w AS word, wc.n_occurrences,
        CAST(length(f.w) AS BIGINT) AS n_chars,
        CAST(len(f.toks) AS BIGINT) AS n_subwords,
        list_aggregate(f.toks, 'string_agg', '|') AS subword_str
      FROM bpefin f JOIN wordcounts wc ON wc.w = f.w
      ORDER BY word
    """.trim))

  // --------------------------------------------------------------- q254
  /** q254 — tokenizer fertility under SUBWORD counts: q212's
    * conversion table re-run with the tokenizer seam set to greedy
    * BPE ([[TextAnalysis.tokenFertility]] with
    * [[graft.functions.Bpe.demoMerges]]) — the per-language budget a
    * byte-weighted mix buys in REAL (subword) tokens, not whitespace
    * words. The oracle segments the distinct vocabulary once in the
    * recursive CTE and charges each word occurrence its subword
    * count — the same per-distinct-word memoization the Spark plan
    * uses. NULL text stays n_tokens NULL ('und' bucket, excluded
    * from the sum exactly as q212). */
  val q254: Q = Q(
    "q254_bpe_fertility",
    (s, d) =>
      TextAnalysis.tokenFertility(Tables.documents(s, d), "text",
        subwordMerges = Some(graft.functions.Bpe.demoMerges)),
    Some(s"""
      WITH RECURSIVE
      d AS (
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
          text IS NULL AS is_null_text,
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
      sc AS (
        SELECT n_bytes,
          CASE WHEN is_null_text THEN NULL ELSE
            CAST(coalesce(tokc.n_tokens, 0) AS BIGINT) END AS n_tokens,
          len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is'))) c_en,
          len(list_filter(w, x -> x IN ('el', 'la', 'los', 'y', 'es'))) c_es,
          len(list_filter(w, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) c_de,
          len(list_filter(w, x -> x IN ('le', 'les', 'et', 'est', 'une'))) c_fr
        FROM d LEFT JOIN tokc USING (doc_id)),
      pred AS (
        SELECT *,
          CASE WHEN c_en IS NULL THEN 'und'
               WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'und'
               WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
               WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
               WHEN c_de >= c_fr THEN 'de'
               ELSE 'fr' END AS lang
        FROM sc)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        CASE WHEN sum(n_tokens) > 0 THEN
          CAST(sum(n_bytes) AS DOUBLE) / sum(n_tokens)
        END AS bytes_per_token,
        CAST(sum(n_tokens) AS DOUBLE) / count(*) AS tokens_per_doc
      FROM pred GROUP BY lang ORDER BY lang
    """.trim))

}
