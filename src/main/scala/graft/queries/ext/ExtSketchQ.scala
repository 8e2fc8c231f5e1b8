package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** [[Ext]] family: bounded-state sketches (CMS, HLL, KMV, grid percentile) and their accuracy evals — queries q80, q89, q148, q249, q250, q251.
  * Split from the monolithic Ext.scala in round 12
  * (pure relocation; helpers live in [[ExtHelpers]]). */
private[queries] trait ExtSketchQ { self: ExtHelpers =>
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

  // ---------------------------------------------------------------- q89
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

  // --------------------------------------------------------------- q249
  /** q249 — KMV sketch content overlap ([[Sketch.kmvOverlap]]): how
    * much word-3-gram shingle content does the English side of the
    * corpus share with the rest, estimated from two 256-row
    * k-minimum-values sketches instead of a distinct-join — the
    * set-OPERATIONS sketch completing the CMS (q80, frequency) / HLL
    * (q89, single-set cardinality) family: HLL registers cannot
    * intersect, KMV sketches compose. The shingle unit (q17/q18's)
    * is the one whose sets genuinely intersect across slices AND is
    * plentiful enough (~10⁴ per side here) to exercise the θ
    * estimator — the fixture has no exact duplicate texts and only
    * ~31 distinct tokens, so whole-doc or token units would
    * degenerate to the exact n < k branch. The oracle replays
    * tokenize, shingle fold, per-side k-minima, union sketch and
    * every integer-division estimate bit-for-bit (the q89
    * discipline: approximate ⇒ still deterministic). */
  val q249: Q = Q(
    "q249_kmv_overlap",
    (s, d) => Sketch.kmvOverlap(Tables.documents(s, d),
      col("lang") === "en", "text"),
    Some(s"""
      WITH ${duckKmv(256)}
      SELECT k, n_a, theta_a, est_a, n_b, theta_b, est_b, n_union,
        theta_union, est_union, inter_in_k, est_inter, jaccard_fp
      FROM est
    """.trim))

  /** Shared DuckDB replay of [[Sketch.kmvOverlap]] over the en/rest
    * split of `documents` — the words→token-hash→shingle chain (the
    * [[ExtHelpers]] fragments with a `side` key instead of `doc_id`),
    * per-side k-minima, union sketch, and every integer-division
    * estimate; `est` is the one-row sketch readout q249 emits and
    * q250 grades. */
  private def duckKmv(k: Int): String = s"""words AS (
        SELECT CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS side,
          list_filter(string_split_regex(trim(text), '\\s+'),
            t -> t <> '') AS w
        FROM documents WHERE text IS NOT NULL),
      wh AS (
        SELECT side, list_transform(w, t ->
          list_reduce(list_prepend(0::BIGINT,
            list_transform(range(1, length(t) + 1),
              j -> ascii(t[j]))),
            (h, c) -> ((h * 31) + c) % $P)) AS whl
        FROM words WHERE len(w) >= 3),
      h AS (
        SELECT DISTINCT side,
          (hs * 2654435761 + 12345) % $P AS h
        FROM wh, LATERAL unnest(list_transform(range(1, len(whl) - 1),
          i -> ((((((whl[i] * 31) + whl[i+1]) % $P) * 31) + whl[i+2])
            % $P))) AS t(hs)),
      ka AS (SELECT h FROM h WHERE side = 'a' ORDER BY h LIMIT $k),
      kb AS (SELECT h FROM h WHERE side = 'b' ORDER BY h LIMIT $k),
      ku AS (
        SELECT h,
          max(CASE WHEN h IN (SELECT h FROM ka) THEN 1 ELSE 0 END)
            AS in_a,
          max(CASE WHEN h IN (SELECT h FROM kb) THEN 1 ELSE 0 END)
            AS in_b
        FROM (SELECT h FROM ka UNION SELECT h FROM kb)
        GROUP BY h ORDER BY h LIMIT $k),
      st AS (
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM ka) AS n_a,
          (SELECT max(h) FROM ka) AS theta_a,
          (SELECT CAST(count(*) AS BIGINT) FROM kb) AS n_b,
          (SELECT max(h) FROM kb) AS theta_b,
          (SELECT CAST(count(*) AS BIGINT) FROM ku) AS n_union,
          (SELECT max(h) FROM ku) AS theta_union,
          (SELECT CAST(coalesce(sum(CASE WHEN in_a = 1 AND in_b = 1
             THEN 1 ELSE 0 END), 0) AS BIGINT) FROM ku) AS inter_in_k),
      est AS (
        SELECT CAST($k AS INT) AS k, n_a, theta_a,
          CASE WHEN n_a < $k THEN n_a
               ELSE CAST(${k - 1} * ${P}::BIGINT // theta_a AS BIGINT)
            END AS est_a,
          n_b, theta_b,
          CASE WHEN n_b < $k THEN n_b
               ELSE CAST(${k - 1} * ${P}::BIGINT // theta_b AS BIGINT)
            END AS est_b,
          n_union, theta_union,
          CASE WHEN n_union < $k THEN n_union
               ELSE CAST(${k - 1} * ${P}::BIGINT // theta_union
                 AS BIGINT) END AS est_union,
          inter_in_k,
          CAST(inter_in_k *
            (CASE WHEN n_union < $k THEN n_union
                  ELSE CAST(${k - 1} * ${P}::BIGINT // theta_union
                    AS BIGINT) END) // n_union AS BIGINT) AS est_inter,
          CAST(inter_in_k * 1048576 // n_union AS BIGINT) AS jaccard_fp
        FROM st)"""

  // --------------------------------------------------------------- q250
  /** q250 — KMV accuracy evaluation ([[Sketch.kmvAccuracy]]): q249's
    * four set-size estimates graded against their EXACT counterparts
    * with signed relative errors — the eval rung completing the
    * measured-accuracy quartet (q129 ANN recall, q144 LSH operating
    * point, q148 HLL accuracy, this). ±1/√(k−2) ≈ ±6.3% is the
    * EXPECTED per-set error at k = 256; this measures it on THIS
    * corpus split. Two corpus passes by definition (sketch + exact
    * ground truth — the q144 honest-eval cost); the oracle replays
    * both sides, so the sketch's measured accuracy itself sits under
    * the correctness gate. */
  val q250: Q = Q(
    "q250_kmv_accuracy",
    (s, d) => Sketch.kmvAccuracy(Tables.documents(s, d),
      col("lang") === "en", "text"),
    Some(s"""
      WITH ${duckKmv(256)},
      exf AS (
        SELECT h,
          max(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS in_a,
          max(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS in_b
        FROM h GROUP BY h),
      ex AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
          CAST(sum(in_b) AS BIGINT) AS exact_b,
          CAST(count(*) AS BIGINT) AS exact_union,
          CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS exact_inter
        FROM exf)
      SELECT k,
        exact_a, est_a,
        est_a / CAST(exact_a AS DOUBLE) - 1.0e0 AS rel_a,
        exact_b, est_b,
        est_b / CAST(exact_b AS DOUBLE) - 1.0e0 AS rel_b,
        exact_union, est_union,
        est_union / CAST(exact_union AS DOUBLE) - 1.0e0 AS rel_union,
        exact_inter, est_inter,
        est_inter / CAST(exact_inter AS DOUBLE) - 1.0e0 AS rel_inter
      FROM est, ex
    """.trim))

  // --------------------------------------------------------------- q251
  /** q251 — KMV source-overlap matrix ([[Sketch.kmvPairMatrix]] over
    * [[Sketch.kmvSketch]]): estimated shared-shingle count and
    * Jaccard for every unordered SOURCE pair, from one k = 64 sketch
    * per source — the sketch rung under q91's exact source-overlap
    * matrix. q91 pays a corpus-wide distinct and per-pair
    * intersection joins; this answers every pairwise composition
    * question from |sources|·k sketch rows built in ONE corpus pass
    * (at web scale: a few hundred KB regardless of corpus size).
    * k = 64 trades ±1/√62 ≈ ±12.7% per-set error for a 4× smaller
    * sketch — the matrix ranks pairs, it doesn't gate them. The
    * oracle replays sketches, per-pair union rank and every
    * integer-division estimate bit-for-bit. */
  val q251: Q = {
    val k = 64
    Q(
      "q251_kmv_source_matrix",
      (s, d) => Sketch.kmvPairMatrix(
        Sketch.kmvSketch(Tables.documents(s, d), "source", "text", k),
        "source", k),
      Some(s"""
        WITH words AS (
          SELECT source AS g,
            list_filter(string_split_regex(trim(text), '\\s+'),
              t -> t <> '') AS w
          FROM documents WHERE text IS NOT NULL),
        wh AS (
          SELECT g, list_transform(w, t ->
            list_reduce(list_prepend(0::BIGINT,
              list_transform(range(1, length(t) + 1),
                j -> ascii(t[j]))),
              (h, c) -> ((h * 31) + c) % $P)) AS whl
          FROM words WHERE len(w) >= 3),
        hh AS (
          SELECT DISTINCT g, (hs * 2654435761 + 12345) % $P AS h
          FROM wh, LATERAL unnest(list_transform(range(1, len(whl) - 1),
            i -> ((((((whl[i] * 31) + whl[i+1]) % $P) * 31) + whl[i+2])
              % $P))) AS t(hs)),
        sk AS (
          SELECT g, h FROM (
            SELECT g, h,
              row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM hh) WHERE rn <= $k),
        gs AS (
          SELECT g, CAST(count(*) AS BIGINT) AS n, max(h) AS theta
          FROM sk GROUP BY 1),
        pairs AS (
          SELECT a.g AS g1, b.g AS g2, a.n AS n_1, a.theta AS theta_1,
            b.n AS n_2, b.theta AS theta_2
          FROM gs a JOIN gs b ON a.g < b.g),
        pu AS (
          SELECT g1, g2, h, max(one) AS in_1, max(two) AS in_2 FROM (
            SELECT p.g1, p.g2, s.h, 1 AS one, 0 AS two
            FROM pairs p JOIN sk s ON s.g = p.g1
            UNION ALL
            SELECT p.g1, p.g2, s.h, 0 AS one, 1 AS two
            FROM pairs p JOIN sk s ON s.g = p.g2)
          GROUP BY 1, 2, 3),
        pur AS (
          SELECT *, row_number()
            OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
          FROM pu),
        u AS (
          SELECT g1, g2, CAST(count(*) AS BIGINT) AS n_union,
            max(h) AS theta_union,
            CAST(sum(CASE WHEN in_1 = 1 AND in_2 = 1 THEN 1 ELSE 0
              END) AS BIGINT) AS inter_in_k
          FROM pur WHERE rn <= $k GROUP BY 1, 2)
        SELECT p.g1 AS g1, p.g2 AS g2, n_1,
          CASE WHEN n_1 < $k THEN n_1
               ELSE CAST(${k - 1} * ${P}::BIGINT // theta_1 AS BIGINT)
            END AS est_1,
          n_2,
          CASE WHEN n_2 < $k THEN n_2
               ELSE CAST(${k - 1} * ${P}::BIGINT // theta_2 AS BIGINT)
            END AS est_2,
          n_union,
          CASE WHEN n_union < $k THEN n_union
               ELSE CAST(${k - 1} * ${P}::BIGINT // theta_union
                 AS BIGINT) END AS est_union,
          inter_in_k,
          CAST(inter_in_k *
            (CASE WHEN n_union < $k THEN n_union
                  ELSE CAST(${k - 1} * ${P}::BIGINT // theta_union
                    AS BIGINT) END) // n_union AS BIGINT) AS est_inter,
          CAST(inter_in_k * 1048576 // n_union AS BIGINT) AS jaccard_fp
        FROM pairs p JOIN u USING (g1, g2)
        ORDER BY 1, 2
      """.trim))
  }
}
