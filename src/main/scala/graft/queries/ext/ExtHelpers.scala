package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** Shared private helpers of the [[Ext]] registry — the
  * portable-hash constants and DuckDB oracle CTE fragments
  * every family trait builds on. Split from the monolithic
  * Ext.scala in round 12 (pure relocation). */
private[queries] trait ExtHelpers {
  private[queries] val P = graft.functions.TextHash.P // 1000000007

  /** `events` with `ts_us` (BIGINT µs since epoch) appended — the
    * encoding-adaptive [[Tables.tsUs]] form every temporal query keys
    * on, so µs gap/tolerance/interval arithmetic stays integer-exact
    * whichever way the fixture encodes `ts`. */
  private[queries] def eventsUs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = Tables.events(s, d)
    e.withColumn("ts_us", Tables.tsUs(e))
  }

  /** DuckDB fragment: tokens array per doc (mirrors TextHash.tokens). */
  private[queries] val duckWords =
    """words AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') w
      |  FROM documents
      |)""".stripMargin

  /** DuckDB fragment: per-token char-fold hashes (mirrors
    * TextHash.tokenHashes). */
  private[queries] val duckTokenHashes =
    s"""wh AS (
      |  SELECT doc_id, len(w) n_tokens, list_transform(w, t ->
      |    list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, length(t) + 1), j -> ascii(t[j]))),
      |      (h, c) -> ((h * 31) + c) % $P)) whl
      |  FROM words WHERE len(w) >= 3
      |)""".stripMargin

  /** DuckDB fragment: distinct hashed 3-gram shingles per doc (mirrors
    * TextHash.shingleHashes; 1-based DuckDB indexing). */
  private[queries] val duckHashShingles =
    s"""sh AS (
      |  SELECT DISTINCT doc_id, hs
      |  FROM wh, LATERAL unnest(list_transform(range(1, len(whl) - 1),
      |    i -> ((((((whl[i] * 31) + whl[i+1]) % $P) * 31) + whl[i+2]) % $P))) AS t(hs)
      |)""".stripMargin

  private[queries] val minhashK = 16

  private[queries] val minhashBands = 4

  /** DuckDB fragment: minhash band CANDIDATES over the `sh` shingle
    * frame (mirrors Dedup.minhashLshPairs' banding) — shared by q18
    * and the q144 operating-point evaluation. */
  private[queries] def duckMinhashCand: String = {
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

  private[queries] def q18OracleSql: String = {
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

  private[queries] val simhashBits = 48

  private[queries] def q19OracleSql: String = {
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

  /** DuckDB fragment: the deterministic k-means coarse quantizer replay
    * shared by q21 and q39 — normed vectors (`n`), hash-seeded init,
    * one fixed-point refinement pass, refined centroid table (`c3`). */
  private[queries] val duckIvfQuantizer =
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
  private[queries] val duckIvfTopK5 =
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

  private[queries] val rpPlanes = 16

  private[queries] def q30OracleSql: String = q30OracleSqlAt(0.3)

  /** DuckDB CTE chain `e, n0, n, sigs` replaying
    * [[graft.operators.Similarity.rpSignatures]] (mirrors
    * Similarity.rpBit: left fold of v[i] * (±1 from the affine parity
    * hash), bit j set when the projection is positive) — shared by the
    * q30 pair replay and the q96 drift replay. */
  private[queries] def duckRpSigCtes: String = {
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

  private[queries] def q30OracleSqlAt(threshold: Double): String = {
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

  /** q49 — one-sided eval-overlap contamination rate (the PaLM-style
    * per-doc rule; q36 is the pairwise view): fraction of each even
    * (train) doc's distinct shingles appearing anywhere in the odd
    * (eval) half's union set, flagged at 0.2. The engine probes a
    * BROADCAST distinct eval set — the train side never shuffles;
    * PlanAuditSpec pins the broadcast. */
  private[queries] lazy val q49OracleSql: String = s"""
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

  /** DuckDB fragment: ordered-fold dot product of two `w`-element list
    * expressions (mirrors the codegen'd VectorOps.dot ascending-index
    * loop). */
  private[queries] def duckDot(a: String, b: String, w: Int): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |  list_transform(range(1, ${w + 1}), i -> $a[i] * $b[i])),
       |  (x, y) -> x + y)""".stripMargin

  private[queries] def q56OracleSql: String = pqOracleSql(adc = false)

  private[queries] def q57OracleSql: String = pqOracleSql(adc = true)

  private[queries] def pqOracleSql(adc: Boolean): String = {
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

  /** DuckDB fragment: one full PQ-quantizer replay (subvector split,
    * hash seeding, one fixed-point refinement, final assignment) with
    * every CTE name prefixed `p` — so q61 can replay TWO quantizers
    * (coarse cells + fine codes) in one statement. `kSel` is a SQL
    * expression for the seed count (a literal for fine, ⌈√N⌉ for
    * coarse). Mirrors pqOracleSql's fragments exactly. */
  private[queries] def duckPqCtes(p: String, m: Int, w: Int, kSel: String): String = {
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

  private[queries] def q61OracleSql: String = {
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
  private[queries] def sqlDouble(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "E0"
  }

  /** DuckDB fragment: the HLL register build + estimate fold over a
    * prior CTE `hv (g, h)` of prepared hashes, ending in
    * `hll (g, n_filled, n_empty, est_distinct)` — the generic tail of
    * [[duckHllEvents]] for callers that hash something other than
    * events/user_id (q236 hashes rendered column values). */
  private[queries] def duckHllTail(m: Int, wBits: Int): String = {
    val k = wBits + 1
    val alpha = Sketch.hllAlpha(m)
    val lut = Sketch.hllLinearLut(m)
    s"""b AS (
          SELECT g, h % $m AS b, h // $m AS w FROM hv),
        r AS (
          SELECT g, b, CASE WHEN w = 0 THEN ${wBits + 1}
            ELSE $wBits - length(bin(w)) + 1 END AS rho FROM b),
        reg AS (
          SELECT g, b, max(rho) AS mj FROM r GROUP BY 1, 2),
        agg AS (
          SELECT g, count(*) AS n_filled,
            sum(1::BIGINT << ($k - mj)) AS s_present
          FROM reg GROUP BY 1),
        sc AS (
          SELECT g, n_filled, ($m - n_filled) AS n_empty,
            ($m::BIGINT - n_filled) * (1::BIGINT << $k) + s_present AS s
          FROM agg),
        hll AS (
          SELECT g, n_filled, n_empty,
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

  /** DuckDB fragment: the full HLL replay over events/user_id — the
    * squared-affine hashing, register build, and the estimate fold —
    * ending in `hll (event_type, n_filled, n_empty, est_distinct)`.
    * Shared by q89 and the q148 accuracy evaluation. */
  private[queries] def duckHllEvents(m: Int, wBits: Int): String = {
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

  /** One unrolled fixed-point PageRank iteration for the q177 oracle
    * (mirrors [[Cohorts.transitionPageRank]]'s loop body exactly:
    * integer products, floor divisions, leaky dangling mass). */
  private[queries] def prIter(prev: String, cur: String): String = s"""
      |$cur AS (
      |  SELECT nodes.t AS t,
      |    ((1099511627776 * 15) // 100) // (SELECT n FROM nn)
      |      + (85 * coalesce(m.s, 0)) // 100 AS r
      |  FROM nodes LEFT JOIN (
      |    SELECT ew.dst AS t, sum(($prev.r * ew.n) // ew.n_src) AS s
      |    FROM ew JOIN $prev ON $prev.t = ew.src GROUP BY 1) m
      |  ON nodes.t = m.t)""".stripMargin

}
