package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** [[Ext]] family: relational breadth (joins, rules, scrubbing, SCD, semi-structured, misc) — queries q33, q34, q38, q43, q44, q46, q58, q59, q63, q64, q70, q75, q77, q78, q82, q85, q104, q109, q117, q118, q119, q121, q131, q155, q156, q158, q162, q168, q192, q198, q208, q210, q220, q223, q245, q246, q247, q248, q252, q258 (Q9), q259 (Q4), q264 (Q17), q268 (Q10), q269 (Q12), q270 (Q14), q282 (Q11).
  * Split from the monolithic Ext.scala in round 12
  * (pure relocation; helpers live in [[ExtHelpers]]). */
private[queries] trait ExtRelationalQ { self: ExtHelpers =>
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

  // --------------------------------------------------------------- q208
  /** q208 — sole-fault suppliers (the TPC-H Q21 SHAPE, the planner's
    * classic multi-way semi + anti SELF-JOIN stressor): suppliers of
    * one nation whose RETURNED line sat in a finalized multi-supplier
    * order where EXISTS another supplier's line (the order wasn't
    * theirs alone) and NOT EXISTS another supplier's RETURNED line
    * (the fault was theirs alone) — count per supplier, worst first.
    * The fixture has no receipt/commit dates, so "late" is read off
    * `l_returnflag = 'R'`; the join topology is Q21's exactly.
    *
    * Scale shape: the target nation's supplier list is dim-sized and
    * prunes l1 FIRST (broadcast at any SF), so the expensive stages
    * run on 1/|nations| of the returned lines. Both self-join sides
    * then key on `l_orderkey` — the semi (all lines of the order),
    * the anti (all RETURNED lines of the order), and the orders join
    * share one hash partitioning, so the exchange is planned once and
    * reused. The ANTI side must NOT be broadcast at scale: it is the
    * corpus-sized returned-lineitem stream itself (≈1/3 of the fact
    * table), and a broadcast anti-join would ship the whole stream to
    * every executor — it stays a shuffled SortMerge anti on the
    * orderkey partitioning (AQE may legitimately broadcast it at
    * fixture SF where it is KBs; the plan is correct either way — the
    * q155 laddering discipline). The <> predicate rides the equi-join
    * as a residual condition, never a nested-loop. */
  val q208: Q = Q(
    "q208_sole_fault_suppliers",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val returned = li.where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val natSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .where(col("n_name") === "NATION_7")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val l1 = returned.join(natSupp,
        col("l_suppkey") === col("s_suppkey"))
      val others = li.select(col("l_orderkey").as("k2"),
        col("l_suppkey").as("sup2"))
      val lateOthers = returned.select(col("l_orderkey").as("k3"),
        col("l_suppkey").as("sup3"))
      l1
        .join(others, col("l_orderkey") === col("k2") &&
          col("l_suppkey") =!= col("sup2"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("k3") &&
          col("l_suppkey") =!= col("sup3"), "left_anti")
        .join(Tables.orders(s, d)
          .where(col("o_orderstatus") === "F").select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""
      SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_7'
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100
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

  // --------------------------------------------------------------- q210
  /** q210 — key-skew profile ([[Skew.keySkewProfile]]): the top-10
    * heaviest supplier keys of the fact table with exact count, table
    * share, multiple-of-mean-key-mass, and the salt fan-out that
    * would level each to 1,000 rows/task — the pre-flight readout
    * that turns [[Skew.saltedJoin]]'s `salt` parameter and
    * [[Skew.capHotKeys]]' threshold from guesses into measurements.
    * One partial-aggregated groupBy + TakeOrderedAndProject + the
    * documented one-row scalar-append; the rank window is bounded at
    * topK rows. */
  val q210: Q = Q(
    "q210_key_skew_profile",
    (s, d) =>
      Skew.keySkewProfile(Tables.lineitem(s, d), "l_suppkey",
        topK = 10, targetRowsPerTask = 1000L),
    Some("""
      WITH c AS (
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
      t AS (
        SELECT CAST(sum(n_rows) AS BIGINT) AS total,
          CAST(count(*) AS BIGINT) AS n_keys FROM c),
      r AS (
        SELECT l_suppkey, n_rows,
          CAST(row_number() OVER (ORDER BY n_rows DESC, l_suppkey)
            AS INT) AS rank
        FROM c)
      SELECT rank, l_suppkey, n_rows,
        CAST(n_rows AS DOUBLE) / total AS share,
        CAST(n_rows AS DOUBLE) * n_keys / total AS skew_x,
        CAST(ceil(CAST(n_rows AS DOUBLE) / 1000) AS BIGINT) AS n_salts
      FROM r, t WHERE rank <= 10 ORDER BY rank
    """.trim))

  // --------------------------------------------------------------- q220
  /** q220 — t-closeness audit ([[Scrub.tClosenessAudit]]): the third
    * privacy rung over q121's (lang, source) quasi-groups — a group
    * can be k- and l-safe yet still leak via its sensitive-value
    * DISTRIBUTION; total-variation distance to the global n_chars
    * distribution, the q112 exact-integer machinery, violation flag
    * by cross-multiplication against the dyadic 3/8 threshold. */
  val q220: Q = Q(
    "q220_t_closeness",
    (s, d) =>
      Scrub.tClosenessAudit(Tables.documents(s, d),
        Seq("lang", "source"), "n_chars", tNum = 3L, tDen = 8L),
    Some("""
      WITH p AS (
        SELECT lang, source, n_chars AS sv, CAST(count(*) AS BIGINT) c_gv
        FROM documents GROUP BY 1, 2, 3),
      vt AS (SELECT sv, CAST(sum(c_gv) AS BIGINT) c_v FROM p GROUP BY 1),
      nt AS (SELECT CAST(sum(c_v) AS BIGINT) n FROM vt),
      gt AS (
        SELECT lang, source, CAST(sum(c_gv) AS BIGINT) n_g
        FROM p GROUP BY 1, 2),
      folded AS (
        SELECT p.lang, p.source, g.n_g, nt.n,
          sum(abs(CAST(p.c_gv AS HUGEINT) * nt.n -
            CAST(vt.c_v AS HUGEINT) * g.n_g)) AS shared,
          CAST(sum(vt.c_v) AS BIGINT) AS s_g
        FROM p
        JOIN vt ON p.sv IS NOT DISTINCT FROM vt.sv
        JOIN gt g ON p.lang IS NOT DISTINCT FROM g.lang
          AND p.source IS NOT DISTINCT FROM g.source, nt
        GROUP BY 1, 2, 3, 4)
      SELECT lang, source, n_g AS n_rows,
        CAST(shared + CAST(n - s_g AS HUGEINT) * n_g AS DOUBLE) /
          CAST(2 * CAST(n_g AS HUGEINT) * n AS DOUBLE) AS tv_distance,
        ((shared + CAST(n - s_g AS HUGEINT) * n_g) * 8 >
          (2 * CAST(n_g AS HUGEINT) * n) * 3) AS t_violation
      FROM folded
      ORDER BY lang NULLS FIRST, source NULLS FIRST
    """.trim))

  // --------------------------------------------------------------- q223
  /** q223 — small-quantity revenue (the TPC-H Q17 SHAPE, the
    * planner's classic AGGREGATE-THEN-REJOIN stressor next to q208's
    * Q21): revenue sitting in lineitems whose quantity is below 20%
    * of their part's average order quantity — the "would a
    * small-order surcharge matter" readout, grouped by brand. The
    * correlated scalar subquery (`l_quantity < 0.2 · avg(l_quantity)
    * per part`) plans as a per-part aggregate joined back to the
    * fact — the shape, not a row-at-a-time subquery. The fractional
    * threshold is CROSS-MULTIPLIED (`q·5·cnt < Σq` in exact
    * DECIMAL), never `0.2·avg` in floats, so the boundary cannot
    * flip between engines; `avg_yearly` is the one IEEE division at
    * the output edge.
    *
    * Scale shape: the per-part stats frame and the fact co-key on
    * `l_partkey` — one hash partitioning planned once and reused;
    * the part dim is broadcast; the brand rollup is a ≤ |brands|
    * partial-aggregated fold. The stats frame must NOT be broadcast
    * at scale (it is |parts|-sized, ~1/4 of the fact row count in
    * TPC-H); AQE may legitimately broadcast it at fixture SF. */
  val q223: Q = Q(
    "q223_small_qty_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
      val stats = li.groupBy(col("l_partkey")).agg(
        count(col("l_quantity")).as("__cnt"),
        sum(Dec.d2(col("l_quantity"))).as("__sq"))
      li.join(stats, Seq("l_partkey"))
        .where(Dec.d2(col("l_quantity")) * lit(5L) * col("__cnt") <
          col("__sq"))
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_small_qty"),
          sum(Dec.d2(col("l_extendedprice"))).as("__rev"))
        .select(col("p_brand"), col("n_small_qty"),
          Dec.outD(col("__rev")).as("revenue"),
          (Dec.outD(col("__rev")) / lit(7.0)).as("avg_yearly"))
        .orderBy(col("p_brand"))
    },
    Some("""
      WITH stats AS (
        SELECT l_partkey, CAST(count(l_quantity) AS BIGINT) AS cnt,
          sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
        FROM lineitem GROUP BY 1)
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
          AS revenue,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
          / 7.0 AS avg_yearly
      FROM lineitem
      JOIN stats USING (l_partkey)
      JOIN part ON p_partkey = l_partkey
      WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sq
      GROUP BY p_brand ORDER BY p_brand
    """.trim))

  // --------------------------------------------------------------- q230
  /** q230 — dominant-share suppliers (the TPC-H Q20 SHAPE, the
    * planner's NESTED SEMI-JOIN-over-aggregate stressor): suppliers of
    * one nation who shipped MORE THAN HALF of some small part's 1996
    * flow — Q20's "excess availability" EXISTS chain re-read on the
    * fixture star (no partsupp table, so availqty becomes the
    * supplier's own shipped share vs the part total). The qualifying
    * (supplier, part) set is an aggregate-of-an-aggregate JOIN that
    * must collapse into a semi-join, not a blowup.
    *
    * Scale shape: both qualifying aggregates — per (part, supplier)
    * and per part — PARTIAL-AGGREGATE before their exchanges (map-side
    * combine shrinks the fact to ≈|partsupp| and ≈|parts| rows), then
    * meet on an `l_partkey` hash join whose per-part side AQE
    * broadcasts at fixture SF and shuffles at scale — measured 0.96 MB
    * shuffle vs 5.0 MB for the "one exchange" keyed-window
    * alternative (`sum over partition by l_partkey` forces the full
    * (part, supplier) aggregate through a sorted partkey exchange;
    * the two partial-agged exchanges are strictly lighter — r14
    * measurement, the cache-intuition lesson again). The part-size
    * filter is a broadcast semi; the final supplier probe is LEFT
    * SEMI on `s_suppkey` (first match wins — no distinct, no
    * multiplication). The share threshold is CROSS-MULTIPLIED in
    * exact DECIMAL (`2·q_sp > q_p`), never a ratio of doubles. The
    * qualifying frame is |parts×suppliers-of-part|-sized and must NOT
    * broadcast at scale; AQE may legitimately do so at fixture SF. */
  val q230: Q = Q(
    "q230_dominant_share_suppliers",
    (s, d) => {
      val f = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"),
          Dec.d2(col("l_quantity")).as("__q"))
      val sp = f.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("__q")).as("__qsp"))
      val p = f.groupBy(col("l_partkey")).agg(sum(col("__q")).as("__qp"))
      val qual = sp.join(p, Seq("l_partkey"))
        .where(col("__qsp") * lit(2L) > col("__qp"))
        .join(broadcast(Tables.part(s, d).where(col("p_size") <= 10)
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .where(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""
      WITH f AS (
        SELECT l_partkey, l_suppkey,
          CAST(l_quantity AS DECIMAL(12,2)) AS q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'),
      sp AS (
        SELECT l_partkey, l_suppkey, sum(q) AS qsp FROM f GROUP BY 1, 2),
      p AS (SELECT l_partkey, sum(q) AS qp FROM f GROUP BY 1)
      SELECT s_suppkey, s_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
      WHERE EXISTS (
        SELECT 1 FROM sp
        JOIN p USING (l_partkey)
        JOIN part ON p_partkey = l_partkey AND p_size <= 10
        WHERE sp.l_suppkey = s_suppkey AND qsp * 2 > qp)
      ORDER BY s_suppkey
    """.trim))

  // --------------------------------------------------------------- q231
  /** q231 — idle high-balance customers (the TPC-H Q22 SHAPE: scalar
    * subquery + ANTI-join): customers whose balance exceeds the
    * positive-balance average and who placed NO order since the
    * recency cut, counted and totalled per nation — the "who holds
    * money but stopped buying" report whose plan is Q22's exactly: a
    * global scalar, a NOT-EXISTS, a small-key rollup. (Q22's literal
    * "no orders EVER" is degenerate on this fixture — every customer
    * has at least one order — so the anti side is the date-filtered
    * order stream, same topology with a pushed-down scan filter.)
    *
    * Scale shape: the average arrives as a ONE-ROW broadcast
    * scalar-append (q84 discipline) carrying (Σ bal⁺, n⁺), and the
    * threshold is CROSS-MULTIPLIED in exact DECIMAL
    * (`bal·n⁺ > Σ bal⁺`) — an avg-as-double compare could flip the
    * boundary between engines. The anti-join keys on `c_custkey`
    * against the corpus-scale orders key stream, which must NOT
    * broadcast at scale (it is the fact table's custkey column; AQE
    * may legitimately broadcast at fixture SF — q155 laddering);
    * the rollup is ≤ |nations| keys. Money exact decimal end-to-end,
    * DOUBLE only at the output boundary. */
  val q231: Q = Q(
    "q231_idle_customers",
    (s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"),
        col("c_nationkey"), Dec.d2(col("c_acctbal")).as("__bal"))
      val stats = cust.where(col("__bal") > 0)
        .agg(sum(col("__bal")).as("__s"), count(lit(1)).as("__c"))
      cust.crossJoin(broadcast(stats))
        .where(col("__bal") * col("__c") > col("__s"))
        .join(Tables.orders(s, d)
          .where(col("o_orderdate") >=
            lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_custs"),
          Dec.outD(sum(col("__bal"))).as("total_acctbal"))
        .orderBy(col("c_nationkey"))
    },
    Some("""
      WITH c AS (
        SELECT c_custkey, c_nationkey,
          CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer),
      t AS (
        SELECT sum(bal) AS s, CAST(count(*) AS BIGINT) AS c
        FROM c WHERE bal > 0)
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_custs,
        CAST(sum(bal) AS DOUBLE) AS total_acctbal
      FROM c CROSS JOIN t
      WHERE bal * c > s
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q232
  /** q232 — recursive (c,l)-diversity audit
    * ([[Scrub.recursiveLDiversity]]): the fourth privacy rung (q121
    * counts distinct values, q220 bounds distributional distance; this
    * bounds DOMINANCE — `r₁ < c·Σ_{i≥l} rᵢ`, the real Machanavajjhala
    * recursive form, log-free so it hash-verifies where the entropy
    * variant cannot). Full per-group table with margins, c = 2, l = 3
    * over the (lang, source) quasi-grid and document length as the
    * sensitive attribute; a release gate reads the `diverse` verdict
    * AND the near-miss margins. */
  val q232: Q = Q(
    "q232_recursive_l_diversity",
    (s, d) =>
      Scrub.recursiveLDiversity(Tables.documents(s, d),
        Seq("lang", "source"), "n_chars", cNum = 2L, cDen = 1L, l = 3),
    Some("""
      WITH p AS (
        SELECT lang, source, n_chars AS sv, CAST(count(*) AS BIGINT) r
        FROM documents GROUP BY 1, 2, 3),
      rk AS (
        SELECT lang, source, r,
          row_number() OVER (PARTITION BY lang, source
            ORDER BY r DESC, sv) AS pos
        FROM p)
      SELECT lang, source, CAST(sum(r) AS BIGINT) AS n_rows,
        CAST(count(*) AS BIGINT) AS n_distinct_sv,
        CAST(max(CASE WHEN pos = 1 THEN r END) AS BIGINT) AS r_top,
        CAST(coalesce(sum(CASE WHEN pos >= 3 THEN r END), 0) AS BIGINT)
          AS tail_mass,
        (max(CASE WHEN pos = 1 THEN r END) * 1 <
          2 * coalesce(sum(CASE WHEN pos >= 3 THEN r END), 0))
          AS diverse
      FROM rk GROUP BY 1, 2
      ORDER BY lang NULLS FIRST, source NULLS FIRST
    """.trim))

  // --------------------------------------------------------------- q235
  /** q235 — part-supplier census (the TPC-H Q16 SHAPE: NOT-IN
    * exclusion + grouped COUNT DISTINCT): per (brand, type, size) over
    * a size short-list, how many DISTINCT suppliers ship the part —
    * excluding suppliers in arrears (the fixture's stand-in for Q16's
    * complaints list). The fourth classic planner stressor in the
    * q208/q223/q230/q231 family.
    *
    * Scale shape: the exclusion list is DIM-sized (suppliers with
    * negative balance), so the NOT-IN plans as a BROADCAST anti-join
    * at any SF — the deliberate contrast with q231, whose anti side is
    * corpus-sized and must shuffle; the part dim is broadcast with the
    * attribute filters pushed into its scan; the count-distinct is
    * Spark's two-phase partial-distinct aggregate (map-side dedup of
    * (group, suppkey) before the exchange — repeated (part, supplier)
    * lineitems never cross the wire twice). Ties pinned (cnt desc,
    * then all three attributes). */
  val q235: Q = Q(
    "q235_part_supplier_census",
    (s, d) => {
      val excl = broadcast(Tables.supplier(s, d)
        .where(col("s_acctbal") < 0).select(col("s_suppkey").as("__ex")))
      val parts = broadcast(Tables.part(s, d)
        .where(col("p_brand") =!= "Brand#1" &&
          !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 4, 9, 16, 25))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size")))
      Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(excl, col("l_suppkey") === col("__ex"), "left_anti")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"),
          col("p_type"), col("p_size"))
    },
    Some("""
      SELECT p_brand, p_type, p_size,
        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1'
        AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (1, 4, 9, 16, 25)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """.trim))

  // --------------------------------------------------------------- q239
  /** q239 — disjunctive-clause revenue (the TPC-H Q19 SHAPE: an OR of
    * conjunctive clauses SPANNING the join): revenue from lineitems
    * matching any of three (brand, size-range, quantity-range)
    * bundles — the planner stressor whose trap is evaluating the
    * disjunction only AFTER a full join. Catalyst's
    * constraint-extraction pulls the part-only factor of each clause
    * out of the OR (brand ∈ {…} and the size caps reach the part
    * SCAN as pushed filters) and the quantity arms ride the broadcast
    * hash join as a residual — never a nested loop, never an
    * unfiltered dim. Money exact decimal, one ungrouped fold.
    *
    * Scale shape: part is dim-sized (broadcast); lineitem is scanned
    * once with no shuffle at all — filter, broadcast probe, partial
    * fold. The single-row output is the Q19 contract. */
  val q239: Q = Q(
    "q239_disjunctive_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        col("l_quantity"),
        (Dec.d2(col("l_extendedprice")) *
          (lit(1) - Dec.d2(col("l_discount")))).as("__rev"))
      val p = broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" &&
            col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" &&
            col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" &&
            col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(count(lit(1)).as("n_lines"),
          Dec.outD(sum(col("__rev"))).as("revenue"))
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
          AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
          AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
          AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 20 AND 30)
    """.trim))

  // --------------------------------------------------------------- q243
  /** q243 — corpus integrity fingerprint ([[Diff.contentChecksum]]):
    * per source, row count, NULL count, and two order-insensitive
    * content checksums (exact DECIMAL sum of the 31-fold char hash
    * mod 2⁶², bit-XOR of the independent 131-fold) — verify a 100 TB
    * copy against its origin by comparing a |sources|-row table, no
    * sort, no join, no full-row shuffle; sum and XOR merge across any
    * partitioning, so the two sides need not even agree on engine
    * (this oracle IS the other engine). */
  val q243: Q = Q(
    "q243_content_checksum",
    (s, d) =>
      Diff.contentChecksum(Tables.documents(s, d), "source", "text"),
    Some(s"""
      WITH h AS (
        SELECT source AS grp,
          CASE WHEN text IS NULL THEN NULL
               WHEN length(text) = 0 THEN 0
               ELSE list_reduce(list_prepend(0::BIGINT,
                 list_transform(range(1, length(text) + 1),
                   j -> ascii(text[j]))),
                 (h, c) -> ((h * 31) + c) % $P) END AS h1,
          CASE WHEN text IS NULL THEN NULL
               WHEN length(text) = 0 THEN 7
               ELSE list_reduce(list_prepend(7::BIGINT,
                 list_transform(range(1, length(text) + 1),
                   j -> ascii(text[j]))),
                 (h, c) -> ((h * 131) + c) % $P) END AS h2
        FROM documents)
      SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_nulls,
        CAST(sum(CAST(h1 AS HUGEINT)) % 4611686018427387904 AS BIGINT)
          AS sum_hash,
        bit_xor(h2) AS xor_hash
      FROM h GROUP BY 1
      ORDER BY grp NULLS FIRST
    """.trim))

  // --------------------------------------------------------------- q245
  /** q245 — large-quantity orders (the TPC-H Q18 SHAPE: semi over a
    * HAVING-aggregate): orders whose total lineitem quantity exceeds a
    * threshold, reported with their customer — the IN-(GROUP BY …
    * HAVING) planner shape. The qualifying set is an AGGREGATE of the
    * fact, so the membership test must plan as aggregate-then-join,
    * never as a re-scan per order.
    *
    * Scale shape: the quantity rollup is CO-KEYED with the orders
    * probe on the orderkey — one hash partitioning planned once; the
    * HAVING filter reduces the aggregate to a sliver BEFORE the join
    * (at TPC-H's own selectivity, ~1 order in 10⁴), and that sliver
    * side drives a hash join against orders. Customer scales with the
    * corpus, so its join is left to Catalyst/AQE (auto-broadcast at
    * fixture SF, keyed shuffle at 100 TB — the q155 discipline). The
    * top-100 is TakeOrderedAndProject (per-partition heaps, no global
    * sort), ties pinned by the unique orderkey. Quantity is DOUBLE in
    * the fixture, so the sum folds in exact DECIMAL — a double fold
    * would be partition-order-dependent. */
  val q245: Q = Q(
    "q245_large_quantity_orders",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(Dec.d2(col("l_quantity"))).as("__qty"))
        .where(col("__qty") > 250)
      val cDim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(cDim, col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice").as("total_price"),
          Dec.outD(col("__qty")).as("sum_qty"))
        .orderBy(col("total_price").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""
      WITH big AS (
        SELECT l_orderkey,
          sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem GROUP BY 1 HAVING qty > 250)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        o_totalprice AS total_price, CAST(qty AS DOUBLE) AS sum_qty
      FROM orders
      JOIN big ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY total_price DESC, o_orderkey
      LIMIT 100
    """.trim))

  // --------------------------------------------------------------- q246
  /** q246 — top supplier by revenue (the TPC-H Q15 SHAPE: a global
    * scalar MAX as the keep predicate, ties preserved): per-supplier
    * revenue over one quarter, keeping exactly the supplier(s) whose
    * revenue EQUALS the global maximum. The planner shape Q15 writes
    * as a view + `WHERE total = (SELECT max(total) FROM view)`.
    *
    * Scale shape: ONE corpus pass builds the |suppliers|-keyed revenue
    * rollup (date filter pushed to the scan, partial-aggregated fold);
    * the global max is a ONE-ROW broadcast scalar-append onto that
    * reduced frame — never a second corpus scan, never a global sort
    * (an `ORDER BY total DESC LIMIT 1` would silently DROP ties; the
    * equality keeps them, and the revenue compares as exact DECIMAL so
    * the boundary cannot flip on an IEEE rounding). The supplier-dim
    * join is left to Catalyst/AQE (corpus-scale at real SF). */
  val q246: Q = Q(
    "q246_top_revenue_supplier",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(Dec.d2(col("l_extendedprice")) *
          (lit(1) - Dec.d2(col("l_discount")))).as("__rev"))
      val mx = rev.agg(max(col("__rev")).as("__mx"))
      rev.crossJoin(broadcast(mx))
        .where(col("__rev") === col("__mx"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"),
          col("s_name")), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          Dec.outD(col("__rev")).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some("""
      WITH rev AS (
        SELECT l_suppkey,
          sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(12,2)))) AS r
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
      FROM rev JOIN supplier ON s_suppkey = l_suppkey
      WHERE r = (SELECT max(r) FROM rev)
      ORDER BY s_suppkey
    """.trim))

  // --------------------------------------------------------------- q247
  /** q247 — nation-pair trade volume (the TPC-H Q7 SHAPE: a
    * disjunction spanning TWO dimension sides of the join): shipping
    * volume between two nations by year, counting flow in BOTH
    * directions — `(supp = A AND cust = B) OR (supp = B AND cust =
    * A)`. The trap is that neither disjunct alone can be pushed to a
    * single scan (each constrains a DIFFERENT join side), but their
    * UNION's projection can: Catalyst's constraint extraction derives
    * the per-side shortlist `nation ∈ {A, B}` from the OR and both
    * dim sides arrive pre-pruned, leaving only the cheap
    * same-nation-pair rejection as a residual after the joins.
    *
    * Scale shape: the two-nation shortlist joins are written
    * explicitly BEFORE the fact joins (supplier and customer each
    * reduce ~12.5× here, |nations|/2-fold in general), so the big
    * orderkey/custkey shuffles move only qualifying rows; nation is
    * constant-size (broadcast); the date filter is pushed to the
    * lineitem scan; the rollup is ≤ 2·|years| groups,
    * partial-aggregated; money exact DECIMAL end-to-end. */
  val q247: Q = Q(
    "q247_nation_pair_volume",
    (s, d) => {
      val pair = Seq("NATION_3", "NATION_7")
      val n = broadcast(Tables.nation(s, d)
        .where(col("n_name").isin(pair: _*)))
      val supp = Tables.supplier(s, d).select(col("s_suppkey"),
          col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d).select(col("c_custkey"),
          col("c_nationkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= "1995-01-01" &&
          col("l_shipdate") < "1997-01-01")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (Dec.d2(col("l_extendedprice")) *
            (lit(1) - Dec.d2(col("l_discount")))).as("__vol"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(count(lit(1)).as("n_lines"),
          Dec.outD(sum(col("__vol"))).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS INT) AS l_year,
        CAST(count(*) AS BIGINT) AS n_lines,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
      GROUP BY 1, 2, 3
      ORDER BY supp_nation, cust_nation, l_year
    """.trim))

  // --------------------------------------------------------------- q248
  /** q248 — regional minimum-cost supplier (the TPC-H Q2 SHAPE:
    * argmin-per-group with an equality REJOIN, ties preserved): for
    * parts in an attribute shortlist, the supplier(s) in one region
    * offering the part at the region's MINIMUM price. The fixture has
    * no partsupp table, so the offer book is derived: a (part,
    * supplier) min-price rollup of lineitem restricted to the
    * region's suppliers — the SHAPE (correlated min subquery planned
    * as aggregate + equality rejoin) is Q2's exactly.
    *
    * Scale shape: region→nation→supplier is a constant-size broadcast
    * chain pruning the fact FIRST (one region ≈ 1/5 of suppliers);
    * the per-part minimum is a WINDOW MIN over the already-reduced
    * offer book, partitioned on `l_partkey` — an aggregate-then-rejoin
    * would duplicate the whole offer subtree (two corpus scans;
    * ReuseExchange can't match the diverged subtrees), where the
    * window reads it ONCE and appends the group min in place; the
    * equality keep on exact DECIMAL preserves ties, where a
    * `row_number = 1` would arbitrarily drop them and a double
    * compare could flip the boundary; the part shortlist is a
    * broadcast dim probe. The |parts|-sized offer frame must NOT
    * broadcast at scale (parts scale with the corpus — the q223
    * discipline). */
  val q248: Q = Q(
    "q248_regional_min_cost_supplier",
    (s, d) => {
      val rsup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .where(col("r_name") === "AFRICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val offers = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          Dec.d2(col("l_extendedprice")).as("__price"))
        .join(rsup.select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("__price")).as("__offer"))
      val parts = broadcast(Tables.part(s, d)
        .where(col("p_type") === "STANDARD" &&
          col("p_size").between(1, 10))
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      offers
        .withColumn("__best", min(col("__offer")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("l_partkey"))))
        .where(col("__offer") === col("__best"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(rsup, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("n_name"), col("s_name"),
          col("s_suppkey"), col("p_partkey"), col("p_brand"),
          col("p_size"), Dec.outD(col("__offer")).as("min_price"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("s_suppkey"), col("p_partkey"))
    },
    Some("""
      WITH rsup AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'AFRICA'),
      offers AS (
        SELECT l_partkey, l_suppkey,
          min(CAST(l_extendedprice AS DECIMAL(12,2))) AS offer
        FROM lineitem JOIN rsup ON s_suppkey = l_suppkey
        GROUP BY 1, 2),
      best AS (
        SELECT l_partkey, min(offer) AS best FROM offers GROUP BY 1)
      SELECT s_acctbal, n_name, s_name, s_suppkey, p_partkey, p_brand,
        p_size, CAST(offer AS DOUBLE) AS min_price
      FROM offers
      JOIN best USING (l_partkey)
      JOIN part ON p_partkey = l_partkey
      JOIN rsup ON s_suppkey = l_suppkey
      WHERE offer = best AND p_type = 'STANDARD'
        AND p_size BETWEEN 1 AND 10
      ORDER BY s_acctbal DESC, n_name, s_name, s_suppkey, p_partkey
    """.trim))

  // --------------------------------------------------------------- q252
  /** q252 — national market share (the TPC-H Q8 SHAPE: a conditional
    * share over a two-sided dimension join): of all revenue delivered
    * to one REGION's customers per year, the fraction supplied by one
    * NATION's suppliers — the same fact row keys into the dimension
    * tree twice (customer side filters the denominator's scope,
    * supplier side splits the numerator out of it), which is the
    * planner shape: one join tree, the split as a row-local CASE
    * inside the aggregate, never two scans or a self-join of the
    * joined fact.
    *
    * Scale shape: region→nation is a constant-size broadcast chain on
    * BOTH sides; the customer-region filter prunes the fact before
    * the supplier probe; orders carries the year and its date filter
    * is pushed to the scan; ≤ |years| rollup with numerator and
    * denominator folded in ONE pass as exact DECIMAL (partial
    * aggregation intact). The share itself is the single final IEEE
    * division of the two exact sums — the one float, pinned on both
    * engines (the q148 discipline). */
  val q252: Q = Q(
    "q252_national_market_share",
    (s, d) => {
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
      val cust = Tables.customer(s, d).select(col("c_custkey"),
          col("c_nationkey"))
        .join(broadcast(nr.where(col("r_name") === "ASIA")
          .select(col("n_nationkey").as("__cn"))),
          col("c_nationkey") === col("__cn"))
        .select(col("c_custkey"))
      val supp = Tables.supplier(s, d).select(col("s_suppkey"),
          col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          (Dec.d2(col("l_extendedprice")) *
            (lit(1) - Dec.d2(col("l_discount")))).as("__vol"))
        .join(Tables.orders(s, d)
          .where(col("o_orderdate") >= "1995-01-01" &&
            col("o_orderdate") < "1997-01-01")
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          Dec.outD(sum(when(col("supp_nation") === "NATION_2",
            col("__vol")).otherwise(lit(0)))).as("nation_revenue"),
          Dec.outD(sum(col("__vol"))).as("total_revenue"))
        .withColumn("mkt_share",
          col("nation_revenue") / col("total_revenue"))
        .orderBy(col("o_year"))
    },
    Some("""
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(sum(CASE WHEN n1.n_name = 'NATION_2'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(12,2))) ELSE 0 END)
          AS DOUBLE) AS nation_revenue,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
          AS total_revenue,
        CAST(sum(CASE WHEN n1.n_name = 'NATION_2'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(12,2))) ELSE 0 END)
          AS DOUBLE) /
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
          AS mkt_share
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n2.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      WHERE region.r_name = 'ASIA'
        AND o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01'
      GROUP BY 1
      ORDER BY o_year
    """.trim))

  // --------------------------------------------------------------- q258
  /** q258 — TPC-H Q9 shape (product-type profit): a LIKE-filtered
    * part shortlist driven through the multi-way
    * lineitem⋈part⋈supplier⋈nation⋈orders join with a PER-ROW profit
    * expression, rolled up by (nation, order year). The two planner
    * stressors Q9 exists for: the LIKE predicate must reach the part
    * SCAN (StringContains pushdown — filtering after the join would
    * drag the whole fact through), and the profit arithmetic must
    * stay row-local inside the join output, never a second pass.
    * No partsupp in the fixture (as q248): `p_retailprice` stands in
    * for the per-unit supply cost — the SHAPE (cost joins in from the
    * part dim, multiplies a fact column, subtracts from discounted
    * revenue) is Q9's exactly. All money exact DECIMAL, one cast to
    * double at the end (the q252 discipline). Plan-pinned: LIKE at
    * the scan, dims broadcast, fact never broadcast. */
  val q258: Q = Q(
    "q258_product_type_profit",
    (s, d) => {
      val part = Tables.part(s, d)
        .where(col("p_name").like("%bolt%"))
        .select(col("p_partkey"),
          Dec.d2(col("p_retailprice")).as("__cost"))
      val supp = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (Dec.d2(col("l_extendedprice")) *
            (lit(1) - Dec.d2(col("l_discount")))).as("__rev"),
          Dec.d2(col("l_quantity")).as("__qty"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), col("o_year"))
        .agg(Dec.outD(sum(col("__rev") - col("__cost") * col("__qty")))
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(sum(
          CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(12,2))) -
          CAST(p_retailprice AS DECIMAL(12,2)) *
            CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%bolt%'
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC
    """.trim))

  // --------------------------------------------------------------- q259
  /** q259 — TPC-H Q4 shape (order priority checking): orders in a
    * one-quarter date WINDOW counted by priority, kept only when an
    * EXISTS-correlated lineitem predicate holds. The planner
    * stressor: the EXISTS must plan as a LEFT SEMI hash join probing
    * the orders sliver — one lineitem scan, never a re-scan or
    * per-order subquery — and the date window must reach the orders
    * scan as pushed filters. No l_commitdate/l_receiptdate in the
    * fixture: the inner predicate is a lineitem-side discount test
    * (same correlation structure — EXISTS over the fact keyed by the
    * outer's orderkey with a residual inner filter). */
  val q259: Q = Q(
    "q259_order_priority_exists",
    (s, d) => {
      val lines = Tables.lineitem(s, d)
        .where(col("l_discount") > 0.05)
        .select(col("l_orderkey"))
      Tables.orders(s, d)
        .where(col("o_orderdate") >= "1996-07-01" &&
          col("o_orderdate") < "1996-10-01")
        .join(lines, col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
      GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q264
  /** q264 — TPC-H Q17 shape (correlated scalar-aggregate threshold):
    * revenue of small-quantity orders for one brand's parts, where
    * "small" means below a fraction of THAT PART's average quantity —
    * the classic decorrelation stressor: the correlated
    * `(SELECT 0.2·avg(quantity) WHERE same part)` must plan as ONE
    * per-part aggregate joined back (never a per-row re-scan), and
    * the aggregate side is itself pre-pruned by the brand shortlist
    * (aggregating only the parts the probe can use). Engine-exact
    * twist: `avg` is a division, so the threshold comparison is
    * CROSS-MULTIPLIED — `5·n·qty < sum_qty` in DECIMAL — and the
    * boundary cannot float (the q45/q233 integer-comparison
    * discipline applied to Q17's 0.2 factor). Output is the one-row
    * Q17 total (sum/7.0 as its single IEEE division). */
  val q264: Q = Q(
    "q264_small_quantity_revenue",
    (s, d) => {
      val part = Tables.part(s, d)
        .where(col("p_brand") === "Brand#4")
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          Dec.d2(col("l_quantity")).as("__qty"),
          Dec.d2(col("l_extendedprice")).as("__price"))
      val perPart = li.groupBy(col("l_partkey").as("__pk"))
        .agg(sum(col("__qty")).as("__sum_qty"),
          count(lit(1)).as("__n"))
      // No broadcast hint on the stats frame: it is brand-pre-pruned
      // (1/25 of parts) but still |parts|-scaled, the frame q223's
      // contract says must NOT be forced to broadcast at scale — AQE
      // broadcasts it at fixture SF on its own and correctly refuses
      // at an SF where it would not fit.
      li.join(perPart, col("l_partkey") === col("__pk"))
        .where(col("__qty") * lit(5) * col("__n") < col("__sum_qty"))
        .agg((Dec.outD(sum(col("__price"))) / lit(7.0))
          .as("avg_yearly"))
    },
    Some("""
      WITH pp AS (
        SELECT l_partkey AS pk,
          sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
          CAST(count(*) AS BIGINT) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'
        GROUP BY 1)
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
          AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN pp ON pp.pk = l_partkey
      WHERE p_brand = 'Brand#4'
        AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * n < sum_qty
    """.trim))

  // --------------------------------------------------------------- q268
  /** q268 — TPC-H Q10 shape (returned-item top customers): revenue
    * lost to returns per customer over one quarter, top-20 by that
    * revenue. The planner stressors: the 4-way
    * lineitem⋈orders⋈customer⋈nation rollup must shuffle the FACT
    * once (returnflag pushed to the lineitem scan, date window pushed
    * to orders, customer/nation broadcast), and the global top-k must
    * plan as TakeOrderedAndProject — never a full sort of the
    * |customers| rollup (the q12/O1 discipline at four tables).
    * Determinism: revenue ties break by c_custkey on BOTH engines so
    * the 20-row SET is pinned. All money exact DECIMAL, one final
    * double (the q252 discipline). */
  val q268: Q = Q(
    "q268_returned_item_customers",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
      Tables.lineitem(s, d)
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (Dec.d2(col("l_extendedprice")) *
            (lit(1) - Dec.d2(col("l_discount")))).as("__rev"))
        .join(Tables.orders(s, d)
          .where(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1996-04-01")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(Dec.outD(sum(col("__rev"))).as("revenue"))
        // customer is NOT hint-broadcast: unlike q258's LIKE-pruned
        // part shortlist it scales 1:1 with SF, and the rollup side
        // is already reduced to ≤ |customers| rows — a co-keyed
        // shuffle join is the at-scale plan (AQE still broadcasts at
        // fixture SF where it fits)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
          AS revenue,
        c_acctbal, n_name
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """.trim))

  // --------------------------------------------------------------- q269
  /** q269 — TPC-H Q12 shape (shipping-bucket priority counts): line
    * shipments in a one-year window bucketed by a line attribute,
    * with a TWO-WAY CONDITIONAL COUNT against the order's priority
    * class — the classic "join once, fold two CASE counts" shape
    * (never two passes, never a pivot shuffle). No l_shipmode in the
    * fixture: `l_linestatus` is the bucketing attribute and
    * `l_returnflag IN ('A','R')` the mode shortlist — the SHAPE
    * (fact-side IN filter + date window pushed to the fact scan,
    * orders joined only to read the priority, both counts from one
    * aggregate) is Q12's exactly. */
  val q269: Q = Q(
    "q269_shipping_priority_buckets",
    (s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01")
        .select(col("l_orderkey"), col("l_linestatus"))
        .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(1L)).otherwise(lit(0L))).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(0L)).otherwise(lit(1L))).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    Some("""
      SELECT l_linestatus,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      WHERE l_returnflag IN ('A', 'R')
        AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      GROUP BY 1 ORDER BY 1
    """.trim))

  // --------------------------------------------------------------- q270
  /** q270 — TPC-H Q14 shape (promo revenue share): the percentage of
    * one month's discounted revenue that came from promo-typed parts —
    * a conditional sum over the fact⋈dim join divided by the
    * unconditional sum, both from ONE aggregate over ONE fact pass
    * (the Q12 fold with a ratio readout). The date window is pushed
    * to the lineitem scan, the part dim broadcasts. Engine-exact: the
    * numerator is scaled by 100 while still EXACT decimal, so the one
    * IEEE division (the q252 mkt_share discipline) is the only
    * rounding anywhere. Fixture p_type is the exact token 'PROMO'
    * (no prefix LIKE needed — same predicate class). */
  val q270: Q = Q(
    "q270_promo_revenue_share",
    (s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= "1996-03-01" &&
          col("l_shipdate") < "1996-04-01")
        .select(col("l_partkey"),
          (Dec.d2(col("l_extendedprice")) *
            (lit(1) - Dec.d2(col("l_discount")))).as("__rev"))
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          Dec.outD(sum(when(col("p_type") === "PROMO", col("__rev"))
            .otherwise(lit(0))) * lit(100)).as("__promo100"),
          Dec.outD(sum(col("__rev"))).as("__total"))
        .select((col("__promo100") / col("__total"))
          .as("promo_revenue"))
    },
    Some("""
      SELECT CAST(100 * sum(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(12,2))) ELSE 0 END)
          AS DOUBLE) /
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
          AS promo_revenue
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'
    """.trim))

  // --------------------------------------------------------------- q282
  /** q282 — national stock-value concentration (the TPC-H Q11 SHAPE:
    * a grouped rollup kept by `HAVING sum(...) > fraction × GLOBAL
    * scalar`, the last unpinned shape of the named set): the value
    * mass each part holds with ONE nation's suppliers, keeping the
    * parts whose mass exceeds a multiple of the average part's. The
    * fixture has no partsupp table, so the per-(part, supplier)
    * value book is derived from lineitem exactly as q248 derives
    * Q2's offer book — `sum(extendedprice · quantity)` per pair is
    * the `ps_supplycost · ps_availqty` analog.
    *
    * Threshold honesty: TPC-H's literal `fraction = 0.0001/SF` bakes
    * the scale factor into the query; the SF-portable restatement
    * keeps parts above `C × (total / n_parts)` — still exactly Q11's
    * planner shape (the HAVING compares each group's sum against a
    * product of GLOBAL aggregates), and the boundary cannot float:
    * the division never happens, the comparison is CROSS-MULTIPLIED
    * `value · n_parts > C · total` in exact DECIMAL (the q264/q246
    * disciplines).
    *
    * Scale shape: nation→supplier is a constant-size broadcast chain
    * pruning the fact first (~1/|nations| of lineitem); the pair book
    * and the per-part rollup are partial-aggregated folds keyed
    * l_partkey (the second reuses the first's hash partitioning —
    * zero extra exchange); the global (total, n_parts) scalar is a
    * ONE-ROW broadcast append onto the reduced |parts| frame — never
    * a second corpus scan (the q246 discipline); the final DESC order
    * is on the kept minority only. */
  val q282: Q = Q(
    "q282_stock_value_concentration",
    (s, d) => {
      val nsup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)
          .where(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val pairBook = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          (Dec.d2(col("l_extendedprice")) * Dec.d2(col("l_quantity")))
            .as("__v"))
        .join(broadcast(nsup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("__v")).as("__pair_value"))
      val byPart = pairBook.groupBy(col("l_partkey"))
        .agg(sum(col("__pair_value")).as("__value"))
      val g = byPart.agg(sum(col("__value")).as("__total"),
        count(lit(1)).as("__n_parts"))
      byPart.crossJoin(broadcast(g))
        .where(col("__value") * col("__n_parts") >
          col("__total") * lit(2))
        .select(col("l_partkey").as("ps_partkey"),
          Dec.outD(col("__value")).as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },
    Some("""
      WITH nsup AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'),
      pair AS (
        SELECT l_partkey, l_suppkey,
          sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
            CAST(l_quantity AS DECIMAL(12,2))) AS pv
        FROM lineitem JOIN nsup ON s_suppkey = l_suppkey
        GROUP BY 1, 2),
      byp AS (
        SELECT l_partkey, sum(pv) AS v FROM pair GROUP BY 1),
      g AS (
        SELECT sum(v) AS total, count(*) AS n_parts FROM byp)
      SELECT l_partkey AS ps_partkey, CAST(v AS DOUBLE) AS value
      FROM byp, g
      WHERE v * n_parts > total * 2
      ORDER BY value DESC, ps_partkey
    """.trim))
}
