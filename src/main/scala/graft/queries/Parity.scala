package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.{Dec, Tables}
import graft.etl.Report

/** Parity operators: every relational capability in SURVEY.md §2 (the
  * reference's inventory) re-targeted onto the driver's TPC-H-ish tables
  * per FIXTURES.md §B's mapping — `lineitem`/`orders` play the fact,
  * `customer`/`nation` the dims.
  *
  * Scale notes apply to every query here: scans are plain parquet reads
  * (pushdown + pruning reach the scan), joins to small dims broadcast,
  * aggregations are partial (map-side combine) by construction, and the
  * only global sorts are over post-aggregation row counts (tiny).
  */
object Parity {

  /** money expression used by the revenue queries:
    * decimal-exact l_extendedprice * (1 - l_discount)
    * (conditional-agg semantics of /root/reference/src/bot_ventas.py:39-57,
    * decimal discipline per SURVEY §1.2). */
  private def revenue(price: Column, disc: Column): Column =
    Dec.d2(price) * (lit(1) - Dec.d2(disc))

  /** q1 — pricing summary (TPC-H Q1 shape).
    * Capability: grouped multi-aggregate with arithmetic inside SUM —
    * the engine analog of the reference's grouped SUM reporting
    * (SURVEY §2.4 A4/A5). Partial-aggregable; one shuffle of ~8 groups. */
  val q1: Q = Q(
    "q1_pricing_summary",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.where(col("l_shipdate") <= lit("2000-01-01").cast("date"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Dec.outD(sum(Dec.d2(col("l_quantity")))).as("sum_qty"),
          Dec.outD(sum(Dec.d2(col("l_extendedprice")))).as("sum_base_price"),
          Dec.outD(sum(revenue(col("l_extendedprice"), col("l_discount"))))
            .as("sum_disc_price"),
          Dec.outD(sum(revenue(col("l_extendedprice"), col("l_discount"))
            * (lit(1) + Dec.d2(col("l_tax"))))).as("sum_charge"),
          (Dec.outD(sum(Dec.d2(col("l_quantity"))))
            / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= DATE '2000-01-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim),
    headline = true)

  /** q9 — sales by nation (the reference's distributor-performance report,
    * /root/reference/src/bot_ventas.py:48-57: 3-table left-join chain +
    * COALESCE null-bucket + grouped SUM + ORDER DESC; SURVEY §2.3 J4 +
    * §2.4 A4). nation is broadcast (KB-scale dim), customer⋈orders⋈lineitem
    * shuffles on its keys — the same plan holds at 100 TB with the fact
    * partitioned by date. */
  val q9: Q = Q(
    "q9_sales_by_nation",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("date")
          && col("o_orderdate") < lit("1997-01-01").cast("date"))
      val cust = Tables.customer(s, d)
      val nat = Tables.nation(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(coalesce(col("n_name"), lit("Venta Directa")).as("nation"))
        .agg(Dec.outD(sum(revenue(col("l_extendedprice"), col("l_discount"))))
          .as("total_prestamos"))
        .orderBy(col("total_prestamos").desc, col("nation"))
    },
    Some("""
      SELECT COALESCE(n_name, 'Venta Directa') AS nation,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_prestamos
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      LEFT JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      GROUP BY 1
      ORDER BY total_prestamos DESC, nation
    """.stripMargin.trim),
    headline = true)

  /** q2 — projection + rename + pushed-down filter (SURVEY §2.2 P4/P5;
    * reference's column projection at transform.py:79,89 and rename maps at
    * transform.py:83-87,102-106). The filter and 4-column read must reach
    * the parquet scan (PushedFilters / ReadSchema). */
  val q2: Q = Q(
    "q2_select_project",
    (s, d) =>
      Tables.part(s, d)
        .where(col("p_size") > 30)
        .select(
          col("p_partkey").as("part_id"),
          col("p_name").as("part_name"),
          col("p_brand").as("brand"),
          Dec.outD(Dec.d2(col("p_retailprice"))).as("retail"))
        .orderBy(col("part_id")),
    Some("""
      SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand,
        CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS retail
      FROM part WHERE p_size > 30 ORDER BY part_id
    """.stripMargin.trim))

  /** q3 — try-cast hygiene (SURVEY §2.2 P8, §2.6 F3/F4): the reference's
    * coerce-to-null-then-filter idiom (pd.to_numeric(errors='coerce'),
    * transform.py:61-64,120-122). try_cast pins null-on-failure regardless
    * of ANSI mode; the succeeding branch filters like P8, the failing
    * branch (words -> int) stays null like F4. */
  val q3: Q = Q(
    "q3_try_cast",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey").as("part_id"),
          expr("try_cast(substring(p_brand, 7, 10) AS INT)").as("brand_num"),
          expr("try_cast(p_type AS INT)").as("type_num"))
        .where(expr("try_cast(substring(p_brand, 7, 10) AS INT)").isNotNull)
        .orderBy(col("part_id")),
    Some("""
      SELECT p_partkey AS part_id,
        TRY_CAST(substr(p_brand, 7, 10) AS INT) AS brand_num,
        TRY_CAST(p_type AS INT) AS type_num
      FROM part
      WHERE TRY_CAST(substr(p_brand, 7, 10) AS INT) IS NOT NULL
      ORDER BY part_id
    """.stripMargin.trim))

  /** q4 — left outer equi-join enrichment (SURVEY §2.3 J1; the clients <-
    * JSON merge at transform.py:91-97, differing key names preserved).
    * nation is a KB-scale dim -> broadcast, zero shuffle of customer. */
  val q4: Q = Q(
    "q4_left_join_enrich",
    (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"), "left")
        .select(
          col("c_custkey").as("id_cliente"),
          col("c_name").as("nombre"),
          col("c_mktsegment").as("segmento"),
          col("n_name").as("nacion"))
        .orderBy(col("id_cliente")),
    Some("""
      SELECT c_custkey AS id_cliente, c_name AS nombre,
             c_mktsegment AS segmento, n_name AS nacion
      FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      ORDER BY id_cliente
    """.stripMargin.trim))

  /** q5 — left anti-join orphan detection (SURVEY §2.3 J2; the RI check at
    * transform.py:57-68 incl. its explicit not-null exclusion). The
    * testdata has dense FKs so the orphan set is empty — the oracle proves
    * the plan computes the same (empty) answer; ParitySpec exercises the
    * same J2 shape on dirty in-memory data (orphans + null keys). */
  val q5: Q = Q(
    "q5_anti_orphans",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_partkey")).distinct()
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"),
          "left_anti")
        .where(col("l_partkey").isNotNull)
        .select(col("l_partkey").as("orphan_partkey"))
        .orderBy(col("orphan_partkey")),
    Some("""
      SELECT DISTINCT l_partkey AS orphan_partkey
      FROM lineitem
      WHERE l_partkey IS NOT NULL
        AND l_partkey NOT IN (SELECT p_partkey FROM part)
      ORDER BY orphan_partkey
    """.stripMargin.trim))

  /** q6 — referential-integrity self-repair (SURVEY §2.5 U1 + §2.3 J2; the
    * reference's signature business rule, transform.py:57-76: fact keys
    * missing from a dim get synthesized dummy dim rows so FK loads never
    * fail). unionByName of the dim with the anti-join orphan set. */
  val q6: Q = Q(
    "q6_ri_repair",
    (s, d) => {
      val dim = Tables.nation(s, d)
        .select(col("n_nationkey").as("id"), col("n_name").as("nombre"))
      val orphans = Tables.customer(s, d)
        .select(col("c_nationkey")).distinct()
        .where(col("c_nationkey").isNotNull)
        .join(Tables.nation(s, d),
          col("c_nationkey") === col("n_nationkey"), "left_anti")
        .select(col("c_nationkey").as("id"),
          lit("Tipo Desconocido (Sistema)").as("nombre"))
      dim.unionByName(orphans).orderBy(col("id"))
    },
    Some("""
      SELECT n_nationkey AS id, n_name AS nombre FROM nation
      UNION ALL
      SELECT DISTINCT c_nationkey AS id, 'Tipo Desconocido (Sistema)' AS nombre
      FROM customer
      WHERE c_nationkey IS NOT NULL
        AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
      ORDER BY id
    """.stripMargin.trim))

  /** q7 — deterministic keep-first dedup (SURVEY §2.4 A2; pandas
    * drop_duplicates keeps the first row in file order, transform.py:79 —
    * Spark's dropDuplicates keeps an arbitrary row, so parity needs
    * row_number over an explicit order). One shuffle on the dedup key. */
  val q7: Q = Q(
    "q7_dedup_keepfirst",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(
          col("o_custkey").as("id_cliente"),
          col("o_orderkey").as("primer_orden"),
          col("o_orderdate").cast("date").as("fecha_primera_trx"))
        .orderBy(col("id_cliente"))
    },
    Some("""
      SELECT o_custkey AS id_cliente, o_orderkey AS primer_orden,
             CAST(o_orderdate AS DATE) AS fecha_primera_trx
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) t
      WHERE rn = 1
      ORDER BY id_cliente
    """.stripMargin.trim))

  /** q8 — ungrouped conditional aggregate, day vs month-to-date (SURVEY
    * §2.4 A3; the daily/accumulated pivot of bot_ventas.py:39-45:
    * SUM(CASE WHEN date = cut THEN monto ELSE 0 END) over a month range).
    * Fully partial-aggregable: single row out, no shuffle beyond the
    * 2-phase agg. */
  val q8: Q = Q(
    "q8_conditional_agg",
    (s, d) => {
      val cut = lit("1998-06-15").cast("date")
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1998-06-01").cast("date")
          && col("l_shipdate") < lit("1998-06-16").cast("date"))
        .agg(
          Dec.outD(sum(when(col("l_shipdate").cast("date") === cut,
            revenue(col("l_extendedprice"), col("l_discount")))
            .otherwise(lit(0)))).as("venta_diaria"),
          Dec.outD(sum(revenue(col("l_extendedprice"), col("l_discount"))))
            .as("acumulado_mes"),
          count(lit(1)).as("n_trx"))
    },
    Some("""
      SELECT
        CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) = DATE '1998-06-15'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
          ELSE 0 END) AS DOUBLE) AS venta_diaria,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS acumulado_mes,
        COUNT(*) AS n_trx
      FROM lineitem
      WHERE l_shipdate >= DATE '1998-06-01' AND l_shipdate < DATE '1998-06-16'
    """.stripMargin.trim),
    headline = true)

  /** q10 — incremental insert-if-absent (SURVEY §2.1 S6 + §2.3 J3 + §2.2
    * P9; load.py:20-68: incoming minus already-loaded PKs, never update).
    * Overlapping windows make the anti-join non-trivial: H1-2000 rows are
    * "already loaded" and must be dropped. Formulated as a left_anti join
    * (never a collected id set — load.py:15 wouldn't scale). */
  val q10: Q = Q(
    "q10_incremental_antijoin",
    (s, d) => {
      val ord = Tables.orders(s, d)
      val incoming = ord.where(
        col("o_orderdate") >= lit("2000-01-01").cast("date"))
      val existing = ord.where(
        col("o_orderdate") < lit("2000-07-01").cast("date"))
        .select(col("o_orderkey"))
      incoming.join(existing, Seq("o_orderkey"), "left_anti")
        .select(
          col("o_orderkey").as("id_trx"),
          col("o_orderdate").cast("date").as("fecha"),
          Dec.outD(Dec.d2(col("o_totalprice"))).as("monto"))
        .orderBy(col("id_trx"))
    },
    Some("""
      SELECT o_orderkey AS id_trx, CAST(o_orderdate AS DATE) AS fecha,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS monto
      FROM orders o
      WHERE o.o_orderdate >= DATE '2000-01-01'
        AND NOT EXISTS (
          SELECT 1 FROM orders o2
          WHERE o2.o_orderdate < DATE '2000-07-01'
            AND o2.o_orderkey = o.o_orderkey)
      ORDER BY id_trx
    """.stripMargin.trim))

  /** q11 — distinct (SURVEY §2.4 A1; .unique() at transform.py:58).
    * Partial-aggregable distinct: map-side dedup before the shuffle. */
  val q11: Q = Q(
    "q11_distinct",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim))

  /** q12 — global sort + top-k (SURVEY §2.7 O1; ORDER BY DESC at
    * bot_ventas.py:57). LIMIT makes Spark use TakeOrderedAndProject —
    * no full sort shuffle at scale. Tie-broken on key for determinism. */
  val q12: Q = Q(
    "q12_topk",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey").as("id_cliente"),
          Dec.outD(Dec.d2(col("c_acctbal"))).as("saldo"))
        .orderBy(col("saldo").desc, col("id_cliente"))
        .limit(10),
    Some("""
      SELECT c_custkey AS id_cliente,
        CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS saldo
      FROM customer
      ORDER BY saldo DESC, id_cliente
      LIMIT 10
    """.stripMargin.trim))

  /** q13 — scalar-function surface (SURVEY §2.6 F2/F5/F6/F7: date
    * truncation/extraction, CASE WHEN, COALESCE over a date-range filter,
    * the function kit of bot_ventas.py:41-55 + transform.py:114-117).
    * Row-level, codegen'd, no shuffle except the output sort. */
  val q13: Q = Q(
    "q13_scalar_funcs",
    (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1997-03-01").cast("date")
          && col("o_orderdate") < lit("1997-04-01").cast("date"))
        .select(
          col("o_orderkey").as("id_trx"),
          col("o_orderdate").cast("date").as("fecha"),
          year(col("o_orderdate")).as("anio"),
          month(col("o_orderdate")).as("mes"),
          when(col("o_totalprice") >= 300000, lit("alto"))
            .when(col("o_totalprice") >= 100000, lit("medio"))
            .otherwise(lit("bajo")).as("banda"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("estado"))
        .orderBy(col("id_trx")),
    Some("""
      SELECT o_orderkey AS id_trx, CAST(o_orderdate AS DATE) AS fecha,
        CAST(year(o_orderdate) AS INT) AS anio,
        CAST(month(o_orderdate) AS INT) AS mes,
        CASE WHEN o_totalprice >= 300000 THEN 'alto'
             WHEN o_totalprice >= 100000 THEN 'medio'
             ELSE 'bajo' END AS banda,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS estado
      FROM orders
      WHERE o_orderdate >= DATE '1997-03-01' AND o_orderdate < DATE '1997-04-01'
      ORDER BY id_trx
    """.stripMargin.trim))

  /** q14 — calendar-bucketed grouped aggregate (SURVEY §2.6 F2 + §2.4 A4:
    * the reporting month-rollup shape; date_trunc keeps the group count
    * tiny so the shuffle is negligible at any scale). */
  val q14: Q = Q(
    "q14_monthly_revenue",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("mes"))
        .agg(
          Dec.outD(sum(Dec.d2(col("o_totalprice")))).as("ingresos"),
          count(lit(1)).as("n_ordenes"))
        .orderBy(col("mes")),
    Some("""
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mes,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS ingresos,
        COUNT(*) AS n_ordenes
      FROM orders
      GROUP BY 1
      ORDER BY mes
    """.stripMargin.trim),
    headline = true)

  /** q15 — the SQL-text API path (SURVEY §3.2: the reference ships SQL
    * strings to Postgres; our engine internalizes them via spark.sql over
    * registered temp views — same Catalyst plan as the DataFrame chain;
    * ParitySpec asserts q15 ≡ q9 row-for-row). View names are
    * query-scoped (`q15_*`) so registering them can never poison another
    * query's resolution in the shared session. */
  val q15: Q = Q(
    "q15_sql_api",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q15_lineitem")
      Tables.orders(s, d).createOrReplaceTempView("q15_orders")
      Tables.customer(s, d).createOrReplaceTempView("q15_customer")
      Tables.nation(s, d).createOrReplaceTempView("q15_nation")
      s.sql("""
        SELECT COALESCE(n_name, 'Venta Directa') AS nation,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_prestamos
        FROM q15_lineitem
        JOIN q15_orders ON l_orderkey = o_orderkey
        JOIN q15_customer ON o_custkey = c_custkey
        LEFT JOIN q15_nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        GROUP BY 1
        ORDER BY total_prestamos DESC, nation
      """)
    },
    q9.oracle)

  /** Star-mapping of the TPC-H-ish testdata onto the reference's fact
    * shape (FIXTURES.md §B): orders plays fct_transacciones. Shared by
    * the Report-path queries so they exercise the ACTUAL
    * `graft.etl.Report` code, not a reimplementation. */
  private def ordersAsFact(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").as("id_trx"),
      col("o_custkey").as("id_cliente"),
      col("o_orderdate").cast("timestamp").as("fecha_trx"),
      Dec.d2(col("o_totalprice")).as("monto"))

  /** q27 — Report.metrics itself, oracle-checked (r2 verdict item 6;
    * bot_ventas.py:39-45 is the reference's first real query). The
    * oracle mirrors the timestamp<=midnight-of-cut boundary the
    * reference has (see Report.metrics scaladoc). */
  val q27: Q = Q(
    "q27_report_metrics",
    (s, d) =>
      Report.metrics(ordersAsFact(s, d), LocalDate.parse("1997-06-15"))
        .select(
          Dec.outD(col("diaria")).as("diaria"),
          Dec.outD(col("acumulado_mes")).as("acumulado_mes")),
    Some("""
      SELECT
        CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) = DATE '1997-06-15'
          THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE) AS diaria,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS acumulado_mes
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
        AND o_orderdate <= TIMESTAMP '1997-06-15 00:00:00'
    """.stripMargin.trim))

  /** q28 — Report.distributorPerformance itself, oracle-checked
    * (bot_ventas.py:48-57). customer→dim_clientes with every 5th
    * nation-key nulled so the 'Venta Directa' coalesce bucket is
    * actually exercised; nation→dim_distribuidores. */
  val q28: Q = Q(
    "q28_report_distributors",
    (s, d) => {
      val dimCli = Tables.customer(s, d).select(
        col("c_custkey").as("id_cliente"),
        when(col("c_nationkey") % 5 === 0, lit(null))
          .otherwise(col("c_nationkey")).as("id_distribuidor"))
      val dimDist = Tables.nation(s, d).select(
        col("n_nationkey").as("id_distribuidor"),
        col("n_name").as("nombre_distribuidor"))
      Report.distributorPerformance(ordersAsFact(s, d), dimCli, dimDist,
        LocalDate.parse("1997-06-15"))
        .select(col("nombre_distribuidor"),
          Dec.outD(col("total_prestamos")).as("total_prestamos"))
    },
    Some("""
      SELECT nombre_distribuidor,
        CAST(SUM(monto) AS DOUBLE) AS total_prestamos
      FROM (
        SELECT COALESCE(d.n_name, 'Venta Directa') AS nombre_distribuidor,
          CAST(f.o_totalprice AS DECIMAL(12,2)) AS monto
        FROM orders f
        LEFT JOIN customer c ON f.o_custkey = c.c_custkey
        LEFT JOIN nation d
          ON (CASE WHEN c.c_nationkey % 5 = 0 THEN NULL
                   ELSE c.c_nationkey END) = d.n_nationkey
        WHERE CAST(f.o_orderdate AS DATE) = DATE '1997-06-15') t
      GROUP BY nombre_distribuidor
      ORDER BY total_prestamos DESC, nombre_distribuidor
    """.stripMargin.trim))

  /** q29 — F1 try-cast-to-timestamp on DIRTY strings (transform.py:117
    * `errors='coerce'`; r2 verdict item 7): date-only strings parse to
    * midnight, datetime strings parse fully, junk coerces to null —
    * pinned against the oracle on all three shapes. The parsed value is
    * emitted as a formatted STRING: raw timestamp columns are compared
    * as epoch integers by the gate and Spark writes ns while DuckDB
    * writes µs — a unit mismatch, not a value one (verified locally). */
  val q29: Q = Q(
    "q29_trycast_timestamp",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey").as("id"),
          when(col("o_orderkey") % 3 === 0,
            concat(col("o_orderdate").cast("date").cast("string"),
              lit(" 12:34:56")))
            .when(col("o_orderkey") % 3 === 1,
              col("o_orderdate").cast("date").cast("string"))
            .otherwise(concat(lit("junk-"), col("o_orderstatus"))).as("raw"))
        .select(col("id"), col("raw"),
          date_format(expr("try_cast(raw AS TIMESTAMP)"),
            "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy(col("id")),
    Some("""
      SELECT id, raw, strftime(TRY_CAST(raw AS TIMESTAMP),
        '%Y-%m-%d %H:%M:%S') AS ts_str FROM (
        SELECT o_orderkey AS id,
          CASE WHEN o_orderkey % 3 = 0
                 THEN CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 12:34:56'
               WHEN o_orderkey % 3 = 1
                 THEN CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
               ELSE 'junk-' || o_orderstatus END AS raw
        FROM orders) t
      ORDER BY id
    """.stripMargin.trim))

  def all: Seq[Q] =
    Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15,
      q27, q28, q29)
}
