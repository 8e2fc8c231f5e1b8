package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.{Dec, Tables}

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

  def all: Seq[Q] = Seq(q1, q9)
}
