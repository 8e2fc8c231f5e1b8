package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reporting path (SURVEY.md §2.4 A3/A4, §3.2;
  * /root/reference/src/bot_ventas.py) — the reference's only true query
  * workload, which it outsources to Postgres as SQL text. Here the two
  * queries are Catalyst plans over the star tables; the tiny aggregate
  * results are collected on the driver and formatted. The HTTP fan-out
  * (S7) is an I/O adapter outside the engine: callers take the formatted
  * string wherever it goes (stdout locally).
  */
object Report {

  /** Prepend a filter on the fact's PARTITION column (`fecha_trx_date`,
    * Transform.buildFact) when the frame carries it — this is what
    * turns the queries' date predicates into partition pruning (only
    * the matching date directories are listed, let alone read). The
    * predicate is a strict superset of the timestamp conditions that
    * follow (fecha_trx_date = to_date(fecha_trx)), so results are
    * unchanged; facts without the physical column (e.g. ad-hoc frames)
    * skip it. */
  private def pruneDates(fact: DataFrame, from: LocalDate, to: LocalDate)
      : DataFrame =
    if (fact.columns.contains("fecha_trx_date"))
      fact.where(col("fecha_trx_date") >= lit(from.toString).cast("date")
        && col("fecha_trx_date") <= lit(to.toString).cast("date"))
    else fact

  /** Daily vs month-to-date metrics (bot_ventas.py:39-45):
    * SUM(CASE WHEN fecha_trx::date = cut THEN monto ELSE 0 END) and
    * SUM(monto) over [first-of-month, cut]. Fully partial-aggregable,
    * single output row.
    *
    * Boundary parity (deliberate): the upper bound compares the raw
    * TIMESTAMP against the cut date, which promotes to midnight — rows
    * later on the cut day are excluded, exactly like the reference's
    * `fecha_trx <= '2025-06-14'` in Postgres (bot_ventas.py:44). The
    * reference's fact timestamps come from date-like Excel cells and
    * are always midnight, so its `diaria` works; ours behaves
    * identically on the same data. Preserved, not "fixed". */
  def metrics(fact: DataFrame, cut: LocalDate): DataFrame = {
    val cutLit = lit(cut.toString).cast("date")
    val monthStart = lit(cut.withDayOfMonth(1).toString).cast("date")
    pruneDates(fact, cut.withDayOfMonth(1), cut)
      .where(col("fecha_trx") >= monthStart && col("fecha_trx") <= cutLit)
      .agg(
        sum(when(col("fecha_trx").cast("date") === cutLit, col("monto"))
          .otherwise(lit(0))).as("diaria"),
        sum(col("monto")).as("acumulado_mes"))
  }

  /** Distributor performance (bot_ventas.py:48-57): fact ⟕ clients ⟕
    * distributors, COALESCE null-bucket to 'Venta Directa', grouped SUM,
    * ORDER DESC (name tiebreak added for deterministic output).
    *
    * Broadcast discipline (r2 verdict item 6): only the BOUNDED dim
    * (`dim_distribuidores`, a curated catalog) carries a broadcast
    * hint. `dim_clientes` grows with the customer base — an unbounded
    * table must never be force-broadcast (it OOMs at 100× scale); the
    * optimizer/AQE picks broadcast vs shuffle for it from measured
    * size. Only the cut day's fact slice is scanned (partition pruning
    * when the fact is date-partitioned). */
  def distributorPerformance(fact: DataFrame, dimClientes: DataFrame,
      dimDistribuidores: DataFrame, cut: LocalDate): DataFrame =
    pruneDates(fact, cut, cut)
      .where(col("fecha_trx").cast("date") === lit(cut.toString).cast("date"))
      .join(dimClientes.select(col("id_cliente"), col("id_distribuidor")),
        Seq("id_cliente"), "left")
      .join(broadcast(dimDistribuidores), Seq("id_distribuidor"), "left")
      .groupBy(coalesce(col("nombre_distribuidor"), lit("Venta Directa"))
        .as("nombre_distribuidor"))
      .agg(sum(col("monto")).as("total_prestamos"))
      .orderBy(col("total_prestamos").desc, col("nombre_distribuidor"))

  private val mesesEs = Map(
    1 -> "ENE", 2 -> "FEB", 3 -> "MAR", 4 -> "ABR",
    5 -> "MAY", 6 -> "JUN", 7 -> "JUL", 8 -> "AGO",
    9 -> "SEP", 10 -> "OCT", 11 -> "NOV", 12 -> "DIC")

  private def money(x: java.math.BigDecimal): String =
    "$" + String.format(java.util.Locale.US, "%,.2f", x)

  /** Driver-side presentation (SURVEY §2.6 F8/F9; bot_ventas.py:74-107):
    * Spanish month abbreviation, `$x,xxx.xx` money format, one line per
    * distributor. Runs post-collect over the tiny aggregates. */
  def formatMessage(metricsRow: org.apache.spark.sql.Row,
      distribuidores: Seq[org.apache.spark.sql.Row],
      cut: LocalDate, dashboardUrl: Option[String] = None): String = {
    val fecha = s"${cut.getDayOfMonth} ${mesesEs(cut.getMonthValue)}, ${cut.getYear}"
    val zero = java.math.BigDecimal.ZERO
    def dec(r: org.apache.spark.sql.Row, i: Int): java.math.BigDecimal =
      if (r.isNullAt(i)) zero else r.getDecimal(i)
    val sb = new StringBuilder
    sb ++= "REPORTE DE COLOCACIÓN - PRÉSTAMOS\n"
    sb ++= s"FECHA DE CORTE: $fecha\n"
    sb ++= "=" * 30 + "\n\n"
    sb ++= s"PRÉSTAMOS DEL DÍA: ${money(dec(metricsRow, 0))}\n"
    sb ++= s"ACUMULADO MENSUAL: ${money(dec(metricsRow, 1))}\n\n"
    sb ++= "RENDIMIENTO POR DISTRIBUIDORA:\n"
    distribuidores.foreach { d =>
      sb ++= s"- ${d.getString(0)}: ${money(dec(d, 1))}\n"
    }
    // Dashboard footer (bot_ventas.py:89,104-106): the reference appends
    // a hardcoded Looker link; here the URL is deployment config — the
    // line renders only when one is configured (hardcoding an external
    // URL into an engine would be both a leak and a lie).
    dashboardUrl.foreach { url =>
      sb ++= s"\nANÁLISIS DETALLADO:\n[CONSULTAR DASHBOARD COMPLETO]($url)\n"
    }
    sb.result()
  }
}
