package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Decimal-typed money arithmetic (SURVEY.md §1.2).
  *
  * The reference's serving layer stores money as DECIMAL(12,2)
  * (/root/reference/sql/ddl_tienda_pago_bi.sql:44-45) so `SUM(monto)` is
  * exact. We carry the same invariant: cast raw doubles to DECIMAL(12,2)
  * once at the scan boundary, do all arithmetic in decimal (exact,
  * order-independent — safe under Spark's partial aggregation), and never
  * round after that. This is also what makes results hash-comparable with
  * a DuckDB oracle: double SUMs are order-dependent in the last ulp;
  * decimal SUMs are not.
  */
object Dec {
  /** Raw double -> money: DECIMAL(12,2). */
  def d2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Final output boundary: decimal -> double. Both Spark
    * (BigDecimal.doubleValue) and DuckDB (CAST(dec AS DOUBLE)) produce the
    * correctly-rounded nearest double (verified exhaustively on sf0.1), so
    * emitting DOUBLE keeps results bit-identical across engines while the
    * arithmetic underneath stays exact decimal.
    */
  def outD(c: Column): Column = c.cast("double")
}
