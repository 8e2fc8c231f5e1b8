package graft.etl

import org.apache.spark.sql.{Row, SparkSession}

import graft.etl.VariosSplitter.RawRow
import graft.sources.{InlineRowsSource, Source}
import graft.etl.StarSchema.{rawClientes, rawRecomendados}

/** The reference-shaped dirty fixture (FIXTURES.md §A): every hazard the
  * transform must survive — unparseable dates, junk/non-numeric keys,
  * an orphan type-id (RI repair), duplicate JSON client rows (join
  * blowup parity), duplicate distributor ids (keep-first dedup), and a
  * Varios sheet with junk rows. Golden expectations live in the specs.
  */
object EtlFixture {

  /** FIXTURES §A4 + explicit file-order column `ord` (keep-first
    * determinism; pandas gets this implicitly from file order). */
  val recomendadosSchema =
    rawRecomendados.add("ord", org.apache.spark.sql.types.IntegerType)

  val recomendadosRows: Seq[Row] = Seq(
    Row(1, 10, "Distribuidora Norte", 5551001L, "A", 3, 0),
    Row(2, 20, "Distribuidora Sur", 5551002L, "B", 1, 1),
    // duplicate IDCLIENTE=2 → dim_clientes join blowup (preserved hazard);
    // duplicate IDDISTRIBUIDOR=20 → keep-first keeps "Distribuidora Sur"
    Row(2, 20, "Distribuidora Sur BIS", 5551003L, "B", 2, 2),
    // client 9 absent from Clientes (left-join keeps base rows only)
    Row(9, 30, "Distribuidora Este", 5551004L, "C", 0, 3))

  val clientesRows: Seq[Row] = Seq(
    Row(1, "2024-01-10", "2024-02-01"),
    Row(2, "2024-02-15", "not-a-date"), // F2 coerce → null
    Row(3, null, "2024-03-05"),
    Row(4, "junk", "2024-04-01"),       // F2 coerce → null
    Row(5, "2024-05-20", "2024-05-25"))

  /** 7 positional string columns (FIXTURES §A2). Dates are date-only
    * like the reference's Excel cells (midnight timestamps). */
  val transaccionesRows: Seq[Row] = Seq(
    Row("1", "2025-06-10", "100", "1001", "1500.50", "15.00", "1"),
    Row("2", "2025-06-14", "101", "1002", "2000.00", "20.00", "2"),
    Row("2", "junk-date", "101", "1003", "300.25", "3.00", "1"), // F1 → null
    // orphan tipo 99 → RI repair synthesizes the dummy dim row BEFORE
    // load — which is exactly why the reference repairs tipos: the
    // warehouse FK would reject the fact otherwise. Sedes get no such
    // repair (reference parity), so the sede here must be real: the
    // sink's FK check (REFERENCES analog) rejects orphan sedes, as the
    // reference's Postgres would (IncrementalSinkSpec covers that).
    Row("5", "2025-06-14", "99", "1004", "750.00", "7.50", "1"),
    Row("x", "2025-06-16", "100", "1005", "100.00", "1.00", "2")) // junk id_cliente → null

  val variosRows: Seq[RawRow] = Seq(
    RawRow(Some("ID"), Some("NOMBRE")),
    RawRow(Some("1"), Some("Sede Centro")),
    RawRow(Some("2"), Some("Sede Norte")),
    RawRow(Some("abc"), Some("Sede Junk")), // non-numeric key → filtered
    RawRow(None, Some("Sede Null")),        // null key → filtered
    RawRow(Some("ID"), Some("DESCRIPCION")),
    RawRow(Some("100"), Some("Prestamo")),
    RawRow(Some("101"), Some("Pago")))

  private def inline(spark: SparkSession, rows: Seq[Row],
      schema: org.apache.spark.sql.types.StructType): Source =
    InlineRowsSource(rows, schema)

  def sources(spark: SparkSession): EtlJob.Sources = EtlJob.Sources(
    clientes = inline(spark, clientesRows, rawClientes),
    transacciones = inline(spark, transaccionesRows,
      StarSchema.rawTransacciones),
    varios = variosRows,
    recomendados = inline(spark, recomendadosRows, recomendadosSchema),
    recomendadosOrderCol = "ord")
}
