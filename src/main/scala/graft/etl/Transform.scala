package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The business-rule transforms (SURVEY.md §2.2-2.6;
  * /root/reference/src/transform.py:8-134), as pure DataFrame =>
  * DataFrame functions — testable without I/O, lazy until a sink acts.
  *
  * Cast discipline (SURVEY §1.2): every "dirty" site uses try_cast +
  * not-null filter (the reference's errors='coerce' idiom); the one
  * strict site — the fact's id_tipo_trx — raises on null/junk like
  * pandas astype(int) does (transform.py:124).
  */
object Transform {

  /** Dim hygiene (SURVEY §2.2 P7/P8 + §2.6 F3: transform.py:61-64,
    * 120-122): drop null keys, keep numeric-parseable keys, cast to int.
    * A single try_cast + not-null filter is equivalent to the reference's
    * parse-check-then-cast pair. */
  def cleanDimKey(df: DataFrame, idCol: String): DataFrame =
    df.withColumn(idCol, expr(s"try_cast(`$idCol` AS INT)"))
      .where(col(idCol).isNotNull)

  /** Referential-integrity self-repair (SURVEY §2.3 J2 + §2.5 U1;
    * transform.py:57-76 — the reference's signature rule): fact keys
    * absent from the dim get synthesized dummy rows so FK loads never
    * fail. Orphans = distinct fact keys, not-null (the reference excludes
    * NaN explicitly), anti-joined against the dim. The dim side is small;
    * the distinct prunes the fact to its key column so only keys shuffle.
    */
  def riRepair(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, descCol: String,
      dummyLabel: String = "Tipo Desconocido (Sistema)"): DataFrame = {
    val orphans = fact.select(col(factKey).cast("int").as(dimKey))
      .where(col(dimKey).isNotNull)
      .distinct()
      .join(dim, Seq(dimKey), "left_anti")
      .select(col(dimKey), lit(dummyLabel).as(descCol))
    dim.select(col(dimKey), col(descCol)).unionByName(orphans)
  }

  /** Keep-first dedup with explicit order (SURVEY §2.4 A2;
    * drop_duplicates at transform.py:79 keeps the first row in file
    * order — Spark needs the order made explicit to be deterministic). */
  def dedupKeepFirst(df: DataFrame, key: String, orderCols: Seq[String])
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key))
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distributor dim (transform.py:78-80): project two columns of the
    * JSON source, dedup by key, rename. `fileOrderCol` makes keep-first
    * deterministic; pass the ingest-order column your source preserves. */
  def buildDimDistribuidores(recomendados: DataFrame, fileOrderCol: String)
      : DataFrame =
    dedupKeepFirst(
      recomendados.select(col("IDDISTRIBUIDOR"), col("`NOMBRE DISTRIBUIDOR`"),
        col(fileOrderCol)),
      "IDDISTRIBUIDOR", Seq(fileOrderCol))
      .select(
        col("IDDISTRIBUIDOR").cast("int").as("id_distribuidor"),
        col("`NOMBRE DISTRIBUIDOR`").as("nombre_distribuidor"))

  /** Client dim (SURVEY §2.3 J1; transform.py:82-106): rename the base,
    * left-join the JSON subset on differing key names, drop the duplicate
    * key, rename — duplicate IDCLIENTEs in the JSON multiply rows, which
    * is the reference's (preserved) behavior AT TRANSFORM LEVEL. The
    * accented `categoría` column is renamed to plain `categoria` here.
    * Dates are coerce-cast (transform.py:114-115).
    *
    * `dedupOrderCol` (the LOAD path's mode): the reference's DDL puts a
    * PRIMARY KEY on dim_clientes.id_cliente (ddl_tienda_pago_bi.sql:22),
    * so a blowup row reaching its `to_sql` append is rejected by
    * Postgres — the transform's multiply-rows behavior and the
    * warehouse's PK cannot BOTH survive contact with duplicate-key JSON.
    * When set (EtlJob passes the JSON ingest-order column), the blowup
    * collapses keep-FIRST in file order — the same drop_duplicates
    * convention the reference itself applies one table over
    * (transform.py:79) and the fix it would need. When None, the raw
    * join (with blowup) comes back for parity/inspection use.
    *
    * The collapse is only DEFINED for join multiplicity, where `ord`
    * (a unique JSON row index) totally orders the candidates. A
    * duplicate id in the BASE sheet has no such order — keep-first
    * would pick a shuffle-dependent survivor and silently bypass the
    * sink's PK rejection — so base duplicates FAIL the materialization
    * loudly instead (the reference's Postgres PK is the behavior being
    * preserved; its pipeline could never load such a sheet either). */
  def buildDimClientes(clientes: DataFrame, recomendados: DataFrame,
      dedupOrderCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base0 = clientes
      .withColumnRenamed("IDCLIENTE", "id_cliente")
      .withColumnRenamed("fechaafiliacion", "fecha_afiliacion")
      .withColumnRenamed("fechaprimertrx", "fecha_primera_trx")
    val base = dedupOrderCol match {
      case None => base0
      case Some(_) => // load path: base ids must be unique (see scaladoc)
        base0
          .withColumn("__bc",
            count(lit(1)).over(Window.partitionBy(col("id_cliente"))))
          .withColumn("id_cliente",
            when(col("__bc") > 1, expr(
              "assert_true(false, 'duplicate id_cliente in the Clientes sheet: the warehouse PK rejects this; fix the source')")
              .cast(base0.schema("id_cliente").dataType))
              .otherwise(col("id_cliente")))
          .drop("__bc")
    }
    val subset = recomendados.select(
      col("IDCLIENTE") +: col("IDDISTRIBUIDOR") +: col("TELEFONO") +:
        col("`categoría`") +: col("recomendados") +:
        dedupOrderCol.map(col).toSeq: _*)
    val joined = base
      .join(subset, base("id_cliente") === subset("IDCLIENTE"), "left")
      .drop("IDCLIENTE")
      .withColumnRenamed("IDDISTRIBUIDOR", "id_distribuidor")
      .withColumnRenamed("TELEFONO", "telefono")
      .withColumnRenamed("categoría", "categoria")
      .withColumn("fecha_afiliacion",
        expr("try_cast(fecha_afiliacion AS DATE)"))
      .withColumn("fecha_primera_trx",
        expr("try_cast(fecha_primera_trx AS DATE)"))
    dedupOrderCol match {
      case Some(ord) => dedupKeepFirst(joined, "id_cliente", Seq(ord)).drop(ord)
      case None => joined
    }
  }

  /** Fact build (SURVEY §2.2 P3 + §2.6 F1/F3; transform.py:108-124):
    * positional schema assignment (the toDF analog of `df.columns = ...`),
    * coerce-cast of the timestamp, strict non-null cast of id_tipo_trx —
    * null or junk there must FAIL the pipeline like pandas astype(int)
    * (transform.py:124), expressed distributedly with assert_true.
    *
    * `fecha_trx_date` is a PHYSICAL design column, not part of the
    * logical DDL (SURVEY §4): the fact is partitioned by transaction
    * date on write, so day-filtered report queries prune to one
    * partition directory instead of scanning history — the difference
    * between a day and 100 TB at scale. */
  def buildFact(transacciones: DataFrame): DataFrame =
    transacciones
      .toDF("id_cliente", "fecha_trx", "id_tipo_trx", "id_trx",
        "monto", "fee", "id_sede")
      .withColumn("fecha_trx", expr("try_cast(fecha_trx AS TIMESTAMP)"))
      .withColumn("id_tipo_trx",
        when(expr("try_cast(id_tipo_trx AS INT)").isNull,
          expr("assert_true(false, 'fct id_tipo_trx must be a non-null int')")
            .cast("int"))
          .otherwise(expr("try_cast(id_tipo_trx AS INT)")))
      .withColumn("id_cliente", expr("try_cast(id_cliente AS INT)"))
      .withColumn("id_trx", expr("try_cast(id_trx AS INT)"))
      .withColumn("id_sede", expr("try_cast(id_sede AS INT)"))
      .withColumn("monto", col("monto").cast(DecimalType(12, 2)))
      .withColumn("fee", col("fee").cast(DecimalType(12, 2)))
      .withColumn("fecha_trx_date", to_date(col("fecha_trx")))

  /** The full transform (transform.py:8-134): Varios has already been
    * split (VariosSplitter — ingest concern); everything else composes
    * the pure pieces above into the five star-schema tables. */
  def transformData(
      clientes: DataFrame,
      transaccionesRaw: DataFrame,
      sedesRaw: DataFrame,
      tiposRaw: DataFrame,
      recomendados: DataFrame,
      recomendadosOrderCol: String): Map[String, DataFrame] = {
    val fact = buildFact(transaccionesRaw)
    val tipos = riRepair(
      fact, "id_tipo_trx",
      cleanDimKey(tiposRaw, "id_tipo_trx"), "id_tipo_trx",
      "descripcion_tipo")
    val sedes = cleanDimKey(sedesRaw, "id_sede")
    Map(
      "dim_sedes" -> sedes,
      "dim_tipo_transaccion" -> tipos,
      "dim_distribuidores" ->
        buildDimDistribuidores(recomendados, recomendadosOrderCol),
      "dim_clientes" -> buildDimClientes(clientes, recomendados,
        dedupOrderCol = Some(recomendadosOrderCol)),
      "fct_transacciones" -> fact)
  }
}
