package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Source

/** The pipeline orchestrator (SURVEY.md §3.1;
  * /root/reference/src/main.py:28-98): extract the four sources,
  * transform into the five star tables, load FK-ordered and
  * insert-if-absent. All-or-nothing extraction (the reference aborts if
  * any source is missing, extract.py:155-157) maps to the sources Map
  * being total; transform failures propagate (main.py:96-98 exits
  * non-zero).
  */
object EtlJob {

  final case class Sources(
      clientes: Source,
      transacciones: Source,
      varios: Seq[VariosSplitter.RawRow],
      recomendados: Source,
      /** column of `recomendados` that carries ingest order (keep-first
        * dedup determinism — SURVEY §7.3) */
      recomendadosOrderCol: String)

  /** Extract + transform: returns the five lazy star tables. */
  def build(spark: SparkSession, src: Sources): Map[String, DataFrame] = {
    val (sedesRaw, tiposRaw) = VariosSplitter.split(spark, src.varios)
    Transform.transformData(
      clientes = src.clientes.load(spark),
      transaccionesRaw = src.transacciones.load(spark),
      sedesRaw = sedesRaw,
      tiposRaw = tiposRaw,
      recomendados = src.recomendados.load(spark),
      recomendadosOrderCol = src.recomendadosOrderCol)
  }

  /** Full run: extract, transform, FK-ordered incremental load.
    * Returns per-table (inserted, ignored) accounting. */
  def run(spark: SparkSession, src: Sources, sink: IncrementalSink)
      : Map[String, (Long, Long)] =
    sink.loadStar(build(spark, src))
}
