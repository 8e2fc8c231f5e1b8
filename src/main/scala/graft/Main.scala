package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.monotonically_increasing_id

import graft.engine.GraftSession
import graft.etl.{EtlJob, IncrementalSink, Report, VariosSplitter}
import graft.sources.{CsvSource, ExcelSource, JsonArraySource, Source, Xlsx}

/** The spark-submit-able entry point (SURVEY.md §3.3): one binary with
  * `etl` and `report` subcommands, mirroring the reference's two
  * scheduled processes (`python src/main.py` then `python
  * src/bot_ventas.py`, etl_pipeline.yml:30-50). Scheduling stays
  * external to the engine, exactly like the reference's cron.
  *
  * Source layout for `etl <srcDir> <warehouseDir>` — either the
  * reference's native modality, one workbook (preferred when present):
  *   workbook.xlsx       sheets Clientes / Transacciones (headered) and
  *                       Varios (headerless sentinel-split) —
  *                       extract.py:143-149's exact shape
  *   recomendados.json   one JSON array of records
  * or the pre-converted CSV layout:
  *   clientes.csv        headered (IDCLIENTE, fechaafiliacion, fechaprimertrx)
  *   transacciones.csv   headered, 7 columns consumed POSITIONALLY
  *   varios.csv          headerless 2-column stacked sheet (sentinel 'ID' rows)
  */
object Main {

  def main(args: Array[String]): Unit = args.toList match {
    case "etl" :: srcDir :: warehouse :: Nil => etl(srcDir, warehouse)
    case "report" :: warehouse :: cut :: Nil =>
      report(warehouse, LocalDate.parse(cut))
    case "compact" :: warehouse :: Nil => compact(warehouse)
    case _ =>
      System.err.println(
        "usage: graft.Main etl <srcDir> <warehouseDir> | report <warehouseDir> <cutDate> | compact <warehouseDir>")
      sys.exit(2)
  }

  /** The Varios sheet is KB-scale control data whose ROW ORDER is part
    * of its meaning (sentinel split) — read it on the driver, in file
    * order, like the reference's sheet reader (SURVEY §7.1 M3). The
    * 2-column split honors standard CSV quoting (a quoted field may
    * contain commas; `""` unescapes to `"`), matching what Spark's CSV
    * reader does for the other tables of the same format. */
  private def readVarios(path: String): Seq[VariosSplitter.RawRow] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val (a, rest) = csvField(line)
        val b = if (rest.startsWith(",")) csvField(rest.drop(1))._1 else ""
        def cell(s: String) = Option(s.trim).filter(_.nonEmpty)
        VariosSplitter.RawRow(cell(a), cell(b))
      }

  /** Consume one CSV field (quoted or bare) off the front of `s`;
    * returns (field value, remainder starting at the delimiter). */
  private[graft] def csvField(s: String): (String, String) =
    if (s.startsWith("\"")) {
      val sb = new StringBuilder
      var i = 1
      var done = false
      while (!done && i < s.length) {
        if (s(i) == '"') {
          if (i + 1 < s.length && s(i + 1) == '"') { sb += '"'; i += 2 }
          else { done = true; i += 1 }
        } else { sb += s(i); i += 1 }
      }
      (sb.result(), s.drop(i))
    } else {
      val cut = s.indexOf(',')
      if (cut < 0) (s, "") else (s.take(cut), s.drop(cut))
    }

  /** JSON records carry no explicit order column; the keep-first dedup
    * needs one (SURVEY §7.3). A single multiLine JSON array loads as
    * one partition, so monotonically_increasing_id IS the file order
    * here — valid only because of that single-partition property, which
    * matches the reference reading one small JSON doc. */
  private final case class OrderedJson(path: String) extends Source {
    def load(spark: org.apache.spark.sql.SparkSession) =
      JsonArraySource(path).load(spark)
        .withColumn("__ord", monotonically_increasing_id())
  }

  private def etl(srcDir: String, warehouse: String): Unit = {
    val spark = GraftSession.local()
    val workbook = s"$srcDir/workbook.xlsx"
    val (clientesSrc, trxSrc, variosRows) =
      if (Files.exists(Paths.get(workbook)))
        (ExcelSource(workbook, "Clientes"): Source,
          ExcelSource(workbook, "Transacciones"): Source,
          Xlsx.readSheet(workbook, "Varios")
            .map(r => VariosSplitter.RawRow( // sheets may be < 2 cols wide
              r.lift(0).flatten, r.lift(1).flatten)))
      else
        (CsvSource(s"$srcDir/clientes.csv"): Source,
          CsvSource(s"$srcDir/transacciones.csv"): Source,
          readVarios(s"$srcDir/varios.csv"))
    val sources = EtlJob.Sources(
      clientes = clientesSrc,
      transacciones = trxSrc,
      varios = variosRows,
      recomendados = OrderedJson(s"$srcDir/recomendados.json"),
      recomendadosOrderCol = "__ord")
    val accounting = EtlJob.run(spark, sources, new IncrementalSink(spark, warehouse))
    // per-table accounting like the reference's load logs (load.py:53-57)
    accounting.toSeq.sortBy(_._1).foreach { case (t, (ins, ign)) =>
      println(s"[etl] $t: inserted=$ins ignored=$ign")
    }
    spark.stop()
  }

  /** Maintenance pass: collapse each star table's accumulated daily
    * append-files (run periodically, like a VACUUM). */
  private def compact(warehouse: String): Unit = {
    val spark = GraftSession.local()
    val sink = new IncrementalSink(spark, warehouse)
    graft.etl.StarSchema.loadOrder.filter(sink.exists).foreach { t =>
      val (before, after) = sink.compact(t)
      println(s"[compact] $t: $before -> $after files")
    }
    spark.stop()
  }

  private def report(warehouse: String, cut: LocalDate): Unit = {
    val spark = GraftSession.local()
    val sink = new IncrementalSink(spark, warehouse)
    val fact = sink.read("fct_transacciones")
    val metricsRow = Report.metrics(fact, cut).collect().head
    val dist = Report.distributorPerformance(
      fact, sink.read("dim_clientes"), sink.read("dim_distribuidores"), cut)
      .collect().toSeq
    println(Report.formatMessage(metricsRow, dist, cut,
      dashboardUrl = "http://localhost/dashboard"))
    spark.stop()
  }
}
