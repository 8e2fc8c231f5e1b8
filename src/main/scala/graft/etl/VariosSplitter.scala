package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Splits the "Varios" sheet — two stacked headerless 2-column tables
  * separated by sentinel rows whose first cell is 'ID' — into (sedes,
  * tipos) (SURVEY.md §2.2 P1/P2; /root/reference/src/transform.py:20-55).
  *
  * Design decision (SURVEY §7.1 M3): this is KB-scale *control* data with
  * row order as part of its meaning, so the split runs on the driver over
  * the ordered rows the sheet reader produced, then each slice becomes a
  * DataFrame. A distributed variant would need a stable file-order key
  * (zipWithIndex) for zero benefit at catalog scale.
  *
  * Branch semantics mirrored from the reference:
  *  - >= 2 sentinels: rows (0, cut) are sedes (skipping the leading
  *    sentinel), rows (cut, end] are tipos.
  *  - exactly 1 sentinel at row 0: everything after it is sedes; tipos is
  *    empty.
  *  - exactly 1 sentinel mid-file: rows [0, cut) are sedes, (cut, end] are
  *    tipos. (The reference forgets to rename columns in this branch and
  *    would crash downstream — transform.py:50-51; we assign the schema
  *    like every other branch instead of reproducing the crash.)
  *  - 0 sentinels: both tables empty.
  */
object VariosSplitter {

  final case class RawRow(c0: Option[String], c1: Option[String])

  private val Sentinel = "ID"

  def split(spark: SparkSession, rows: Seq[RawRow]): (DataFrame, DataFrame) = {
    val sentinelIdx = rows.zipWithIndex.collect {
      case (RawRow(Some(Sentinel), _), i) => i
    }
    val (sedesRows, tiposRows) = sentinelIdx match {
      case idx if idx.length > 1 =>
        val cut = idx(1)
        (rows.slice(1, cut), rows.drop(cut + 1))
      case Seq(0) =>
        (rows.drop(1), Seq.empty[RawRow])
      case Seq(cut) =>
        (rows.take(cut), rows.drop(cut + 1))
      case _ =>
        (Seq.empty[RawRow], Seq.empty[RawRow])
    }
    (toDf(spark, sedesRows, "id_sede", "nombre_sede"),
      toDf(spark, tiposRows, "id_tipo_trx", "descripcion_tipo"))
  }

  private def toDf(spark: SparkSession, rows: Seq[RawRow],
      idCol: String, nameCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField(idCol, StringType), StructField(nameCol, StringType)))
    val data = rows.map(r => Row(r.c0.orNull, r.c1.orNull))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
  }
}
