package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression for the similarity stack (SURVEY.md §2.11):
  * per-dimension int8 scalar quantization — the standard first rung of
  * vector-index compression (4× smaller than float32 before any PQ),
  * what a 100 TB embedding store does before building IVF/LSH
  * structures over it.
  *
  * Scale shape: the per-dimension min/max is a partial-aggregable
  * groupBy over the position-exploded frame (map-side combine reduces
  * it to dims·partitions rows before the exchange); the dims-row stats
  * frame is then BROADCAST back onto the exploded frame, so the
  * N·dims code computation itself never shuffles. No window, no
  * driver-side data beyond the dims-row stats.
  *
  * Engine-exactness: codes and reconstruction errors are pure IEEE
  * field ops with pinned parenthesization (`((x-mn)*255)/(mx-mn)`,
  * then `mn + (code*(mx-mn))/255`), `least(…, 255)` guards the
  * rounding-up edge at `x = mx`, and the squared error is floored to
  * a 2^-20-grid long — so the DuckDB oracle replays every row
  * bit-for-bit. Output is the long (vec_id, pos, code, err_fp) form:
  * the verification surface; a production sink would re-pack codes
  * into a binary column row-locally.
  */
object Quantize {

  /** Int8 codes + fixed-point squared reconstruction error per
    * (vector, dimension). Constant dimensions (mx == mn) code to 0
    * with reconstruction = mn, so err_fp = 0. */
  def int8Codes(embeddings: DataFrame): DataFrame = {
    val x = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("pos"), col("xf").cast("double").as("x"))
    val st = x.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    x.join(broadcast(st), Seq("pos"))
      .withColumn("code",
        when(col("mx") > col("mn"),
          least(floor(((col("x") - col("mn")) * lit(255.0)) /
            (col("mx") - col("mn"))), lit(255.0)))
          .otherwise(lit(0.0)).cast("int"))
      .withColumn("recon",
        col("mn") + (col("code").cast("double") * (col("mx") - col("mn")))
          / lit(255.0))
      .withColumn("err_fp",
        floor(((col("x") - col("recon")) * (col("x") - col("recon")))
          * lit(1048576.0)).cast("long"))
      .select(col("vec_id"), col("pos"), col("code"), col("err_fp"))
      .orderBy(col("vec_id"), col("pos"))
  }
}
