package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/mixing: keep a per-stratum fraction of
  * documents chosen by a portable affine hash of the id — NOT `rand()`.
  * Reproducibility is the point: the same mixture comes out on every
  * run, every engine, every retry of a failed task (rand() breaks all
  * three), and the sample is consistent under incremental reprocessing
  * (a doc's fate never changes as the corpus grows). Row-local filter:
  * no shuffle, prunes at the scan when the stratum column is a
  * partition key.
  */
object Sampling {

  private val P = 1000000007L

  /** Hash bucket 0-99 for an integral id column — the affine fold
    * family TextHash uses, mirrored exactly by the oracle. */
  def pctBucket(idCol: Column): Column =
    ((idCol % P) * lit(2654435761L) % P + lit(12345L)) % P % 100

  /** Keep rows whose bucket falls under their stratum's percentage.
    * `pctByStratum` maps stratum value → keep-percent (0-100);
    * unlisted strata get `defaultPct`. */
  def stratifiedByHash(df: DataFrame, idCol: String, stratumCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.where(pctBucket(col(idCol)) < pct)
  }
}
