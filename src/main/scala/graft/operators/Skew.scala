package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md intro: "salting for skew").
  *
  * The FIRST line of defense at scale is AQE's runtime skew-join
  * splitting (`spark.sql.adaptive.enabled`, on in GraftSession) — it
  * needs no code and no salt-factor tuning. Manual salting is for the
  * cases AQE cannot fix: a skewed AGGREGATION key, a broadcast-ineligible
  * dim against a hot key, or engines/stages where AQE is off. Keeping it
  * here as a tested operator documents the pattern the 100 TB plan
  * reaches for when one reducer owns half the shuffle.
  */
object Skew {

  /** Deterministic salt for a row: content hash + the input partition
    * id. The partition id matters for the degenerate case content
    * hashing alone can't spread — a hot key whose rows are IDENTICAL
    * (repeated events, denormalized dims): those rows span many input
    * partitions, so the partition id still fans them out. Identical
    * rows within ONE input partition remain a single salt — that
    * residual case needs a row_number, which costs the very shuffle
    * salting tries to avoid; documented limit, not fixed. Both inputs
    * are stable under task retry (same partition ⇒ same id), unlike
    * rand(), whose per-retry drift corrupts shuffle replay. */
  private def saltCol(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(
      (spark_partition_id().cast("long") +:
        df.columns.map(col).toIndexedSeq): _*), lit(salt.toLong))

  /** Inner equi-join with the big side salted into `salt` sub-keys and
    * the small side replicated `salt` ways; hot keys spread across
    * `salt` reducers at the cost of a `salt`× blowup of the SMALL side
    * only. Result set is exactly the unsalted join's (SkewSpec pins
    * it — salt values never affect CONTENT, only distribution). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt=$salt must be positive")
    val bigS = big.withColumn("__salt", saltCol(big, salt))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skewed aggregation: count per (key, salt) first (spreads
    * a hot key over `salt` reducers with map-side partials), then merge
    * the per-salt partials. Equivalent to groupBy(key).count. */
  def saltedCount(df: DataFrame, key: String, salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt=$salt must be positive")
    df.withColumn("__salt", saltCol(df, salt))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
  }
}
