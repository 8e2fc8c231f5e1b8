package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Salting must be a pure physical rewrite: identical results to the
  * unsalted plan on skewed data (one key owning most rows).
  */
class SkewSpec extends SparkSpec {

  private val bigSchema = StructType(Seq(
    StructField("k", IntegerType), StructField("payload", IntegerType)))
  private val dimSchema = StructType(Seq(
    StructField("k", IntegerType), StructField("name", StringType)))

  // hot key 1 owns 90% of the rows; keys 2-11 share the rest
  private lazy val big = spark.createDataFrame(
    spark.sparkContext.parallelize(
      (1 to 900).map(i => Row(1, i)) ++ (1 to 100).map(i => Row(2 + i % 10, i)),
      8), bigSchema)
  private lazy val dim = spark.createDataFrame(
    spark.sparkContext.parallelize((1 to 11).map(i => Row(i, s"n$i")), 2),
    dimSchema)

  test("saltedJoin ≡ plain inner join on skewed data") {
    val plain = big.join(dim, Seq("k"))
      .select("k", "payload", "name").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8)
      .select("k", "payload", "name").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 1000)
  }

  test("saltedCount ≡ plain groupBy count, and the hot key spreads over salts") {
    val plain = big.groupBy("k").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(big, "k", salt = 8).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // the point of the exercise: the hot key's rows really do land in
    // multiple salt buckets (content-hash salting is not degenerate)
    val saltsUsed = big.where(col("k") === 1)
      .withColumn("__salt",
        pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8L)))
      .select("__salt").distinct().count()
    assert(saltsUsed > 1)
  }
}
