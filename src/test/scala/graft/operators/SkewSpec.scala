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

  test("saltedCount ≡ plain groupBy count on skewed data") {
    val plain = big.groupBy("k").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(big, "k", salt = 8).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("IDENTICAL hot rows (degenerate content-hash case) stay correct") {
    // 500 byte-identical rows of the hot key spread over 8 partitions —
    // content hashing alone would collapse them to one salt; the
    // partition-id component still spreads them, and either way the
    // RESULTS must equal the unsalted plans exactly
    val hot = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.fill(500)(Row(1, 42)), 8),
      bigSchema)
    val plainJoin = hot.join(dim, Seq("k")).count()
    assert(Skew.saltedJoin(hot, dim, "k", salt = 8).count() == plainJoin)
    val counts = Skew.saltedCount(hot, "k", salt = 8).collect()
    assert(counts.map(r => r.getInt(0) -> r.getLong(1)).toMap == Map(1 -> 500L))
  }

  test("joinBlowupProfile: exact pair mass per shared key; NULL and " +
    "one-side-only keys absent; top-k ties break on the key") {
    val s = spark; import s.implicits._
    val left = Seq[java.lang.Long](1L, 1L, 1L, 2L, 2L, 3L, null)
      .toDF("k")
    val right = Seq[java.lang.Long](1L, 1L, 2L, 2L, 2L, 4L, null)
      .toDF("k")
    val all = Skew.joinBlowupProfile(left, right, "k", topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // k=1: 3·2 = 6; k=2: 2·3 = 6 (tie → key asc); 3 and 4 are
    // one-sided (emit nothing), NULLs never match
    assert(all.toSeq == Seq((1L, 3L, 2L, 6L), (2L, 2L, 3L, 6L)))
    // topK truncates after the sort
    val top1 = Skew.joinBlowupProfile(left, right, "k", topK = 1)
      .collect()
    assert(top1.length == 1 && top1(0).getLong(0) == 1L)
  }

  test("keySkewProfile: exact counts, shares, mean multiples and salt " +
    "fan-out against a hand-computed skewed frame; NULLs excluded") {
    val s = spark; import s.implicits._
    // 10 rows of key 1, 4 of key 2, 1 each of 3 and 4, one NULL:
    // total 16, n_keys 4, mean mass 4
    val rows = (Seq.fill(10)(1L) ++ Seq.fill(4)(2L) ++ Seq(3L, 4L))
      .map(java.lang.Long.valueOf) :+ null.asInstanceOf[java.lang.Long]
    val df = rows.toDF("k")
    val got = Skew.keySkewProfile(df, "k", topK = 3,
        targetRowsPerTask = 4L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1, 1L, 10L, 10.0 / 16, 10.0 * 4 / 16, 3L), // ceil(10/4)=3 salts
      (2, 2L, 4L, 4.0 / 16, 1.0, 1L),
      (3, 3L, 1L, 1.0 / 16, 0.25, 1L))) // tie with key 4 → key asc
  }
}
