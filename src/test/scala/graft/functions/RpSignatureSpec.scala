package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the single-pass [[RpSignature]] against the per-plane
  * higher-order fold it replaces — the formulation the DuckDB oracle
  * replays — bit for bit, plus the fold's null semantics.
  */
class RpSignatureSpec extends SparkSpec {

  /** Reference: plane j's bit as an independent left fold (mirrors the
    * q30 oracle SQL). */
  private def refBit(j: Int): Column = {
    val base = j * 8192L
    (expr(s"""
      aggregate(
        zip_with(a,
          transform(sequence(0, size(a) - 1),
            i -> cast(1 - 2 * (((1000003L * (${base}L + i) + 12345L)
                 % 1000000007L) & 1L) as double)),
          (x, s) -> x * s),
        0D, (acc, p) -> acc + p)""") > 0).cast("long")
  }

  private def refSig(planes: Int): Column =
    (0 until planes).map(j => refBit(j) * lit(1L << j)).reduce(_ + _)

  private val rng = new scala.util.Random(7)
  private def df(rows: Seq[Seq[Any]]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows.map(Row(_)), 2),
    StructType(Seq(StructField("a", ArrayType(FloatType, containsNull = true)))))

  test("single-pass signature ≡ 16 independent plane folds, bit for bit") {
    // empty arrays are OUT of contract: `sequence(0, size-1)` counts
    // DOWN for size 0, nulling the HOF reference — and the operator
    // filters zero-norm (hence empty) vectors before signatures anyway
    val rows: Seq[Seq[Any]] =
      Seq.fill(60)(Seq.fill(64)(rng.nextFloat() * 2f - 1f): Seq[Any]) ++
        Seq(Seq(0.5f), Seq(-0.5f, 0.25f))
    val out = df(rows).select(
      VectorOps.rpSignature(col("a"), 16).as("fast"), refSig(16).as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null array and null element yield null, like the fold") {
    val rows: Seq[Seq[Any]] = Seq(null, Seq(1f, null, 2f), Seq(1f, 2f))
    val out = df(rows).select(
      VectorOps.rpSignature(col("a"), 16).as("fast"), refSig(16).as("ref"))
      .collect()
    assert(out.map(_.isNullAt(0)).toSeq == Seq(true, true, false))
    out.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1)))
  }

  test("interpreted (NO_CODEGEN) path matches codegen") {
    val rows: Seq[Seq[Any]] =
      Seq.fill(10)(Seq.fill(32)(rng.nextFloat()): Seq[Any])
    val viaCodegen = df(rows)
      .select(VectorOps.rpSignature(col("a"), 12)).collect().map(_.getLong(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df(rows)
        .select(VectorOps.rpSignature(col("a"), 12)).collect()
        .map(_.getLong(0))
      assert(viaCodegen.toSeq == interp.toSeq)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
