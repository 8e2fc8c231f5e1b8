package graft.operators

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

/** Morton z-order layout semantics (the q233 operator). */
class LayoutSpec extends SparkSpec {

  test("interleaveBits: hand-computed Morton codes (x even bits, " +
    "y odd bits)") {
    val s = spark; import s.implicits._
    // (cx, cy) -> z at 2 bits: z = x0 + 2*y0 + 4*x1 + 8*y1
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L), (2L, 1L, 6L))
    val df = cases.toDF("cx", "cy", "want")
    val got = df.select(col("want"),
      Layout.interleaveBits(col("cx"), col("cy"), 2).as("z")).collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(0), r))
  }

  test("zOrderManifest: data-anchored grid, exact cell edges, NULLs " +
    "drop, per-cell bounding boxes") {
    val s = spark; import s.implicits._
    // x,y in [0, 7], bits=1 -> 2x2 grid, cell edge at (v*2) div 8 = 1
    // when v >= 4. Cells: (0,0)->z0, (1,0)->z1, (0,1)->z2, (1,1)->z3
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (0L, 0L), (3L, 3L),   // z0
      (7L, 0L),             // z1
      (0L, 4L),             // z2
      (4L, 7L), (7L, 4L),   // z3
      (null, 1L), (1L, null))
      .toDF("x", "y")
    val out = Layout.zOrderManifest(df, "x", "y", bits = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      0L -> ((2L, 0L, 3L, 0L, 3L)),
      1L -> ((1L, 7L, 7L, 0L, 0L)),
      2L -> ((1L, 0L, 0L, 4L, 4L)),
      3L -> ((2L, 4L, 7L, 4L, 7L))))
  }

  test("zOrderManifest: z-contiguity bounds both dimensions — the " +
    "first half of the curve never touches the upper y half") {
    val s = spark; import s.implicits._
    // bits=2 over a full 16x16 integer grid: z in [0, 7] covers
    // exactly cy in {0, 1} (y < 8) whatever x is — the skip guarantee
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val out = Layout.zOrderManifest(pts.toDF("x", "y"), "x", "y",
      bits = 2).collect()
    assert(out.length == 16 && out.map(_.getLong(1)).forall(_ == 16L))
    out.filter(_.getLong(0) < 8).foreach(r =>
      assert(r.getLong(5) <= 7L, r)) // max_y in the low-y half
    val half = out.filter(_.getLong(0) < 8)
    assert(half.length == 8)
  }
}
