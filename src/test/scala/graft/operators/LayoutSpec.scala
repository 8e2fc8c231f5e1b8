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

  test("maintainZOrdered: append-then-maintain == one-shot on the " +
    "union (tree AND manifest); only touched spans rewritten") {
    import org.apache.spark.sql.functions.{count, max, min}
    val src = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .where(col("l_partkey").isNotNull && col("l_suppkey").isNotNull)
    val base = src.where(col("l_orderkey") % 5 =!= 0)
    val extra = src.where(col("l_orderkey") % 5 === 0)
    // the equivalence contract needs the append INSIDE the original
    // bounds — assert the fixture satisfies it (else the test is vacuous)
    def bounds(df: org.apache.spark.sql.DataFrame) = df
      .agg(min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey")))
      .collect()(0).toSeq
    assert(bounds(base) == bounds(src), "fixture split must preserve bounds")
    val dirInc = java.nio.file.Files
      .createTempDirectory("graft_zmaint").toString + "/z"
    val dirOne = java.nio.file.Files
      .createTempDirectory("graft_zone").toString + "/z"
    Layout.writeZOrdered(base, "l_partkey", "l_suppkey", dirInc,
      bits = 3, files = 8)
    val preManifest = spark.read.parquet(s"$dirInc/_manifest")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val (nTouched, nNew) = Layout.maintainZOrdered(extra,
      "l_partkey", "l_suppkey", dirInc)
    assert(nNew == extra.count())
    assert(nTouched >= 1 && nTouched <= 8)
    Layout.writeZOrdered(src, "l_partkey", "l_suppkey", dirOne,
      bits = 3, files = 8)
    // tree contents equal as multisets (ordering within files differs)
    def treeRows(dir: String) = spark.read.parquet(dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("z"),
        col("file_id").cast("long"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(treeRows(dirInc) == treeRows(dirOne))
    // manifests identical
    def man(dir: String) = spark.read.parquet(s"$dir/_manifest")
      .collect().map(_.toSeq).toSet
    assert(man(dirInc) == man(dirOne))
    // every manifest row that CHANGED must belong to a span the
    // append actually touched — untouched spans carry over verbatim
    val postManifest = spark.read.parquet(s"$dirInc/_manifest")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val differing = postManifest.filter { case (id, row) =>
      preManifest.get(id).exists(_ != row) || !preManifest.contains(id)
    }.keySet
    val extraZ = spark.read.parquet(dirOne)
      .withColumn("fid", col("file_id").cast("long"))
    val touchedByData = extra
      .join(extraZ, Seq("l_orderkey", "l_linenumber"))
      .select(col("fid")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(differing.subsetOf(touchedByData),
      s"manifest changed outside touched spans: $differing vs $touchedByData")
    // one-file discipline survives maintenance
    val f0 = new java.io.File(s"$dirInc/file_id=0")
    if (f0.isDirectory)
      assert(f0.listFiles().count(_.getName.endsWith(".parquet")) == 1)
  }

  test("maintainZOrdered: out-of-bounds appends clamp to edge cells " +
    "and widen the edge zone map truthfully") {
    val s2 = spark; import s2.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zclamp").toString + "/z"
    val base = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (x, y)).toDF("x", "y")
    Layout.writeZOrdered(base, "x", "y", dir, bits = 2, files = 4)
    val beyond = Seq((99L, 99L)).toDF("x", "y")
    val (t, n) = Layout.maintainZOrdered(beyond, "x", "y", dir)
    assert(t == 1L && n == 1L)
    // the row landed in the LAST file span (max cell, max z)
    val m = spark.read.parquet(s"$dir/_manifest")
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(6))))
      .toMap // file_id -> (max_x?, ...) positions: (n_rows,min_z,max_z,min_x,max_x,min_y,max_y)
    val maxFile = m.keys.max
    val manMax = spark.read.parquet(s"$dir/_manifest")
      .where(col("file_id") === maxFile)
      .select(col("max_x"), col("max_y")).collect()(0)
    assert(manMax.getLong(0) == 99L && manMax.getLong(1) == 99L)
    // reads still see every row
    assert(spark.read.parquet(dir).count() == 16 * 16 + 1)
  }

  test("manifest persists the grid parameters; maintenance recovers " +
    "them (non-default grid) and refuses a tree without them") {
    val s2 = spark; import s2.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zgrid").toString + "/z"
    val base = (for (x <- 0L until 8L; y <- 0L until 8L)
      yield (x, y)).toDF("x", "y")
    Layout.writeZOrdered(base, "x", "y", dir, bits = 3, files = 8)
    val man = spark.read.parquet(s"$dir/_manifest")
    val grids = man.select(col("grid_bits"), col("grid_files"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(grids.toSeq == Seq((3L, 8L)))
    // maintenance under the manifest grid: the appended row's file_id
    // must come from the 3-bit/8-file split, not any caller default
    val (t, n) = Layout.maintainZOrdered(
      Seq((7L, 7L)).toDF("x", "y"), "x", "y", dir)
    assert(t == 1L && n == 1L)
    assert(spark.read.parquet(dir)
      .select(col("file_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).forall(_ < 8L))
    // a pre-grid-column tree is rejected, not silently re-gridded
    val legacy = java.nio.file.Files
      .createTempDirectory("graft_zleg").toString + "/z"
    Layout.writeZOrdered(base, "x", "y", legacy, bits = 2, files = 4)
    spark.read.parquet(s"$legacy/_manifest")
      .drop("grid_bits", "grid_files")
      .localCheckpoint(true)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$legacy/_manifest")
    val e = intercept[IllegalArgumentException] {
      Layout.maintainZOrdered(Seq((1L, 1L)).toDF("x", "y"),
        "x", "y", legacy)
    }
    assert(e.getMessage.contains("grid parameters"))
  }
}
