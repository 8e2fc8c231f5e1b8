package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT planning — the write-side companion to
  * partition pruning: a table range-partitioned on ONE column skips
  * files for predicates on that column only, while a 100 TB fact
  * queried on TWO keys (part AND supplier, user AND day) needs its
  * file-level min/max zones tight in BOTH. The standard answer
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`, the Hudi/ClickHouse space-
  * filling-curve layouts) is to sort by the Morton Z-VALUE — the
  * bit-interleave of the dimensions' grid cells — so rows close on the
  * curve are close in EVERY dimension and each written file's
  * bounding box stays small.
  *
  * This module computes the curve and its MANIFEST declaratively:
  * [[zOrderManifest]] reports, per z-cell, the row count and the
  * per-dimension min/max bounding box — the parquet-footer zone map a
  * z-ordered write WOULD produce, readable as "what fraction of files
  * does a 2-D predicate skip". Pair with `repartitionByRange(zCol)` +
  * the [[Packing.writeShards]] one-file discipline for the actual
  * write.
  *
  * Engine-exact: the grid is anchored to the data's own integer
  * min/max (ONE-ROW broadcast scalar-append, the q84 shape) and the
  * cell is the exact rational `((v − min) · G) div (max − min + 1)` —
  * integer division, boundary cannot flip between engines; the
  * interleave is pure bit arithmetic. No doubles anywhere.
  *
  * Scale shape: bounds are one partial-aggregated fold; cell and
  * z-value assignment are row-local; the manifest is one fold to
  * ≤ G² keys. The corpus is scanned once and never shuffled by more
  * than the final small-key aggregate.
  */
object Layout {

  /** Morton interleave of two `bits`-bit cell ids: x occupies the even
    * bit positions, y the odd. Pure bit arithmetic on longs. */
  def interleaveBits(cx: Column, cy: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits=$bits out of [1, 16]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(cx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(cy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }
  }

  /** Per-z-cell layout manifest over two INTEGER dimensions: (z,
    * n_rows, min/max of each dimension) for a 2^bits × 2^bits grid
    * anchored at the data's own bounds, ordered by z. A z-contiguous
    * file span's bounding box is the union of its cells' boxes — the
    * number a 2-D predicate's file-skip rate is read from. NULL
    * dimension values have no cell and drop out (a real layout sorts
    * them into a dedicated NULL file). */
  def zOrderManifest(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 4): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits=$bits out of [1, 16]")
    val bad = Seq(xCol, yCol).filterNot(df.columns.contains)
    require(bad.isEmpty, s"unknown columns: $bad")
    val g = 1L << bits
    val rows = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    val bounds = rows.agg(min(col("__x")).as("__minx"),
      max(col("__x")).as("__maxx"), min(col("__y")).as("__miny"),
      max(col("__y")).as("__maxy"))
    rows.crossJoin(broadcast(bounds))
      .withColumn("__cx",
        expr(s"((__x - __minx) * $g) div (__maxx - __minx + 1)"))
      .withColumn("__cy",
        expr(s"((__y - __miny) * $g) div (__maxy - __miny + 1)"))
      .withColumn("z", interleaveBits(col("__cx"), col("__cy"), bits))
      .groupBy(col("z"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
      .orderBy(col("z"))
  }

  /** Z-ORDERED EXPORT — [[zOrderManifest]] made actionable (the q224 →
    * `writeShards` pattern): write `df` partitioned into `files`
    * z-CONTIGUOUS spans, each span exactly ONE parquet file (the
    * Bucketed one-file discipline — no small-file debris), plus a
    * per-file zone-map manifest under `outDir/_manifest`
    * (underscore-ignored by parquet reads). A reader with predicates
    * on BOTH dimensions prunes whole files from the manifest.
    *
    * File assignment is `file_id = (z · files) div G²` — a
    * deterministic cell-range split, so re-runs reproduce the SAME
    * file plan byte-for-byte (a `repartitionByRange` would balance
    * rows better but samples its boundaries — nondeterministic plans
    * break resume-and-compare). Even z-spans, not even rows: the
    * manifest's per-file row counts are the skew readout, and `bits`
    * is the rebalance knob.
    *
    * Returns (files written, rows written). NULL-dimension rows are
    * excluded (a production layout would route them to a dedicated
    * NULL file). */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      outDir: String, bits: Int = 4, files: Int = 16): (Long, Long) = {
    require(files >= 1 && files <= 4096, s"files=$files out of [1, 4096]")
    require(bits >= 1 && bits <= 16, s"bits=$bits out of [1, 16]")
    val g = 1L << bits
    val rows = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val bounds = rows.agg(
      min(col(xCol).cast("long")).as("__minx"),
      max(col(xCol).cast("long")).as("__maxx"),
      min(col(yCol).cast("long")).as("__miny"),
      max(col(yCol).cast("long")).as("__maxy"))
    val withZ = rows.crossJoin(broadcast(bounds))
      .withColumn("__cx", expr(
        s"((CAST(`$xCol` AS BIGINT) - __minx) * $g)" +
          " div (__maxx - __minx + 1)"))
      .withColumn("__cy", expr(
        s"((CAST(`$yCol` AS BIGINT) - __miny) * $g)" +
          " div (__maxy - __miny + 1)"))
      .withColumn("z", interleaveBits(col("__cx"), col("__cy"), bits))
      .withColumn("file_id", expr(s"(z * $files) div ${g * g}"))
      .drop("__minx", "__maxx", "__miny", "__maxy", "__cx", "__cy")
    withZ.repartition(col("file_id"))
      .write.partitionBy("file_id").parquet(outDir)
    // manifest from the WRITTEN tree, not a second run of the withZ
    // pipeline: file_id survives as a partition column and z as a
    // data column, so this pass is a column-pruned scan of the fresh
    // (already z-assigned) output — the corpus and its bounds/cell/z
    // computation are never evaluated twice (the writeShards
    // one-pass discipline, achieved here by reading back instead of
    // caching).
    val spark = df.sparkSession
    val manifest = spark.read.parquet(outDir)
      // partition-column inference types file_id INT; the manifest
      // contract (and its readers) keep the written BIGINT
      .groupBy(col("file_id").cast("long").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"),
        min(col(xCol).cast("long")).as("min_x"),
        max(col(xCol).cast("long")).as("max_x"),
        min(col(yCol).cast("long")).as("min_y"),
        max(col(yCol).cast("long")).as("max_y"))
      // the grid PARAMETERS travel with the zone maps: maintenance
      // recovers (bits, files) from here, so an append can never be
      // assigned under a different grid than the tree was written with
      .withColumn("grid_bits", lit(bits.toLong))
      .withColumn("grid_files", lit(files.toLong))
      .orderBy(col("file_id"))
    manifest.coalesce(1).write.parquet(s"$outDir/_manifest")
    val m = spark.read.parquet(s"$outDir/_manifest")
      .agg(count(lit(1)), coalesce(sum(col("n_rows")), lit(0L)))
      .collect()(0)
    (m.getLong(0), m.getLong(1))
  }

  /** INCREMENTAL z-order maintenance — append new rows into an
    * EXISTING [[writeZOrdered]] tree without a full re-sort: the cell
    * grid and the `file_id = (z · files) div G²` split are
    * deterministic functions of the GRID BOUNDS, so an append only
    * has to rewrite the file spans its rows land in — a per-touched-
    * cell rewrite (read touched spans + union + dynamic partition
    * overwrite), never a corpus pass. The bounds are recovered from
    * the manifest (every row lives in some file, so the global min/
    * max is the fold of the per-file zone maps), making
    * append-then-maintain ≡ one-shot writeZOrdered on the union
    * whenever the append stays inside the original bounds
    * (spec-pinned). Rows OUTSIDE the original bounds are CLAMPED to
    * the edge cells — their edge file's zone map widens to stay
    * truthful (readers prune correctly, just less tightly); a
    * periodic full [[writeZOrdered]] re-anchors the grid, exactly the
    * OPTIMIZE-vs-append split Delta/Iceberg users run.
    *
    * Scale shape: ONE bounded collect (the 4-long bounds row +
    * ≤ `files` touched ids), a scan of the TOUCHED spans only, the
    * new batch assigned row-locally, one repartition by file_id for
    * the one-file-per-span discipline. The untouched manifest rows
    * are carried over, the touched ones recomputed from the
    * rewritten spans. localCheckpoint materializes the combined
    * spans before the overwrite (Spark refuses to overwrite a path
    * it is reading — the standard read-modify-write fence), bounded
    * by the touched mass, not the table.
    *
    * The grid parameters (bits, files) are NOT caller-supplied: they
    * are recovered from the `_manifest` written by [[writeZOrdered]],
    * so a maintenance run can never silently assign rows under a
    * different grid than the tree holds (the zone maps would stay
    * truthful but the append-then-maintain ≡ one-shot equivalence
    * would break without any error).
    *
    * Returns (files touched, new rows written). */
  def maintainZOrdered(newRows: DataFrame, xCol: String, yCol: String,
      outDir: String): (Long, Long) = {
    val spark = newRows.sparkSession
    val oldManifest = spark.read.parquet(s"$outDir/_manifest")
    require(oldManifest.columns.contains("grid_bits") &&
      oldManifest.columns.contains("grid_files"),
      s"$outDir/_manifest carries no grid parameters — " +
        "re-anchor with writeZOrdered before maintaining")
    val b = oldManifest.agg(
      min(col("min_x")).as("__minx"), max(col("max_x")).as("__maxx"),
      min(col("min_y")).as("__miny"), max(col("max_y")).as("__maxy"),
      min(col("grid_bits")).as("__b0"), max(col("grid_bits")).as("__b1"),
      min(col("grid_files")).as("__f0"), max(col("grid_files")).as("__f1"))
      .collect()(0)
    val (minx, maxx, miny, maxy) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    require(b.getLong(4) == b.getLong(5) && b.getLong(6) == b.getLong(7),
      s"$outDir/_manifest declares inconsistent grid parameters")
    val bits = b.getLong(4).toInt
    val files = b.getLong(6).toInt
    require(bits >= 1 && bits <= 16, s"manifest bits=$bits out of [1, 16]")
    require(files >= 1 && files <= 4096,
      s"manifest files=$files out of [1, 4096]")
    val g = 1L << bits
    def cell(c: String, lo: Long, hi: Long): String =
      s"least(${g - 1}L, greatest(0L, " +
        s"((CAST(`$c` AS BIGINT) - ${lo}L) * $g) div ${hi - lo + 1}L))"
    val newZ = newRows
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("__cx", expr(cell(xCol, minx, maxx)))
      .withColumn("__cy", expr(cell(yCol, miny, maxy)))
      .withColumn("z", interleaveBits(col("__cx"), col("__cy"), bits))
      .withColumn("file_id", expr(s"(z * $files) div ${g * g}"))
      .drop("__cx", "__cy")
    val touched = newZ.select(col("file_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val nNew = newZ.count()
    if (touched.isEmpty) return (0L, 0L)
    val existingTouched = spark.read.parquet(outDir)
      .withColumn("file_id", col("file_id").cast("long"))
      .where(col("file_id").isin(touched: _*))
    val combined = existingTouched
      .unionByName(newZ.select(existingTouched.columns.map(col): _*))
      .localCheckpoint(true)
    combined.repartition(col("file_id"))
      .write.partitionBy("file_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(outDir)
    // manifest: untouched rows carried over, touched recomputed from
    // the rewritten spans (both frames are ≤ `files` rows)
    val touchedManifest = spark.read.parquet(outDir)
      .withColumn("file_id", col("file_id").cast("long"))
      .where(col("file_id").isin(touched: _*))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"),
        min(col(xCol).cast("long")).as("min_x"),
        max(col(xCol).cast("long")).as("max_x"),
        min(col(yCol).cast("long")).as("min_y"),
        max(col(yCol).cast("long")).as("max_y"))
      .withColumn("grid_bits", lit(bits.toLong))
      .withColumn("grid_files", lit(files.toLong))
    val newManifest = oldManifest
      .where(!col("file_id").isin(touched: _*))
      .unionByName(touchedManifest)
      .orderBy(col("file_id"))
      .localCheckpoint(true)
    newManifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_manifest")
    (touched.length.toLong, nNew)
  }
}
