package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Count-min sketch over portable token hashes — the fixed-memory
  * frequency rung UNDER the exact vocabulary groupBy (q65's Zipf
  * profile). The exact profile shuffles |vocab| keys; at 100 TB a
  * web-scale vocabulary (hundreds of billions of distinct n-grams) can
  * make even that reduced shuffle the bottleneck. The sketch replaces
  * it with a `depth`×`width` counter matrix whose size is a CONSTANT
  * chosen up front: every partition folds its occurrences into its own
  * d·w partial grid (map-side combine), and the only shuffle is
  * d·w·partitions pre-folded rows — independent of both corpus size
  * and vocabulary size. Estimates never undercount (each counter is a
  * superset sum); overcount is bounded by the usual CMS 2N/w with
  * probability 1 − 2^−d.
  *
  * Portability: bucket hashing reuses [[TextHash.minhashPerm]]'s affine
  * family mod the 30-bit prime [[TextHash.P]] — plain integer
  * arithmetic the DuckDB oracle replays bit-for-bit, which is what lets
  * a SKETCH (normally "approximate ⇒ unverifiable") hash-verify: the
  * estimate is a deterministic function of the corpus, engine-exact on
  * both sides.
  */
object Sketch {

  /** Sketch depth (independent counter rows). 4 rows ⇒ an estimate
    * exceeds the 2N/w bound with probability ≤ 2^−4. */
  val depth: Int = 4

  /** Bucket of hash `h` in sketch row `i`: the minhashPerm affine
    * re-hash folded onto `width` buckets. Row-local integer math;
    * every intermediate < 2^35. */
  def bucket(i: Int, h: Column, width: Int): Column =
    TextHash.minhashPerm(i, h) % lit(width.toLong)

  private def buckets(h: Column, width: Int): Column =
    array((0 until depth).map(i => bucket(i, h, width)): _*)

  /** Build the sketch from an occurrence stream: one row per
    * occurrence in `hashes(hashCol)` → the (r, b, cnt) counter grid,
    * ≤ depth·width rows. The groupBy key space IS the sketch, so the
    * map-side combine collapses everything before the exchange — the
    * constant-size-shuffle property the scaladoc above promises. */
  def cmBuild(hashes: DataFrame, hashCol: String,
      width: Int = 1024): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    // the build width travels WITH the sketch (column metadata on
    // `cnt`), so a probe against a sketch built at a different width
    // fails fast instead of silently mis-bucketing and undercounting
    val widthMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("cm_width", width.toLong).putLong("cm_depth", depth.toLong)
      .build()
    hashes
      .select(posexplode(buckets(col(hashCol), width)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
      .select(col("r"), col("b"), col("cnt").as("cnt", widthMeta))
  }

  /** Point-estimate counts for probe rows carrying `hashCol`: min over
    * the `depth` counters (absent bucket = 0 — nothing ever
    * incremented it). The sketch is BROADCAST (≤ d·w rows by
    * construction); probes keep all their columns AND their
    * multiplicity — a transient per-row id regroups after the bucket
    * explode, so duplicate probe rows each come back with their own
    * `est_cf` instead of collapsing. `width` must match the sketch's
    * build width (checked against the metadata [[cmBuild]] stamps —
    * probing at a different width mis-buckets and can undercount,
    * breaking the `est_cf ≥ cf` guarantee). Adds `est_cf`. */
  def cmEstimate(probes: DataFrame, hashCol: String, sketch: DataFrame,
      width: Int = 1024): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    sketch.schema.fields.find(_.name == "cnt")
      .map(_.metadata).filter(_.contains("cm_width")).foreach { m =>
        require(m.getLong("cm_width") == width.toLong,
          s"cmEstimate width=$width but the sketch was built at " +
            s"width=${m.getLong("cm_width")} — estimates would " +
            "mis-bucket; probe with the build width")
      }
    val keep = probes.columns.toSeq
    probes
      .withColumn("__probe_id", monotonically_increasing_id())
      .select(col("*"),
        posexplode(buckets(col(hashCol), width)).as(Seq("r", "b")))
      .join(broadcast(sketch), Seq("r", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy((col("__probe_id") +: keep.map(col)): _*)
      .agg(min(col("cnt")).as("est_cf"))
      .drop("__probe_id")
  }

  /** The verification composition: exact top-`topK` whitespace-token
    * frequencies (ground truth) side-by-side with their CMS estimates —
    * `est_cf ≥ cf` always, equality when none of a term's `depth`
    * buckets collides with other mass. Two corpus passes (exact counts
    * + sketch build), both scan-fused token explodes; the probe-side
    * char fold runs on topK rows only. */
  def heavyHittersEstimate(docs: DataFrame, textCol: String,
      topK: Int = 20, width: Int = 1024): DataFrame = {
    require(topK > 0, s"need topK > 0, got $topK")
    val toks = docs.select(explode(TextHash.tokens(col(textCol))).as("term"))
    val top = toks.groupBy(col("term")).agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("term")).limit(topK)
      .withColumn("h", expr(s"""
        aggregate(transform(sequence(1, length(term)),
          j -> ascii(substring(term, j, 1))),
          0L, (h, c) -> ((h * 31L) + c) % ${TextHash.P}L)"""))
    val sketch = cmBuild(
      docs.select(explode(TextHash.tokenHashesOf(col(textCol))).as("h")),
      "h", width)
    cmEstimate(top, "h", sketch, width)
      .select(col("term"), col("cf"), col("est_cf"))
      .orderBy(col("cf").desc, col("term"))
  }
}
