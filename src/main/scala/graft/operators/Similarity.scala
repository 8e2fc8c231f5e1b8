package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorOps

/** Embedding similarity search (SURVEY.md §2.11) over
  * `embeddings.parquet` (vec_id, embedding: array<float>, label).
  *
  * Scoring runs on the raw `array<float>` through the native codegen'd
  * [[graft.functions.DotProduct]] — elements widen float→double (exact)
  * inside the generated loop and accumulate strictly left-to-right, so
  * results are bit-identical to an external engine folding the same
  * element order (the correctness gate hash-compares doubles). No UDFs,
  * no interpreted higher-order functions, no per-row array allocation.
  */
object Similarity {

  private def dot(a: String, b: String): Column =
    VectorOps.dot(col(a), col(b))

  /** vec_id + raw float vector + L2 norm, the shared scoring input.
    * Zero-norm (all-zero) vectors are dropped here: cosine is undefined
    * for them, and 0/0 diverges across engines (null in Spark, NaN —
    * which sorts ABOVE every number — in DuckDB), so the guard is a
    * correctness requirement, not hygiene. Persisted: both sides of
    * every similarity join read it, and the vectors are small relative
    * to executor memory (MEMORY_AND_DISK spills rather than evicting
    * under pressure). */
  private def normed(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
      .where(col("nrm") > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Brute-force cosine top-k: every `vec_id % queryStride == 0` vector
    * is a query; rank all other vectors by cosine, keep the top k.
    *
    * Scale shape: the (small) query set is broadcast against the
    * candidate stream — a broadcast nested-loop with narrow candidates,
    * no shuffle of the big side; the only shuffle is the per-query
    * window over the scored rows. This is the labelled EXACTNESS
    * baseline — O(|queries|·N·dim) by construction — and the recall
    * oracle for [[ivfCosinePairs]], which is the scale path. */
  def cosineTopK(embeddings: DataFrame, k: Int = 5, queryStride: Long = 50)
      : DataFrame = {
    val n = normed(embeddings)
    val q = n.where(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = broadcast(q)
      .join(n.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("nrm").as("cn")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Bucketed cosine near-dup pairs over a PRE-ASSIGNED bucket column:
    * vectors are compared only within their bucket. Kept as the simple
    * variant for callers that already have a partition key (and as the
    * unit-test harness for the join shape); its cost is Σ|bucket|²,
    * which is only scale-safe if the bucket count grows with the data —
    * for a fixed-cardinality column it degenerates to O(N²/buckets).
    * [[ivfCosinePairs]] is the scale path: it builds a real coarse
    * quantizer whose cell count scales with N. */
  def bucketedNearDupPairs(embeddings: DataFrame, bucketCol: String = "label",
      threshold: Double = 0.3): DataFrame = {
    val n = embeddings
      .select(col("vec_id"), col(bucketCol).as("bucket"),
        col("embedding").as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
      .where(col("nrm") > 0) // cosine undefined for zero vectors
    val a = n.select(col("bucket"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("bucket"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dot("va", "vb") / (col("na") * col("nb")))
      .where(col("cosine") >= threshold)
      .select(col("bucket"), col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("bucket"), col("vec_a"), col("vec_b"))
  }


  /** Random-hyperplane LSH near-dup pairs — the LSH-bucketed ANN
    * variant (SimHash for vectors): `planes` sign bits per vector form
    * the signature; two bands bucket candidates (a hamming-pigeonhole
    * on the signature halves); only candidates pay the exact cosine
    * verify. Complements [[ivfCosinePairs]]: RP-LSH needs no centroid
    * structure at all — signatures come from the single-pass codegen'd
    * [[graft.functions.RpSignature]] over the deterministic hyperplane
    * family, so the corpus scan stays fully narrow and the only shuffle
    * is the band-bucket groupBy, whose key cardinality (2^(planes/2)
    * per band) controls candidate volume.
    *
    * Recall: cos-similar vectors agree on each bit with probability
    * 1 - θ/π; requiring an exact match on one 8-bit band keeps pairs
    * with high cosine at high probability — deterministic, mirrored by
    * the oracle, and a documented LSH trade (like MinHash-LSH's). */
  def rpLshCosinePairs(embeddings: DataFrame, threshold: Double = 0.3,
      planes: Int = 16): DataFrame = {
    require(planes % 2 == 0, s"planes=$planes must split into 2 bands")
    val half = planes / 2
    val n = normed(embeddings)
    val sigs = n.select(col("vec_id"),
      VectorOps.rpSignature(col("v"), planes).as("sig"))
    val bands = sigs.select(col("vec_id"),
      explode(array(
        struct(lit(0).as("band"),
          col("sig").bitwiseAND(lit((1L << half) - 1)).as("bv")),
        struct(lit(1).as("band"),
          shiftright(col("sig"), half).bitwiseAND(lit((1L << half) - 1))
            .as("bv")))).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"), col("bs.bv").as("bv"))
    val cand = bands.select(col("vec_id").as("vec_a"), col("band"), col("bv"))
      .join(bands.select(col("vec_id").as("vec_b"), col("band"), col("bv")),
        Seq("band", "bv"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    cand
      .join(n.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("vec_a"))
      .join(n.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cosine", dot("va", "vb") / (col("na") * col("nb")))
      .where(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** IVF-style near-dup pairs with a REAL coarse quantizer: the
    * centroid set is a deterministic sample of the corpus itself
    * (`vec_id % centroidStride == 0`), so the cell count C = N/stride
    * GROWS with the corpus — per-cell population stays ~stride and the
    * candidate volume Σ|cell|² stays O(N·stride) instead of O(N²).
    * Multi-probe (`probes` nearest centroids per vector) buys recall
    * near cell boundaries, the standard IVF trade.
    *
    * Deterministic by construction (sampled centroids, cosine argmax
    * tie-broken on centroid id), so an external oracle replays the
    * same assignment and the SAME pair set — recall loss vs the exact
    * answer is a documented property of the index, not nondeterminism.
    *
    * Plan shape at 100 TB: assignment is a broadcast nested-loop of N
    * vectors × C centroids (C ≪ N, broadcast-able by construction: at
    * stride 50 the centroid table is 2% of the corpus; a k-means front
    * end would shrink it further), then one shuffle on `cell` and a
    * within-cell self-join — embarrassingly parallel across cells, hot
    * cells split by AQE skew handling. */
  def ivfCosinePairs(embeddings: DataFrame, threshold: Double = 0.3,
      centroidStride: Long = 50, probes: Int = 2): DataFrame = {
    val n = normed(embeddings)
    val cents = n.where(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"),
        col("nrm").as("cn"))
    // nearest-`probes` centroids per vector (cosine, ties → low cent_id)
    val byAffinity = Window.partitionBy(col("vec_id"))
      .orderBy(col("affinity").desc, col("cent_id"))
    val assigned = n.join(broadcast(cents), expr("true"))
      .withColumn("affinity", dot("v", "cv") / (col("nrm") * col("cn")))
      .withColumn("probe", row_number().over(byAffinity))
      .where(col("probe") <= probes)
      .select(col("cent_id").as("cell"), col("vec_id"))
    // candidate pairs are generated over (cell, id) ONLY — the wide
    // vector columns never enter the candidate shuffle; multi-probe can
    // surface a pair in several shared cells, hence the distinct on the
    // 16-byte id pair
    val cand = assigned.select(col("cell"), col("vec_id").as("vec_a"))
      .join(assigned.select(col("cell"), col("vec_id").as("vec_b")),
        Seq("cell"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    // verify step: re-attach vectors (cached in `n`) to candidates only
    cand
      .join(n.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("vec_a"))
      .join(n.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cosine", dot("va", "vb") / (col("na") * col("nb")))
      .where(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
