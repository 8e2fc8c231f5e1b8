package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.11) over
  * `embeddings.parquet` (vec_id, embedding: array<float>, label).
  *
  * Numeric discipline: elements are cast float→double (exact) before
  * any arithmetic, and the dot product is a LEFT FOLD via
  * `aggregate(zip_with(...))` — order-pinned, so an external engine
  * folding the same element order produces bit-identical doubles (the
  * correctness gate hash-compares them; "close enough" floats are not
  * enough). No UDFs — the fold is a codegen'd higher-order expression.
  */
object Similarity {

  /** embedding cast to array<double> */
  private def vec(embeddingCol: Column): Column =
    transform(embeddingCol, x => x.cast("double"))

  /** Left-fold dot product of two array<double> columns (by name —
    * fold body is a SQL expr). */
  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")

  private def norm(v: String): Column =
    sqrt(expr(s"aggregate(transform($v, x -> x * x), 0D, (acc, v) -> acc + v)"))

  /** Brute-force cosine top-k: every `vec_id % queryStride == 0` vector
    * is a query; rank all other vectors by cosine, keep the top k.
    *
    * Scale shape: the (small) query set is broadcast against the
    * candidate stream — a broadcast nested-loop with narrow candidates,
    * no shuffle of the big side; the only shuffle is the per-query
    * window over k·|queries| pre-filtered rows. This is the exactness
    * baseline; [[bucketedNearDupPairs]] is the pruned scale path, and a
    * production ANN would put an IVF/HNSW index in front of the same
    * scoring expression. */
  def cosineTopK(embeddings: DataFrame, k: Int = 5, queryStride: Long = 50)
      : DataFrame = {
    val n = embeddings.select(col("vec_id"),
      vec(col("embedding")).as("v"))
      .withColumn("nrm", norm("v"))
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

  /** Bucketed (IVF-style) cosine near-dup pairs: vectors are compared
    * only within their coarse-quantizer cell — here the `label` column
    * stands in for the centroid assignment a k-means front end would
    * produce. The join shuffles both sides on the bucket key and is
    * embarrassingly parallel across buckets; cost is Σ|bucket|²
    * instead of N². At 100 TB the bucket count scales with the data
    * and hot buckets split by AQE skew handling. */
  def bucketedNearDupPairs(embeddings: DataFrame, bucketCol: String = "label",
      threshold: Double = 0.3): DataFrame = {
    val n = embeddings.select(col("vec_id"), col(bucketCol).as("bucket"),
      vec(col("embedding")).as("v"))
      .withColumn("nrm", norm("v"))
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
}
