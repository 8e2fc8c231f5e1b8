package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables
import graft.functions.VectorOps

/** Similarity-search semantics on the sf0.001 embeddings fixture:
  * the label-bucket variant (kept as the join-shape harness — r2 verdict
  * item 4), and the IVF quantizer's soundness (no false positives;
  * candidates scored exactly) against the brute-force answer.
  */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)

  /** exact all-pairs cosine >= t — the recall oracle. */
  private def exactPairs(t: Double): Set[(Long, Long)] = {
    val n = emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
    val a = n.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = n.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    a.crossJoin(b).where(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cosine") >= t)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("withinBucketPairsForTests: pairs only within the bucket column") {
    val out = Similarity.withinBucketPairsForTests(emb, "label",
      threshold = 0.3)
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(1), r.getLong(2))
      assert(a < b)
      assert(labels(a) == labels(b)) // same bucket by construction
      assert(r.getDouble(3) >= 0.3)
    }
  }

  test("ivfCosinePairs: sound (subset of exact) with real recall") {
    val exact = exactPairs(0.3)
    val ivf = Similarity.ivfCosinePairs(emb, threshold = 0.3,
      probes = 2, kmeansIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.subsetOf(exact)) // verify step scores exactly → no false positives
    assert(ivf.nonEmpty)
    // multi-probe recall on the fixture should be substantial; pin a
    // floor so a quantizer regression (e.g. probe ordering) is caught
    assert(ivf.size.toDouble / exact.size >= 0.5,
      s"recall ${ivf.size}/${exact.size}")
  }

  test("extra k-means refinement iterations stay sound and deterministic") {
    val exact = exactPairs(0.3)
    def run() = Similarity.ivfCosinePairs(emb, threshold = 0.3,
      probes = 2, kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = run()
    assert(first.subsetOf(exact)) // verify step still exact
    assert(first.nonEmpty)
    assert(run() == first) // fixed-point means ⇒ run-to-run identical
  }

  test("k-means quantizer: cell count tracks sqrt(N), not N") {
    // the r3 stride quantizer had C = N/50 (assignment O(N^2/50) and a
    // centroid table that grew with the corpus); the k-means front end
    // must keep C within ceil(sqrt(N)) regardless of corpus size, and
    // every vector must land in `probes` cells (multi-probe assignment)
    val n = emb.count()
    val cMax = math.ceil(math.sqrt(n.toDouble)).toLong
    val assigned = Similarity.cellAssignments(emb, probes = 2)
    assert(assigned.select("cell").distinct().count() <= cMax)
    val perVec = assigned.groupBy("vec_id").count()
      .select(max("count"), min("count")).head()
    assert(perVec.getLong(0) == 2L && perVec.getLong(1) == 2L)
  }

  test("ivfTopK: well-formed ranks, exact scores, real recall vs cosineTopK") {
    val k = 5
    val exact = Similarity.cosineTopK(emb, k = k, queryStride = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.ivfTopK(emb, k = k, queryStride = 50,
      probes = 4, kmeansIters = 1).collect()
    assert(ann.nonEmpty)
    // per-query: contiguous ranks from 1, ordered by descending cosine,
    // never more than k, never the query itself
    ann.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length <= k)
      assert(rows.map(_.getInt(2)).toSeq.sorted == (1 to rows.length))
      assert(rows.forall(_.getLong(1) != q))
      val cos = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }
    // approximate-search recall floor vs the exact baseline: probing 2
    // of ~sqrt(N) cells must still find most true top-k neighbors; a
    // quantizer/probe regression shows up here
    val annSet = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (annSet & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@$k $recall")
    // every query in the exact baseline is answered by the ANN path too
    assert(ann.map(_.getLong(0)).toSet ==
      exact.map(_._1))
  }

  test("ivfTopK: deterministic run to run") {
    def run() = Similarity.ivfTopK(emb, k = 3, queryStride = 100,
      probes = 2, kmeansIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(run() == run())
  }

  test("cosineTopK: ranks exactly like a brute-force window") {
    val out = Similarity.cosineTopK(emb, k = 3, queryStride = 100).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).toSeq.sorted == (1 to rows.length))
      // ranks ordered by descending cosine
      val cosines = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("labelCentroidAffinity: hand-checkable cosines; scale-invariant mean") {
    val s = spark; import s.implicits._
    // label 0 centroid-sum -> (2^20-scaled) axis x; label 1 -> axis y;
    // label 2 -> diagonal. cos(0,1)=0, cos(0,2)=cos(1,2)=1/sqrt(2).
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(3.0f, 0.0f), 0),
      (3L, Seq(0.0f, 2.0f), 1),
      (4L, Seq(1.0f, 1.0f), 2), (5L, Seq(2.0f, 2.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidAffinity(rows)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set((0, 1), (0, 2), (1, 2)))
    assert(out((0, 1)) == ((2L, 1L, 0.0)))
    val invSqrt2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(out((0, 2))._3 - invSqrt2) < 1e-12)
    assert(math.abs(out((1, 2))._3 - invSqrt2) < 1e-12)
    // n_a/n_b carry the slice masses
    assert(out((0, 2))._1 == 2L && out((0, 2))._2 == 2L)
    // cosine reads the MEAN direction: replicating a slice's rows
    // scales its centroid-sum, never its affinity
    val tripled = rows.where(col("label") === 0)
      .unionAll(rows.where(col("label") === 0))
      .unionAll(rows)
    val out3 = Similarity.labelCentroidAffinity(tripled)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(4)))
      .toMap
    assert(out3((0, 1)) == out((0, 1))._3)
    assert(out3((0, 2)) == out((0, 2))._3)
  }

  test("hardNegatives: exact top-k among different-label vectors only") {
    val out = Similarity.hardNegatives(emb, k = 3, queryStride = 100)
      .collect()
    assert(out.nonEmpty)
    // brute-force replay in the driver with the SAME fold order the
    // codegen'd DotProduct uses (left-to-right double accumulation),
    // so cosines must be EXACTLY equal
    val vecs = emb.select(col("vec_id"), col("label"), col("embedding"))
      .collect().map { r =>
        (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray) }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val normed = vecs.map { case (id, l, v) =>
      (id, l, v, math.sqrt(dot(v, v))) }.filter(_._4 > 0)
    val expected = normed.filter(_._1 % 100 == 0).flatMap {
      case (qid, ql, qv, qn) =>
        normed.filter(_._2 != ql)
          .map { case (cid, cl, cv, cn) =>
            (qid, cid, cl, dot(qv, cv) / (qn * cn)) }
          .sortBy { case (_, cid, _, cos) => (-cos, cid) }
          .take(3).zipWithIndex
          .map { case ((q, cid, cl, cos), i) => (q, i + 1) -> (cid, cl, cos) }
    }.toMap
    val labels = vecs.map(v => v._1 -> v._2).toMap
    out.foreach { r =>
      val (qid, ql) = (r.getLong(0), r.getInt(1))
      val (nid, nl) = (r.getLong(2), r.getInt(3))
      assert(ql != nl, s"neighbor $nid shares label $nl with anchor $qid")
      assert(ql == labels(qid) && nl == labels(nid))
      val (eid, el, ecos) = expected((qid, r.getInt(4)))
      assert(nid == eid && nl == el && r.getDouble(5) == ecos)
    }
    assert(out.length == expected.size)
  }

  test("intraLabelDiversity: sum identity equals hand math; singletons and zero vectors drop") {
    import spark.implicits._
    val fix = Seq(
      (1L, 1, Array(1f, 0f)), (2L, 1, Array(1f, 0f)), (3L, 1, Array(0f, 1f)),
      (10L, 2, Array(1f, 0f)),                   // singleton → excluded
      (20L, 3, Array(1f, 0f)), (21L, 3, Array(0f, 1f)), // orthogonal
      (30L, 3, Array(0f, 0f)))                   // zero vector → drops
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.intraLabelDiversity(fix)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(out.keySet == Set(1, 3)) // label 2 singleton gone
    // label 1: unit vectors, pair cosines {1, 0, 0} over 6 ordered
    // pairs → mean 2/6 = 1/3 (exact in fixed point: coords are 0/1)
    val (n1, m1, d1) = out(1)
    assert(n1 == 3L)
    assert(math.abs(m1 - 1.0 / 3.0) < 1e-12, m1.toString)
    assert(d1 == 1.0 - m1)
    // label 3: two orthogonal unit vectors → mean pair cosine 0
    val (n3, m3, _) = out(3)
    assert(n3 == 2L) // zero vector dropped from the count too
    assert(m3 == 0.0)
    // the collapsed label is less diverse than the orthogonal one
    assert(out(1)._3 < out(3)._3)
  }

  test("semanticOverlap: hit count, deterministic top match, zero-norm " +
    "drop, and sub-threshold rows absent") {
    val s = spark; import s.implicits._
    def f(xs: Double*) = xs.map(_.toFloat).toArray
    // train: t1 ≈ e1 and e2 (both hit; e1 higher), t2 orthogonal to
    // every eval (no hits), t3 zero-norm (dropped)
    val train = Seq(
      (1L, f(1, 0, 0)), (2L, f(0, 0, 1)), (3L, f(0, 0, 0)))
      .toDF("vec_id", "embedding")
    // eval: e10 = exact match of t1; e20 = partial; e30 zero-norm
    val eval = Seq(
      (10L, f(1, 0, 0)), (20L, f(1, 1, 0)), (30L, f(0, 0, 0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticOverlap(train, eval, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // t1: cos(e10)=1, cos(e20)=1/√2 ≈ .707 — both ≥ .5 → 2 hits,
    // top is e10 at 1.0
    assert(out.keySet == Set(1L))
    assert(out(1L)._1 == 2L)
    assert(out(1L)._2 == 10L)
    assert(out(1L)._3 == 1.0)
  }

  test("nearestCentroidConfusion: clean labels sit on the diagonal, a " +
    "mislabeled vector lands off it; NULL-label and zero rows drop") {
    val s = spark; import s.implicits._
    def f(xs: Double*) = xs.map(_.toFloat).toArray
    // label 1 clusters on the x axis, label 2 on y. One label-1 vector
    // points along y — the space says it belongs to 2.
    val emb = Seq(
      (1L, f(1, 0), Some(1)), (2L, f(4, 0), Some(1)),
      (3L, f(0, 1), Some(1)),                       // the mislabeled one
      (4L, f(0, 2), Some(2)), (5L, f(0, 3), Some(2)),
      (6L, f(1, 1), None),                          // NULL label drops
      (7L, f(0, 0), Some(2)))                       // zero-norm drops
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.nearestCentroidConfusion(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    // centroid(1) ≈ (5/3, 1/3) leans x; centroid(2) = (0, 2.5) is y.
    // vectors 1, 2 → predicted 1; vector 3 (pure y) → predicted 2;
    // vectors 4, 5 → predicted 2.
    assert(out == Map((1, 1) -> 2L, (1, 2) -> 1L, (2, 2) -> 2L))
  }

  test("embeddingHealth: NULL / NaN / zero / ragged counts by hand; " +
    "clean-only norm mean; all-dirty label keeps NULL stats") {
    val s = spark; import s.implicits._
    def f(xs: Double*) = xs.map(_.toFloat).toArray
    val emb = Seq(
      (1L, f(3, 4), Some(1)),                    // clean, norm 5
      (2L, f(0, 0), Some(1)),                    // zero-norm (clean)
      (3L, f(1, 0, 0), Some(1)),                 // ragged: dim 3
      (4L, f(Double.NaN, 1), Some(1)),           // NaN
      (5L, null.asInstanceOf[Array[Float]], Some(1)), // NULL vector
      (6L, f(Double.NaN, 0), Some(2)))           // label 2: only dirt
      .toDF("vec_id", "embedding", "label")
    val r1 = Similarity.embeddingHealth(emb).where("label = 1")
      .collect().head
    // label 1: 5 vectors; 1 null, 1 nan, 1 zero; clean dims {2, 3};
    // clean norms {5, 0, 1} → fp mean (5+0+1)·2^20/3 / 2^20 = 2.0
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4),
      r1.getInt(5), r1.getInt(6), r1.getDouble(7)) ==
      ((5L, 1L, 1L, 1L, 2, 3, 2.0)))
    // label 2: the NaN row is its only vector — no clean stats
    val r2 = Similarity.embeddingHealth(emb).where("label = 2")
      .collect().head
    assert(r2.getLong(1) == 1L && r2.getLong(3) == 1L)
    assert(r2.isNullAt(5) && r2.isNullAt(6) && r2.isNullAt(7))
  }

  test("topKRecall: per-query hit fractions; a query the candidate " +
    "missed entirely still reports recall 0") {
    val s = spark; import s.implicits._
    val ref = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val cand = Seq((1L, 10L), (1L, 99L))   // q1: 1 of 2; q2: absent
      .toDF("query_id", "neighbor_id")
    val out = Similarity.topKRecall(ref, cand).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 0L, 0.0)))
  }

  test("semanticOverlap ties break to the smallest eval id") {
    val s = spark; import s.implicits._
    def f(xs: Double*) = xs.map(_.toFloat).toArray
    val train = Seq((1L, f(1, 0))).toDF("vec_id", "embedding")
    // two evals identical to the train vector — same cosine 1.0
    val eval = Seq((7L, f(1, 0)), (5L, f(2, 0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticOverlap(train, eval, threshold = 0.9)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 5L)
  }

  test("embeddingDupReport: byte-identical vectors collapse, near-equal " +
    "ones don't") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0), // exact dup
      (3L, Seq(1.0f, 1e-7f), 0),                          // near, distinct
      (4L, Seq(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingDupReport(df, "label").collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(0) == ((3L, 2L, 1L, 1.0 / 3)))
    assert(out(1) == ((1L, 1L, 0L, 0.0)))
  }

  test("cellBalance: populations match the quantizer's 1-probe census; " +
    "shares are exact per-cell fractions; affinity profile is sane") {
    val bal = Similarity.cellBalance(emb, kmeansIters = 1).collect()
    val census = Similarity.cellAssignments(emb, probes = 1,
        kmeansIters = 1)
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bal.map(r => r.getLong(0) -> r.getLong(1)).toMap == census)
    val total = census.values.sum
    bal.foreach { r =>
      assert(r.getDouble(2) ==
        r.getLong(1).toDouble / total.toDouble)
      val (mean, mn) = (r.getDouble(3), r.getDouble(4))
      // a member's cosine to its own (nearest) centroid: bounded by 1,
      // mean dominates min, and the fixed-point floor costs < 2^-20
      assert(mean <= 1.0 + 1e-9 && mn <= mean + 1.0 / 1048576)
    }
  }

  test("labelMrr: first-relevant rank drives the reciprocal; no " +
    "relevant hit reads 0.0; null labels match null-safe") {
    val s = spark; import s.implicits._
    val topk = Seq(
      // q10: relevant at ranks 2 and 3 -> rr = 1/2
      (10L, 20L, 1), (10L, 21L, 2), (10L, 22L, 3),
      // q11: nothing relevant -> rr = 0.0
      (11L, 20L, 1),
      // q12 (null label): neighbor 23 also null -> relevant at rank 1
      (12L, 23L, 1), (12L, 20L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val labels = Seq[(Long, java.lang.Long)](
      (10L, 1L), (11L, 2L), (12L, null),
      (20L, 9L), (21L, 1L), (22L, 1L), (23L, null))
      .toDF("vec_id", "label")
    val out = Similarity.labelMrr(topk, labels, "vec_id", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1 else r.getInt(3), r.getDouble(4))))
      .toMap
    assert(out(10L) == ((3L, 2L, 2, 0.5)))
    assert(out(11L) == ((1L, 0L, -1, 0.0)))
    assert(out(12L) == ((2L, 1L, 1, 1.0)))
  }
}
