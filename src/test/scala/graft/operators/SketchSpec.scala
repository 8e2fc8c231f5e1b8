package graft.operators

import graft.SparkSpec
import graft.functions.TextHash

/** Hand-replay of the count-min sketch (q80's operator): the sketch,
  * the estimates, and the never-undercount invariant recomputed in
  * plain Scala over a crafted corpus with a deliberately TINY width so
  * collisions actually occur (a collision-free sketch only tests the
  * trivial path). */
class SketchSpec extends SparkSpec {

  private val P = TextHash.P

  private def charFold(t: String): Long =
    t.foldLeft(0L)((h, c) => (h * 31 + c) % P)

  private def bucket(i: Int, h: Long, w: Int): Long =
    ((h * (2L * i + 1) + (1000003L * i + 12345L)) % P) % w

  test("estimates replay the hand-computed sketch exactly; est >= cf") {
    val s = spark; import s.implicits._
    val texts = Seq("a a a b b c", "a b d d", "c a e")
    val docs = texts.toDF("text")
    val occs = texts.flatMap(_.split("\\s+"))
    val w = 2 // tiny: forces bucket collisions among the 5 terms
    val sk = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (t <- occs; i <- 0 until Sketch.depth) {
      val key = (i, bucket(i, charFold(t), w))
      sk(key) = sk.getOrElse(key, 0L) + 1
    }
    val cf = occs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = cf.toSeq.map { case (t, c) =>
      val est = (0 until Sketch.depth)
        .map(i => sk((i, bucket(i, charFold(t), w)))).min
      (t, c, est)
    }.sortBy { case (t, c, _) => (-c, t) }
    val out = Sketch.heavyHittersEstimate(docs, "text", topK = 10, width = w)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expected)
    out.foreach { case (t, c, e) => assert(e >= c, s"undercount on $t") }
    // the tiny width must actually have produced at least one overcount,
    // or this test is only exercising the collision-free path
    assert(out.exists { case (_, c, e) => e > c }, out.toString)
  }

  test("duplicate probe rows each keep their own estimate row") {
    val s = spark; import s.implicits._
    val build = Seq.fill(3)(7L).toDF("h") // cf(7) = 3
    val sketch = Sketch.cmBuild(build, "h", width = 4)
    // the probe frame repeats the same row — a groupBy over the probe
    // columns alone would collapse them to one output row
    val probes = Seq(7L, 7L, 9L).toDF("h")
    val out = Sketch.cmEstimate(probes, "h", sketch, width = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out.size == 3, s"duplicate probes collapsed: $out")
    assert(out.count(_._1 == 7L) == 2)
    out.filter(_._1 == 7L).foreach { case (_, e) => assert(e >= 3L) }
  }

  test("probing at a width other than the build width fails fast") {
    val s = spark; import s.implicits._
    val sketch = Sketch.cmBuild(Seq(1L, 2L).toDF("h"), "h", width = 8)
    val probes = Seq(1L).toDF("h")
    val e = intercept[IllegalArgumentException] {
      Sketch.cmEstimate(probes, "h", sketch, width = 16)
    }
    assert(e.getMessage.contains("built at width=8"))
    // and the matching width still estimates
    assert(Sketch.cmEstimate(probes, "h", sketch, width = 8)
      .collect().length == 1)
  }

  test("hllDistinct: raw regime tracks true cardinality within 3 std errors") {
    val s = spark; import s.implicits._
    // 20k sequential ids through the q89 squared-mix hash: n >> 2.5m,
    // so the RAW estimate branch runs (no empty buckets expected)
    val m = 256
    val hashed = s.range(20000).toDF("id").selectExpr(
      "'g' AS g",
      s"""((id % ${P}L) * 2654435761L % ${P}L + 12345L) % ${P}L AS h1""",
      s"""((id % ${P}L) * 1779033703L % ${P}L + 54321L) % ${P}L AS h2""")
      .selectExpr("g", s"(h1*h1 % ${P}L) * ${P}L + (h2*h2 % ${P}L) AS h")
    val out = Sketch.hllDistinct(hashed, "g", "h", m = m, wBits = 52)
      .collect()
    assert(out.length == 1)
    val est = out.head.getAs[Double]("est_distinct")
    // standard error 1.04/sqrt(m) = 6.5%; 3 sigma = 19.5%
    assert(math.abs(est - 20000.0) / 20000.0 < 0.195, s"est=$est")
  }

  test("hllDistinct: small-range branch uses the linear-counting table") {
    val s = spark; import s.implicits._
    val m = 256
    // 40 distinct keys: raw HLL would report ~alpha*m; the branch must
    // switch to m*ln(m/V), which is accurate in this regime
    val hashed = s.range(40).toDF("id").selectExpr(
      "'g' AS g",
      s"""((id % ${P}L) * 2654435761L % ${P}L + 12345L) % ${P}L AS h1""",
      s"""((id % ${P}L) * 1779033703L % ${P}L + 54321L) % ${P}L AS h2""")
      .selectExpr("g", s"(h1*h1 % ${P}L) * ${P}L + (h2*h2 % ${P}L) AS h")
    val row = Sketch.hllDistinct(hashed, "g", "h", m = m, wBits = 52)
      .collect().head
    val est = row.getAs[Double]("est_distinct")
    val filled = row.getAs[Long]("n_filled")
    val empty = row.getAs[Long]("n_empty")
    assert(filled + empty == m.toLong)
    // the reported value must BE the shared literal-table entry —
    // bit-equal, the exact portability contract the oracle relies on
    assert(est == Sketch.hllLinearLut(m)(empty.toInt - 1))
    assert(math.abs(est - 40.0) / 40.0 < 0.25, s"est=$est")
  }

  test("hllDistinct: registers of a union == max-merge of part registers") {
    // the mergeability contract the streaming twin and any multi-corpus
    // union rely on: build registers per part, max-merge, fold — must
    // equal the one-shot build over the union
    val s = spark; import s.implicits._
    val m = 64
    def hashed(lo: Long, hi: Long) =
      s.range(lo, hi).toDF("id").selectExpr("'g' AS g",
        s"""((id % ${P}L) * 2654435761L % ${P}L + 12345L) % ${P}L AS h1""",
        s"""((id % ${P}L) * 1779033703L % ${P}L + 54321L) % ${P}L AS h2""")
        .selectExpr("g", s"(h1*h1 % ${P}L) * ${P}L + (h2*h2 % ${P}L) AS h")
    val merged = Sketch.hllEstimateFromRegisters(
      Sketch.hllRegisters(hashed(0, 300), "g", "h", m = m)
        .unionByName(Sketch.hllRegisters(hashed(200, 600), "g", "h", m = m))
        .groupBy("g", "b")
        .agg(org.apache.spark.sql.functions.max("mj").as("mj")),
      "g", m = m).collect().head.getAs[Double]("est_distinct")
    val oneShot = Sketch.hllDistinct(hashed(0, 600), "g", "h", m = m)
      .collect().head.getAs[Double]("est_distinct")
    assert(merged == oneShot)
  }

  test("hllDistinct: duplicate keys do not move the estimate") {
    val s = spark; import s.implicits._
    val m = 64
    def build(rep: Int) = {
      val base = s.range(500).toDF("id").selectExpr("'g' AS g",
        s"""((id % ${P}L) * 2654435761L % ${P}L + 12345L) % ${P}L AS h1""",
        s"""((id % ${P}L) * 1779033703L % ${P}L + 54321L) % ${P}L AS h2""")
        .selectExpr("g", s"(h1*h1 % ${P}L) * ${P}L + (h2*h2 % ${P}L) AS h")
      val rows = (1 to rep).map(_ => base).reduce(_ union _)
      Sketch.hllDistinct(rows, "g", "h", m = m, wBits = 52)
        .collect().head.getAs[Double]("est_distinct")
    }
    assert(build(1) == build(3)) // registers are max-folds: idempotent
  }

  test("width must be a power of two") {
    val s = spark; import s.implicits._
    val docs = Seq("a").toDF("text")
    intercept[IllegalArgumentException] {
      Sketch.cmBuild(docs.select(
        org.apache.spark.sql.functions.lit(1L).as("h")), "h", width = 100)
    }
  }

  test("hllAccuracy: exact side is truly exact; rel_error is the " +
    "estimate's own ratio and lands inside the m=256 expectation") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // two groups with known distinct counts (120 and 40), duplicates
    // included to prove the exact side dedups
    val rows = (1L to 120L).map(u => ("a", u)) ++
      (1L to 120L).map(u => ("a", u)) ++
      (201L to 240L).map(u => ("b", u))
    val base = rows.toDF("g", "u")
    val h1 = (col("u") % P * 2654435761L % P + 12345L) % P
    val h2 = (col("u") % P * 1779033703L % P + 54321L) % P
    val hashed = base.select(col("g"), col("u"),
      ((h1 * h1 % P) * P + (h2 * h2 % P)).as("h"))
    val out = Sketch.hllAccuracy(hashed, "g", "h", "u").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a")._1 == 120L && out("b")._1 == 40L)
    out.values.foreach { case (exact, est, rel) =>
      assert(rel == est / exact.toDouble - 1.0)
      // 1.04/sqrt(256) ≈ 6.5% expected; allow a generous 4σ
      assert(math.abs(rel) < 0.26, s"rel_error $rel out of band")
    }
  }

  // ---- kmvOverlap (q249) -------------------------------------------

  private def wordShingles(text: String): Set[Long] = {
    val th = text.trim.split("\\s+").filter(_.nonEmpty).map(charFold)
    if (th.length < 3) Set.empty[Long]
    else th.sliding(3).map(a =>
      (((a(0) * 31 + a(1)) % P) * 31 + a(2)) % P)
      .map(h => (h * 2654435761L + 12345L) % P).toSet // the KMV spread
  }

  /** Plain-Scala KMV replay: k smallest per side, union subset
    * property, the n < k exact branch and the θ division. */
  private def kmvReplay(a: Set[Long], b: Set[Long], k: Int) = {
    def sk(s: Set[Long]) = s.toSeq.sorted.take(k)
    val (ka, kb) = (sk(a), sk(b))
    val ku = sk((ka ++ kb).toSet)
    def est(n: Long, theta: Long) =
      if (n < k) n else (k - 1).toLong * P / theta
    val (na, nb, nu) = (ka.size.toLong, kb.size.toLong, ku.size.toLong)
    val c = ku.count(h => ka.contains(h) && kb.contains(h)).toLong
    val eu = est(nu, if (ku.nonEmpty) ku.max else 0L)
    (na, if (ka.nonEmpty) ka.max else -1L, est(na, if (ka.nonEmpty) ka.max else 0L),
      nb, if (kb.nonEmpty) kb.max else -1L, est(nb, if (kb.nonEmpty) kb.max else 0L),
      nu, if (ku.nonEmpty) ku.max else -1L, eu,
      c, if (nu > 0) c * eu / nu else 0L,
      if (nu > 0) c * 1048576L / nu else 0L)
  }

  test("kmvOverlap replays the hand-computed sketch exactly — " +
    "θ estimator branch (n = k) and exact branch (n < k) together") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // side A: enough distinct shingles (11) to exceed k = 8 (θ
    // branch); side B: exactly one 4-token doc (n < k exact branch);
    // that doc SHARED verbatim, and k covers most of the union, so
    // the shared shingles land inside the union sketch
    val aTexts = Seq("p q r s t u v w", "x y z p q", "m n o p")
    val bTexts = Seq("m n o p")
    val docs = (aTexts.map((_, true)) ++ bTexts.map((_, false)))
      .toDF("text", "is_a")
    val out = Sketch.kmvOverlap(docs, col("is_a"), "text", k = 8)
      .collect().head
    val want = kmvReplay(
      aTexts.flatMap(wordShingles).toSet,
      bTexts.flatMap(wordShingles).toSet, k = 8)
    val got = (out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4), out.getLong(5), out.getLong(6),
      out.getLong(7), out.getLong(8), out.getLong(9),
      out.getLong(10), out.getLong(11), out.getLong(12))
    assert(out.getInt(0) == 8)
    assert(got == want)
    // the crafted fixture really exercises both branches
    assert(out.getLong(1) == 8L, "side A must hit the θ branch")
    assert(out.getLong(4) < 8L, "side B must hit the exact branch")
    assert(out.getLong(10) > 0L, "intersection must be non-empty")
  }

  test("kmvOverlap: an absent side reports n = 0, est = 0, " +
    "empty intersection — never a NULL-poisoned estimate row") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(("p q r s", false), ("x y z", false))
      .toDF("text", "is_a")
    val out = Sketch.kmvOverlap(docs, col("is_a"), "text", k = 4)
      .collect().head
    assert(out.getLong(1) == 0L)   // n_a
    assert(out.isNullAt(2))        // theta_a: no hashes, honestly NULL
    assert(out.getLong(3) == 0L)   // est_a = n_a via the exact branch
    assert(out.getLong(10) == 0L)  // inter_in_k
    assert(out.getLong(11) == 0L && out.getLong(12) == 0L)
  }
}
