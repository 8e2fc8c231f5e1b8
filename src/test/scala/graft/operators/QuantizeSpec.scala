package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Int8 scalar-quantization semantics (q55's operator). */
class QuantizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("int8Codes: hand-checkable codes, constant dims code to 0 with zero error") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, Array(5.0f, 10.0f))).toDF("vec_id", "embedding")
    val rows = Quantize.int8Codes(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getLong(3)))
      .toMap
    // dim 0: mn=0 mx=5 → x=0 codes 0, x=5 (the max) codes 255
    assert(rows((1L, 0))._1 == 0)
    assert(rows((2L, 0))._1 == 255)
    // dim 1 is constant → code 0, reconstruction exact
    assert(rows((1L, 1)) == ((0, 0L)))
    assert(rows((2L, 1)) == ((0, 0L)))
  }

  test("int8Codes: reconstruction error bounded by one quantization step") {
    val emb = Tables.embeddings(spark, sf)
    val out = Quantize.int8Codes(emb)
    val st = out.join(
      emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf"))),
      Seq("vec_id", "pos"))
    // per-dim step = (mx-mn)/255; err^2 must stay under step^2 (code is
    // the floor, so |err| < step) — check via the global worst dim
    val dims = emb.select(posexplode(col("embedding")).as(Seq("pos", "xf")))
      .groupBy("pos").agg((max(col("xf").cast("double")) -
        min(col("xf").cast("double"))).as("range"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val worstStep = dims.values.max / 255.0
    val maxErrFp = out.agg(max(col("err_fp"))).collect().head.getLong(0)
    assert(maxErrFp <= math.ceil(worstStep * worstStep * 1048576.0).toLong)
    assert(st.count() == out.count())
  }

  test("int8Codes: partitioning-invariant") {
    val emb = Tables.embeddings(spark, sf)
    val one = Quantize.int8Codes(emb.coalesce(1)).collect().toSeq
    val many = Quantize.int8Codes(emb.repartition(7)).collect().toSeq
    assert(one == many)
  }

  test("pqCodes: one row per (vector, subspace); codes are seed ids") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val out = Quantize.pqCodes(emb, m = 8, k = 8)
    val rows = out.collect()
    assert(rows.length == n * 8)
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).distinct.length ==
      rows.length)
    // codes are centroid identities = seed vec_ids: at most k distinct
    // per subspace, and all of them real vector ids
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val bySub = rows.groupBy(_.getInt(1))
    assert(bySub.size == 8)
    bySub.values.foreach { g =>
      val codes = g.map(_.getLong(2)).toSet
      assert(codes.size <= 8 && codes.subsetOf(ids))
    }
  }

  test("pqCodes: k >= N degenerates to zero reconstruction error") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array.tabulate(16)(i => i.toFloat)),
      (2L, Array.tabulate(16)(i => (i * 2).toFloat)),
      (3L, Array.tabulate(16)(i => (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    // every vector is a seed -> its own subvectors are centroids ->
    // every code is the vector itself with dist 0 (refinement keeps
    // singleton cells' means exact on the 2^-20 grid for these values)
    val out = Quantize.pqCodes(emb, m = 4, k = 3).collect()
    assert(out.length == 12)
    assert(out.forall(_.getLong(3) == 0L),
      out.filter(_.getLong(3) != 0L).mkString(","))
  }

  test("pqCodes: partitioning-invariant") {
    val emb = Tables.embeddings(spark, sf)
    val one = Quantize.pqCodes(emb.coalesce(1), m = 8, k = 8)
      .collect().toSeq
    val many = Quantize.pqCodes(emb.repartition(7), m = 8, k = 8)
      .collect().toSeq
    assert(one == many)
  }

  test("pqTopK: every query gets ranks 1..topK; exact duplicate ranks first") {
    import spark.implicits._
    // vec 0 is the (stride-selected) query; vec 7 is its exact copy —
    // identical subvectors share codes, so ADC distance(query, dup) is
    // the self-distance minimum and the duplicate must rank 1
    val base = Array.tabulate(16)(i => (i * 3 % 7).toFloat)
    val emb = (Seq((0L, base), (7L, base)) ++
      (1L to 5L).map(i => (i, Array.tabulate(16)(j =>
        (j * 3 % 7) + i * 10f)))).toDF("vec_id", "embedding")
    val out = Quantize.pqTopK(emb, m = 4, k = 4, topK = 3,
      queryStride = 50).collect()
    assert(out.map(_.getLong(0)).distinct.toSeq == Seq(0L))
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    assert(out.head.getLong(1) == 7L, out.mkString(","))
  }

  test("encodeWith: frozen-codebook encode equals pqCodes; appends never re-code") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val book = Quantize.trainCodebook(emb, m = 8, k = 8)
    assert(Quantize.encodeWith(book)(emb).collect().toSeq ==
      Quantize.pqCodes(emb, m = 8, k = 8).collect().toSeq)
    // the index-maintenance property: encoding a GROWN corpus against
    // the frozen codebook leaves every previously-indexed vector's
    // codes untouched (assignment is row-local per vector)
    val half = emb.where(col("vec_id") % 2 === 0)
    val halfBook = Quantize.trainCodebook(half, m = 8, k = 8)
    val before = Quantize.encodeWith(halfBook)(half).collect().toSeq
    val after = Quantize.encodeWith(halfBook)(emb)
      .where(col("vec_id") % 2 === 0).collect().toSeq
    assert(before == after)
  }

  test("encodeWith: wrong-dimension batch fails loudly, not silent codes") {
    import spark.implicits._
    val emb = (0L to 7L).map(i =>
      (i, Array.tabulate(16)(j => (i * 16 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val book = Quantize.trainCodebook(emb, m = 4, k = 2)
    val bad = Seq((99L, Array.tabulate(12)(_.toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Quantize.encodeWith(book)(bad).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain.contains("encodeWith: embedding dim"), chain)
  }

  test("ivfPqTopK: exact duplicate shares the query's cell and ranks first") {
    import spark.implicits._
    val base = Array.tabulate(16)(i => (i * 3 % 7).toFloat)
    val emb = (Seq((0L, base), (7L, base)) ++
      (1L to 5L).map(i => (i, Array.tabulate(16)(j =>
        (j * 3 % 7) + i * 10f)))).toDF("vec_id", "embedding")
    val out = Quantize.ivfPqTopK(emb, m = 4, k = 4, probes = 2,
      topK = 3, queryStride = 50).collect()
    assert(out.map(_.getLong(0)).distinct.toSeq == Seq(0L))
    assert(out.map(_.getInt(2)).toSeq == (1 to out.length))
    assert(out.head.getLong(1) == 7L, out.mkString(","))
  }

  test("ivfPqTopK: fixture run — dense ranks, cell-restricted, deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val out = Quantize.ivfPqTopK(emb, m = 8, k = 8, probes = 2,
      topK = 5, queryStride = 50).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(_.getInt(2)).sorted.toSeq == (1 to g.length))
      assert(g.length <= 5)
    }
    // the cell restriction is REAL: at least one query returns fewer
    // candidates than the unrestricted ADC search would
    val full = Quantize.pqTopK(emb, m = 8, k = 8, topK = 5,
      queryStride = 50).collect()
    assert(out.length <= full.length)
    val again = Quantize.ivfPqTopK(emb.repartition(9), m = 8, k = 8,
      probes = 2, topK = 5, queryStride = 50).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("pqTopK: fixture run — all queries covered, ranks dense, deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val out = Quantize.pqTopK(emb, m = 8, k = 8, topK = 5,
      queryStride = 50).collect()
    val nQueries = emb.where(col("vec_id") % 50 === 0).count()
    assert(out.map(_.getLong(0)).distinct.length == nQueries)
    out.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(_.getInt(2)).sorted.toSeq == (1 to 5))
    }
    val again = Quantize.pqTopK(emb.repartition(9), m = 8, k = 8,
      topK = 5, queryStride = 50).collect()
    assert(out.toSeq == again.toSeq)
  }
}
