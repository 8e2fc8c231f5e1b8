package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** BM25 relevance semantics (q52's operator) on the sf0.001 documents
  * fixture plus hand-built corpora where the score is checkable by
  * hand-replaying the formula.
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  test("bm25Scores: only matching docs appear, n_terms_matched counts distinct terms") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark query spark table"),
      (2L, "window sort merge"),
      (3L, "the row agg filter")).toDF("doc_id", "text")
    val out = Retrieval.bm25Scores(corpus, "doc_id", "text",
      Seq("spark", "window")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val byId = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId(1L) == 1) // "spark" twice = one distinct term
    assert(byId(2L) == 1)
  }

  test("bm25Scores: hand-replayed fixed-point score on a 2-doc corpus") {
    import spark.implicits._
    // doc 1: tf(spark)=2, dl=4; doc 2: dl=2, no match. N=2, avgdl=3.
    val corpus = Seq(
      (1L, "spark query spark table"),
      (2L, "window sort")).toDF("doc_id", "text")
    val out = Retrieval.bm25Scores(corpus, "doc_id", "text", Seq("spark"))
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L)
    val idf = (2.0 - 1.0 + 0.5) / (1.0 + 0.5)
    val sat = (2.0 * 2.25) / (2.0 + 1.25 * (0.25 + 0.75 * (4.0 / 3.0)))
    val expected = math.floor(idf * sat * 1048576.0).toLong
    assert(out.head.getLong(2) == expected)
  }

  test("bm25Scores: rarer term dominates a common one at equal tf/dl") {
    import spark.implicits._
    // "hash" in 1 of 4 docs, "table" in 4 of 4; probe docs have equal
    // length and tf=1 each — the rare-term doc must outrank
    val corpus = Seq(
      (1L, "hash key row value"),
      (2L, "table key row value"),
      (3L, "table scan agg sort"),
      (4L, "table line part col")).toDF("doc_id", "text")
    val scores = Retrieval.bm25Scores(corpus, "doc_id", "text",
      Seq("hash", "table"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(1L) > scores(2L))
  }

  test("bm25Scores: partitioning-invariant (fixed-point sum commutes)") {
    val terms = Seq("spark", "query", "window", "vector")
    val one = Retrieval.bm25Scores(docs.coalesce(1), "doc_id", "text", terms)
      .collect().toSeq
    val many = Retrieval.bm25Scores(docs.repartition(13), "doc_id", "text",
      terms).collect().toSeq
    assert(one == many)
  }

  test("bm25Scores: fixture run is non-trivial and doc_id-ordered") {
    val out = Retrieval.bm25Scores(docs, "doc_id", "text",
      Seq("spark", "query", "window", "vector", "stream", "shuffle"))
      .collect()
    assert(out.length > 10)
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
    assert(out.forall(_.getLong(2) > 0L))
  }

  test("postingLists: df band by hand — rare dropped, over-half dropped") {
    import spark.implicits._
    // 4 docs; term arrays passed directly (the generic surface).
    // df: x=3 (> 4/2, stopword-capped out), y=2 (kept), z=1 (< minDf).
    val corpus = Seq(
      (10L, Seq("x", "y")),
      (11L, Seq("x", "y")),
      (12L, Seq("x", "z")),
      (13L, Seq.empty[String])).toDF("doc_id", "terms")
    val out = Retrieval.postingLists(corpus, "doc_id", col("terms"),
      minDf = 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toSeq))
    assert(out.toSeq == Seq(("y", 2L, Seq(10L, 11L))))
  }

  test("postingLists: duplicate occurrences within a doc count once") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq("a", "a", "b")),
      (2L, Seq("a")),
      (3L, Seq("b")),
      (4L, Seq("c")),
      (5L, Seq("c"))).toDF("doc_id", "terms")
    val out = Retrieval.postingLists(corpus, "doc_id", col("terms"),
      minDf = 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toSeq))
    // a: df 2 (not 3 — doc 1's repeat collapses); b, c: df 2
    assert(out.toSeq == Seq(
      ("a", 2L, Seq(1L, 2L)),
      ("b", 2L, Seq(1L, 3L)),
      ("c", 2L, Seq(4L, 5L))))
  }

  test("rrfFuse: consensus beats a single-list head; one-list docs " +
    "keep a null rank on the missing side; ties break on doc_id") {
    val s = spark; import s.implicits._
    // list A: d1 first, d2 second, d3 third; list B: d2 first, d3
    // second (d1 absent from B)
    val a = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 2L, 1), (1L, 3L, 2))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, k = 60, topK = 10).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3),
        if (r.isNullAt(4)) null else r.getInt(4),
        if (r.isNullAt(5)) null else r.getInt(5)))
    // d2: 1/62 + 1/61 ≈ .0325 beats d1's single 1/61 ≈ .0164;
    // d3: 1/63 + 1/62 ≈ .0320 also beats d1
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((2L, 1), (3L, 2), (1L, 3)))
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(2L)._3 == 1.0 / 62 + 1.0 / 61)
    assert(byDoc(1L)._3 == 1.0 / 61)            // absent side adds 0
    assert(byDoc(1L)._4 == 1 && byDoc(1L)._5 == null)
    assert(byDoc(3L)._4 == 3 && byDoc(3L)._5 == 2)
  }

  test("rrfFuse rejects malformed inputs") {
    val s = spark; import s.implicits._
    val ok = Seq((1L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val badCols = Seq((1L, 1L)).toDF("query_id", "doc_id")
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(ok, badCols) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(ok, ok, k = 0)
    }
  }

  test("tfIdfKeywords: rare terms outrank frequent ones; within-doc " +
    "tf breaks idf ties; term breaks full ties; k caps per doc") {
    val s2 = spark; import s2.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry zebra"),
      (3L, "apple cherry cherry")
    ).toDF("doc_id", "text")
    val out = Retrieval.tfIdfKeywords(docs, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(5)) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // N = 3; df: apple 2, banana 2, cherry 2, zebra 1
    // idf_fp(df 2) = (4·2^20)//3 = 1398101; idf_fp(df 1) = 2·2^20
    // doc1: apple tf2 wins over banana tf1 (same idf)
    assert(out((1L, 1)) == (("apple", 2L, 2L)))
    assert(out((1L, 2)) == (("banana", 1L, 2L)))
    assert(!out.contains((1L, 3)))
    // doc2: rare zebra (idf 2097152) outranks the df-2 pair; the
    // banana/cherry full tie resolves by term order
    assert(out((2L, 1)) == (("zebra", 1L, 1L)))
    assert(out((2L, 2)) == (("banana", 1L, 2L)))
    assert(out((2L, 3)) == (("cherry", 1L, 2L)))
    // doc3: cherry tf2 over apple tf1
    assert(out((3L, 1)) == (("cherry", 2L, 2L)))
    assert(out((3L, 2)) == (("apple", 1L, 2L)))
  }
}
