package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Sketch

/** The incremental KMV invariants: batch splits merge to EXACTLY the
  * one-shot sketch (distinct-then-rank is the whole merge), the fold
  * is IDEMPOTENT under re-delivery (the deliberate contrast with the
  * counter stores, where a re-delivered batch double-counts), the
  * stored pair matrix matches the direct q251 computation, compact
  * preserves the merged state, and a k-mismatched reopen fails fast. */
class KmvStoreSpec extends SparkSpec {

  private val K = 16

  // ≥ 3 whitespace tokens per doc (shingles need 3); two groups with
  // a deliberately shared doc so the pair matrix has an intersection
  private val corpus = Seq(
    ("g1", "alpha beta gamma delta epsilon"),
    ("g1", "zeta eta theta iota kappa lambda"),
    ("g1", "mu nu xi omicron pi rho sigma tau"),
    ("g2", "alpha beta gamma delta epsilon"),
    ("g2", "upsilon phi chi psi omega alpha"))

  private def df(rows: Seq[(String, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "text")
  }

  private def table(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("row-disjoint batches merge to the one-shot sketch; the " +
    "stored pair matrix matches the direct computation; compact " +
    "preserves both") {
    val dir = Files.createTempDirectory("graft_kmv").toString + "/store"
    val store = new KmvStore(spark, dir, K)
    assert(store.sketches.collect().isEmpty)
    store.ingest(df(corpus.take(2)), "src", "text")
    store.ingest(df(corpus.drop(2)), "src", "text")
    val oneShot = Sketch.kmvSketch(df(corpus), "src", "text", K)
    assert(table(store.sketches) ==
      oneShot.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    val direct = Sketch.kmvPairMatrix(oneShot, "src", K).collect().toSeq
    assert(store.pairMatrix.collect().toSeq == direct)
    assert(direct.nonEmpty && direct.head.getAs[Long]("inter_in_k") > 0,
      "the shared doc must surface as a non-empty intersection")
    val (before, after) = store.compact()
    assert(before >= 2L && after >= 1L)
    assert(store.pairMatrix.collect().toSeq == direct)
  }

  test("re-delivering a batch is a NO-OP — min over a set union is " +
    "idempotent, the at-least-once-safe side of the store family") {
    val dir = Files.createTempDirectory("graft_kmv2").toString + "/store"
    val store = new KmvStore(spark, dir, K)
    val batch = df(corpus.take(3))
    store.ingest(batch, "src", "text")
    val clean = table(store.sketches)
    store.ingest(batch, "src", "text") // harmless here, by design
    assert(table(store.sketches) == clean)
  }

  test("reopening at a different k fails fast before touching state") {
    val dir = Files.createTempDirectory("graft_kmv3").toString + "/store"
    new KmvStore(spark, dir, K).ingest(df(corpus), "src", "text")
    val e = intercept[IllegalArgumentException] {
      new KmvStore(spark, dir, 64).ingest(df(corpus), "src", "text")
    }
    assert(e.getMessage.contains("k=16"))
  }
}
