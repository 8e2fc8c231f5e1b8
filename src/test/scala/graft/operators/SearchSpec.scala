package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** The frozen-index search contract: serving queries against STORED
  * artifacts (codebook + codes, coarse codebook + cells) reproduces
  * the in-memory train-and-search operators row for row on the same
  * corpus — q57 (pqTopK ≡ pqSearch) and q61 (ivfPqTopK ≡
  * ivfPqSearch), including through the `index`/`search` CLI cores. */
class SearchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sf)
  private def queries = emb.where(col("vec_id") % 50 === 0)

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getLong(3))).toSeq

  test("pqSearch over a frozen codebook+codes == pqTopK on the build corpus") {
    val book = Quantize.trainCodebook(emb)
    val codes = Quantize.encodeWith(book)(emb)
    val direct = rows(Quantize.pqTopK(emb, m = 8, k = 8, topK = 5,
      queryStride = 50))
    assert(direct.nonEmpty)
    assert(rows(Quantize.pqSearch(queries, book, codes, topK = 5))
      == direct)
  }

  test("ivfPqSearch over frozen artifacts == ivfPqTopK on the build corpus") {
    val book = Quantize.trainCodebook(emb)
    val codes = Quantize.encodeWith(book)(emb)
    val coarse = Quantize.trainCoarseCodebook(emb)
    val cells = Quantize.assignCells(coarse)(emb)
    val direct = rows(Quantize.ivfPqTopK(emb, m = 8, k = 8, probes = 2,
      topK = 5, queryStride = 50))
    assert(direct.nonEmpty)
    assert(rows(Quantize.ivfPqSearch(queries, book, codes, coarse, cells,
      probes = 2, topK = 5)) == direct)
  }

  test("index + search CLI cores serve both rungs from disk; re-index is frozen") {
    val base = Files.createTempDirectory("graft_search_cli").toString
    val qDir = base + "/queries.parquet"
    queries.write.parquet(qDir)
    val idx = base + "/index"
    val (frozen1, n1) = graft.Main.runIndex(spark,
      s"$sf/embeddings.parquet", idx)
    assert(!frozen1 && n1 > 0)
    // the stored-artifact search == the in-memory operators
    graft.Main.runSearch(spark, idx, qDir, base + "/adc", 5, None)
    assert(rows(spark.read.parquet(base + "/adc")
      .orderBy(col("query_id"), col("rank")))
      == rows(Quantize.pqTopK(emb, m = 8, k = 8, topK = 5,
        queryStride = 50)))
    graft.Main.runSearch(spark, idx, qDir, base + "/ivf", 5, Some(2))
    assert(rows(spark.read.parquet(base + "/ivf")
      .orderBy(col("query_id"), col("rank")))
      == rows(Quantize.ivfPqTopK(emb, m = 8, k = 8, probes = 2, topK = 5,
        queryStride = 50)))
    // a second index run trusts the committed codebooks (frozen path)
    // and reproduces byte-identical search results
    val (frozen2, _) = graft.Main.runIndex(spark,
      s"$sf/embeddings.parquet", idx)
    assert(frozen2)
    graft.Main.runSearch(spark, idx, qDir, base + "/adc2", 5, None)
    assert(rows(spark.read.parquet(base + "/adc2")
      .orderBy(col("query_id"), col("rank")))
      == rows(spark.read.parquet(base + "/adc")
        .orderBy(col("query_id"), col("rank"))))
  }
}
