package graft.engine

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}

/** Pins the [[CacheScope]] lifetime contract (r5 verdict item 7): a
  * long-lived session making repeated operator calls must be able to
  * release each call's persisted intermediates without nuking the whole
  * cache — and the scoped/eager paths must not change results. */
class CacheScopeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("repeated scoped dedup + similarity calls don't grow the block manager") {
    spark.catalog.clearCache()
    graft.engine.GraftSession.tune(spark)
    val docs = graft.engine.Tables.documents(spark, sf)
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val base = cachedRddCount
    var rows = -1L
    (1 to 3).foreach { _ =>
      CacheScope.withScope { scope =>
        val n = Dedup.ngramJaccardPairs(docs, "doc_id", "text", scope = scope)
          .count()
        val m = Similarity.cosineTopK(emb, scope = scope).count()
        if (rows < 0) rows = n + m else assert(rows == n + m)
        assert(cachedRddCount > base, "operator cache should be live in-scope")
      }
      assert(cachedRddCount == base,
        s"scope close leaked caches: $cachedRddCount vs $base")
    }
  }

  test("withScope releases caches on the failure path too") {
    spark.catalog.clearCache()
    val docs = graft.engine.Tables.documents(spark, sf)
    val base = cachedRddCount
    intercept[RuntimeException] {
      CacheScope.withScope { scope =>
        Dedup.simhashPairs(docs, "doc_id", "text", scope = scope).count()
        sys.error("consumer blew up")
      }
    }
    assert(cachedRddCount == base)
  }

  test("eager: result usable after the scope closed, same rows as unmanaged") {
    spark.catalog.clearCache()
    graft.engine.GraftSession.tune(spark)
    val docs = graft.engine.Tables.documents(spark, sf)
    val eager = CacheScope.eager { scope =>
      Dedup.minhashLshPairs(docs, "doc_id", "text", scope = scope)
    }
    // intermediates are gone; the checkpointed result itself is the
    // only block-manager state and dies with the frame's GC
    val expected = Dedup.minhashLshPairs(docs, "doc_id", "text").collect()
    spark.catalog.clearCache()
    assert(eager.collect().toSeq == expected.toSeq)
  }
}
