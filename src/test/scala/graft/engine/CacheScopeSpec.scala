package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}

/** Pins the [[CacheScope]] lifetime contract (r5 verdict item 7): a
  * long-lived session making repeated operator calls must be able to
  * release each call's persisted intermediates without nuking the whole
  * cache — and the scoped/eager paths must not change results.
  *
  * Leak checks are PER-FRAME against the cache registry
  * (`cacheManager.lookupCachedData` on the scope's own tracked frames),
  * never global `getPersistentRDDs` counts: suites share one
  * SparkSession and run concurrently, so a global count races whatever
  * another suite is persisting (the r6 full-suite flake). The fixture
  * is also copied to a spec-private dir so no other suite can hold a
  * plan-identical cache entry for these frames.
  */
class CacheScopeSpec extends SparkSpec {

  /** Spec-private fixture copy: plan identity includes the file path,
    * so frames read from here can't collide with other suites' caches. */
  private lazy val sf: String = {
    val dir = Files.createTempDirectory("cachescope_sf")
    Seq("documents.parquet", "embeddings.parquet").foreach { f =>
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$f"), dir.resolve(f),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def isCached(f: DataFrame): Boolean =
    spark.sharedState.cacheManager
      .lookupCachedData(f.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .isDefined

  test("repeated scoped dedup + similarity calls don't grow the block manager") {
    graft.engine.GraftSession.tune(spark)
    val docs = graft.engine.Tables.documents(spark, sf)
    val emb = graft.engine.Tables.embeddings(spark, sf)
    var rows = -1L
    (1 to 3).foreach { _ =>
      var tracked: Seq[DataFrame] = Nil
      CacheScope.withScope { scope =>
        val n = Dedup.ngramJaccardPairs(docs, "doc_id", "text", scope = scope)
          .count()
        val m = Similarity.cosineTopK(emb, scope = scope).count()
        if (rows < 0) rows = n + m else assert(rows == n + m)
        tracked = scope.trackedFrames
        assert(tracked.nonEmpty, "operator caches should be scope-tracked")
        assert(tracked.forall(isCached),
          "operator cache should be live in-scope")
      }
      assert(!tracked.exists(isCached),
        "scope close left entries in the cache registry")
    }
  }

  test("withScope releases caches on the failure path too") {
    val docs = graft.engine.Tables.documents(spark, sf)
    var tracked: Seq[DataFrame] = Nil
    intercept[RuntimeException] {
      CacheScope.withScope { scope =>
        Dedup.simhashPairs(docs, "doc_id", "text", scope = scope).count()
        tracked = scope.trackedFrames
        assert(tracked.nonEmpty && tracked.forall(isCached))
        sys.error("consumer blew up")
      }
    }
    assert(!tracked.exists(isCached))
  }

  test("eager: result usable after the scope closed, same rows as scoped") {
    graft.engine.GraftSession.tune(spark)
    val docs = graft.engine.Tables.documents(spark, sf)
    var tracked: Seq[DataFrame] = Nil
    val eager = CacheScope.eager { scope =>
      val r = Dedup.minhashLshPairs(docs, "doc_id", "text", scope = scope)
      tracked = scope.trackedFrames
      r
    }
    // intermediates are gone; the checkpointed result itself is the
    // only block-manager state and dies with the frame's GC
    assert(!tracked.exists(isCached))
    val expected = CacheScope.withScope { s2 =>
      Dedup.minhashLshPairs(docs, "doc_id", "text", scope = s2).collect()
    }
    assert(eager.collect().toSeq == expected.toSeq)
  }
}
