package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifetime handle for the caches the multi-consumer operators create
  * (r4/r5 advice): `Dedup.*Pairs` and `Similarity.*` persist shared
  * intermediate frames (shingle index, normed vectors) that their
  * returned frame reads lazily, so the operator itself can never
  * unpersist — something has to end the lifetime after the result is
  * materialized. Without a handle that something was the caller
  * remembering `spark.catalog.clearCache()`, which a long-lived session
  * interleaving many operator calls forgets at its peril (the block
  * manager grows monotonically).
  *
  * Usage — scoped (caller controls when the result is consumed):
  * {{{
  * CacheScope.withScope { scope =>
  *   Dedup.ngramJaccardPairs(docs, "doc_id", "text", scope = scope)
  *     .write.parquet(out)        // consume INSIDE the scope
  * }                              // intermediates unpersisted here
  * }}}
  *
  * or eager (result survives the scope; intermediates don't):
  * {{{
  * val pairs = CacheScope.eager { scope =>
  *   Dedup.minhashLshPairs(docs, "doc_id", "text", scope = scope)
  * } // pairs is materialized (localCheckpoint), caches already freed
  * }}}
  *
  * Consuming a scoped result AFTER `close()` is safe but slow: the plan
  * recomputes without the cache. The default `unmanaged` scope keeps
  * the historical contract — blocks live until `clearCache()` or
  * session end (fine for per-query processes like Verify, and for the
  * bench, which clears per run).
  */
final class CacheScope private[engine] (managed: Boolean) {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK — spill, don't evict, under
    * pressure) and register it for release at `close()`. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    if (managed) synchronized { frames += p }
    p
  }

  /** The frames this scope persisted and will release — test-visible so
    * specs can assert per-frame cache-registry state instead of racing
    * other suites on global block-manager counts. */
  private[graft] def trackedFrames: Seq[DataFrame] =
    synchronized { frames.toSeq }

  /** Release every cache this scope created. Idempotent; non-blocking
    * (block eviction completes asynchronously, but the entries leave
    * the cache registry immediately, so repeated scoped calls never
    * stack). */
  def close(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}

object CacheScope {

  /** The no-release scope: persists are left for the caller's
    * `clearCache()`/session end, the pre-handle contract. */
  val unmanaged: CacheScope = new CacheScope(managed = false)

  /** A fresh managed scope; pair with `close()`, or use [[withScope]]. */
  def apply(): CacheScope = new CacheScope(managed = true)

  /** Run `f` with a fresh scope and release its caches on the way out
    * (also on failure). Consume the operator result inside `f`. */
  def withScope[T](f: CacheScope => T): T = {
    val scope = apply()
    try f(scope) finally scope.close()
  }

  /** Eager-materialize-then-unpersist: build an operator result in a
    * fresh scope, force it with an eager `localCheckpoint` (operator
    * results here are small — pair lists, signatures), then free every
    * intermediate cache. The returned frame reads its own checkpointed
    * blocks, which the ContextCleaner reclaims once the frame is
    * garbage-collected — no explicit lifetime left to manage. */
  def eager(build: CacheScope => DataFrame): DataFrame =
    withScope(scope => build(scope).localCheckpoint(eager = true))
}
