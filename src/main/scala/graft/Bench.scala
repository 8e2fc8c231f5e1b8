package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registry query at the
  * sf-dir in SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Harness discipline (r2 verdict item 2 — the previous harness hid real
  * regressions behind noise; r3 verdict "What's wrong #3" — back-to-back
  * runs shared one contention window):
  *  - deterministic order: queries run in `SparkEntry.registry` order
  *    (a Seq), never hash-map order, so JIT/GC tax lands on the same
  *    queries every round and rounds are comparable;
  *  - SWEEP-interleaved repeats: instead of warmup+N back-to-back runs
  *    per query, the harness makes `warmups + runs` full sweeps over
  *    the registry and reports each query's MIN across timed sweeps.
  *    Back-to-back repeats of one query sit inside the same host
  *    contention burst (BENCH_r03: q17 29.7 s on BOTH runs, q31 55.6 s
  *    on both, while quiet-host runs are 2-3 s) — sweeps space the
  *    repeats ~a full registry apart, so a burst must outlast the whole
  *    bench to poison every sample of a query;
  *  - `spark.catalog.clearCache()` before EVERY run, warmup and timed:
  *    several operators persist() shared intermediate frames, and
  *    Spark's CacheManager matches plan-identical frames across
  *    invocations — without the clear, timed runs would read the
  *    warmup's cache and report the post-cache path, not the honest
  *    per-invocation cost;
  *  - `System.gc()` after every query: localCheckpoint/broadcast blocks
  *    are freed by the ContextCleaner only after the driver-side refs
  *    are collected; without the nudge, debris from iterative queries
  *    (q31's per-pass checkpoints) accumulates in the block manager
  *    across the sweep and later queries pay the eviction;
  *  - a query that throws is a FAILURE: it is reported in `failed`,
  *    excluded from the total, skipped in later sweeps, and the process
  *    exits non-zero (the old harness recorded thrown queries as fast
  *    successes).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "1").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // dev-loop filter: comma-separated query-name substrings; unset = all.
    // The driver never sets it, so the artifact is always the full registry.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    require(runs >= 1 && warmups >= 0,
      s"need runs >= 1 (got $runs) and warmups >= 0 (got $warmups)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.GraftSession.tune(spark)

    val selected = only match {
      case Some(subs) =>
        SparkEntry.registry.filter(q => subs.exists(q.name.contains))
      case None => SparkEntry.registry
    }
    var failed = Set.empty[String]
    // best[i] = min across timed sweeps for registry query i (-1 = failed)
    val best = Array.fill(selected.size)(Double.MaxValue)
    for (sweep <- 1 to (warmups + runs)) {
      val timed = sweep > warmups
      selected.zipWithIndex.foreach { case (q, i) =>
        if (!failed.contains(q.name)) {
          try {
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            // noop sink, NOT count(): under a count aggregate Catalyst
            // prunes every projection-only column, so a query like q33
            // would time the scan and skip the regex/hash work entirely —
            // the noop writer materializes every output column
            q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            if (timed && sec < best(i)) best(i) = sec
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] ${q.name} FAILED: $e")
              failed += q.name
          }
          System.gc() // let the ContextCleaner drop checkpoint debris
        }
      }
    }
    val results = selected.zipWithIndex.map { case (q, i) =>
      q.name -> (if (failed.contains(q.name)) -1.0 else best(i))
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"warmups":$warmups,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
