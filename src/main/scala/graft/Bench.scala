package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registry query at the
  * sf-dir in SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Harness discipline (r2 verdict item 2 — the previous harness hid real
  * regressions behind noise):
  *  - deterministic order: queries run in `SparkEntry.registry` order
  *    (a Seq), never hash-map order, so JIT/GC tax lands on the same
  *    queries every round and rounds are comparable;
  *  - per-query 1 warmup + 2 timed runs, reporting the MIN — the min
  *    is the least-noise estimator once JIT/codegen compilation has
  *    happened (which is what the warmup is for);
  *  - `spark.catalog.clearCache()` before EVERY run, warmup and timed:
  *    several operators persist() shared intermediate frames, and
  *    Spark's CacheManager matches plan-identical frames across
  *    invocations — without the clear, timed runs would read the
  *    warmup's cache and report the post-cache path, not the honest
  *    per-invocation cost;
  *  - a query that throws is a FAILURE: it is reported in `failed`,
  *    excluded from the total, and the process exits non-zero (the old
  *    harness recorded thrown queries as fast successes).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "1").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    require(runs >= 1 && warmups >= 0,
      s"need runs >= 1 (got $runs) and warmups >= 0 (got $warmups)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.GraftSession.tune(spark)

    var failed = List.empty[String]
    val results = SparkEntry.registry.map { q =>
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // noop sink, NOT count(): under a count aggregate Catalyst
        // prunes every projection-only column, so a query like q33
        // would time the scan and skip the regex/hash work entirely —
        // the noop writer materializes every output column
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        (1 to warmups).foreach(_ => once())
        q.name -> (1 to runs).map(_ => once()).min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: $e")
          failed ::= q.name
          q.name -> -1.0
      }
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"warmups":$warmups,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
