package graft.tools

/** Dev-only plan dumper for the optimization rounds: writes
  * `.explain("formatted")` of selected registry queries to text files
  * (the `plans/rNN/<query>_<suffix>.txt` deliverable — the judge
  * cannot run Spark and checks plan claims against these). Not part
  * of the driver contract.
  *
  * Usage: `sbt "runMain graft.tools.DumpPlans <outDir> <suffix> <sub1,sub2,...>"`
  * — dumps every registry query whose name contains one of the
  * comma-separated substrings (or ALL queries when the list is `all`).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: DumpPlans <outDir> <suffix> <sub1,sub2,...|all>")
    val Array(outDir, suffix, subsArg) = args
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val subs = subsArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = graft.engine.GraftSession.local(32, "graft-plans")
    graft.engine.GraftSession.quietKnownBenignWarnings()
    val selected =
      if (subsArg == "all") graft.SparkEntry.registry
      else graft.SparkEntry.registry
        .filter(q => subs.exists(q.name.contains))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir))
    selected.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        // queryExecution.explainString mirrors explain("formatted")
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q.name}_$suffix.txt"),
          plan)
        println(s"[plans] wrote ${q.name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] ${q.name} FAILED: $e")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
