package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler: times the stages of the shingle pipeline so
  * optimization targets are measured, not guessed. Not part of the
  * driver contract; run via `sbt "runMain graft.tools.Profile"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, "graft-profile")
    import graft.functions.TextHash

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.engine.Tables.documents(spark, sfDir)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      spark.catalog.clearCache()
      time("scan+count")(docs.count())
      time("tokens only") {
        docs.select(TextHash.tokens(col("text")).as("w"))
          .select(sum(size(col("w")))).collect()
      }
      time("tokens+tokenHashes") {
        docs.select(TextHash.tokens(col("text")).as("w"))
          .select(TextHash.tokenHashes("w").as("wh"))
          .select(sum(size(col("wh")))).collect()
      }
      time("tokens+hashes+shingles") {
        docs.select(col("doc_id"), TextHash.tokens(col("text")).as("w"))
          .where(size(col("w")) >= 3)
          .select(col("doc_id"), TextHash.tokenHashes("w").as("wh"))
          .select(col("doc_id"), TextHash.shingleHashes("wh").as("sh"))
          .select(sum(size(col("sh")))).collect()
      }
      time("full q17")(
        graft.queries.Ext.q17.run(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("full q18")(
        graft.queries.Ext.q18.run(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("full q19")(
        graft.queries.Ext.q19.run(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
