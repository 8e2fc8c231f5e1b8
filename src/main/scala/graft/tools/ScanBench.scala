package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: quantify the single-row-group scan bottleneck on
  * row-local-heavy queries — same query with and without a
  * hash-repartition right after the read. */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(32, "graft-scanbench")
    graft.engine.GraftSession.quietKnownBenignWarnings()

    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val r = f
      println(f"[scanbench] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val liR = li.repartition(32, col("l_orderkey"))
    def q1of(l: org.apache.spark.sql.DataFrame) = l
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("n"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val docsR = docs.repartition(32, col("doc_id"))
    def redact(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"),
            "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
          "\\d{3}-\\d{4}", "<PHONE>").as("t"))
      .select(col("doc_id"), length(col("t")).as("n"))
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val evR = ev.repartition(32, col("user_id"))
    def parse(e: org.apache.spark.sql.DataFrame) = e
      .select(col("user_id"), col("ts"),
        sha2(concat_ws("|", col("user_id"), col("event_type")), 256).as("h"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"),
        max(col("h")).as("m"))
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("q1-shape scan 1-part")(noop(q1of(li)))
      time("q1-shape repartitioned")(noop(q1of(liR)))
      time("regex-redact 1-part")(noop(redact(docs)))
      time("regex-redact repartitioned")(noop(redact(docsR)))
      time("events sha 1-part")(noop(parse(ev)))
      time("events sha repartitioned")(noop(parse(evR)))
    }
    spark.stop()
  }
}
