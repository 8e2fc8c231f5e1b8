package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the pre-flight a pipeline runs before it
  * trusts a new table (or before a corpus team sets filters): per
  * column, row count, null count, and exact distinct cardinality.
  *
  * Scale shape: ONE aggregate pass over the table computes every
  * metric (all partial-aggregable — null counters are sums,
  * `countDistinct` expands to Spark's internal Expand + two-phase
  * aggregate), and the wide 1-row result is unpivoted to long form
  * with `stack` AFTER aggregation, so the unpivot touches |cols| rows,
  * never the table. Metrics are deliberately counts only: min/max
  * would need per-type rendering to stay engine-portable, while counts
  * hash-verify as-is.
  */
object Profiling {

  /** Long-form profile: (column_name, n_rows, n_nulls, n_distinct)
    * per requested column, ordered by column name. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"unknown columns: $bad")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"))) :+
      count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`").mkString(", ")
    wide.select(
      expr(s"stack(${cols.size}, $stackArgs)")
        .as(Seq("column_name", "n_nulls", "n_distinct")),
      col("__rows").as("n_rows"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
      .orderBy(col("column_name"))
  }
}
