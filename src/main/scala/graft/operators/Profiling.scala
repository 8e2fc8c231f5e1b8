package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Resolve a verbatim column name — backtick-escaped, so names
    * containing dots, quotes, or backticks resolve as one column
    * instead of being parsed as nested-field / SQL syntax. */
  private def raw(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** Long-form profile: (column_name, n_rows, n_nulls, n_distinct)
    * per requested column, ordered by column name. Built entirely from
    * Column expressions (internal aliases are positional, the user
    * name travels only as a string literal) — no SQL-string
    * interpolation, so arbitrary column names can't break parsing. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"unknown columns: $bad")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      sum(when(raw(c).isNull, 1L).otherwise(0L)).as(s"c${i}__nulls"),
      countDistinct(raw(c)).as(s"c${i}__distinct")) } :+
      count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("column_name"),
      col(s"c${i}__nulls").as("n_nulls"),
      col(s"c${i}__distinct").as("n_distinct")) }: _*)
    wide.select(explode(entries).as("e"), col("__rows").as("n_rows"))
      .select(col("e.column_name").as("column_name"), col("n_rows"),
        col("e.n_nulls").as("n_nulls"), col("e.n_distinct").as("n_distinct"))
      .orderBy(col("column_name"))
  }
}
