package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column extraction (SURVEY.md §2.11) — the
  * schema-on-read step every event pipeline needs: payload columns
  * arrive as JSON strings (`events.props`), and the typed fields
  * inside them feed the same relational operators as any parquet
  * column. Extraction is `get_json_object` — a codegen'd native
  * expression walking a JSONPath, no UDF, no whole-row parse when one
  * field is asked for — followed by an explicit cast that turns
  * malformed or missing fields into NULLs (never errors: a poison
  * payload must not kill a 100 TB scan).
  *
  * At scale the pattern to avoid is re-parsing the same payload once
  * per field: [[extractLong]] composes (each call is one pass over the
  * string), so multi-field consumers should extract all fields in ONE
  * select — the optimizer keeps them in a single codegen stage over
  * one scan.
  */
object SemiStructured {

  /** `$.field` of a JSON-string column as a nullable LONG column:
    * missing key, non-numeric value and malformed JSON all yield NULL
    * (get_json_object returns NULL; the non-ANSI cast turns garbage
    * into NULL rather than raising). */
  def extractLong(jsonCol: Column, field: String): Column =
    get_json_object(jsonCol, s"$$.$field").cast("long")

  /** Per-group stats of one numeric JSON field — the "is this payload
    * field healthy per event type" profile: row count, how many rows
    * actually carry the field (presence is a data-quality signal of
    * its own), the exact integer sum, and the mean over PRESENT
    * values (one IEEE division of exact integers). One scan, one
    * |groups|-row shuffle (partial-aggregated). */
  def jsonFieldStats(df: DataFrame, jsonCol: String, field: String,
      groupCol: String): DataFrame = {
    val v = extractLong(col(jsonCol), field)
    df.select(col(groupCol), v.as("__v"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        count(col("__v")).cast("long").as("n_present"),
        sum(col("__v")).cast("long").as("sum_value"))
      .withColumn("mean_value",
        col("sum_value").cast("double") / col("n_present").cast("double"))
      .orderBy(col(groupCol))
  }

  /** JSON FIELD TOP-K — the value census of a semi-structured field
    * per group ("what OS strings appear in props, per platform"):
    * extract with the same poison-proof [[extractLong]] path, count,
    * keep each group's k most frequent values. Missing / malformed /
    * mistyped payloads surface as the NULL value row — the
    * missing-rate is part of the census, not silently dropped (the
    * [[jsonFieldStats]] presence-counting convention made visible).
    *
    * Deterministic: ties order by count desc then value ASC NULLS
    * FIRST, pinned on both engines (the labelPurity trap). Scale
    * shape: extraction row-local; ONE partial-aggregable
    * (group, value) count; the rank filter plans as WindowGroupLimit
    * (per-task k-heaps before the exchange — the q46 shape). */
  def jsonFieldTopK(df: DataFrame, jsonCol: String, field: String,
      groupCol: String, k: Int = 5): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol), extractLong(col(jsonCol), field).as("value"))
      .groupBy(col(groupCol), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n").desc, col("value").asc_nulls_first)
    counts
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col(groupCol), col("rank"))
  }
}
