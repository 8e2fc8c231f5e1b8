package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under the sf-dir. Reads are plain
  * `spark.read.parquet` so Catalyst's predicate pushdown / column pruning
  * reach the scan — at 100 TB these tables would be directories of many
  * files (ideally partitioned, e.g. the fact by date) and the same code
  * holds.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")

  /** The `events.ts` column as BIGINT microseconds-since-epoch,
    * adapting to however the parquet encodes it — the fixture has
    * shipped it both as TIMESTAMP(NANOS) (read as long nanos under
    * `nanosAsLong`) and as TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).
    * The UTC session timezone (GraftSession.tune) makes the NTZ→LTZ
    * cast an identity reinterpretation, so every branch agrees with
    * DuckDB's `epoch_us(ts)` — the form the oracle SQL uses — and all
    * downstream µs arithmetic (sessionize gaps, as-of tolerances,
    * interval bounds) is integer-exact regardless of encoding. */
  def tsUs(events: DataFrame): Column = events.schema("ts").dataType match {
    // The long branch is ONLY the nanosAsLong read path (TIMESTAMP
    // with NANOS logical type surfacing as INT64). A plain BIGINT
    // column of µs would also arrive here and a silent div-1000 would
    // shift every temporal query by 1000× — so the div is guarded by a
    // magnitude bound: any epoch-nanos after 1973 is ≥ 1e17, while the
    // same instants in µs are ~3 orders of magnitude smaller. Values
    // below the bound fail loudly instead of being reinterpreted.
    case LongType =>
      import org.apache.spark.sql.functions.{format_string, lit, raise_error, when}
      val minPlausibleNs = 100000000000000000L // 1973-03-03 in ns
      when(col("ts").isNull, lit(null).cast(LongType))
        .when(col("ts") >= minPlausibleNs, expr("ts div 1000"))
        .otherwise(raise_error(format_string(
          "events.ts INT64 value %s is too small to be epoch " +
            "nanoseconds — a plain-BIGINT microseconds encoding? " +
            "Refusing the silent div-1000; fix the read path " +
            "(Tables.tsUs) for this encoding", col("ts"))).cast(LongType))
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case TimestampType    => unix_micros(col("ts"))
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type ${other.catalogString}")
  }

  /** `events.ts` as a TIMESTAMP event-time column (for windowed /
    * streaming use) — `timestamp_micros` over [[tsUs]], so every
    * encoding branch is integer-exact µs first. */
  def eventTime(events: DataFrame): Column =
    org.apache.spark.sql.functions.timestamp_micros(tsUs(events))
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
