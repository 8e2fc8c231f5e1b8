package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic source abstraction (SURVEY.md §2.1).
  *
  * The reference ingests Excel sheets and a JSON array, optionally fetched
  * from a remote object store first (/root/reference/src/extract.py:46-128:
  * download precedes scan). We model the same split: an optional
  * [[ObjectStoreFetcher]] runs on the driver before the scan; the scan
  * itself is a [[Source]] returning a DataFrame.
  */
trait Source {
  def load(spark: SparkSession): DataFrame
}

/** Parquet directory/file scan — the engine's primary columnar source.
  * Predicate pushdown and column pruning reach the scan for free. */
final case class ParquetSource(path: String) extends Source {
  def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** Whole-document JSON array scan (SURVEY §2.1 S2): the reference loads one
  * JSON doc that is an array of records (extract.py:120-123), which in
  * Spark is multiLine=true (NOT newline-delimited JSON). */
final case class JsonArraySource(path: String, schema: Option[StructType] = None)
    extends Source {
  def load(spark: SparkSession): DataFrame = {
    val r = spark.read.option("multiLine", value = true)
    schema.fold(r)(r.schema).json(path)
  }
}

/** ORC directory/file scan — the second columnar format Spark ships
  * natively (vectorized reader, pushdown/pruning like parquet); here so
  * a warehouse standardized on ORC plugs into the same Source seam. */
final case class OrcSource(path: String) extends Source {
  def load(spark: SparkSession): DataFrame = spark.read.orc(path)
}

/** Header-bearing CSV scan — the portable stand-in for tabular sheet data
  * when fixtures are pre-converted (SURVEY §2.1 S1 option a). */
final case class CsvSource(path: String, header: Boolean = true,
    schema: Option[StructType] = None) extends Source {
  def load(spark: SparkSession): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }
}

/** Driver-side rows source (SURVEY §2.1 S1 option b): irregular KB-scale
  * catalog sheets (the reference's Excel workbook) are parsed on the driver
  * — by whatever sheet reader is available — into ordered rows, then
  * parallelized. File order is preserved by construction, which the
  * sentinel-split and keep-first-dedup semantics depend on
  * (SURVEY §2.2 P1/P2, §2.4 A2). For big data this is the wrong tool;
  * big inputs arrive as parquet/CSV/JSON and never pass the driver.
  */
final case class InlineRowsSource(rows: Seq[Row], schema: StructType)
    extends Source {
  def load(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000 + 1)),
      schema)
}

/** JDBC table scan (SURVEY §2.1 S4; /root/reference/src/load.py:7-18
  * reads `SELECT {pk} FROM {table}` from Postgres). `keys` is the
  * column-pruned existing-PK read the incremental load pairs with a
  * left_anti join — pushdown sends only the key column over the wire.
  *
  * Runtime-exercised against embedded Apache Derby (which ships in the
  * Spark distribution's jars): JdbcSpec drives load/keys/append and the
  * full insert-if-absent flow through the real JDBC read/write
  * machinery. A deployment swaps the URL (+ driver jar) for its
  * warehouse and these options work unchanged.
  */
final case class JdbcSource(url: String, table: String,
    properties: Map[String, String] = Map.empty) extends Source {
  def load(spark: SparkSession): DataFrame =
    properties.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** Key-only scan — the S4 shape (`get_existing_ids`, load.py:13-14). */
  def keys(spark: SparkSession, pkCol: String): DataFrame =
    load(spark).select(org.apache.spark.sql.functions.col(pkCol))

  /** Whether the table resolves on the remote database. Spark's JDBC
    * relation fetches the schema eagerly (a `WHERE 1=0` probe) at
    * DataFrame creation, so resolution failure IS the existence test —
    * no dialect-specific catalog query needed. */
  def tableExists(spark: SparkSession): Boolean =
    try { load(spark).schema; true } catch { case _: Exception => false }
}

/** JDBC append writer (SURVEY §2.1 S5; load.py:40,58 —
  * `to_sql(if_exists='append')`). Append-only like the reference:
  * the insert-if-absent logic stays in the caller's anti-join
  * (IncrementalSink semantics), never an UPDATE/MERGE. */
object JdbcSink {
  def append(df: DataFrame, url: String, table: String,
      properties: Map[String, String] = Map.empty): Unit =
    properties.foldLeft(
      df.write.format("jdbc").option("url", url).option("dbtable", table)
    ) { case (w, (k, v)) => w.option(k, v) }
      .mode(org.apache.spark.sql.SaveMode.Append).save()

  /** Insert-if-absent against a live JDBC table — the reference's exact
    * serving flow (load.py:13-14 reads existing PKs, :40,58 appends only
    * absent rows), with the same contract as the parquet
    * `IncrementalSink.appendOnlyNew`:
    *  - never update — re-sent changed rows are silently ignored;
    *  - within-batch PK uniqueness ENFORCED (the remote DDL's PK
    *    constraint would reject the load anyway — failing before any
    *    row lands keeps the append all-or-nothing at the batch level);
    *  - null-PK rows always pass the anti-join (pandas `~isin` parity);
    *  - the fresh set is materialized (eager localCheckpoint) BEFORE the
    *    append so no executor re-evaluates a plan that reads the very
    *    table being written (persist would be best-effort, not a
    *    barrier).
    * Scale: existing keys arrive as a column-pruned distributed JDBC
    * scan partitioned by the usual jdbc options (partitionColumn /
    * numPartitions in `properties`), anti-joined without driver
    * involvement — the reference's driver-side Python `set` is the one
    * thing this must never recreate.
    * Returns (inserted, ignored) — load.py:53-57's accounting. */
  def appendOnlyNew(spark: SparkSession, df: DataFrame, url: String,
      table: String, pkCol: String,
      properties: Map[String, String] = Map.empty): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
    val acct = df.agg(count(lit(1)), count(col(pkCol)),
      countDistinct(col(pkCol))).head()
    val incomingCount = acct.getLong(0)
    val dupes = acct.getLong(1) - acct.getLong(2)
    require(dupes == 0L,
      s"jdbc table '$table': incoming batch carries $dupes duplicate " +
        s"non-null '$pkCol' rows; the never-update sink refuses ambiguous " +
        s"batches — dedup upstream (Transform.dedupKeepFirst) where row " +
        s"order exists")
    val src = JdbcSource(url, table, properties)
    if (!src.tableExists(spark)) {
      append(df, url, table, properties)
      (incomingCount, 0L)
    } else {
      val fresh = df.join(src.keys(spark, pkCol), Seq(pkCol), "left_anti")
        .localCheckpoint(true)
      val freshCount = fresh.count() // served from checkpointed blocks
      if (freshCount > 0)
        append(fresh.select(df.columns.map(col).toIndexedSeq: _*),
          url, table, properties)
      (freshCount, incomingCount - freshCount)
    }
  }
}

/** Driver-side fetch of a remote object to a local path before scanning
  * (SURVEY §2.1 S3: the reference's Drive connector is a pre-scan
  * side-channel, not a dataflow operator). Implementations wrap whatever
  * client the deployment has; the engine only needs the local path back.
  */
trait ObjectStoreFetcher {
  def fetch(objectName: String, container: String, localPath: String): String
}

/** A fetcher for already-local files (tests, mounted filesystems). */
object LocalFetcher extends ObjectStoreFetcher {
  def fetch(objectName: String, container: String, localPath: String): String =
    s"$container/$objectName"
}
