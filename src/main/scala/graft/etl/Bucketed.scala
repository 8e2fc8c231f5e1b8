package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table management — the storage-layout half of the 100 TB
  * join story (SURVEY intro: "repartition()/bucketing for co-located
  * joins"). A fact table written with `bucketBy(n, key).sortBy(key)`
  * is hash-partitioned AND sorted ON DISK: every later join or
  * aggregation on that key reads the layout instead of re-shuffling
  * the corpus — the plan drops BOTH the Exchange and the Sort on each
  * bucketed side (BucketedSpec pins exchange-free, sort-free joins
  * and exchange-free aggregates). At 100 TB this converts every
  * recurring fact⋈fact join from a full-corpus shuffle (the single
  * most expensive operation a cluster runs) into a per-bucket local
  * merge, paid ONCE at write time and amortized over every read.
  *
  * Rules the wrapper enforces (the ways bucketing silently degrades):
  *  - both join sides must use the SAME bucket count — Spark joins
  *    mismatched counts by shuffling the smaller-bucketed side (or,
  *    pre-3.1, both), so `coLocate` takes the count explicitly and
  *    [[bucketsOf]] exposes it for the caller to match;
  *  - bucket columns must be the JOIN key exactly (a bucketed table
  *    joined on a different key shuffles like any other);
  *  - OSS Spark only honors bucketing through the catalog
  *    (`saveAsTable`) — a path-based `parquet(path)` write silently
  *    drops the bucket spec, so this wrapper refuses to exist outside
  *    the table API.
  *
  * Managed tables land in `spark.sql.warehouse.dir`; the Derby-backed
  * session catalog is enough locally, a shared metastore serves the
  * cluster case. */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed parquet table (overwrite).
    * One shuffle now (into `buckets` files per partition-write), zero
    * shuffles on every future `key`-join/aggregate against any table
    * bucketed the same way. */
  def coLocate(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    require(df.columns.contains(key),
      s"bucket key '$key' not in ${df.columns.mkString(", ")}")
    // self-heal the orphaned-location crash/restart window (the
    // IncrementalSink discipline): with an in-memory catalog, a table
    // written in a PREVIOUS session leaves its managed directory on
    // disk while the new session's catalog has never heard of it —
    // and CTAS then refuses with LOCATION_ALREADY_EXISTS even in
    // Overwrite mode (Overwrite only drops CATALOGED tables). A
    // directory at the managed default location of a table name the
    // catalog does not know is debris of this same table: remove it.
    // (Persistent-metastore deployments never hit this branch — the
    // table stays cataloged and Overwrite handles it.)
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        table.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // repartition INTO the bucket count first: otherwise every writer
    // task emits a file per bucket (tasks × buckets small files), and —
    // the subtler cost — Spark only trusts the on-disk sort order when
    // a bucket is ONE file, so multi-file buckets silently resurrect
    // the per-side Sort this layout exists to delete (BucketedSpec
    // would catch it). With n(partitions) = n(buckets) on the same
    // hash, each task owns exactly one bucket.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Read a previously co-located table. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** The bucket count a table was written with (None when the table
    * is not bucketed) — what a caller matches before writing the
    * OTHER side of a co-located join. */
  def bucketsOf(spark: SparkSession, name: String): Option[Int] = {
    val rows = spark.sql(s"DESCRIBE TABLE EXTENDED $name").collect()
    rows.find(_.getString(0) == "Num Buckets")
      .map(_.getString(1).trim.toInt)
  }
}
