package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Shared durability discipline for append-only parquet STORES (the
  * novelty shingle store, the LSH signature index): `_SUCCESS`-gated
  * validity, and the temp-path-then-verified-swap compaction whose
  * rename handling treats `FileSystem.rename` as what it is on HDFS —
  * an operation that reports most failures by RETURNING FALSE, not by
  * throwing. Extracted from [[NoveltyStore]] so every store shares one
  * audited copy of the crash-window logic instead of re-growing its
  * own.
  */
private[etl] object ParquetStore {

  private def hfs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True iff the store directory holds committed data: data files
    * under a `_SUCCESS` job-commit marker. Data without the marker
    * (a writer died between task commit and job commit) FAILS loudly —
    * reading partial state would silently shift results. A crashed
    * compact leaves `.compact_old`; that heals by re-running compact,
    * and the error says so. `what` names the component in messages. */
  def gatedExists(spark: SparkSession, storeDir: String,
      what: String): Boolean = {
    val d = new Path(storeDir)
    val fs = hfs(spark, d)
    val old = new Path(storeDir + ".compact_old")
    if (!fs.exists(d)) {
      if (fs.exists(old)) throw new IllegalStateException(
        s"$what $storeDir missing but $old exists — a compact() " +
          "crashed mid-swap; call compact() to heal before reading")
      false
    } else {
      val entries = fs.listStatus(d).filterNot { s =>
        val n = s.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
      val committed = entries.nonEmpty && fs.exists(new Path(d, "_SUCCESS"))
      if (committed) true
      else if (fs.exists(old)) throw new IllegalStateException(
        // an uncommitted (or empty) live copy BESIDE old is the
        // post-swap verification-failure window: the real data is at
        // old, and reporting "store empty" here would let a reader
        // silently see nothing while the last complete copy waits —
        // compact() restores it
        s"$what $storeDir is uncommitted but $old exists — a " +
          "compact() crashed mid-swap; call compact() to heal before " +
          "reading")
      else if (entries.isEmpty) false
      else throw new IllegalStateException(
        s"$what $storeDir has data files but no _SUCCESS marker " +
          "— a prior append crashed before job commit; rebuild the " +
          "store (delete the directory and re-ingest) rather than " +
          "reading partial state")
    }
  }

  /** Rewrite the accumulated per-batch appends into few SIZED files
    * (`ceil(bytes / targetFileBytes)` — a single-task `coalesce(1)`
    * rewrite would both serialize the job and emit one giant file).
    * The compacted copy goes to a TEMP directory off the live store,
    * then swaps in with two VERIFIED renames; `old` (the last complete
    * copy until the swap proves itself) is only deleted once the live
    * path exists and lists committed parquet files. Crash windows
    * self-heal on the next call: stale `.compact_tmp` → deleted;
    * `.compact_old` with the store missing (died between renames) →
    * old restored; `.compact_old` beside a live store → leftover
    * deleted. Returns (files before, files after). */
  def compact(spark: SparkSession, storeDir: String, read: => DataFrame,
      targetFileBytes: Long): (Long, Long) = {
    val store = new Path(storeDir)
    val fs = hfs(spark, store)
    val tmp = new Path(storeDir + ".compact_tmp")
    val old = new Path(storeDir + ".compact_old")
    // heal any crash window of a previous run (see scaladoc)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) {
      // committed = _SUCCESS marker plus at least one parquet data file;
      // a store that exists but fails this check is the post-swap
      // verification-failure window whose message promised the previous
      // copy stays at old — deleting old here would lose that copy.
      def committed(p: Path): Boolean =
        fs.exists(new Path(p, "_SUCCESS")) && fs.listStatus(p).toSeq
          .exists(_.getPath.getName.endsWith(".parquet"))
      if (!fs.exists(store)) { // mid-swap crash: restore the last copy
        if (!fs.rename(old, store)) throw new java.io.IOException(
          s"compact: healing rename $old -> $store failed; the last " +
            "complete copy is still at the .compact_old path")
      } else if (committed(store)) {
        fs.delete(old, true) // post-swap crash: store is live and whole
      } else { // store present but uncommitted: old IS the live data
        fs.delete(store, true)
        if (!fs.rename(old, store)) throw new java.io.IOException(
          s"compact: healing rename $old -> $store failed; the last " +
            "complete copy is still at the .compact_old path")
      }
    }
    def parquetFiles(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(store)
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    read.repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    def renameOrDie(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst)) throw new java.io.IOException(
        s"compact: rename $src -> $dst failed (FileSystem returned " +
          "false); store left in a self-healing state — re-run compact()")
    if (fs.exists(store)) renameOrDie(store, old)
    renameOrDie(tmp, store)
    val after = parquetFiles(store)
    if (!fs.exists(new Path(store, "_SUCCESS")) || after.isEmpty)
      throw new IllegalStateException(
        s"compact: post-swap verification failed — $store lacks " +
          "committed parquet files; previous copy preserved at " +
          s"$old for healing")
    if (fs.exists(old)) fs.delete(old, true)
    (before.size.toLong, after.size.toLong)
  }
}
