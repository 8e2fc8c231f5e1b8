package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diffing — the data-ops audit between two versions of a
  * keyed corpus/table: which ids were added, removed, content-changed,
  * or untouched since the last snapshot. This is the first question
  * after every ingest ("yesterday's crawl vs today's: what actually
  * moved?"), the sanity gate before an expensive re-process (a 90%%
  * "changed" rate usually means a normalization bug upstream, not 90%%
  * fresh content), and the input a downstream incremental consumer
  * (novelty store, PQ index, training shards) uses to decide what to
  * re-ingest.
  *
  * Scale shape: content equality is decided by a row-local sha-256
  * over the compared columns (computed independently on each side —
  * a 32-byte fingerprint joins where re-reading full text would carry
  * the corpus through the shuffle twice), then ONE full-outer hash
  * join on the id — both sides partition on the same key — and a
  * partial-aggregable (source, change) rollup whose exchange carries
  * counts. Nothing else shuffles; no window, no driver state.
  *
  * The fingerprint is a hash OF per-column hashes: each compared
  * column is hashed independently (sha-256 of its string form, NULL
  * mapped to a one-char sentinel no 64-hex-char hash can equal), and
  * the outer hash covers the fixed-arity concatenation. Every column
  * therefore contributes exactly one token at a fixed position —
  * ("ab","c") / ("a","bc") can't alias (per-column hashing), and
  * ("a",NULL) / (NULL,"a") can't either (the sentinel holds the
  * NULL column's position, where a bare `concat_ws` would drop the
  * column together with its separator and collapse the two rows).
  */
object Diff {

  /** Per-(source, change) counts between two snapshots keyed by
    * `idCol`: change ∈ added | removed | changed | unchanged, source
    * taken from the new side when present (else the old side — a
    * removed doc still reports under its original source). Two rows
    * compare equal iff they agree column-by-column, NULL ≡ NULL —
    * see the class scaladoc for the NULL-safe fingerprint shape. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      sourceCol: String, contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs content columns")
    def fingerprinted(df: DataFrame, side: String) = {
      val bad = (idCol +: sourceCol +: contentCols)
        .filterNot(df.columns.contains)
      require(bad.isEmpty, s"snapshotDiff: unknown columns $bad")
      df.select(col(idCol).as("id"),
        col(sourceCol).as(s"${side}_source"),
        // 64 hex chars per non-NULL column, one non-hex sentinel char
        // for NULL: the token stream parses back uniquely, so the
        // outer hash is injective over per-column (value-or-NULL)
        sha2(concat(contentCols.map(c =>
          coalesce(sha2(col(c).cast("string"), 256), lit("N"))): _*), 256)
          .as(s"${side}_hash"))
    }
    fingerprinted(oldSnap, "old")
      .join(fingerprinted(newSnap, "new"), Seq("id"), "full_outer")
      .select(
        coalesce(col("new_source"), col("old_source")).as("source"),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged").as("change"))
      .groupBy(col("source"), col("change"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("change"))
  }

  /** CORPUS INTEGRITY FINGERPRINT — verify a copy/export of a 100 TB
    * corpus WITHOUT sorting it or shuffling a single full row: per
    * group, the row count, the NULL-content count, and two
    * ORDER-INSENSITIVE content checksums (an exact DECIMAL sum of the
    * portable 31-fold char hash, reduced mod 2⁶², and a bit-XOR of
    * the independent 131-fold). Sum and XOR are commutative,
    * associative and partition-mergeable, so two sides of a transfer
    * compute their fingerprints independently — different partition
    * counts, different row orders, different engines — and compare a
    * |groups|-row table. Two checksums because each is individually
    * forgeable by accident (a swap of two rows' contents preserves
    * the sum of anything; XOR misses duplicate-pair drops); agreeing
    * on BOTH plus the count is the practical bar for "same bytes".
    *
    * [[snapshotDiff]] answers "WHICH ids changed" with an id join;
    * this answers "is it the SAME corpus" with no join at all.
    *
    * Scale shape: one partial-aggregated fold; the shuffle carries
    * |groups| rows of counters. */
  def contentChecksum(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val bad = Seq(groupCol, textCol).filterNot(df.columns.contains)
    require(bad.isEmpty, s"unknown columns: $bad")
    val dec = "DECIMAL(38,0)"
    df.select(col(groupCol).as("grp"),
        graft.functions.TextHash.charFoldOf(col(textCol), 31L, 0L)
          .as("__h1"),
        graft.functions.TextHash.charFoldOf(col(textCol), 131L, 7L)
          .as("__h2"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__h1").isNull, 1L).otherwise(0L)).as("n_nulls"),
        expr(s"CAST(sum(CAST(__h1 AS $dec)) % 4611686018427387904" +
          " AS BIGINT)").as("sum_hash"),
        expr("bit_xor(__h2)").as("xor_hash"))
      .orderBy(col("grp").asc_nulls_first)
  }
}
