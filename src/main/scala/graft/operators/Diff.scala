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
}
