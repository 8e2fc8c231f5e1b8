package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for pretraining corpora: redact personally
  * identifying spans before anything downstream sees the text. Pure
  * row-local regexp work — codegen'd, no shuffle, linear in corpus
  * size; exactly the shape that runs as the first pass over 100 TB.
  *
  * Patterns deliberately stick to regex constructs with identical
  * semantics in Java regex and RE2 (character classes, bounded
  * quantifiers, no alternation/backtracking) so an external oracle
  * replays the same redactions byte-for-byte.
  */
object Scrub {

  /** Email addresses. `[.]` instead of `\.` on purpose: the pattern is
    * spliced into Spark SQL literals (which eat lone backslashes),
    * DataFrame-API strings and DuckDB literals (which don't) — a
    * backslash-free pattern means one spelling with one meaning in all
    * three. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"

  /** Standalone runs of 6+ digits (phone fragments, ids, SSN-ish). */
  val longDigitsRe = "[0-9]{6,}"

  /** Redacted text plus per-document counts of what was removed —
    * counts first (on the original), then replacement, emails before
    * digit runs so an address's digits aren't double-counted. */
  def redactPii(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(expr(s"regexp_extract_all($textCol, '$emailRe', 0)"))
        .as("n_emails"),
      size(expr(
        s"regexp_extract_all(regexp_replace($textCol, '$emailRe', '<EMAIL>'), '$longDigitsRe', 0)"))
        .as("n_digit_runs"),
      regexp_replace(
        regexp_replace(col(textCol), emailRe, "<EMAIL>"),
        longDigitsRe, "<NUM>").as("redacted"))
}
