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

  /** URLs, scheme-anchored with a greedy path class. A trailing
    * sentence dot can be absorbed into the match — acceptable for
    * redaction (the span was getting removed anyway) and, like every
    * pattern here, byte-identical in Java regex and RE2. */
  val urlRe = "https?://[A-Za-z0-9./_%?=&#-]+"

  /** Dotted-quad IPv4. No word anchors (`\\b` is backslash territory —
    * see [[emailRe]]'s splicing note), so a dotted version string also
    * redacts; deliberate over-redaction, mirrored by the oracle. */
  val ipv4Re = "([0-9]{1,3}[.]){3}[0-9]{1,3}"

  /** Network-identifier redaction: URLs then IPv4s — URL FIRST, because
    * a URL's host may itself be a dotted quad and must come out as one
    * `<URL>`, not a `<IP>` embedded in link text. Counts follow the
    * redactPii discipline: each pattern counted on the text its
    * replacement actually sees. */
  def redactNetwork(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(expr(s"regexp_extract_all($textCol, '$urlRe', 0)"))
        .as("n_urls"),
      size(expr(
        s"regexp_extract_all(regexp_replace($textCol, '$urlRe', '<URL>'), '$ipv4Re', 0)"))
        .as("n_ips"),
      regexp_replace(
        regexp_replace(col(textCol), urlRe, "<URL>"),
        ipv4Re, "<IP>").as("redacted"))
}
