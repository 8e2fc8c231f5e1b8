package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text-hashing primitives for the
  * LLM-data-pipeline operators (SURVEY.md §2.11).
  *
  * Everything here is a left-fold polynomial hash mod a 30-bit prime,
  * built from Spark higher-order functions — codegen-friendly, no UDFs,
  * no JVM-specific hashing. The folds are order-pinned (a left fold over
  * the array), so any engine with list lambdas computes bit-identical
  * values; the DuckDB oracle mirrors each fold with
  * `list_reduce(list_prepend(0, …))`. That portability is what lets the
  * driver hash-compare MinHash/SimHash outputs across engines — Spark's
  * own `hash`/`xxhash64` are murmur-based and not reproducible elsewhere.
  *
  * Scale: all of these are per-row array expressions — narrow, no
  * shuffle, whole-stage-codegen'd. Cost is O(total chars) per document.
  *
  * Char-indexed folds need literal positions that the Scala HOF API
  * cannot express (`substring` takes Int positions), so the fold bodies
  * are SQL `expr` templates over a column *name*; the typed-Column
  * helpers below cover the rest.
  */
object TextHash {

  /** 30-bit prime modulus; keeps every intermediate < 2^35 so the fold
    * arithmetic never overflows a long (and never goes negative, which
    * would make `%` semantics engine-dependent). */
  val P: Long = 1000000007L

  /** Whitespace tokenization: trim → split on runs of whitespace → drop
    * empties. The filter makes leading/trailing/duplicate whitespace
    * harmless in both engines. */
  def tokens(textCol: Column): Column = {
    val w = split(trim(textCol), "\\s+")
    filter(w, t => t =!= lit(""))
  }

  /** Per-token polynomial char hash: h = (h*31 + ascii(c)) % P, folded
    * left over the token's characters. Applied to a tokens-array column
    * (by name), returns the parallel array of token hashes. */
  def tokenHashes(wordsCol: String): Column =
    expr(s"""
      transform($wordsCol, t ->
        aggregate(transform(sequence(1, length(t)), j -> ascii(substring(t, j, 1))),
          0L, (h, c) -> ((h * 31L) + c) % ${P}L))""")

  /** Hashed word-3-gram shingles, distinct per document. Combines three
    * consecutive token hashes with the same 31/mod-P fold. 0-based Spark
    * indexing: positions i-1, i, i+1 for i in [1, size-2]; callers must
    * guard size >= 3 (Spark's `sequence(1, 0)` counts DOWN, it is not
    * empty). */
  def shingleHashes(tokenHashCol: String): Column =
    expr(s"""
      array_distinct(transform(sequence(1, size($tokenHashCol) - 2), i ->
        ((((($tokenHashCol[i-1] * 31L) + $tokenHashCol[i]) % ${P}L) * 31L)
          + $tokenHashCol[i+1]) % ${P}L))""")

  /** Rolling fingerprint over an array-of-hashes column:
    * fp = (fp*131 + h_i) % P, folded left. */
  def rollingFold(hashesCol: String): Column =
    expr(s"aggregate($hashesCol, 0L, (a, x) -> ((a * 131L) + x) % ${P}L)")

  /** POSITIONAL `span`-token window hashes of a token-hash array
    * column: element i (0-based) is the 31-multiplier fold of hashes
    * i..i+span-1; duplicates and order kept (unlike [[shingleHashes]]),
    * empty array below `span` hashes. This slice/aggregate form is the
    * executable reference for the rolling O(tokens) compiled
    * [[windowHashesOf]] (TextHashProps pins them equal); the DuckDB
    * oracle mirrors this form 1-based. */
  def windowHashes(tokenHashCol: String, span: Int): Column =
    expr(s"""
      CASE WHEN size($tokenHashCol) >= $span THEN
        transform(sequence(1, size($tokenHashCol) - ${span - 1}), i ->
          aggregate(slice($tokenHashCol, i, $span),
            0L, (h, x) -> ((h * 31L) + x) % ${P}L))
      ELSE cast(array() AS array<bigint>) END""")

  /** The i-th MinHash permutation of a shingle hash:
    * (a_i * h + b_i) % P with a_i = 2i+1 (odd, nonzero mod the prime P)
    * and b_i an arbitrary fixed offset. */
  def minhashPerm(i: Int, shingleHash: Column): Column =
    (shingleHash * lit(2L * i + 1) + lit(1000003L * i + 12345L)) % lit(P)

  /** The j-th SimHash bit of a hash: parity of an independent affine
    * re-hash — ((2j+3)*h + 7j+1) % P, lowest bit. Independent per-bit
    * re-hashing (rather than slicing one 30-bit hash) is what lets the
    * fingerprint carry 48 useful bits. */
  def simhashBit(j: Int, hashCol: Column): Column =
    ((hashCol * lit(2L * j + 3) + lit(7L * j + 1)) % lit(P)).bitwiseAND(lit(1L))

  // ---- compiled equivalents ([[TextHashNative]]) -------------------
  // The HOF folds above stay as the executable REFERENCE semantics
  // (property-pinned equal); operators use these codegen'd forms so the
  // per-character work runs as one primitive JVM loop per row instead
  // of an interpreted Catalyst eval per character.

  import org.apache.spark.sql.GraftColumns

  /** Codegen'd `tokenHashes(tokens(text))`: ordered per-token hashes. */
  def tokenHashesOf(text: Column): Column =
    GraftColumns.of(TokenHashes(GraftColumns.expr(text)))

  /** Codegen'd distinct word-3-gram shingle hashes of a text column
    * (empty array below 3 tokens). */
  def shingleHashesOf(text: Column): Column =
    GraftColumns.of(ShingleHashes(GraftColumns.expr(text)))

  /** Codegen'd k-permutation MinHash signature of a shingle array. */
  def minhashSignatureOf(sh: Column, k: Int): Column =
    GraftColumns.of(MinhashSignature(GraftColumns.expr(sh), k))

  /** Codegen'd SimHash fingerprint of a shingle array. */
  def simhashOf(sh: Column, bits: Int): Column =
    GraftColumns.of(SimhashFingerprint(GraftColumns.expr(sh), bits))

  /** Codegen'd marker-set token count (`size(filter(w, isin(...)))`). */
  def markerCountOf(words: Column, markers: Seq[String]): Column =
    GraftColumns.of(MarkerCount(GraftColumns.expr(words), markers))

  /** Codegen'd sum of per-token character counts. */
  def sumTokenLengthsOf(words: Column): Column =
    GraftColumns.of(SumTokenLengths(GraftColumns.expr(words)))

  /** Codegen'd [[rollingFold]] (whole-array 131-multiplier fold). */
  def rollingFoldOf(hashes: Column): Column =
    GraftColumns.of(PolyFold(GraftColumns.expr(hashes), 131L))

  /** Codegen'd minimum `gram`-window fold (null below `gram` hashes). */
  def minGramFoldOf(hashes: Column, gram: Int): Column =
    GraftColumns.of(MinGramFold(GraftColumns.expr(hashes), gram))

  /** Codegen'd positional `span`-token window hashes of a text column
    * (empty array below `span` tokens; rolling O(tokens) pass). */
  def windowHashesOf(text: Column, span: Int): Column =
    GraftColumns.of(WindowHashes(GraftColumns.expr(text), span))

  /** Portable whole-string character fold
    * `h ← (h·mult + codepoint) mod P` starting from `seed` — the q80
    * term hash generalized to any multiplier/seed. Built from Spark
    * SQL HOFs (aggregate/transform — inside whole-stage codegen), and
    * replayed verbatim in DuckDB via list_reduce/list_transform, so
    * the value — not just the distribution — matches across engines.
    * Empty strings fold to the seed (a descending `sequence(1, 0)` is
    * the Spark trap the guard exists for). */
  def charFoldOf(text: Column, mult: Long, seed: Long): Column =
    GraftColumns.of(CharFold(GraftColumns.expr(text), mult, seed))

  /** HOF REFERENCE semantics of [[charFoldOf]] (property-pinned
    * equal) — operators use the compiled form above. */
  def charFold(c: Column, mult: Long, seed: Long): Column = {
    import org.apache.spark.sql.functions.{aggregate, ascii, length,
      lit, sequence, transform, when}
    when(length(c) === 0, lit(seed)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(c)),
          j => ascii(c.substr(j, lit(1))).cast("long")),
        lit(seed),
        (h, ch) => (h * mult + ch) % P))
  }
}
