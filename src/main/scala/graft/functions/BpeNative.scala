package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE-APPLY subword tokenization — greedy merge application over a
  * pinned merge-rank table, as one compiled row-local pass.
  *
  * Why this exists: every token statistic in the engine (q24/q41/q37/
  * q145/q212 budgets, fertility, packing) counted WHITESPACE tokens,
  * but the budgets a training pipeline actually buys are SUBWORD
  * tokens — fertility in particular is defined over a real tokenizer.
  * This is the tokenizer: byte-pair-encoding APPLICATION (inference,
  * not training) against a merge table learned elsewhere and shipped
  * as a dim — exactly how production pipelines run (the merge table is
  * the tokenizer artifact; applying it is row-local).
  *
  * Merge semantics — occurrence-at-a-time greedy, the HuggingFace
  * `tokenizers` contract: a word starts as its codepoint sequence;
  * repeatedly find the adjacent pair with the LOWEST merge rank
  * (leftmost occurrence on ties — ranks are unique by construction,
  * but a pair can occur at several positions) and merge that ONE
  * occurrence; stop when no adjacent pair is in the table. Merging
  * one occurrence and re-ranking (rather than sweeping all occurrences
  * of the chosen pair first) matters only when a merge OUTPUT itself
  * participates in a lower-ranked merge overlapping a remaining
  * occurrence — the two variants are otherwise identical, and this
  * one is replayable step-for-step in the DuckDB oracle's recursive
  * CTE (one merge per recursion step; final state = the row with the
  * fewest tokens, since every step shrinks the list by exactly one).
  *
  * Scale shape: pure per-word integer/string arithmetic — no shuffle,
  * no state, merge table broadcast as an expression reference object
  * (vocab-sized dim, the [[MarkerCount]] pattern). Worst case
  * O(len² · merges-lookups) per word with O(1) hash lookups — bounded
  * by word length, independent of corpus size. Applied per DISTINCT
  * word where the consumer allows (q253's vocab frame); the per-doc
  * count form ([[BpeSubwordCount]]) is one compiled pass over the
  * document, O(chars + words·len).
  *
  * No reference-repo counterpart (the reference has no tokenizer);
  * capability class: training-data token accounting (SURVEY §2.11).
  */
object BpeNative {

  /** Merge-rank lookup key: the pair's two tokens joined by U+0001
    * (mirrored by the oracle's chr(1); never a codepoint of any merge output — merge tables are built
    * from text tokens, and a control char is not whitespace so it could only
    * appear inside a token if the corpus contained it; the engine's
    * fixture tables are letters-only). */
  def key(a: String, b: String): String = a + "\u0001" + b

  def rankMap(merges: Seq[(String, String)])
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      require(m.put(key(a, b), Integer.valueOf(r)) == null,
        s"duplicate merge pair ($a, $b)")
    }
    m
  }

  /** Pre-tokenization length bound, the real-tokenizer guard (HF
    * WordPiece's max_input_chars_per_word, byte-level BPE's regex
    * pre-split): the greedy merge loop is O(len²) per word, so a
    * single multi-megabyte whitespace-free "word" in a web corpus
    * (a base64 blob, a minified bundle) would stall a task for hours.
    * Words longer than this many CODEPOINTS skip the merge loop and
    * are emitted as their raw codepoint sequence (counted at one
    * subword per codepoint) — linear cost, and an honest budget
    * number: pathological blobs barely merge anyway. Part of the
    * oracle contract: fixture words are orders of magnitude shorter,
    * so the DuckDB CTE replay never sees the cap. */
  val MaxWordCodepoints: Int = 4096

  /** Greedy BPE over ONE word (see semantics above): the final
    * subword strings in order. A word of one codepoint (or empty) is
    * returned as-is; a word over [[MaxWordCodepoints]] is returned as
    * its unmerged codepoints (the length-cap contract above). */
  def subwordList(word: String,
      ranks: java.util.HashMap[String, Integer])
      : java.util.ArrayList[String] = {
    val toks = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      toks.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    var done = toks.size <= 1 || toks.size > MaxWordCodepoints
    while (!done) {
      var bestRank = Integer.MAX_VALUE
      var bestPos = -1
      var j = 0
      while (j < toks.size - 1) {
        val r = ranks.get(key(toks.get(j), toks.get(j + 1)))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPos = j
        }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        toks.set(bestPos, toks.get(bestPos) + toks.get(bestPos + 1))
        toks.remove(bestPos + 1)
        if (toks.size <= 1) done = true
      }
    }
    toks
  }

  /** `graft_bpe_subwords` eval: subword array of one word. */
  def subwords(word: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val toks = subwordList(word.toString, ranks)
    val out = new Array[AnyRef](toks.size)
    var i = 0
    while (i < toks.size) {
      out(i) = UTF8String.fromString(toks.get(i)); i += 1
    }
    new GenericArrayData(out)
  }

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' ||
      cp == '\r'

  /** `graft_bpe_count` eval: total subwords over the WHITESPACE tokens
    * of `text` (the [[TextHashNative]] tokenization — trim/split/drop
    * empties folded into one scan). Caller lowercases if its
    * convention (q212's) wants case-folded merges. */
  def subwordCount(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): Long = {
    val str = text.toString
    val n = str.length
    var total = 0L
    val sb = new java.lang.StringBuilder
    // over-[[MaxWordCodepoints]] words count one subword per
    // codepoint WITHOUT materializing the token list (the cap
    // contract, allocation-free here)
    def flush(): Unit = if (sb.length > 0) {
      val cps = sb.codePointCount(0, sb.length)
      total +=
        (if (cps > MaxWordCodepoints) cps.toLong
         else subwordList(sb.toString, ranks).size.toLong)
      sb.setLength(0)
    }
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isWs(cp)) flush() else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    flush()
    total
  }
}

/** `graft_bpe_subwords(word)` → array<string>: the word's greedy-BPE
  * subwords under the expression's pinned merge table (reference
  * object — shared across rows, broadcast with the plan). */
case class BpeSubwords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.nonEmpty, "BPE needs a non-empty merge table")
  @transient private lazy val ranks = BpeNative.rankMap(merges)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_subwords needs a string input, got ${dt.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(w: Any): Any =
    BpeNative.subwords(w.asInstanceOf[UTF8String], ranks)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("graftBpeRanks", ranks,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeNative.subwords($c, $r);")
  }
  override protected def withNewChildInternal(newChild: Expression)
      : BpeSubwords = copy(child = newChild)
  override def prettyName: String = "graft_bpe_subwords"
}

/** `graft_bpe_count(text)` → bigint: total greedy-BPE subwords across
  * the text's whitespace tokens — one compiled pass per document. */
case class BpeSubwordCount(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {
  require(merges.nonEmpty, "BPE needs a non-empty merge table")
  @transient private lazy val ranks = BpeNative.rankMap(merges)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count needs a string input, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any =
    BpeNative.subwordCount(t.asInstanceOf[UTF8String], ranks)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("graftBpeRanks", ranks,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeNative.subwordCount($c, $r);")
  }
  override protected def withNewChildInternal(newChild: Expression)
      : BpeSubwordCount = copy(child = newChild)
  override def prettyName: String = "graft_bpe_count"
}

/** Column-API surface + the engine's pinned demo merge table. */
object Bpe {

  /** The fixture merge table every BPE query pins (rank = position).
    * Learned-look merges over the documents fixture's vocabulary so
    * several words fully fuse (join/order/row/scan/table/the/value)
    * while others split mid-word — exercising rank precedence,
    * overlapping candidates (fast: (a,s) vs the lower-ranked (s,t)),
    * and multi-step chains. A real deployment passes its tokenizer's
    * learned table instead; nothing below depends on this one. */
  val demoMerges: Seq[(String, String)] = Seq(
    ("s", "c"), ("a", "n"), ("sc", "an"),
    ("t", "a"), ("b", "l"), ("ta", "bl"), ("tabl", "e"),
    ("r", "o"), ("ro", "w"),
    ("j", "o"), ("i", "n"), ("jo", "in"),
    ("t", "h"), ("th", "e"),
    ("e", "r"), ("o", "r"), ("d", "er"), ("or", "der"),
    ("v", "a"), ("l", "u"), ("va", "lu"), ("valu", "e"),
    ("s", "t"), ("a", "s"))

  /** Codegen'd greedy-BPE subword array of a word column. */
  def subwordsOf(word: Column, merges: Seq[(String, String)]): Column =
    GraftColumns.of(BpeSubwords(GraftColumns.expr(word), merges))

  /** Codegen'd total subword count over a text column's whitespace
    * tokens. */
  def subwordCountOf(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumns.of(BpeSubwordCount(GraftColumns.expr(text), merges))

  /** TRAIN a merge table from a corpus — the tokenizer-ARTIFACT
    * producer completing the BPE story (train → ship the table as a
    * dim → apply row-locally): classic byte-pair-encoding training on
    * WORD COUNTS, exactly how Sennrich/HF train — the corpus folds
    * once to the (word, count) vocabulary (partial-aggregated), the
    * TOP-`maxVocab` vocabulary rows by count collect to the driver,
    * and the greedy loop runs locally: count adjacent pairs weighted
    * by word count, merge the most frequent everywhere, repeat.
    * DETERMINISTIC by construction — ties break (count DESC, pair
    * ASC), so the same corpus always yields the same table
    * (spec-pinned), which is what makes the artifact shippable.
    *
    * The `maxVocab` cap is the STRUCTURAL driver-memory bound, not a
    * convention: at web scale distinct whitespace "words" (typos,
    * URLs, hex blobs) are not dim-bounded, so the collect is gated
    * through a TakeOrdered top-N by count (ties word ASC — still
    * deterministic). Dropping the singleton tail is also what
    * Sennrich/HF training effectively does: merges are chosen by
    * pair frequency ≥ 2, and a hapax tail of unique junk words
    * contributes no winning pair. A cap large enough to hold the
    * real vocabulary (default 2²⁰) therefore trains the SAME table
    * as the uncapped fold (spec-pinned on the fixture).
    *
    * Stops early when no pair occurs twice (merging singleton pairs
    * only memorizes words). Returns merges in rank order, directly
    * usable by [[subwordsOf]]/[[subwordCountOf]]. */
  def trainMerges(docs: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int, maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    require(nMerges >= 1 && nMerges <= 65536, s"nMerges=$nMerges")
    require(maxVocab >= 1 && maxVocab <= (1 << 24), s"maxVocab=$maxVocab")
    import org.apache.spark.sql.functions.{col, count, explode, lit, lower}
    val vocab = docs.where(col(textCol).isNotNull)
      .select(explode(TextHash.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      // TakeOrderedAndProject, never a full collect: the enforced
      // top-N bound (count DESC, word ASC — deterministic under ties)
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // words as mutable token lists, weighted by corpus count
    val words = vocab.map { case (w, n) =>
      val toks = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        toks += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      (toks, n)
    }
    val merges = Seq.newBuilder[(String, String)]
    var made = 0
    var done = false
    while (made < nMerges && !done) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (toks, n) =>
        var j = 0
        while (j < toks.length - 1) {
          val p = (toks(j), toks(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += ((a, b))
          made += 1
          // merge every occurrence left-to-right in every word
          words.foreach { case (toks, _) =>
            var j = 0
            while (j < toks.length - 1) {
              if (toks(j) == a && toks(j + 1) == b) {
                toks(j) = a + b
                toks.remove(j + 1)
              } else j += 1
            }
          }
      }
    }
    merges.result()
  }

  /** The DuckDB MAP literal of a merge table — generated from the SAME
    * Seq the Spark expressions hold (the q217 `bandLadderSql`
    * discipline: one source of truth, two engines). Keys are
    * `a || chr(1) || b`, values the rank. */
  def mergeMapSql(merges: Seq[(String, String)]): String =
    merges.zipWithIndex.map { case ((a, b), r) =>
      s"'$a' || chr(1) || '$b': $r"
    }.mkString("MAP {", ", ", "}")

  /** The merge table as a (rank, a, b) frame — the on-disk artifact
    * form (`bpe-train` writes it; any engine reads it). */
  def mergesToDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "a", "b")
  }

  /** Load a merge table written by [[mergesToDf]] — a bounded dim
    * collect (the table IS the tokenizer artifact), rank order
    * restored. */
  def mergesFromDf(df: org.apache.spark.sql.DataFrame)
      : Seq[(String, String)] = {
    import org.apache.spark.sql.functions.col
    df.select(col("rank").cast("long"), col("a"), col("b"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** The DuckDB recursive-CTE replay of the greedy merge over a
    * `words(w)` relation: CTE fragments `bpe(w, toks)` + final
    * `bpefin(w, toks)` — one merge per recursion step (the leftmost
    * occurrence of the lowest-ranked pair), final state per word =
    * the fewest-token row (each step shrinks the list by one). */
  def bpeCteSql(merges: Seq[(String, String)]): String = {
    val mp = mergeMapSql(merges)
    s"""bpe(w, toks) AS (
      |  SELECT w, string_split(w, '') FROM words
      |  UNION ALL
      |  SELECT w, toks[1:bi-1] || [toks[bi] || toks[bi+1]] || toks[bi+2:]
      |  FROM (
      |    SELECT w, toks,
      |      CAST(list_sort(
      |        [[CAST($mp[toks[i] || chr(1) || toks[i+1]][1] AS BIGINT),
      |          CAST(i AS BIGINT)]
      |         FOR i IN range(1, len(toks))
      |         IF len($mp[toks[i] || chr(1) || toks[i+1]]) > 0]
      |        )[1][2] AS BIGINT) AS bi
      |    FROM bpe) s
      |  WHERE bi IS NOT NULL),
      |bpefin AS (
      |  SELECT w, min_by(toks, len(toks)) AS toks FROM bpe GROUP BY w)""".stripMargin
  }
}
