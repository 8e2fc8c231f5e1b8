package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled implementations of the [[TextHash]] folds.
  *
  * Why this exists (r4 bench forensics): the HOF formulations
  * (`aggregate(transform(sequence(...)))` per character) are evaluated
  * interpretively — Spark higher-order functions never enter
  * whole-stage codegen, and each character pays a Catalyst
  * `Expression.eval` round trip plus a boxed lambda call. At sf0.1 the
  * tokenize+hash chain alone measured ~0.45 s warm (~30% of q18's
  * whole floor), and under host contention that interpreted CPU is the
  * first thing to stall — q17/q18/q19 were the three queries that blew
  * their 2× per-query budgets in BENCH_r04. These expressions run the
  * identical arithmetic as one primitive JVM loop per row.
  *
  * Numeric contract: BIT-IDENTICAL to the [[TextHash]] HOF reference
  * on the engine's supported text domain. Tokenization splits on runs
  * of Java-regex `\s` characters (space, \t, \n, \x0B, \f, \r —
  * exactly the class `split(trim(text), "\\s+")` uses); hashing folds
  * h = (h*31 + codepoint) % P left-to-right. Code points, not UTF-8
  * bytes, keep the fold engine-portable: DuckDB's `ascii()` (the
  * oracle's mirror) is code-point based. `TextHashPropsSpec`
  * property-pins native ≡ HOF on ASCII strings (the corpus domain —
  * all driver fixtures verified 100% ASCII at every SF) and pins the
  * code-point semantics on non-ASCII directly.
  *
  * All methods are static forwarders callable from generated Java, so
  * every expression here participates in whole-stage codegen with one
  * invoke per row and zero allocation beyond the output array.
  */
object TextHashNative {
  import TextHash.P

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' ||
      cp == '\r'

  /** Ordered per-token polynomial hashes — compiled
    * `TextHash.tokenHashes(TextHash.tokens(text))`. */
  def tokenHashes(s: UTF8String): ArrayData =
    new GenericArrayData(tokenHashArray(s))

  private def tokenHashArray(s: UTF8String): Array[Long] = {
    val str = s.toString
    val n = str.length
    var out = new Array[Long](8)
    var m = 0
    var h = 0L
    var inTok = false
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isWs(cp)) {
        if (inTok) {
          if (m == out.length) out = java.util.Arrays.copyOf(out, m * 2)
          out(m) = h; m += 1; h = 0L; inTok = false
        }
      } else {
        inTok = true
        h = (h * 31L + cp) % P
      }
      i += Character.charCount(cp)
    }
    if (inTok) {
      if (m == out.length) out = java.util.Arrays.copyOf(out, m + 1)
      out(m) = h; m += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** Distinct hashed word-3-gram shingles in first-occurrence order —
    * compiled `array_distinct(TextHash.shingleHashes(tokenHashes))`.
    * Empty array (not null) when the text has fewer than 3 tokens. */
  def shingleHashes(s: UTF8String): ArrayData = {
    val th = tokenHashArray(s)
    if (th.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](th.length * 2)
    var i = 0
    while (i <= th.length - 3) {
      val hs = (((th(i) * 31L + th(i + 1)) % P) * 31L + th(i + 2)) % P
      seen.add(hs)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }

  /** k MinHash permutation minimums over a shingle-hash array — the
    * row-local equivalent of `groupBy(doc).agg(min(minhashPerm(i, hs))
    * for i < k)` (same set, same mins; order-independent). Null for an
    * empty array (min of nothing), matching the groupBy formulation
    * where such a doc never has a row. */
  def minhashSignature(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = sh.getLong(j)
      var i = 0
      while (i < k) {
        val p = (h * (2L * i + 1) + (1000003L * i + 12345L)) % P
        if (p < mins(i)) mins(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Count of tokens that belong to a marker set — compiled
    * `size(filter(words, t => t.isin(markers)))`. Null elements are
    * never hits (`isin` yields null there, which `filter` drops). */
  def markerCount(words: ArrayData, markers: Array[UTF8String]): Int = {
    val n = words.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        var j = 0
        while (j < markers.length) {
          if (markers(j).equals(w)) { c += 1; j = markers.length }
          else j += 1
        }
      }
      i += 1
    }
    c
  }

  /** Sum of per-token character counts — compiled
    * `aggregate(transform(words, x -> length(x)), 0L, (a, b) -> a + b)`.
    * A null element poisons the whole sum to null, exactly as `a + null`
    * does in the HOF fold. */
  def sumTokenLengths(words: ArrayData): Any = {
    val n = words.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) return null
      s += words.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  /** Whole-array polynomial fold — compiled
    * `aggregate(hashes, 0L, (a, x) -> ((a * mult) + x) % P)`.
    * 0 on an empty array (the fold's zero), like the HOF. */
  /** Whole-string character fold `h ← (h·mult + codepoint) mod P`
    * from `seed` — compiled [[TextHash.charFold]]. CODEPOINT
    * iteration (not UTF-16 units), the same convention as
    * [[tokenHashes]] and DuckDB's `ascii()`. Empty string folds to
    * the seed. */
  def charFold(s: UTF8String, mult: Long, seed: Long): Long = {
    val str = s.toString
    val n = str.length
    var h = seed % P
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def polyFold(hs: ArrayData, mult: Long): Long = {
    val n = hs.numElements()
    var a = 0L
    var i = 0
    while (i < n) {
      a = (a * mult + hs.getLong(i)) % P
      i += 1
    }
    a
  }

  /** Minimum `gram`-window polynomial fold over a hash array — compiled
    * `array_min(transform(sequence(1, n - gram + 1), i ->
    *   aggregate(slice(hs, i, gram), 0L, (a, x) -> ((a * 131) + x) % P)))`
    * guarded by `n >= gram`. Null below `gram` elements (the guard's
    * `otherwise(null)` branch folded in). */
  def minGramFold(hs: ArrayData, gram: Int): Any = {
    val n = hs.numElements()
    if (n < gram) return null
    var best = Long.MaxValue
    var i = 0
    while (i <= n - gram) {
      var a = 0L
      var j = 0
      while (j < gram) {
        a = (a * 131L + hs.getLong(i + j)) % P
        j += 1
      }
      if (a < best) best = a
      i += 1
    }
    best
  }

  /** SimHash fingerprint over a shingle-hash array — the row-local
    * equivalent of the exploded `sum(when(simhashBit(j, hs) === 1, 1)
    * .otherwise(-1))` per bit (sum over the same set; order-free).
    * Null for an empty array. */
  def simhashFingerprint(sh: ArrayData, bits: Int): Any = {
    val n = sh.numElements()
    if (n == 0) return null
    var fp = 0L
    var j = 0
    while (j < bits) {
      var s = 0L
      var i = 0
      while (i < n) {
        val h = sh.getLong(i)
        val bit = ((h * (2L * j + 3) + (7L * j + 1)) % P) & 1L
        s += (if (bit == 1L) 1L else -1L)
        i += 1
      }
      if (s > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** POSITIONAL polynomial hashes of every `span`-token window — the
    * substring-dedup unit (each element w_i is the 31-multiplier fold
    * of token hashes i..i+span-1; empty array below `span` tokens).
    * Unlike [[shingleHashes]] this keeps duplicates AND order: element
    * index IS the window's 0-based token position, which is what lets
    * the span-dedup operator turn "window w repeats" into "tokens
    * [i, i+span) are covered".
    *
    * One compiled O(tokens) pass: the naive per-window fold is
    * O(tokens·span) — at span=50 that is 50× the corpus's total CPU —
    * so the window hash is maintained incrementally: drop the leading
    * term (w - th_i·31^(span-1)) mod P, shift by 31, add the entering
    * token. All intermediates stay under 2^61 (P < 2^30), no overflow,
    * never negative. The HOF slice/aggregate form in
    * [[TextHash.windowHashes]] is the executable reference semantics;
    * TextHashProps pins them equal. */
  def windowHashes(s: UTF8String, span: Int): ArrayData = {
    val th = tokenHashArray(s)
    val n = th.length
    if (n < span) return new GenericArrayData(Array.emptyLongArray)
    // 31^(span-1) mod P, for removing the window's leading term
    var pw = 1L
    var k = 1
    while (k < span) { pw = (pw * 31L) % P; k += 1 }
    val out = new Array[Long](n - span + 1)
    var w = 0L
    var j = 0
    while (j < span) { w = (w * 31L + th(j)) % P; j += 1 }
    out(0) = w
    var i = 1
    while (i <= n - span) {
      w = (((w - (th(i - 1) * pw) % P + P) % P) * 31L + th(i + span - 1)) % P
      out(i) = w
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_token_hashes(text)` → array<bigint>: ordered per-token
  * polynomial hashes; one compiled pass over the string. */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_token_hashes needs a string input, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(s: Any): Any =
    TextHashNative.tokenHashes(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashNative.tokenHashes($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_token_hashes"
}

/** `graft_shingle_hashes(text)` → array<bigint>: distinct hashed
  * word-3-gram shingles (empty array below 3 tokens); one compiled
  * pass — tokenize, per-token fold, 3-gram fold, dedup. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes needs a string input, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(s: Any): Any =
    TextHashNative.shingleHashes(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashNative.shingleHashes($c);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** `graft_minhash_signature(sh, k)` → array<bigint> of the k MinHash
  * permutation minimums of a shingle-hash array (null on empty). */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"minhash signature needs k >= 1, got $k")
  // containsNull=false required (ADVICE r5): getLong on a null element
  // reads 0 or NPEs depending on the array encoding — via the SQL
  // registration a null-bearing array would silently poison the
  // signature. The operators only ever feed null-free hash arrays.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_signature needs array<bigint> without null elements, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input array => null
  override protected def nullSafeEval(sh: Any): Any =
    TextHashNative.minhashSignature(sh.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHashNative.minhashSignature($c, $k);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_signature"
}

/** `graft_simhash(sh, bits)` → bigint SimHash fingerprint of a
  * shingle-hash array (null on empty). */
case class SimhashFingerprint(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"simhash needs 1 <= bits <= 63, got $bits")
  // containsNull=false required — same rationale as MinhashSignature
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash needs array<bigint> without null elements, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty input array => null
  override protected def nullSafeEval(sh: Any): Any =
    TextHashNative.simhashFingerprint(sh.asInstanceOf[ArrayData], bits)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("fp")
      s"""
      Object $r = graft.functions.TextHashNative.simhashFingerprint($c, $bits);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }"""
    })
  override protected def withNewChildInternal(newChild: Expression): SimhashFingerprint =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

/** `graft_marker_count(words, m1, m2, ...)` → int: number of tokens in
  * the marker set — compiled `size(filter(words, t => t.isin(...)))`.
  * The marker set is tiny (language stopword profiles), so membership
  * is a linear probe over a shared UTF8String array, no per-row
  * allocation. */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends UnaryExpression {
  require(markers.nonEmpty, "marker count needs a non-empty marker set")
  @transient private lazy val utf8Markers: Array[UTF8String] =
    markers.map(UTF8String.fromString).toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_marker_count needs array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(words: Any): Any =
    TextHashNative.markerCount(words.asInstanceOf[ArrayData], utf8Markers)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("graftMarkers", utf8Markers,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashNative.markerCount($c, $m);")
  }
  override protected def withNewChildInternal(newChild: Expression): MarkerCount =
    copy(child = newChild)
  override def prettyName: String = "graft_marker_count"
}

/** `graft_sum_token_lengths(words)` → bigint: sum of per-token char
  * counts — compiled `aggregate(transform(words, x -> length(x)), 0L,
  * (a, b) -> a + b)` (null element => null sum, like the HOF fold). */
case class SumTokenLengths(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_sum_token_lengths needs array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null element poisons the sum
  override protected def nullSafeEval(words: Any): Any =
    TextHashNative.sumTokenLengths(words.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sumLen")
      s"""
      Object $r = graft.functions.TextHashNative.sumTokenLengths($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }"""
    })
  override protected def withNewChildInternal(newChild: Expression): SumTokenLengths =
    copy(child = newChild)
  override def prettyName: String = "graft_sum_token_lengths"
}

/** `graft_char_fold(text, mult, seed)` → bigint: whole-string
  * codepoint fold h = (h·mult + cp) % P from `seed` — compiled
  * [[TextHash.charFold]] (the q236/q243 content hash; seed folds out
  * of an empty string unchanged). */
case class CharFold(child: Expression, mult: Long, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_char_fold needs a string input, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(s: Any): Any =
    TextHashNative.charFold(s.asInstanceOf[UTF8String], mult, seed)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashNative.charFold($c, ${mult}L, ${seed}L);")
  override protected def withNewChildInternal(newChild: Expression): CharFold =
    copy(child = newChild)
  override def prettyName: String = "graft_char_fold"
}

/** `graft_poly_fold(hashes, mult)` → bigint: whole-array left fold
  * h = (h*mult + x) % P — compiled `TextHash.rollingFold` (0 on empty,
  * the fold's zero element). */
case class PolyFold(child: Expression, mult: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_poly_fold needs array<bigint> without null elements, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(hs: Any): Any =
    TextHashNative.polyFold(hs.asInstanceOf[ArrayData], mult)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashNative.polyFold($c, ${mult}L);")
  override protected def withNewChildInternal(newChild: Expression): PolyFold =
    copy(child = newChild)
  override def prettyName: String = "graft_poly_fold"
}

/** `graft_min_gram_fold(hashes, gram)` → bigint: minimum over all
  * `gram`-length windows of the 131-multiplier polynomial fold — the
  * winnowing-style min-gram marker, compiled from the nested
  * `array_min(transform(sequence(...), i -> aggregate(slice(...))))`
  * HOF (null below `gram` elements, folding in the caller's size
  * guard). */
case class MinGramFold(child: Expression, gram: Int)
    extends UnaryExpression {
  require(gram >= 1, s"min-gram fold needs gram >= 1, got $gram")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_min_gram_fold needs array<bigint> without null elements, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // fewer than `gram` hashes => null
  override protected def nullSafeEval(hs: Any): Any =
    TextHashNative.minGramFold(hs.asInstanceOf[ArrayData], gram)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mgf")
      s"""
      Object $r = graft.functions.TextHashNative.minGramFold($c, $gram);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }"""
    })
  override protected def withNewChildInternal(newChild: Expression): MinGramFold =
    copy(child = newChild)
  override def prettyName: String = "graft_min_gram_fold"
}

/** `graft_window_hashes(text, span)` → array<bigint>: positional
  * polynomial hashes of every `span`-token window (empty array below
  * `span` tokens) — one compiled rolling O(tokens) pass; see
  * [[TextHashNative.windowHashes]]. */
case class WindowHashes(child: Expression, span: Int)
    extends UnaryExpression {
  require(span >= 1, s"window hashes need span >= 1, got $span")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_window_hashes needs a string input, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(s: Any): Any =
    TextHashNative.windowHashes(s.asInstanceOf[UTF8String], span)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashNative.windowHashes($c, $span);")
  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_window_hashes"
}
