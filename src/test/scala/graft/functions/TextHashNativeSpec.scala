package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Pins the compiled [[TextHashNative]] expressions bit-identical to
  * the interpreted [[TextHash]] HOF reference — the contract that lets
  * the operators swap the hot path without touching a single oracle.
  * Randomized inputs cover the corpus domain (ASCII words, every
  * Java-regex `\s` whitespace kind, degenerate token counts); unicode
  * code-point semantics are pinned directly against the documented
  * fold since the fixtures are 100% ASCII and Spark's `ascii()`
  * byte-vs-codepoint behavior is not part of the contract.
  */
class TextHashNativeSpec extends SparkSpec {

  private def df(texts: String*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("text", StringType))))
  }

  private val rng = new scala.util.Random(20260812L)
  private def randWord(): String = {
    val chars = "abcdefghijklmnopqrstuvwxyzABC0123456789.,;:!?'-()$%"
    (0 until (1 + rng.nextInt(10)))
      .map(_ => chars(rng.nextInt(chars.length))).mkString
  }
  private def randText(): String = {
    val seps = Seq(" ", "  ", "\t", "\n", " \t ", "", "\f", "\r\n")
    val n = rng.nextInt(12) // includes 0/1/2-token degenerates
    (0 until n).map(_ => randWord())
      .mkString(seps(rng.nextInt(seps.length))) +
      (if (rng.nextBoolean()) " " else "")
  }

  test("token hashes: native == HOF reference on 200 random texts") {
    val texts = (0 until 200).map(_ => randText()) ++
      Seq("", " ", "one", "a b", "  lead  and  trail  ")
    val d = df(texts: _*)
    val hof = d.select(col("id"), TextHash.tokens(col("text")).as("w"))
      .select(col("id"), TextHash.tokenHashes("w").as("wh"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq)
    val native = d.select(col("id"),
        TextHash.tokenHashesOf(col("text")).as("wh"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq)
    assert(hof.toSeq == native.toSeq)
  }

  test("shingle hashes: native == HOF reference incl. distinct order") {
    val texts = (0 until 200).map(_ => randText()) ++
      Seq("a b c", "a b c a b c a b c", "x y", "")
    val d = df(texts: _*)
    // the HOF chain filters sub-3-token docs before the shingle expr
    // (sequence(1, n) counts DOWN for n < 1); native yields [] for them
    val hof = d.select(col("id"), TextHash.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 3)
      .select(col("id"), TextHash.tokenHashes("w").as("wh"))
      .select(col("id"),
        array_distinct(TextHash.shingleHashes("wh")).as("hs"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val native = d.select(col("id"),
        TextHash.shingleHashesOf(col("text")).as("hs"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(native.filter(_._2.nonEmpty) == hof.filter(_._2.nonEmpty))
    // docs the HOF filtered out must come back as EMPTY arrays natively
    assert(native.keySet.diff(hof.keySet).forall(native(_).isEmpty))
  }

  test("minhash signature: native == groupBy(min(perm_i)) reference") {
    val texts = (0 until 100).map(_ => randText())
    val d = df(texts: _*)
    val sh = d.select(col("id"),
        explode(TextHash.shingleHashesOf(col("text"))).as("hs"))
    val k = 16
    val mins = (0 until k).map(i =>
      min(TextHash.minhashPerm(i, col("hs"))).as(s"mh$i"))
    val hof = sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (1 to k).map(r.getLong(_)).toSeq).toMap
    val native = d.select(col("id"),
        TextHash.minhashSignatureOf(
          TextHash.shingleHashesOf(col("text")), k).as("sig"))
      .where(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(native == hof)
  }

  test("simhash: native == exploded-sum reference; empty => null") {
    val texts = (0 until 100).map(_ => randText())
    val d = df(texts: _*)
    val bits = 48
    val sh = d.select(col("id"),
      explode(TextHash.shingleHashesOf(col("text"))).as("hs"))
    val bitSums = (0 until bits).map(j =>
      sum(when(TextHash.simhashBit(j, col("hs")) === 1, 1).otherwise(-1))
        .as(s"s$j"))
    val fp = (0 until bits).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val hof = sh.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), fp.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nativeRows = d.select(col("id"),
        TextHash.simhashOf(TextHash.shingleHashesOf(col("text")), bits)
          .as("simhash")).collect()
    val native = nativeRows.filter(!_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof)
    // sub-3-token docs: no shingles, so the fingerprint is null
    assert(nativeRows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet ==
      nativeRows.map(_.getLong(0)).toSet.diff(hof.keySet))
  }

  test("marker count: native == size(filter(isin)) HOF on 200 random texts") {
    val markers = Seq("the", "a", "of", "and", "is")
    // salt random texts with real markers so hits actually occur
    val texts = (0 until 200).map(_ =>
      randText() + " " + markers(rng.nextInt(markers.length)) +
        (if (rng.nextBoolean()) " the" else "")) ++
      Seq("", "the the the", "THE The the", "a-of and. is")
    val d = df(texts: _*)
    val words = TextHash.tokens(lower(col("text")))
    val hof = d.select(col("id"),
        size(filter(words, t => t.isin(markers.map(lit): _*))).as("c"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    val native = d.select(col("id"),
        TextHash.markerCountOf(words, markers).as("c"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(hof == native)
  }

  test("sum of token lengths: native == aggregate(transform(length)) HOF") {
    val texts = (0 until 200).map(_ => randText()) ++ Seq("", " ", "ab cde")
    val d = df(texts: _*)
    val hof = d.select(col("id"), TextHash.tokens(col("text")).as("w"))
      .select(col("id"),
        expr("aggregate(transform(w, x -> length(x)), 0L, (a, b) -> a + b)")
          .as("s"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    val native = d.select(col("id"), TextHash.tokens(col("text")).as("w"))
      .select(col("id"), TextHash.sumTokenLengthsOf(col("w")).as("s"))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(hof == native)
  }

  test("rolling + min-gram folds: native == HOF reference incl. null guard") {
    import TextHash.P
    val texts = (0 until 200).map(_ => randText()) ++ Seq(
      "", "one", "a b c d e f g",      // 0, 1, 7 tokens -> null min-gram
      "a b c d e f g h",               // exactly 8
      "a b c d e f g h i j k l m n o") // many windows
    val d = df(texts: _*)
    val base = d.select(col("id"),
      TextHash.tokenHashesOf(col("text")).as("wh"))
    val hof = base
      .select(col("id"),
        TextHash.rollingFold("wh").as("r"),
        when(size(col("wh")) >= 8,
          array_min(expr(s"""
            transform(sequence(1, size(wh) - 7), i ->
              aggregate(slice(wh, i, 8), 0L, (a, x) -> ((a * 131L) + x) % ${P}L))""")))
          .otherwise(lit(null).cast("long")).as("m"))
      .orderBy("id").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))
    val native = base
      .select(col("id"),
        TextHash.rollingFoldOf(col("wh")).as("r"),
        TextHash.minGramFoldOf(col("wh"), 8).as("m"))
      .orderBy("id").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))
    assert(hof.toSeq == native.toSeq)
  }

  test("unicode: per-char fold is code-point based (oracle-aligned)") {
    // 'é' = U+00E9 (233), '😀' = U+1F600 (128512) — DuckDB ascii()
    // values; one token each, fold h = (h*31 + cp) % P
    val d = df("é", "😀", "aé")
    val out = d.select(col("id"),
        TextHash.tokenHashesOf(col("text")).as("wh"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq)
    assert(out(0) == Seq(233L))
    assert(out(1) == Seq(128512L))
    assert(out(2) == Seq((97L * 31 + 233) % TextHash.P))
  }

  test("SQL registration: graft_shingle_hashes reachable from spark.sql") {
    graft.engine.GraftSession.tune(spark)
    df("uno dos tres cuatro").createOrReplaceTempView("thn_docs")
    val viaSql = spark.sql(
      "SELECT graft_shingle_hashes(text) AS hs FROM thn_docs")
      .collect().head.getSeq[Long](0)
    val viaCol = df("uno dos tres cuatro")
      .select(TextHash.shingleHashesOf(col("text")).as("hs"))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.size == 2)
  }

  test("generated code COMPILES for every native expression (no silent fallback)") {
    // Spark quietly degrades to interpreted eval when doGenCode output
    // fails to compile — results stay right, the perf win silently
    // vanishes. fallback=false turns that into a loud failure.
    val before = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val d = df("the quick brown fox jumps over the lazy dog again and again")
      val out = d.select(
        TextHash.tokenHashesOf(col("text")).as("wh"),
        TextHash.shingleHashesOf(col("text")).as("sh"),
        TextHash.markerCountOf(TextHash.tokens(col("text")),
          Seq("the", "a")).as("mc"),
        TextHash.sumTokenLengthsOf(TextHash.tokens(col("text"))).as("sl"))
        .select(col("mc"), col("sl"),
          TextHash.rollingFoldOf(col("wh")).as("pf"),
          TextHash.minGramFoldOf(col("wh"), 3).as("mg"),
          TextHash.minhashSignatureOf(col("sh"), 4).as("sig"),
          TextHash.simhashOf(col("sh"), 16).as("fp"))
        .collect().head
      assert(out.getInt(0) == 2 && out.getLong(1) > 0)
      assert(!out.isNullAt(2) && !out.isNullAt(3))
      assert(out.getSeq[Long](4).size == 4 && !out.isNullAt(5))
    } finally spark.conf.set("spark.sql.codegen.fallback", before)
  }

  test("SQL registration: marker-count and fold functions reachable") {
    graft.engine.GraftSession.tune(spark)
    df("the quick the lazy the").createOrReplaceTempView("thn_docs2")
    val row = spark.sql("""
      SELECT
        graft_marker_count(split(text, ' '), 'the', 'a') AS mc,
        graft_sum_token_lengths(split(text, ' ')) AS sl,
        graft_poly_fold(graft_token_hashes(text), 131) AS pf,
        graft_min_gram_fold(graft_token_hashes(text), 3) AS mg
      FROM thn_docs2""").collect().head
    assert(row.getInt(0) == 3)
    assert(row.getLong(1) == 18L) // "thequickthelazythe"
    val viaCol = df("the quick the lazy the")
      .select(
        TextHash.rollingFoldOf(TextHash.tokenHashesOf(col("text"))).as("pf"),
        TextHash.minGramFoldOf(TextHash.tokenHashesOf(col("text")), 3).as("mg"))
      .collect().head
    assert(row.getLong(2) == viaCol.getLong(0))
    assert(row.getLong(3) == viaCol.getLong(1))
  }

  test("char fold: native == HOF reference on 200 random texts, " +
    "empty folds to the seed, both (mult, seed) pairs") {
    val texts = (0 until 200).map(_ => randText()) ++
      Seq("", " ", "a", "hello world")
    val d = df(texts: _*)
    for ((m, s) <- Seq((31L, 0L), (131L, 7L))) {
      val hof = d.select(col("id"),
          TextHash.charFold(col("text"), m, s).as("h"))
        .orderBy("id").collect().map(_.getLong(1))
      val native = d.select(col("id"),
          TextHash.charFoldOf(col("text"), m, s).as("h"))
        .orderBy("id").collect().map(_.getLong(1))
      assert(hof.toSeq == native.toSeq, s"mult=$m seed=$s")
    }
    assert(df("").select(TextHash.charFoldOf(col("text"), 131L, 7L))
      .collect().head.getLong(0) == 7L)
    // documented fold value: "ab" with mult 31 seed 0 ->
    // ((0*31+97)*31+98) % P = 3105
    assert(df("ab").select(TextHash.charFoldOf(col("text"), 31L, 0L))
      .collect().head.getLong(0) == 97L * 31L + 98L)
  }
}
