package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the greedy-BPE merge semantics (occurrence-at-a-time,
  * lowest-rank-then-leftmost — the HF `tokenizers` contract) on the
  * cases where the variants DIVERGE, plus the count/array consistency
  * and null handling the q253/q254 oracles rely on. */
class BpeSpec extends SparkSpec {
  import BpeNative.{rankMap, subwordList}

  private val ranks = rankMap(Bpe.demoMerges)

  private def seg(w: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    subwordList(w, ranks).asScala.toSeq
  }

  test("rank precedence: 'fast' merges (s,t) rank 22 though the " +
    "overlapping (a,s) rank 23 is leftmost") {
    assert(seg("fast") == Seq("f", "a", "st"))
  }

  test("multi-step chains fuse whole words: table/order/value/join") {
    assert(seg("table") == Seq("table"))
    assert(seg("order") == Seq("order"))
    assert(seg("value") == Seq("value"))
    assert(seg("join") == Seq("join"))
    assert(seg("scan") == Seq("scan"))
  }

  test("unknown chars pass through untouched; 1-char and empty words " +
    "are identity") {
    assert(seg("x") == Seq("x"))
    assert(seg("") == Seq())
    assert(seg("zq") == Seq("z", "q"))
  }

  test("occurrence-at-a-time: a merge output preempts remaining " +
    "occurrences of the chosen pair") {
    // ranks: (a,a)->1; (aa,a)->0. All-at-once on "aaaaa" gives
    // [aa, aaa]; occurrence-at-a-time gives [aaa, aa] — the pinned
    // semantics (first (a,a) merge creates aa whose (aa,a) pair has
    // LOWER rank and fires before the remaining (a,a) pairs).
    val r2 = rankMap(Seq(("aa", "a"), ("a", "a")))
    import scala.jdk.CollectionConverters._
    assert(subwordList("aaaaa", r2).asScala.toSeq == Seq("aaa", "aa"))
  }

  test("leftmost occurrence wins within one rank") {
    val r2 = rankMap(Seq(("a", "b")))
    import scala.jdk.CollectionConverters._
    // both (a,b) occurrences merge, left one first; no cross-pair forms
    assert(subwordList("abab", r2).asScala.toSeq == Seq("ab", "ab"))
  }

  test("column API: subword count over text == sum of per-word array " +
    "sizes; null text is null count") {
    val df = spark.createDataFrame(Seq(
      (1L, "the fast table  scan"),
      (2L, "   "),
      (3L, null.asInstanceOf[String])
    )).toDF("id", "text")
    val got = df.select(col("id"),
      Bpe.subwordCountOf(lower(col("text")), Bpe.demoMerges).as("n"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // the=1, fast=3, table=1, scan=1 -> 6
    assert(got == Map(1L -> 6L, 2L -> 0L, 3L -> -1L))
    val arr = df.where(col("id") === 1)
      .select(explode(graft.functions.TextHash.tokens(
        lower(col("text")))).as("w"))
      .select(size(Bpe.subwordsOf(col("w"), Bpe.demoMerges)).as("k"))
      .collect().map(_.getInt(0)).sum
    assert(arr == 6)
  }

  test("whole-stage codegen hosts both expressions (no fallback)") {
    val df = spark.range(4).select(
      concat(lit("tab"), col("id").cast("string")).as("w"))
    val plan = df
      .select(Bpe.subwordsOf(col("w"), Bpe.demoMerges).as("s"),
        Bpe.subwordCountOf(col("w"), Bpe.demoMerges).as("n"))
    // forces execution through codegen; a doGenCode bug throws here
    assert(plan.collect().length == 4)
    // the '*(n)' prefix marks a WholeStageCodegen-hosted operator
    val exec = plan.queryExecution.executedPlan.toString
    assert(exec.contains("*("), exec)
  }

  test("trainMerges learns the hand-computed table: most frequent " +
    "pair first, (count desc, pair asc) ties, singleton pairs never " +
    "merged, deterministic across runs") {
    import org.apache.spark.sql.functions._
    // counts: "aaab" x3, "ab" x2 -> pair counts round 1:
    //   (a,a): 2 per "aaab" word x3 = 6; (a,b): 1x3 + 1x2 = 5
    // round 2 (after a+a->aa): (aa,a) 3, (a,b) 5 -> (a,b) wins
    // round 3: (aa,ab) 3, ... continues until pairs are singletons
    val df = spark.createDataFrame(Seq(
      (1L, "aaab aaab aaab ab"), (2L, "ab")
    )).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(df, "text", 10)
    assert(merges.take(2) == Seq(("a", "a"), ("a", "b")))
    // every learned pair occurred at least twice at its turn
    assert(merges == Bpe.trainMerges(df, "text", 10), "nondeterministic")
    // applying the learned table compresses: subwords <= chars
    val ranks = BpeNative.rankMap(merges)
    import scala.jdk.CollectionConverters._
    val seg = BpeNative.subwordList("aaab", ranks).asScala
    assert(seg.length < 4, seg)
    // nMerges caps the table
    assert(Bpe.trainMerges(df, "text", 1) == Seq(("a", "a")))
  }

  test("merge-table artifact round-trips through parquet form " +
    "(mergesToDf / mergesFromDf preserve rank order)") {
    val back = Bpe.mergesFromDf(
      Bpe.mergesToDf(spark, Bpe.demoMerges))
    assert(back == Bpe.demoMerges)
  }

  test("maxVocab is an enforced top-N bound: a cap holding the real " +
    "vocabulary trains the same table as the uncapped fold; a " +
    "tail-dropping cap still trains deterministically") {
    val df = spark.createDataFrame(Seq(
      (1L, "aaab aaab aaab ab"), (2L, "ab zq xk")
    )).toDF("doc_id", "text")
    // 4 distinct words (aaab, ab, zq, xk); cap >= 4 ≡ uncapped
    val full = Bpe.trainMerges(df, "text", 10)
    assert(Bpe.trainMerges(df, "text", 10, maxVocab = 4) == full)
    assert(Bpe.trainMerges(df, "text", 10, maxVocab = 1 << 16) == full)
    // cap=2 keeps the two most frequent words (aaab x3, ab x2) —
    // the hapax tail (zq, xk) never contributed a winning pair, so
    // the table is unchanged here too, and still deterministic
    val capped = Bpe.trainMerges(df, "text", 10, maxVocab = 2)
    assert(capped == full)
    assert(capped == Bpe.trainMerges(df, "text", 10, maxVocab = 2))
  }

  test("over-MaxWordCodepoints words skip the merge loop: raw " +
    "codepoint emission, count = codepoint count (the length-cap " +
    "contract)") {
    import scala.jdk.CollectionConverters._
    val ranks = BpeNative.rankMap(Seq(("a", "a"), ("a", "b")))
    val blob = "ab" * (BpeNative.MaxWordCodepoints / 2 + 1)
    val toks = BpeNative.subwordList(blob, ranks).asScala
    assert(toks.length == blob.length, "must stay unmerged")
    assert(toks.forall(_.length == 1))
    // one codepoint per subword through the count path too
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeNative.subwordCount(
      UTF8String.fromString(s"ab $blob ab"), ranks) ==
      1L + blob.length + 1L) // "ab" merges to 1 token each side
    // at the boundary the merge loop still runs
    val atCap = "ab" * (BpeNative.MaxWordCodepoints / 2)
    assert(BpeNative.subwordList(atCap, ranks).size < atCap.length)
  }
}
