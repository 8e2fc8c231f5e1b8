package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Pins [[Packing.contiguousOffsets]]: exact offsets on a crafted
  * corpus, and — the property the two-phase prefix sum exists for —
  * invariance of every output number under the partition count. */
class PackingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("offsets, pack ids, and boundary spans on a crafted corpus") {
    // token counts: 3, 4, 2, 5 with maxTokens 6 ->
    //   offsets 0, 3, 7, 9; packs 0, 0, 1, 1
    //   doc 1 spans (3+4 > 6), doc 3 spans (3+5 > 6... offset 9 % 6 = 3)
    val out = Packing.contiguousOffsets(
      docs(
        0L -> "a b c",
        1L -> "d e f g",
        2L -> "h i",
        3L -> "j k l m n"),
      "doc_id", "text", maxTokens = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (0L, 3, 0L, 0L, 0L, false),
      (1L, 4, 3L, 0L, 3L, true),   // 3 + 4 crosses the 6-token cut
      (2L, 2, 7L, 1L, 1L, false),
      (3L, 5, 9L, 1L, 3L, true)))  // 3 + 5 crosses the 12-token cut
  }

  test("slidingChunks: exact windows on crafted lengths") {
    // C=4, stride=3, overlap=1; bound = max(n-1, 1)
    //   n=0 -> no chunks; n=1 -> one [0,1); n=4 -> one [0,4)
    //   n=5 -> starts 0,3 -> [0,4), [3,5)
    //   n=7 -> starts 0,3 -> [0,4), [3,7)  (start 6 trimmed: suffix-only)
    val out = Packing.slidingChunks(
      docs(0L -> "", 1L -> "a", 2L -> "a b c d", 3L -> "a b c d e",
        4L -> "a b c d e f g"),
      "doc_id", "text", chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 0, 0, 1),
      (2L, 0, 0, 4),
      (3L, 0, 0, 4), (3L, 1, 3, 2),
      (4L, 0, 0, 4), (4L, 1, 3, 4)))
  }

  test("slidingChunks: full coverage, correct overlap, no contained chunks") {
    val corpus = (0L until 120L).map(i =>
      i -> (("w " * (i % 17).toInt).trim))
    val out = Packing.slidingChunks(docs(corpus: _*), "doc_id", "text",
      chunkTokens = 8, stride = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3)))
    val nTokens = corpus.toMap.view.mapValues(t =>
      if (t.isEmpty) 0 else t.split(" ").length).toMap
    out.groupBy(_._1).foreach { case (id, chunks) =>
      val n = nTokens(id)
      val sorted = chunks.sortBy(_._2)
      // contiguous idx, stride-spaced starts
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      sorted.foreach { case (_, idx, start, len) =>
        assert(start == idx * 5 && len == math.min(8, n - start) && len > 0)
      }
      // coverage: last chunk reaches the end; each chunk adds new tokens
      assert(sorted.last._3 + sorted.last._4 == n)
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, l2)) =>
          assert(s2 + l2 > s1 + l1, s"contained chunk for doc $id")
        case _ =>
      }
    }
    // every non-empty doc chunked
    assert(out.map(_._1).distinct.length ==
      nTokens.count { case (_, n) => n > 0 })
  }

  test("epochShardedOffsets: self-consistent shard streams over the full doc set") {
    val corpus = (0L until 300L).map(i =>
      i -> (("w " * (1 + (i % 13).toInt)).trim))
    val out = Packing.epochShardedOffsets(docs(corpus: _*), "doc_id",
      "text", shards = 4, seed = 1L, maxTokens = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))
    // a permutation: every doc exactly once
    assert(out.map(_._1).distinct.length == 300)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(0 <= shard && shard < 4)
      val inOrder = rows.sortBy(_._3)
      assert(inOrder.map(_._3).toSeq == (1 to rows.length)) // dense pos
      // shard_offset is the running sum of the tokens before each doc,
      // and pack fields derive from it exactly
      var acc = 0L
      inOrder.foreach { case (_, _, _, n, off, packId, packOff, spans) =>
        assert(off == acc)
        assert(packId == off / 32 && packOff == off % 32)
        assert(spans == (off % 32 + n > 32))
        acc += n
      }
    }
  }

  test("epochShardedOffsets: a new epoch seed re-deals docs, preserving the set") {
    val corpus = (0L until 200L).map(i => i -> "a b c")
    def run(seed: Long) = Packing.epochShardedOffsets(docs(corpus: _*),
      "doc_id", "text", shards = 4, seed = seed, maxTokens = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val e0 = run(0L)
    assert(run(0L) == e0) // deterministic
    val e1 = run(1L)
    assert(e0 != e1)
    assert(e0.map(_._1).sorted == e1.map(_._1).sorted)
  }

  test("every output is invariant under the partition count") {
    val corpus = (0L until 400L).map(i =>
      i -> (("w " * (1 + (i % 17).toInt)).trim))
    def run(parts: Int): Seq[Row] = {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Packing.contiguousOffsets(docs(corpus: _*), "doc_id", "text",
        maxTokens = 64).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    val one = run(1) // degenerate: the whole corpus in one partition
    assert(run(7) == one)
    assert(run(32) == one)
  }

  test("shardManifest: crafted boundaries, and invariance under the " +
    "partition count") {
    // byte sizes 5, 7, 3, 9 (docs below), shardBytes 10 ->
    //   offsets 0, 5, 12, 15; shards 0, 0, 1, 1
    //   doc 1 straddles (5 + 7 > 10), doc 3 straddles (15%10 + 9 > 10)
    val crafted = docs(
      0L -> "aaaaa", 1L -> "bbbbbbb", 2L -> "ccc", 3L -> "ddddddddd")
    val out = Packing.shardManifest(crafted, "doc_id", "text",
      shardBytes = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 12L, 1L, 0L, 1L),
      (1L, 2L, 12L, 1L, 2L, 3L)))

    val corpus = (0L until 400L).map(i =>
      i -> (("w " * (1 + (i % 17).toInt)).trim))
    def run(parts: Int): Seq[Row] = {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Packing.shardManifest(docs(corpus: _*), "doc_id", "text",
        shardBytes = 128L).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    val one = run(1)
    assert(one.size > 1)
    assert(run(7) == one)
    assert(run(32) == one)
  }

  test("truncateToTokens: the kept hash is the prefix's, short docs " +
    "pass whole, empty docs keep their audit row") {
    import org.apache.spark.sql.functions.sha2
    import org.apache.spark.sql.functions.lit
    val out = Packing.truncateToTokens(
      docs(1L -> "a b c d e", 2L -> "x y", 3L -> ""),
      "doc_id", "text", maxTokens = 3).collect()
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getBoolean(3)) ==
      ((5L, 3L, true)))
    // the hash is of the JOINED KEPT PREFIX — equal to hashing "a b c"
    val want = docs(9L -> "a b c").select(
      sha2(lit("a b c"), 256)).collect()(0).getString(0)
    assert(r1.getString(4) == want)
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getBoolean(3)) ==
      ((2L, 2L, false)))
    val r3 = out(2)
    assert(r3.getLong(1) == 0L && r3.getLong(2) == 0L &&
      !r3.getBoolean(3))
  }
}
