package graft.operators

import graft.SparkSpec

/** Edges the q77 oracle fixture can't exercise: multi-column
  * fingerprint aliasing and the fail-loud column check. */
class DiffSpec extends SparkSpec {

  import spark.implicits._

  test("multi-column content does not alias across the column boundary") {
    // ("ab","c") vs ("a","bc") concatenate identically without a
    // boundary — per-column hashing must classify them as changed
    val oldSnap = Seq((1L, "s", "ab", "c")).toDF("id", "src", "a", "b")
    val newSnap = Seq((1L, "s", "a", "bc")).toDF("id", "src", "a", "b")
    val out = Diff.snapshotDiff(oldSnap, newSnap, "id", "src", Seq("a", "b"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("changed", 1L)))
  }

  test("a NULL shifting between columns classifies as changed") {
    // ("a", NULL) vs (NULL, "a"): concat_ws drops a NULL column WITH
    // its separator, so both sides would fingerprint as just "a" and
    // report unchanged — the per-column hash + NULL sentinel keeps
    // the NULL's position in the fingerprint
    val oldSnap = Seq((1L, "s", Some("a"), Option.empty[String]))
      .toDF("id", "src", "a", "b")
    val newSnap = Seq((1L, "s", Option.empty[String], Some("a")))
      .toDF("id", "src", "a", "b")
    val out = Diff.snapshotDiff(oldSnap, newSnap, "id", "src", Seq("a", "b"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("changed", 1L)))
    // and NULL ≡ NULL still reads unchanged
    val same = Diff.snapshotDiff(oldSnap, oldSnap, "id", "src", Seq("a", "b"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(same == Seq(("unchanged", 1L)))
  }

  test("all four change kinds classify; removed docs keep their old source") {
    val oldSnap = Seq((1L, "s1", "x"), (2L, "s2", "y"), (3L, "s3", "z"))
      .toDF("id", "src", "t")
    val newSnap = Seq((1L, "s1", "x"), (2L, "s2", "Y"), (4L, "s4", "w"))
      .toDF("id", "src", "t")
    val out = Diff.snapshotDiff(oldSnap, newSnap, "id", "src", Seq("t"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(out == Seq(
      ("s1", "unchanged", 1L), ("s2", "changed", 1L),
      ("s3", "removed", 1L), ("s4", "added", 1L)))
  }

  test("unknown columns fail loudly") {
    val df = Seq((1L, "s", "x")).toDF("id", "src", "t")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(df, df, "id", "src", Seq("nope"))
    }
  }

  test("contentChecksum: invariant under row order and partitioning; " +
    "a one-char edit flips both checksums; NULLs counted") {
    val s = spark; import s.implicits._
    val rows = Seq(("a", "hello"), ("a", "world"), ("a", null),
      ("b", "hello"))
    val base = Diff.contentChecksum(rows.toDF("src", "t"), "src", "t")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val shuffled = Diff.contentChecksum(
      rows.reverse.toDF("src", "t").repartition(7), "src", "t")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(base == shuffled)
    assert(base("a")._1 == 3L && base("a")._2 == 1L)
    // same multiset of content across groups -> same checksums
    assert(base("b")._3 != base("a")._3)
    val edited = Diff.contentChecksum(
      Seq(("a", "hellp"), ("a", "world"), ("a", null))
        .toDF("src", "t"), "src", "t")
      .collect().map(r => r.getString(0) -> ((r.getLong(3),
        r.getLong(4)))).toMap
    assert(edited("a")._1 != base("a")._3 &&
      edited("a")._2 != base("a")._4)
  }

  test("contentChecksum: dropping a duplicate PAIR preserves XOR but " +
    "trips the count and the sum — why both checksums exist") {
    val s = spark; import s.implicits._
    val full = Diff.contentChecksum(
      Seq(("a", "x"), ("a", "x"), ("a", "y")).toDF("src", "t"),
      "src", "t").collect()(0)
    val dropped = Diff.contentChecksum(
      Seq(("a", "y")).toDF("src", "t"), "src", "t").collect()(0)
    assert(full.getLong(4) == dropped.getLong(4)) // XOR blind to the pair
    assert(full.getLong(1) != dropped.getLong(1))
    assert(full.getLong(3) != dropped.getLong(3)) // sum catches it
  }
}
