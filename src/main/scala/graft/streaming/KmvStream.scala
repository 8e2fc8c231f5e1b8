package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextHash
import graft.operators.Sketch

/** Streaming per-group KMV sketches — the live twin of
  * [[graft.operators.Sketch.kmvSketch]] (q249/q251), watching each
  * source's k-minima as documents arrive so overlap questions
  * ([[Sketch.kmvPairMatrix]]) are answerable mid-ingest.
  *
  * KMV shares HLL's streamability argument with a twist: state is ≤ k
  * longs per group — bounded by construction — and the fold (min-k of
  * a set union) is associative, commutative, IDEMPOTENT, so
  * re-delivered documents can never move a sketch. But unlike HLL's
  * registers the fold is not a per-KEY scalar aggregate (the k minima
  * interact), so it lives in `flatMapGroupsWithState` rather than a
  * streaming aggregation.
  *
  * Emission contract: a group emits its FULL current sketch (tagged
  * with a per-group version) only on the batches where the sketch
  * CHANGED — a re-delivered or all-seen batch emits nothing (the
  * no-op the idempotence buys; spec-pinned). A file-sink consumer
  * reads the live sketch as "rows of the max version per group" —
  * [[latest]] folds exactly that, and its output equals the batch
  * [[Sketch.kmvSketch]] over everything delivered. */
object KmvStream {

  final case class HashRow(grp: String, h: Long)

  /** One emitted sketch row; `version` counts the group's sketch
    * CHANGES (not batches — unchanged batches emit nothing). */
  final case class SketchRow(grp: String, h: Long, version: Long)

  /** State per group: the current k-minima and a change counter.
    * Public like the sibling streams' state classes — Catalyst's
    * generated encoder code cannot reach a private nested class. */
  final case class KmvState(mins: Array[Long], version: Long)

  /** Fold hashes into a k-capped ordered set: O(k) memory however
    * many hashes arrive (the TreeSet dedups; anything ≥ the current
    * k-th minimum is rejected in O(log k) without being stored). */
  private def foldMinK(into: java.util.TreeSet[java.lang.Long],
      hs: Iterator[Long], k: Int): Unit =
    hs.foreach { h =>
      if (into.size < k) into.add(h)
      else if (h < into.last) { if (into.add(h)) into.pollLast() }
    }

  /** Per-group current k-minima over a (streaming or batch) document
    * frame; run with `outputMode("append")`. Works unchanged on batch
    * frames (a one-batch drain IS the batch sketch at version 1).
    *
    * Bounded at BOTH ends, matching the batch twin's rank-limit-
    * before-exchange shape: a stateless per-partition min-k
    * pre-reduction caps what crosses the shuffle at k hashes per
    * group per partition (a hot group in a huge micro-batch never
    * ships its full token mass), and the state fold streams the
    * iterator through a k-capped ordered set, so per-trigger working
    * memory is O(k) — the same bound as the stored state — not
    * O(batch hashes per group). */
  def sketch(docs: DataFrame, groupCol: String, textCol: String,
      k: Int = 256): Dataset[SketchRow] = {
    require(k > 1 && (1 << 20) % k == 0,
      s"need k > 1 dividing 2^20, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .where(col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        explode(TextHash.shingleHashesOf(col(textCol))).as("h0"))
      .select(col("grp"), Sketch.kmvSpread(col("h0")).as("h"))
      .as[HashRow]
      .mapPartitions { it =>
        // per-partition pre-reduction: ≤ k hashes per group survive
        // (min-k of a subset can only come from the subset's min-k);
        // memory is |groups seen in this partition| × k longs
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[String, java.util.TreeSet[java.lang.Long]]
        it.foreach { r =>
          val s = acc.getOrElseUpdate(r.grp,
            new java.util.TreeSet[java.lang.Long]())
          foldMinK(s, Iterator.single(r.h), k)
        }
        acc.iterator.flatMap { case (g, s) =>
          val it2 = s.iterator()
          Iterator.continually(it2)
            .takeWhile(_.hasNext).map(i => HashRow(g, i.next()))
        }
      }
      .groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[HashRow],
            st: GroupState[KmvState]) =>
          val prev = st.getOption.getOrElse(KmvState(Array.empty, 0L))
          val set = new java.util.TreeSet[java.lang.Long]()
          prev.mins.foreach(h => set.add(h))
          foldMinK(set, rows.map(_.h), k)
          val merged = new Array[Long](set.size)
          locally {
            val it2 = set.iterator(); var i = 0
            while (it2.hasNext) { merged(i) = it2.next(); i += 1 }
          }
          if (merged.sameElements(prev.mins)) Iterator.empty
          else {
            val next = KmvState(merged, prev.version + 1)
            st.update(next)
            merged.iterator.map(SketchRow(grp, _, next.version))
          }
      }
  }

  /** Fold a drained emission log to the LIVE sketch: rows of each
    * group's max version — the read side of the emission contract. */
  def latest(emitted: DataFrame): DataFrame = {
    val mx = emitted.groupBy(col("grp"))
      .agg(max(col("version")).as("version"))
    emitted.join(mx, Seq("grp", "version"))
      .select(col("grp"), col("h"))
  }
}
