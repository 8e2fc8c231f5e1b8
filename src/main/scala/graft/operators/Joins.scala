package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's API lacks as primitives (builder brief §custom
  * operators): the as-of join and the interval (range) join, both
  * expressed as compositions of existing operators — option (a) on the
  * brief's preference ladder — so Catalyst plans ordinary shuffles and
  * hash joins, never a quadratic fallback.
  *
  * == As-of join ==
  * For each left row, the right row with the greatest `time` at-or-before
  * (inclusive) / strictly-before (strict) the left row's `time`, equal on
  * `key`. The naive Spark formulations are both wrong at scale: a
  * non-equi `join(l.ts >= r.ts)` plans a per-key row explosion (every
  * left row pairs with its whole right history before the max-filter),
  * and a windowed `max(ts) <= ts` subquery shuffles twice. This
  * implementation is the single-shuffle union trick the streaming world
  * uses (Flink's event-time join executes the same shape): tag right
  * rows 0 and left rows 1, union, ONE window over (`key`) ordered by
  * (`time`, tag), and carry the most recent right payload forward with
  * `last(ignoreNulls)`. Cost = sort-merge-join cost on `key`; memory is
  * one row of carried state per window frame, never a history buffer.
  *
  * Equal-timestamp semantics are the tag order: inclusive sorts right
  * rows before left rows at the same `time` (visible), strict sorts them
  * after (invisible) — byte-identical to DuckDB's `ASOF JOIN` (`>=`)
  * and (`>`) respectively, which is what lets q43 hash-verify.
  *
  * Determinism contract: callers must make (`key`, `time`) unique on the
  * right (aggregate ties first, as q43 does with max(event_id)) — the
  * same contract DuckDB's ASOF documents, where a tied right side picks
  * an arbitrary row.
  *
  * `forward = true` flips the direction — the EARLIEST right row
  * at-or-after (q78's time-to-next-event form, DuckDB `ASOF ... <=`):
  * the same single window iterated in reverse time order, so cost and
  * state are identical to the backward join.
  *
  * == Interval join ==
  * Point-in-interval matching with NO equi-key (the hard case: with an
  * equi-key the range predicate is just a post-filter on an ordinary
  * join). Catalyst's only native plan for a pure range predicate is
  * BroadcastNestedLoopJoin — O(N·M) scans that stop being a plan and
  * start being an outage at 100 TB. This operator restores an equi-key
  * by bucketing time: points land in bucket `t div W`, intervals explode
  * to the buckets they overlap, the join is a hash join on the bucket
  * id, and the exact containment predicate filters the candidates.
  * Bucket width trades fan-out for candidate volume; the sweet spot is
  * the typical interval length (each interval then explodes to ~2 rows).
  * Both trunc-division sides are the same monotone function, so coverage
  * is exact for any sign of the time axis. PlanAuditSpec pins the
  * no-nested-loop shape.
  */
object Joins {

  /** All left rows, each extended with the right payload columns (null
    * when no right row qualifies). `right` must carry `key` and `time`
    * under the same names as `left`; its remaining columns are the
    * payload and must not collide with left's. Right rows with a null
    * key or time never match (SQL equality/inequality semantics).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
      inclusive: Boolean = true, forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = right.columns.toSeq.filterNot(c => c == key || c == time)
    require(payload.nonEmpty, "right side has no payload columns")
    val collide = payload.toSet.intersect(leftCols.toSet)
    require(collide.isEmpty, s"right payload collides with left: $collide")
    require(leftCols.contains(key) && leftCols.contains(time),
      s"left must carry '$key' and '$time'")
    val (rTag, lTag) = if (inclusive) (0, 1) else (1, 0)
    val lPayload = leftCols.filterNot(c => c == key || c == time)
    val r = right
      .where(col(key).isNotNull && col(time).isNotNull)
      .select(col(key).as("__k"), col(time).as("__t"),
        struct(payload.map(col): _*).as("__r"), lit(rTag).as("__side"))
    val l = left.select(col(key).as("__k"), col(time).as("__t"),
      struct(lPayload.map(col): _*).as("__l"), lit(lTag).as("__side"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // forward = the EARLIEST right row at-or-after: identical machinery
    // iterated in reverse time order — the carried "most recent right
    // seen" becomes "nearest following right". The tag order (and with
    // it the inclusive/strict tie rule) is unchanged because __side
    // still sorts ascending within one timestamp.
    val w = Window.partitionBy(col("__k"))
      .orderBy(if (forward) col("__t").desc else col("__t").asc,
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === lTag)
      .select(leftCols.map {
        case c if c == key => col("__k").as(key)
        case c if c == time => col("__t").as(time)
        case c => col("__l").getField(c).as(c)
      } ++ payload.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** [[asOf]] with a max-staleness bound — the feature-store lookup
    * rule ("use the latest feature value, but never one older than
    * T"): matches whose right row is more than `tolerance` time-units
    * behind the left row come back as null payload, exactly as if no
    * row qualified. Purely compositional: the latest at-or-before row
    * either IS within tolerance or nothing is, so this is [[asOf]]
    * carrying the matched timestamp plus a row-local null-out — no
    * second shuffle, no new join shape. `time` must be numeric (the
    * µs-long convention of the events fixture). */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
      time: String, tolerance: Long, inclusive: Boolean = true)
      : DataFrame = {
    require(tolerance >= 0, s"need tolerance >= 0, got $tolerance")
    val payload = right.columns.toSeq.filterNot(c => c == key || c == time)
    require(!(payload ++ left.columns).contains("__rt"),
      "column name '__rt' is reserved by asOfWithin")
    val out = asOf(left, right.withColumn("__rt", col(time)), key, time,
      inclusive)
    val fresh = col("__rt").isNotNull &&
      col("__rt") >= col(time) - lit(tolerance)
    out.select(left.columns.toSeq.map(col) ++
      payload.map(c => when(fresh, col(c)).as(c)): _*)
  }

  /** One row per (interval, point) pair with
    * `start <= point.time <= end`. Column sets must be disjoint.
    * `bucketWidth` is in `time`'s own units.
    */
  def intervalJoin(intervals: DataFrame, startCol: String, endCol: String,
      points: DataFrame, timeCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"need bucketWidth > 0, got $bucketWidth")
    val collide = intervals.columns.toSet.intersect(points.columns.toSet)
    require(collide.isEmpty, s"interval/point columns collide: $collide")
    val iv = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("__b", explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        expr(s"`$endCol` div $bucketWidth"))))
    val pt = points
      .where(col(timeCol).isNotNull)
      .withColumn("__b", expr(s"`$timeCol` div $bucketWidth"))
    iv.join(pt, Seq("__b"))
      .where(col(timeCol).between(col(startCol), col(endCol)))
      .drop("__b")
  }
}
