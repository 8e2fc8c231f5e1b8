package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md intro: "salting for skew").
  *
  * The FIRST line of defense at scale is AQE's runtime skew-join
  * splitting (`spark.sql.adaptive.enabled`, on in GraftSession) — it
  * needs no code and no salt-factor tuning. Manual salting is for the
  * cases AQE cannot fix: a skewed AGGREGATION key, a broadcast-ineligible
  * dim against a hot key, or engines/stages where AQE is off. Keeping it
  * here as a tested operator documents the pattern the 100 TB plan
  * reaches for when one reducer owns half the shuffle.
  */
object Skew {

  /** Deterministic salt for a row: content hash + the input partition
    * id. The partition id matters for the degenerate case content
    * hashing alone can't spread — a hot key whose rows are IDENTICAL
    * (repeated events, denormalized dims): those rows span many input
    * partitions, so the partition id still fans them out. Identical
    * rows within ONE input partition remain a single salt — that
    * residual case needs a row_number, which costs the very shuffle
    * salting tries to avoid; documented limit, not fixed. Both inputs
    * are stable under task retry (same partition ⇒ same id), unlike
    * rand(), whose per-retry drift corrupts shuffle replay. */
  private def saltCol(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(
      (spark_partition_id().cast("long") +:
        df.columns.map(col).toIndexedSeq): _*), lit(salt.toLong))

  /** Inner equi-join with the big side salted into `salt` sub-keys and
    * the small side replicated `salt` ways; hot keys spread across
    * `salt` reducers at the cost of a `salt`× blowup of the SMALL side
    * only. Result set is exactly the unsalted join's (SkewSpec pins
    * it — salt values never affect CONTENT, only distribution). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt=$salt must be positive")
    val bigS = big.withColumn("__salt", saltCol(big, salt))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Bound a keyed self-join's quadratic blow-up BEFORE it happens:
    * drop every row of any key holding more than `maxKeyRows` rows.
    * A key with c rows costs O(c²) pairs downstream, so the bound to
    * enforce is ABSOLUTE key mass, not share-of-total — a 1M-row key
    * is a 5·10¹¹-pair reducer whether the corpus is 10M or 10B rows.
    * After the cap the worst key contributes at most
    * `maxKeyRows·(maxKeyRows−1)/2` pairs, so the join's cost is
    * linear in the number of keys with a constant quadratic factor.
    *
    * This is ONE discipline with three instances in the repo:
    * [[Dedup.ngramJaccardPairs]]'s shingle df-cap (hot shingles carry
    * no near-dup signal), [[Dedup.fuzzyMatchPairs]]'s block cap (a
    * degenerate blocking key piles unrelated names into one quadratic
    * block), and the cross-corpus caps (computed over the combined
    * frame, so they stay inline). Dropping is the documented RECALL
    * trade of every capped path: pairs inside a dropped key are never
    * compared, exactly like q17's hot shingles.
    *
    * Plan shape: the count aggregate partial-combines map-side; the
    * hot list is heavy-hitters-small in any Zipf-shaped corpus, so
    * AQE broadcasts it into a LeftAnti hash join on its own — no
    * sort, no second shuffle of `df`. The hint is deliberately NOT
    * forced (r17): the list's WORST-case bound is total/maxKeyRows —
    * corpus-LINEAR, exactly the frame the q223/q264 discipline says
    * must never carry a forced broadcast; on a pathological lake
    * where every key is hot, AQE correctly refuses and the anti-join
    * degrades to a shuffle instead of a driver OOM. Rows with a NULL
    * key are never capped (an equi-self-join drops them anyway;
    * callers' block keys coalesce NULL upstream). */
  def capHotKeys(df: DataFrame, key: String, maxKeyRows: Long): DataFrame = {
    require(maxKeyRows >= 1, s"maxKeyRows=$maxKeyRows must be >= 1")
    val hot = df.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .where(col("__c") > maxKeyRows).select(col(key))
    df.join(hot, Seq(key), "left_anti")
  }

  /** Two-phase skewed aggregation: count per (key, salt) first (spreads
    * a hot key over `salt` reducers with map-side partials), then merge
    * the per-salt partials. Equivalent to groupBy(key).count. */
  def saltedCount(df: DataFrame, key: String, salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt=$salt must be positive")
    df.withColumn("__salt", saltCol(df, salt))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
  }

  /** JOIN-BLOWUP PROFILER — the pre-flight for any fat equi-join:
    * per join key, how many rows each side holds and the exact output
    * mass `n_left · n_right` that key will emit, top-k keys by that
    * product. This is the number that decides BEFORE the join whether
    * to run it plain, [[saltedJoin]] it, or [[capHotKeys]] a side —
    * run the profile (two cheap counts), not the join, to find out; a
    * key whose product dwarfs the rest IS the straggler task the
    * stage would stall on. Only keys present on BOTH sides appear
    * (keys on one side emit nothing from an inner join), and NULL
    * keys are excluded (SQL equality never matches them — the
    * [[capHotKeys]] convention).
    *
    * Scale shape: each side folds to per-key counts map-side (the
    * shuffle carries key cardinality, not rows); the count-frame join
    * keys on the profiled key; the top-k is TakeOrderedAndProject
    * (per-partition k-heaps — k rows cross, never the key space).
    * Ties break on the key, pinned on both engines. `est_pairs` is an
    * exact long product — two sides would need > 3·10^9 rows EACH on
    * one key to overflow, a join no one should run. */
  def joinBlowupProfile(left: DataFrame, right: DataFrame, key: String,
      topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK=$topK must be positive")
    def counts(df: DataFrame, as: String) =
      df.where(col(key).isNotNull)
        .groupBy(col(key)).agg(count(lit(1)).as(as))
    counts(left, "n_left").join(counts(right, "n_right"), Seq(key))
      .withColumn("est_pairs", col("n_left") * col("n_right"))
      .orderBy(col("est_pairs").desc, col(key))
      .limit(topK)
  }

  /** KEY-SKEW PROFILE — the pre-flight readout behind every salting
    * decision: [[saltedJoin]]/[[saltedCount]]'s `salt` parameter and
    * [[capHotKeys]]' threshold are INPUTS someone has to choose, and
    * this is where the numbers come from. Top-`topK` heaviest keys of
    * a column with, per key: the exact row count, its share of the
    * table, its multiple of the mean key mass (`skew_x` — the "one
    * reducer owns half the shuffle" number), and the salt fan-out
    * `ceil(n_rows / targetRowsPerTask)` that would level it.
    *
    * Scale shape: ONE partial-aggregated groupBy builds the per-key
    * count frame (the shuffle carries key cardinality, not rows),
    * persisted once for its two consumers (the scalars and the
    * top-k); top-k is TakeOrderedAndProject (per-partition k-heaps —
    * k rows cross, never the key space); the (total, n_keys) scalars
    * reduce to ONE row appended by the documented broadcast
    * scalar-append (the q52/q79/q84 shape, in the plan sweep's
    * justified list); the rank window runs over the ALREADY-limited
    * k-row frame (a bounded SinglePartition of ≤ topK rows). NULL
    * keys are excluded — they are a missingness question (q165), not
    * a skew question. Ties pinned (count desc, key asc). */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 10,
      targetRowsPerTask: Long = 1000000L,
      scope: graft.engine.CacheScope = graft.engine.CacheScope.unmanaged)
      : DataFrame = {
    require(topK > 0, s"topK=$topK must be positive")
    require(targetRowsPerTask > 0,
      s"targetRowsPerTask=$targetRowsPerTask must be positive")
    import org.apache.spark.sql.expressions.Window
    val c = scope.persist(df.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("n_rows")))
    val totals = c.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_keys"))
    c.orderBy(col("n_rows").desc, col(key)).limit(topK)
      .crossJoin(broadcast(totals))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n_rows").desc, col(key))))
      .select(col("rank"), col(key), col("n_rows"),
        (col("n_rows").cast("double") / col("total")).as("share"),
        (col("n_rows").cast("double") * col("n_keys") / col("total"))
          .as("skew_x"),
        ceil(col("n_rows").cast("double") / targetRowsPerTask)
          .cast("bigint").as("n_salts"))
      .orderBy(col("rank"))
  }
}
