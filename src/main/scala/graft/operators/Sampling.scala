package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Deterministic corpus sampling/mixing: keep a per-stratum fraction of
  * documents chosen by a portable affine hash of the id — NOT `rand()`.
  * Reproducibility is the point: the same mixture comes out on every
  * run, every engine, every retry of a failed task (rand() breaks all
  * three), and the sample is consistent under incremental reprocessing
  * (a doc's fate never changes as the corpus grows). Row-local filter:
  * no shuffle, prunes at the scan when the stratum column is a
  * partition key.
  */
object Sampling {

  private val P = 1000000007L

  /** Hash bucket 0-99 for an integral id column — the affine fold
    * family TextHash uses, mirrored exactly by the oracle. */
  def pctBucket(idCol: Column): Column =
    ((idCol % P) * lit(2654435761L) % P + lit(12345L)) % P % 100

  /** Keep rows whose bucket falls under their stratum's percentage.
    * `pctByStratum` maps stratum value → keep-percent (0-100);
    * unlisted strata get `defaultPct`. */
  def stratifiedByHash(df: DataFrame, idCol: String, stratumCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.where(pctBucket(col(idCol)) < pct)
  }

  /** Deterministic train/val/test holdout assignment — the split every
    * training pipeline makes before anything else touches the corpus.
    * A doc's split is a pure function of its id through [[pctBucket]]:
    * stable across runs, engines, retries, AND corpus growth (a doc
    * never migrates between splits as data arrives — the property that
    * keeps yesterday's eval set uncontaminated by today's re-split).
    * Row-local (adds one column, no shuffle); downstream per-split
    * reads filter on it or partition by it. */
  def holdoutSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10, outCol: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; " +
        s"got train=$trainPct val=$valPct")
    // fail-loud like the neighboring operators: withColumn REPLACES an
    // existing column, which would silently discard caller data
    require(!df.columns.contains(outCol),
      s"holdoutSplit: input already has a '$outCol' column — pass a " +
        s"different outCol instead of silently overwriting it")
    val b = pctBucket(col(idCol))
    df.withColumn(outCol,
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** LEAKAGE-SAFE holdout: [[holdoutSplit]] keyed by near-dup CLUSTER
    * instead of doc id. An id-keyed split puts near-duplicate docs on
    * both sides of the train/eval fence — the eval set then "tests"
    * paraphrases of training data and scores leak upward. Splitting on
    * the cluster id (every doc carries one from
    * [[Dedup.nearDupClusters]] — singletons are their own cluster)
    * sends ENTIRE near-dup families to one side: a doc's split is a
    * pure function of its cluster, so the q68 stability contract
    * (engines, runs, retries, growth) carries over at cluster
    * granularity — with the documented cluster-growth caveat that a
    * NEW near-dup edge can merge clusters and move the merged family
    * together (that move is the point: the family must never straddle
    * the fence).
    *
    * Scale shape: one equi-join of docs to the (doc, cluster) frame on
    * the id — both sides key-partitioned, no new corpus pass; the
    * split column itself is row-local. */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      clusters: DataFrame, trainPct: Int = 80, valPct: Int = 10,
      outCol: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; " +
        s"got train=$trainPct val=$valPct")
    require(!docs.columns.contains(outCol) &&
      !docs.columns.contains("cluster_id"),
      s"leakageSafeSplit: input already has '$outCol'/'cluster_id'")
    val b = pctBucket(col("cluster_id"))
    docs
      .join(clusters.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol))
      .withColumn(outCol,
        when(b < trainPct, lit("train"))
          .when(b < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Weighted corpus mixing to a token budget — the pretraining-mixture
    * op ("a B-token corpus at 50% en / 25% es / 12.5% de / 12.5% fr"):
    * each stratum contributes `budget · wᵢ/Σw` tokens IN EXPECTATION,
    * realized by keeping docs whose per-million affine id-hash bucket
    * falls under the stratum's keep fraction `min(1, targetᵢ/Tᵢ)`
    * (`Tᵢ` = the stratum's total tokens). A stratum with fewer tokens
    * than its target is kept whole (the fraction caps at 1) — the
    * shortfall stays visible in the realized output rather than being
    * silently rebalanced onto other strata (weights are a statement of
    * intent; rebalancing would corrupt the mixture).
    *
    * Same determinism contract as [[stratifiedByHash]]: no rand(), a
    * doc's fate is a pure function of (id, weights, budget, corpus
    * totals), stable across runs/engines/retries. NOTE the corpus-total
    * dependence: unlike plain stratified sampling, the keep fraction
    * moves as the corpus grows — budgeted mixing is a SNAPSHOT
    * operation by nature (fixed budget over a growing corpus must
    * dilute someone).
    *
    * Scale shape: one partial-aggregated groupBy over (stratum) —
    * shuffle volume = |strata| rows per partition — broadcast back to a
    * row-local filter; no corpus-wide shuffle, no driver data. Exact
    * cross-engine replay needs dyadic weights (0.5, 0.25, …): every
    * intermediate double is then exact, so the floor() boundary cannot
    * flip between engines (q41 uses such weights; arbitrary weights are
    * still run-to-run deterministic within Spark). */
  def mixToTokenBudget(df: DataFrame, idCol: String, stratumCol: String,
      textCol: String, weights: Map[String, Double],
      budgetTokens: Long,
      subwordMerges: Option[Seq[(String, String)]] = None): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "need at least one stratum with a positive weight")
    val wsum = weights.values.sum
    // tokenizer seam (r15, as tokenFertility's): None = whitespace
    // tokens (the original contract, every existing caller/oracle
    // unchanged); Some(merges) = greedy-BPE subwords — the budget a
    // training pipeline actually buys. Both row-local one-pass.
    val nTokens = subwordMerges match {
      case None => size(TextHash.tokens(col(textCol)))
      case Some(m) =>
        graft.functions.Bpe.subwordCountOf(lower(trim(col(textCol))), m)
    }
    val counts = df.select(col(idCol), col(stratumCol),
      nTokens.as("n_tokens"))
    val target = weights.foldLeft(lit(0.0)) { case (acc, (s, wgt)) =>
      when(col(stratumCol) === s,
        lit(budgetTokens.toDouble) * lit(wgt) / lit(wsum)).otherwise(acc)
    }
    val thr = counts.groupBy(col(stratumCol))
      .agg(sum(col("n_tokens")).cast("long").as("t"))
      .select(col(stratumCol),
        floor(least(lit(1.0), target / col("t").cast("double")) *
          lit(1000000.0)).cast("long").as("thr"))
    // pmod, not %: a NEGATIVE id's Java-% fold is negative all the way
    // down, so `bucket < thr` would admit it unconditionally and
    // silently distort the mixture (the r18 advice finding); for ids
    // >= 0 the two agree, so every existing oracle is unchanged
    val bucket =
      (pmod(col(idCol), lit(P)) * lit(2654435761L) % P + lit(12345L)) %
        P % 1000000L
    counts.join(broadcast(thr), Seq(stratumCol))
      .where(bucket < col("thr"))
      .select(col(idCol), col(stratumCol), col("n_tokens"))
  }

  /** Weighted corpus mixing to a BYTE budget — [[mixToTokenBudget]]'s
    * media sibling (r18): a multimodal training mixture is stated in
    * BYTES per modality ("a 10 TB mix at 50% image / 25% audio / 25%
    * video" — a loader reading payload shards buys octets, and token
    * counts do not exist for binary media), realized by the same
    * machinery — each stratum contributes `budget · wᵢ/Σw` bytes IN
    * EXPECTATION via the per-million affine id-hash keep fraction
    * `min(1, targetᵢ/Bᵢ)` (`Bᵢ` = the stratum's total weight-column
    * mass). A stratum lighter than its target is kept whole; the
    * shortfall stays visible (weights are intent — silent rebalancing
    * would corrupt the mixture). Rows whose stratum carries no weight
    * (an unroutable modality) drop — quota zero is a decision, not an
    * accident. `weightCol` is any non-negative integer column
    * (`octet_length(payload)` for a media lake); rows never decode —
    * mixing meters raw bytes, routing/decode gates live upstream.
    *
    * Same determinism and scale shape as [[mixToTokenBudget]]: no
    * rand(), one \|strata\|-row partial-aggregated fold broadcast back
    * to a row-local filter, no corpus-wide shuffle. Output (idCol,
    * stratumCol, n_bytes). */
  def mixToByteBudget(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: Column, weights: Map[String, Double],
      budgetBytes: Long): DataFrame = {
    require(budgetBytes > 0, s"budgetBytes=$budgetBytes must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "need at least one stratum with a positive weight")
    val wsum = weights.values.sum
    val sized = df.select(col(idCol), col(stratumCol),
      weightCol.cast("long").as("n_bytes"))
    val target = weights.foldLeft(lit(0.0)) { case (acc, (s, wgt)) =>
      when(col(stratumCol) === s,
        lit(budgetBytes.toDouble) * lit(wgt) / lit(wsum)).otherwise(acc)
    }
    val thr = sized.groupBy(col(stratumCol))
      .agg(sum(col("n_bytes")).cast("long").as("b"))
      .select(col(stratumCol),
        floor(least(lit(1.0), target / col("b").cast("double")) *
          lit(1000000.0)).cast("long").as("thr"))
    // pmod for the same negative-id reason as [[mixToTokenBudget]]
    val bucket =
      (pmod(col(idCol), lit(P)) * lit(2654435761L) % P + lit(12345L)) %
        P % 1000000L
    sized.join(broadcast(thr), Seq(stratumCol))
      .where(bucket < col("thr"))
      .select(col(idCol), col(stratumCol), col("n_bytes"))
  }

  /** PAIRED byte-budget mixture — [[mixToByteBudget]] for ATOMIC
    * multi-payload rows (the caption+image+audio training triple): a
    * paired row carries EVERY modality's bytes at once, so
    * per-stratum keep fractions cannot apply (dropping a row drops
    * all of its modalities together, and an arbitrary per-row
    * modality composition makes an exact stated mixture generally
    * unreachable by row selection). The mixture statement therefore
    * becomes per-modality byte CAPS: modality m may spend at most
    * `budget·wₘ/Σw` octets. A UNIFORM deterministic keep fraction f
    * scales every modality's byte mass by f in expectation, so the
    * BINDING modality (largest mass-to-target ratio) fixes
    * `f = min(1, minₘ targetₘ/Mₘ)` and every modality lands at or
    * under its cap — the binding one at its target, the others
    * under, and the shortfall stays VISIBLE (weights are intent;
    * silent rebalancing would corrupt the mixture). A modality
    * listed in `masses` but absent from `weights` has target 0: if
    * it carries any bytes, f = 0 and NOTHING is kept — quota zero is
    * a decision, not an accident (the [[mixToByteBudget]] rule for
    * unroutable strata, stated per-column here).
    *
    * Same determinism and scale shape as the stratified siblings: no
    * rand(), one \|modalities\|-column single-row fold broadcast back
    * to the row-local affine id-hash filter, no corpus-wide shuffle.
    * Output: (idCol, `<modality>_bytes`...) — the KEPT rows with
    * their per-modality octets. */
  def pairedMixToByteBudget(df: DataFrame, idCol: String,
      masses: Seq[(String, Column)], weights: Map[String, Double],
      budgetBytes: Long): DataFrame = {
    require(budgetBytes > 0, s"budgetBytes=$budgetBytes must be positive")
    require(masses.nonEmpty, "need at least one modality byte column")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val wsum = weights.values.sum
    require(wsum > 0, "need at least one positive weight")
    val sized = df.select(col(idCol) +: masses.map { case (m, c) =>
      c.cast("long").as(s"${m}_bytes") }: _*)
    // one row: per-modality total masses → the binding keep fraction,
    // floored to per-million (the portable threshold every stratified
    // mixer uses, so engines agree bit-for-bit)
    val fr = masses.map { case (m, _) =>
      val target = lit(budgetBytes.toDouble) *
        lit(weights.getOrElse(m, 0.0)) / lit(wsum)
      when(col(s"__t_$m") > 0L,
        target / col(s"__t_$m").cast("double")).otherwise(lit(1.0))
    }
    val thr = sized.agg(
        sum(col(s"${masses.head._1}_bytes")).cast("long")
          .as(s"__t_${masses.head._1}"),
        masses.tail.map { case (m, _) =>
          sum(col(s"${m}_bytes")).cast("long").as(s"__t_$m") }: _*)
      .select(floor(least(fr.reduceLeft(least(_, _)), lit(1.0)) *
        lit(1000000.0)).cast("long").as("__thr"))
    val bucket =
      (pmod(col(idCol), lit(P)) * lit(2654435761L) % P + lit(12345L)) %
        P % 1000000L
    sized.crossJoin(broadcast(thr))
      .where(bucket < col("__thr"))
      .drop("__thr")
  }

  /** Fixed-k-per-stratum priority sample: exactly `min(k, |stratum|)`
    * documents per stratum, chosen as the k SMALLEST affine id-hashes
    * (ties → lowest id). This is deterministic priority sampling — the
    * fixed-COUNT sibling of [[stratifiedByHash]]'s fixed-FRACTION
    * keep: same portable-hash determinism (no rand(); a doc's rank
    * only changes when a lower-hash doc enters its stratum), but the
    * output size is an exact contract, which is what eval-set and
    * human-review draws need. `sample_rank` (1..k) makes any prefix of
    * the sample a valid smaller sample — nested samples for free.
    *
    * Scale shape: the hash is row-local and the rank filter plans as
    * WindowGroupLimit (plan-pinned, like q46): each task keeps a k-row
    * heap per stratum BEFORE the exchange, so the shuffle carries
    * ≤ k·|strata|·partitions rows — never the corpus. */
  def priorityKPerStratum(df: DataFrame, idCol: String,
      stratumCol: String, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val h = ((col(idCol) % P) * lit(2654435761L) % P + lit(12345L)) % P
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
      .drop("__h")
  }

  /** Weighted (probability-proportional-to-size) priority sample:
    * `min(k, |stratum|)` rows per stratum where a row's chance of
    * selection scales with `weightCol` — the Duffield–Lund–Thorup
    * priority-sampling scheme with the portable affine hash standing
    * in for the uniform draw. Priority = w/u with u = (h+1)/P; we keep
    * the k LARGEST priorities, i.e. the k smallest u/w keys. The key
    * is one IEEE division of exact integers (`(h+1)/w` in doubles) —
    * correctly rounded, so every engine orders identically; ties break
    * on id. Zero/negative weights are excluded (they carry no mass).
    *
    * The training-mix use case: draw human-review or eval candidates
    * where longer / higher-value documents should surface
    * proportionally more often, still fully deterministic re-run to
    * re-run. Same WindowGroupLimit scale shape as
    * [[priorityKPerStratum]]: per-task k-heaps before the exchange. */
  def weightedPriorityK(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val h = ((col(idCol) % P) * lit(2654435761L) % P + lit(12345L)) % P
    val key = (h + lit(1L)).cast("double") / col(weightCol).cast("double")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__key"), col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn("__key", key)
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
      .drop("__key")
  }

  /** Deterministic training-order shuffle: the last step of every
    * corpus pipeline — randomize document order for training, sharded
    * so a 1000-executor writer (and later a 1000-worker data loader)
    * each own one shard.
    *
    * Each doc gets a portable affine hash of (id, seed): `shard` =
    * hash % shards, `pos` = dense rank of the hash within the shard
    * (ties broken by id — total order, engine-independent). The seed is
    * the EPOCH: a different seed reshuffles every doc into a new shard
    * and position, which is exactly the "reshuffle between epochs"
    * semantics trainers want, with no state carried between epochs.
    *
    * Scale shape: the hash/shard assignment is row-local; the only
    * shuffle is the per-shard window (`partitionBy(shard)` — `shards`
    * balanced partitions, each ~N/shards rows, AQE-splittable). Never a
    * GLOBAL sort or single-partition window: position is only
    * meaningful WITHIN a shard, the cross-shard interleave being the
    * data loader's round-robin. The downstream write is
    * `repartition(col("shard")).sortWithinPartitions(col("pos"))` —
    * one more shuffle, inherent to materializing any permutation. */
  def trainingOrder(df: DataFrame, idCol: String, shards: Int = 8,
      seed: Long = 0L): DataFrame = {
    require(shards > 0, s"shards=$shards must be positive")
    val h = ((col(idCol) % P) * lit(2654435761L) % P +
      (lit(seed % P) * lit(40503L)) % P) % P
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("skey"), col(idCol))
    df.withColumn("skey", h)
      .withColumn("shard", (col("skey") % shards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("skey")
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * rebalance (the `p_i^α / Σ p_j^α` upsampling rule of the mT5/XLM-R
    * pretraining recipes): flatten the natural per-stratum token shares
    * so low-resource strata are seen more than their raw mass and no
    * head stratum drowns the mixture. Output, one row per stratum:
    * the exact token count, the natural share `c_i/Σc`, the tempered
    * share `c_i^α/Σc_j^α`, and `boost` = tempered/natural — the
    * upsampling factor a loader (or [[mixToTokenBudget]], fed
    * `share` as its weights) applies.
    *
    * `alphaQuarters`∈[1,4] sets α = quarters/4. Restricting α to the
    * quarter grid is the cross-engine exactness trade: x^(1/4), x^(1/2),
    * x^(3/4) and x^1 compose from `sqrt` and one multiply — IEEE-exact
    * everywhere — where a general `pow` is a transcendental whose last
    * bit varies by libm (the q52 ln-avoidance argument). The tempered
    * weight is floored to a 2^-20 fixed-point long before normalizing,
    * so both shares are ratios of EXACT integers; α=1/2 (the default)
    * is the common published temperature T=2.
    *
    * Scale shape: one partial-aggregated groupBy(stratum) over the
    * corpus — shuffle volume |strata| rows per partition — then windows
    * over the |strata|-row aggregate only (the over-all window never
    * sees the corpus; it is bounded by stratum cardinality, which is
    * what makes it safe where a corpus-wide global window would not
    * be). */
  def temperatureMix(docs: DataFrame, stratumCol: String, textCol: String,
      alphaQuarters: Int = 2): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      s"alphaQuarters=$alphaQuarters must be in [1,4] (α = quarters/4)")
    val counts = docs.groupBy(col(stratumCol))
      .agg(sum(size(TextHash.tokens(col(textCol)))).cast("long")
        .as("n_tokens"))
    val x = col("n_tokens").cast("double")
    val tempered = alphaQuarters match {
      case 1 => sqrt(sqrt(x))
      case 2 => sqrt(x)
      case 3 => sqrt(x) * sqrt(sqrt(x))
      case _ => x
    }
    import org.apache.spark.sql.expressions.Window
    val overAll = Window.partitionBy() // |strata|-row frame only
    counts
      .withColumn("w_fp", floor(tempered * lit(1048576.0)).cast("long"))
      .withColumn("natural_share", col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(overAll).cast("double"))
      .withColumn("share", col("w_fp").cast("double") /
        sum(col("w_fp")).over(overAll).cast("double"))
      .withColumn("boost", col("share") / col("natural_share"))
      .orderBy(col(stratumCol))
  }

  /** EFFECTIVE SAMPLE SIZE of a weighted mix — the diversity price tag
    * [[temperatureMix]] doesn't show: re-weighting strata makes some
    * documents count more than others, and the Kish ESS
    * `(Σ wᵢ)² / Σ wᵢ²` says how many EQUALLY-weighted documents the
    * weighted corpus is worth (ESS = N when weights are uniform,
    * → the heavy stratum's size as weights concentrate). The number a
    * mixing decision is judged by: a mix that buys 2× more target-
    * domain share by collapsing ESS to a tenth of the corpus is
    * usually a bad trade. Per-doc weight = the doc's stratum weight
    * from the same α-tempered fixed-point table as [[temperatureMix]]
    * (ESS is scale-invariant, so the 2^20 factor cancels exactly).
    *
    * Engine-exact: stratum folds are exact integers; `Σ n_s·w` and
    * `Σ n_s·w²` fold in DECIMAL(38,0) (w_fp ≤ 2^20·√N keeps the
    * squares in range); the final ESS is a pinned 3-op IEEE sequence
    * (`(double)sw · (double)sw / (double)sw2` — sw² itself would
    * overflow any integer width at corpus scale, and the division is
    * where exactness is spent anyway).
    *
    * Scale shape: one partial-aggregated stratum fold, then an
    * ungrouped fold over the |strata|-row frame. */
  def effectiveSampleSize(docs: DataFrame, stratumCol: String,
      textCol: String, alphaQuarters: Int = 2): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      s"alphaQuarters=$alphaQuarters must be in [1,4] (α = quarters/4)")
    val counts = docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(size(TextHash.tokens(col(textCol)))).cast("long")
          .as("n_tokens"))
    val x = col("n_tokens").cast("double")
    val tempered = alphaQuarters match {
      case 1 => sqrt(sqrt(x))
      case 2 => sqrt(x)
      case 3 => sqrt(x) * sqrt(sqrt(x))
      case _ => x
    }
    val dec = "DECIMAL(38,0)"
    counts
      .withColumn("w_fp", floor(tempered * lit(1048576.0)).cast("long"))
      .agg(sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_strata"),
        sum(col("n_docs").cast(dec) * col("w_fp").cast(dec)).as("__sw"),
        sum(col("n_docs").cast(dec) * col("w_fp").cast(dec) *
          col("w_fp").cast(dec)).as("__sw2"))
      .select(col("n_docs"), col("n_strata"),
        (col("__sw").cast("double") * col("__sw").cast("double") /
          col("__sw2").cast("double")).as("ess"))
      .withColumn("ess_ratio", col("ess") / col("n_docs").cast("double"))
  }

  /** TIME-EMBARGO TEMPORAL SPLIT — the leakage-safe split for TEMPORAL
    * data: train strictly before, test strictly after, and an embargo
    * gap between them wide enough that trailing features (moving
    * averages, [[Rolling.causalZScore]] windows) computed on train
    * rows cannot touch test-period state. [[holdoutSplit]] hashes
    * identity, [[leakageSafeSplit]] respects near-dup families; this
    * respects the ARROW OF TIME — the split a forecasting or
    * early-warning model must use (a random split lets the model
    * memorize the future).
    *
    * Anchored to the data's own max timestamp (the q85 rule), cut
    * arithmetic in integer microseconds. The report also counts, per
    * split, the users it SHARES with the test period — the identity
    * leakage a purely temporal fence leaves open (a user's test-period
    * behavior is partially predictable from their train-period rows;
    * quantify it before trusting the eval).
    *
    * Scale shape: the anchor is a one-row broadcast scalar append
    * (q84 shape); classification is row-local; ONE corpus-sized
    * partial-aggregable pass keys on `user`; the final rollup reduces
    * the |users| frame to 3 rows via the single-explode unpivot. */
  def temporalSplit(df: DataFrame, tsUsCol: Column, userCol: Column,
      testDays: Int, embargoDays: Int): DataFrame = {
    require(testDays >= 1, s"need testDays >= 1, got $testDays")
    require(embargoDays >= 0, s"need embargoDays >= 0, got $embargoDays")
    val usDay = 86400000000L
    val base = df.select(tsUsCol.as("ts_us"), userCol.as("u"))
    val anchor = base.agg(max(col("ts_us")).as("__anchor"))
    val perUser = base.crossJoin(broadcast(anchor))
      .withColumn("split",
        when(col("ts_us") > col("__anchor") - lit(testDays * usDay),
          "test")
        .when(col("ts_us") >
          col("__anchor") - lit((testDays + embargoDays) * usDay),
          "embargo")
        .otherwise("train"))
      .groupBy(col("u"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L))
          .as("n_train"),
        sum(when(col("split") === "embargo", 1L).otherwise(0L))
          .as("n_embargo"),
        sum(when(col("split") === "test", 1L).otherwise(0L))
          .as("n_test"))
    val wide = perUser.agg(
      coalesce(sum(col("n_train")), lit(0L)).as("e_train"),
      coalesce(sum(col("n_embargo")), lit(0L)).as("e_embargo"),
      coalesce(sum(col("n_test")), lit(0L)).as("e_test"),
      coalesce(sum(when(col("n_train") > 0, 1L).otherwise(0L)), lit(0L))
        .as("u_train"),
      coalesce(sum(when(col("n_embargo") > 0, 1L).otherwise(0L)), lit(0L))
        .as("u_embargo"),
      coalesce(sum(when(col("n_test") > 0, 1L).otherwise(0L)), lit(0L))
        .as("u_test"),
      coalesce(sum(when(col("n_train") > 0 && col("n_test") > 0, 1L)
        .otherwise(0L)), lit(0L)).as("s_train"),
      coalesce(sum(when(col("n_embargo") > 0 && col("n_test") > 0, 1L)
        .otherwise(0L)), lit(0L)).as("s_embargo"),
      coalesce(sum(when(col("n_test") > 0, 1L).otherwise(0L)), lit(0L))
        .as("s_test"))
    val entries = Seq("train", "embargo", "test").map(sp => struct(
      lit(sp).as("split"), col(s"e_$sp").as("n_events"),
      col(s"u_$sp").as("n_users"),
      col(s"s_$sp").as("n_users_shared_with_test")))
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.split").as("split"), col("e.n_events"),
        col("e.n_users"), col("e.n_users_shared_with_test"))
      .orderBy(col("split"))
  }

  /** CONTRASTIVE TRIPLET EXPORT — (anchor, positive, negative) rows
    * for contrastive/embedding training, composed from the near-dup
    * cluster decision ([[graft.operators.Dedup.nearDupClusters]],
    * q31): the POSITIVE is a same-cluster neighbor (the previous
    * member by id, the first member borrowing the second — NULL only
    * for singletons), the NEGATIVE a different-cluster doc chosen by
    * the portable affine hash — no rand(), the [[stratifiedByHash]]
    * reproducibility contract: same triplets every run, engine and
    * retry. [[graft.operators.Dedup]]'s hard-negative mining (q106)
    * picks semantically-CLOSE negatives by embedding; this is the
    * cheap lexical-pipeline rung that needs no vectors.
    *
    * Negative selection is the q40 shard discipline: docs order by
    * (hash, id) WITHIN hash shards (partitioned windows — no global
    * sort), and each anchor takes the first of its next 3 hash
    * neighbors from a DIFFERENT cluster (NULL if all 3 share its
    * cluster — vanishingly rare off a degenerate clustering, and an
    * honest NULL beats a silent same-cluster "negative").
    *
    * Scale shape: input is the |docs|-row cluster frame (the corpus
    * pass already happened in q31); one cluster-keyed window for
    * positives, one shard-keyed window for negatives, one id join. */
  def contrastiveTriplets(clusters: DataFrame, shards: Int = 8)
      : DataFrame = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    import org.apache.spark.sql.expressions.Window
    val base = clusters.select(col("doc_id"), col("cluster_id"))
    val cw = Window.partitionBy(col("cluster_id")).orderBy(col("doc_id"))
    val pos = base.withColumn("positive_id",
      coalesce(lag(col("doc_id"), 1).over(cw),
        lead(col("doc_id"), 1).over(cw)))
    val hashed = base
      .withColumn("hh",
        (col("doc_id") % P) * lit(2654435761L) % P + lit(12345L))
      .withColumn("hh", col("hh") % P)
      .withColumn("shard", col("hh") % shards)
    val sw = Window.partitionBy(col("shard"))
      .orderBy(col("hh"), col("doc_id"))
    val neg = hashed
      .withColumn("n1", lead(col("doc_id"), 1).over(sw))
      .withColumn("c1", lead(col("cluster_id"), 1).over(sw))
      .withColumn("n2", lead(col("doc_id"), 2).over(sw))
      .withColumn("c2", lead(col("cluster_id"), 2).over(sw))
      .withColumn("n3", lead(col("doc_id"), 3).over(sw))
      .withColumn("c3", lead(col("cluster_id"), 3).over(sw))
      .select(col("doc_id"),
        when(col("c1").isNotNull && col("c1") =!= col("cluster_id"),
          col("n1"))
        .when(col("c2").isNotNull && col("c2") =!= col("cluster_id"),
          col("n2"))
        .when(col("c3").isNotNull && col("c3") =!= col("cluster_id"),
          col("n3")).as("negative_id"))
    pos.join(neg, Seq("doc_id"))
      .select(col("doc_id").as("anchor_id"), col("cluster_id"),
        col("positive_id"), col("negative_id"))
      .orderBy(col("anchor_id"))
  }

  /** SPLIT BALANCE AUDIT — did the split skew the features: per
    * split of [[temporalSplit]]'s fence (or any split column), the
    * mean ± standard error of a measure ([[graft.operators.Trend.stratumMeanSE]]
    * keyed by split). Two splits whose error bars don't overlap on a
    * feature the model uses = the eval is measuring the SPLIT, not
    * the model. One corpus pass after the split assignment. */
  def splitBalance(df: DataFrame, splitCol: Column, valueCol: Column)
      : DataFrame =
    graft.operators.Trend.stratumMeanSE(
      df.select(splitCol.as("split"), valueCol.as("v")),
      col("split"), col("v"))
      .withColumnRenamed("stratum", "split")

  /** Truncated-Poisson(1) CDF thresholds in 2^20 fixed-point —
    * computed ONCE here and interpolated verbatim into the DuckDB
    * oracle (the importanceWeights shared-constant discipline), so
    * the weight ladder cannot drift between engines. */
  val PoissonT: Seq[Long] = {
    val e1 = math.exp(-1.0)
    val cum = Seq(e1, 2 * e1, 2.5 * e1, 8.0 / 3.0 * e1)
    cum.map(c => math.floor(c * 1048576.0).toLong)
  }

  /** POISSON-BOOTSTRAP CONFIDENCE INTERVAL — the resampling statistic
    * that actually runs at corpus scale: a classic bootstrap draws n
    * rows WITH replacement (a global shuffle per replicate — dead at
    * 100 TB), while the Poisson bootstrap gives every row an
    * independent Poisson(1) weight per replicate, so all B replicates
    * fold in ONE pass with a ×B row-local expansion and a ≤ B-key
    * aggregate. The per-replicate means' spread is the standard error
    * of the full-sample mean; the 2nd-smallest / 2nd-largest replicate
    * means bracket a ≈94% percentile CI at B = 32.
    *
    * Engine-exact: the weight is a 4-step threshold ladder on the
    * portable (id, replicate) affine hash against the fixed-point
    * truncated-Poisson CDF ([[PoissonT]] — weights capped at 4, the
    * 1.9% tail mass collapsed into the cap; documented bias, exactness
    * bought). `valueCol` must be integer-valued: replicate sums fold
    * exactly in DECIMAL(38,0), each replicate mean is ONE fixed-point
    * division, and the SE is one pinned IEEE sqrt over exact
    * integer moments of the ≤ B means.
    *
    * Scale shape: one corpus pass (row-local explode ×B, partial
    * aggregation to B keys), then all statistics on the B-row frame.
    * B = 32 multiplies map output, not shuffle rows — the honest,
    * documented cost of resampling; subsample first if even that is
    * too much. */
  def poissonBootstrapCI(df: DataFrame, idCol: String,
      valueCol: String, replicates: Int = 32,
      seed: Long = 1L): DataFrame = {
    require(replicates >= 4 && replicates <= 256,
      s"replicates=$replicates out of [4, 256]")
    val bad = Seq(idCol, valueCol).filterNot(df.columns.contains)
    require(bad.isEmpty, s"unknown columns: $bad")
    val p = TextHash.P
    val dec = "DECIMAL(38,0)"
    val Seq(t0, t1, t2, t3) = PoissonT
    val rows = df
      .where(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(valueCol).cast("long").as("__v"))
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0L), lit(replicates - 1L))).as("__b"))
      .withColumn("__u", expr(
        s"((__id % $p) * 2654435761 % $p + " +
          s"((__b + ${seed}L) % $p) * 40503 % $p) % $p % 1048576"))
      .withColumn("__w",
        when(col("__u") < t0, 0L).when(col("__u") < t1, 1L)
          .when(col("__u") < t2, 2L).when(col("__u") < t3, 3L)
          .otherwise(4L))
    val reps = rows.groupBy(col("__b"))
      .agg(sum(col("__w")).as("__n"),
        sum((col("__w") * col("__v")).cast(dec)).as("__s"))
      .where(col("__n") > 0)
      .select(col("__b"),
        expr(s"CAST((__s * 1048576) div CAST(__n AS $dec) AS BIGINT)")
          .as("__mean_fp"))
    reps
      .agg(count(lit(1)).as("n_replicates"),
        sum(col("__mean_fp").cast(dec)).as("__m1"),
        sum((col("__mean_fp").cast(dec) * col("__mean_fp").cast(dec)))
          .as("__m2"),
        sort_array(collect_list(col("__mean_fp"))).as("__sorted"))
      .select(col("n_replicates"),
        expr(s"CAST(__m1 div CAST(n_replicates AS $dec) AS BIGINT)")
          .as("boot_mean_fp"),
        sqrt(greatest(
          (col("__m2").cast("double") -
            col("__m1").cast("double") * col("__m1").cast("double") /
              col("n_replicates").cast("double")) /
            (col("n_replicates").cast("double") - 1.0), lit(0.0)))
          ./(lit(1048576.0)).as("se"),
        element_at(col("__sorted"), 2).as("ci_lo_fp"),
        element_at(col("__sorted"), -2).as("ci_hi_fp"))
  }

  /** WATER-FILLING QUOTA — MAX-MIN FAIR division of a global budget
    * across strata: [[temperatureMix]] reshapes shares by a smooth
    * exponent, but a curation contract is often the harder
    * "every source keeps everything UP TO the fair level; only the
    * giants are capped". That is water-filling: the level `L` where
    * `Σ min(massᵢ, L) = budget` — small sources are untouched, all
    * capped sources land at the same level (no source is cut while a
    * larger one keeps more), and the budget is met EXACTLY.
    *
    * Exact integer solution (no search): sort strata by mass
    * ascending; stratum `j` is fully satisfiable iff even granting its
    * mass to every not-smaller stratum fits — `S_{j−1} + (n−j+1)·mⱼ ≤
    * B`. With `j*` the largest such index, `L = (B − S_{j*}) div
    * (n − j*)` and the integer remainder goes +1 each to the LARGEST
    * capped strata (they have headroom by construction: maximality of
    * `j*` forces `mᵢ ≥ L+1` above it), ties by stratum name — fully
    * deterministic, `Σ allocated = min(B, Σ mass)` exactly.
    *
    * Scale shape: one partial-aggregated mass fold to |strata| keys;
    * every window below runs on that TINY frame (the q84 aggregated
    * discipline), never the corpus. */
  def waterfillQuota(df: DataFrame, stratumCol: String,
      weightCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"need budget >= 0, got $budget")
    val bad = Seq(stratumCol, weightCol).filterNot(df.columns.contains)
    require(bad.isEmpty, s"unknown columns: $bad")
    val masses = df
      .groupBy(col(stratumCol).as("stratum"))
      .agg(sum(col(weightCol).cast("long")).as("mass"))
    val wAsc = Window.orderBy(col("mass").asc, col("stratum").asc)
    val ranked = masses
      .withColumn("__j", row_number().over(wAsc).cast("long"))
      .withColumn("__s_prev", coalesce(sum(col("mass"))
        .over(wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).cast("long"))
      .withColumn("__full",
        col("__s_prev") + (col("__n") - col("__j") + 1L) * col("mass")
          <= budget)
    val jStar = ranked
      .agg(coalesce(max(when(col("__full"), col("__j"))), lit(0L))
        .as("__jstar"),
        coalesce(sum(when(col("__full"), col("mass"))), lit(0L))
          .as("__sstar"))
    val out = ranked.crossJoin(broadcast(jStar))
      .withColumn("__ncap", col("__n") - col("__jstar"))
      .withColumn("__level", when(col("__ncap") > 0,
        expr(s"(${budget}L - __sstar) div __ncap")).otherwise(lit(0L)))
      .withColumn("__rem", when(col("__ncap") > 0,
        expr(s"(${budget}L - __sstar) % __ncap")).otherwise(lit(0L)))
      .withColumn("__caprank",
        when(col("__j") > col("__jstar"),
          row_number().over(Window
            .orderBy(col("mass").desc, col("stratum").asc)).cast("long"))
          .otherwise(lit(0L)))
    out.select(col("stratum"), col("mass"),
      when(col("__j") <= col("__jstar"), col("mass"))
        .otherwise(col("__level") +
          when(col("__caprank") <= col("__rem"), 1L).otherwise(0L))
        .as("allocated"),
      (col("__j") > col("__jstar")).as("capped"))
      .orderBy(col("stratum").asc_nulls_first)
  }
}
