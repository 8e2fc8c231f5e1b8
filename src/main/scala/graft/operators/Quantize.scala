package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.CacheScope
import graft.functions.VectorOps

/** Embedding compression for the similarity stack (SURVEY.md §2.11):
  * per-dimension int8 scalar quantization — the standard first rung of
  * vector-index compression (4× smaller than float32 before any PQ),
  * what a 100 TB embedding store does before building IVF/LSH
  * structures over it.
  *
  * Scale shape: the per-dimension min/max is a partial-aggregable
  * groupBy over the position-exploded frame (map-side combine reduces
  * it to dims·partitions rows before the exchange); the dims-row stats
  * frame is then BROADCAST back onto the exploded frame, so the
  * N·dims code computation itself never shuffles. No window, no
  * driver-side data beyond the dims-row stats.
  *
  * Engine-exactness: codes and reconstruction errors are pure IEEE
  * field ops with pinned parenthesization (`((x-mn)*255)/(mx-mn)`,
  * then `mn + (code*(mx-mn))/255`), `least(…, 255)` guards the
  * rounding-up edge at `x = mx`, and the squared error is floored to
  * a 2^-20-grid long — so the DuckDB oracle replays every row
  * bit-for-bit. Output is the long (vec_id, pos, code, err_fp) form:
  * the verification surface; a production sink would re-pack codes
  * into a binary column row-locally.
  */
object Quantize {

  /** Int8 codes + fixed-point squared reconstruction error per
    * (vector, dimension). Constant dimensions (mx == mn) code to 0
    * with reconstruction = mn, so err_fp = 0. */
  def int8Codes(embeddings: DataFrame): DataFrame = {
    val x = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("pos"), col("xf").cast("double").as("x"))
    val st = x.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    x.join(broadcast(st), Seq("pos"))
      .withColumn("code",
        when(col("mx") > col("mn"),
          least(floor(((col("x") - col("mn")) * lit(255.0)) /
            (col("mx") - col("mn"))), lit(255.0)))
          .otherwise(lit(0.0)).cast("int"))
      .withColumn("recon",
        col("mn") + (col("code").cast("double") * (col("mx") - col("mn")))
          / lit(255.0))
      .withColumn("err_fp",
        floor(((col("x") - col("recon")) * (col("x") - col("recon")))
          * lit(1048576.0)).cast("long"))
      .select(col("vec_id"), col("pos"), col("code"), col("err_fp"))
      .orderBy(col("vec_id"), col("pos"))
  }

  /** Product quantization — the compression rung ABOVE [[int8Codes]]
    * and the standard ANN-index encoding (IVF-PQ): the vector is split
    * into `m` subvectors and each subvector is coded as its nearest of
    * `k` per-subspace centroids, so a 64-dim float32 vector becomes
    * `m` small codes (with `m=8, k=8`: 8 codes ≈ 3 bits each — 85×
    * smaller than the raw vector).
    *
    * Training is the deterministic k-means scheme the IVF quantizer
    * established (Similarity.scala): seeds = the `k` smallest
    * affine-hashed vec_ids (their subvectors initialize every
    * subspace), ONE fixed-point refinement pass (per-(subspace, cell)
    * dimension means as 2^-20-grid long sums — order-independent), then
    * the final assignment. Assignment is ROW-LOCAL over one broadcast
    * centroids-per-subspace row: squared L2 via the codegen'd
    * [[VectorOps.dot]] identity `(sv·sv - 2·sv·cv) + cv·cv`, ties to
    * the smallest cent_id — the order an external `row_number() OVER
    * (ORDER BY dist, cent_id)` replays. The corpus never shuffles for
    * assignment; the only exchanges are the k-seed TakeOrdered and the
    * (m·k·dims)-row fixed-point mean aggregate.
    *
    * Codes keep their centroid's SEED vec_id as identity (no rank
    * remapping — stable, joinable, replayable). Output long form
    * (vec_id, sub, code, err_fp): the verification surface, like
    * [[int8Codes]]; err_fp is the squared distance floored to the
    * 2^-20 grid (clamped at 0: the dot identity can go −ulp on exact
    * matches). */
  def pqCodes(embeddings: DataFrame, m: Int = 8, k: Int = 8,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val (sv, refined) = trainPq(embeddings, m, k, scope)
    codesFrom(sv, refined)
  }

  private def codesFrom(sv: DataFrame, cents: DataFrame): DataFrame =
    assign(sv, cents)
      .select(col("vec_id"), col("sub"), col("code"),
        floor(greatest(col("dist"), lit(0.0)) * lit(1048576.0))
          .cast("long").as("err_fp"))
      .orderBy(col("vec_id"), col("sub"))

  /** The trained per-subspace codebook alone — (sub, cent_id, cv) —
    * the artifact an index stores next to its codes. */
  def trainCodebook(embeddings: DataFrame, m: Int = 8, k: Int = 8,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    trainPq(embeddings, m, k, scope)._2

  /** Encode vectors against a FROZEN codebook — the index-maintenance
    * path: a 100 TB embedding store trains its codebook ONCE and then
    * encodes every new batch against it, because (a) re-training on
    * each append would re-code the whole history (every stored code
    * potentially changes), and (b) a code is only meaningful relative
    * to the codebook that produced it. Codes for already-indexed
    * vectors are trivially append-invariant under a frozen codebook —
    * assignment is row-local per vector (QuantizeSpec pins it). Same
    * output shape as [[pqCodes]]. */
  def encodeWith(codebook: DataFrame)(embeddings: DataFrame): DataFrame = {
    val (m, w) = bookShape(codebook)
    codesFrom(slicedAgainst(embeddings, m, w), codebook)
  }

  /** A stored codebook's (m, w) — one action over the tiny (sub,
    * cent_id, cv) frame, with the ragged-width guard. */
  private def bookShape(codebook: DataFrame): (Int, Int) = {
    val shape = codebook
      .agg(max(col("sub")).as("maxSub"),
        min(size(col("cv"))).as("wLo"), max(size(col("cv"))).as("wHi"))
      .head()
    require(shape.getInt(1) == shape.getInt(2),
      s"ragged codebook widths: ${shape.getInt(1)}..${shape.getInt(2)}")
    (shape.getInt(0) + 1, shape.getInt(1))
  }

  /** (vec_id, sub, sv) subvectors sliced to a FROZEN codebook's shape.
    * Row-local dimensionality guard: a wrong-dim vector would slice to
    * short/empty subvectors whose NULL dot products get masked into
    * err_fp=0 with an arbitrary "nearest" centroid — fail loudly
    * instead, without an extra validation scan over the store. */
  private def slicedAgainst(embeddings: DataFrame, m: Int,
      w: Int): DataFrame = {
    val dimOk = when(size(col("v")) === lit(m * w), lit(true))
      .otherwise(raise_error(format_string(
        s"encodeWith: embedding dim %s != codebook m*w = ${m * w} (vec_id=%s)",
        size(col("v")), col("vec_id"))))
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .filter(dimOk)
      .select(col("vec_id"), col("v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("vec_id"), col("sub"),
        slice(col("v"), col("sub") * lit(w) + lit(1), lit(w)).as("sv"))
  }

  /** The squared-L2 identity `(sv·sv − 2·sv·cv) + cv·cv` over the
    * codegen'd dot — the exact parenthesization the oracle replays. */
  private def sqDist(svCol: org.apache.spark.sql.Column,
      cvCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (VectorOps.dot(svCol, svCol) -
      lit(2.0) * VectorOps.dot(svCol, cvCol)) +
      VectorOps.dot(cvCol, cvCol)

  /** Row-local nearest-centroid assignment over one broadcast
    * centroids row per subspace; (dist, cent_id) struct min = the
    * row_number(ORDER BY dist, cent_id) an external engine replays. */
  private def assign(sv: DataFrame, cents: DataFrame): DataFrame = {
    val centArr = cents.groupBy(col("sub"))
      .agg(sort_array(collect_list(struct(col("cent_id"), col("cv"))))
        .as("ca"))
    val byDist = transform(col("ca"), c => struct(
      sqDist(col("sv"), c.getField("cv")).as("dist"),
      c.getField("cent_id").as("cent_id")))
    sv.join(broadcast(centArr), Seq("sub"))
      .withColumn("best", element_at(array_sort(byDist), 1))
      .select(col("vec_id"), col("sub"), col("sv"),
        col("best.cent_id").as("code"), col("best.dist").as("dist"))
  }

  /** [[assign]]'s multi-probe sibling: the `probes` nearest centroids
    * per row (still row-local over the broadcast centroids row), the
    * same slice-of-sorted-structs shape as the IVF assignCells. */
  private def assignProbes(sv: DataFrame, cents: DataFrame,
      probes: Int): DataFrame = {
    val centArr = cents.groupBy(col("sub"))
      .agg(sort_array(collect_list(struct(col("cent_id"), col("cv"))))
        .as("ca"))
    val byDist = transform(col("ca"), c => struct(
      sqDist(col("sv"), c.getField("cv")).as("dist"),
      c.getField("cent_id").as("cent_id")))
    sv.join(broadcast(centArr), Seq("sub"))
      .select(col("vec_id"), col("sub"),
        explode(transform(slice(array_sort(byDist), 1, probes),
          s => s.getField("cent_id"))).as("cell"))
  }

  /** Shared PQ training core: the persisted subvector frame plus the
    * refined per-subspace centroid table. */
  private def trainPq(embeddings: DataFrame, m: Int, k: Int,
      scope: CacheScope, knownDim: Option[Int] = None): (DataFrame, DataFrame) = {
    require(m > 0 && k > 0, s"need m > 0 and k > 0, got m=$m k=$k")
    val d = knownDim.getOrElse {
      val dims = embeddings.select(size(col("embedding")).as("d"))
        .agg(min(col("d")).as("lo"), max(col("d")).as("hi")).head()
      require(dims.getInt(0) == dims.getInt(1),
        s"ragged embedding lengths: ${dims.getInt(0)}..${dims.getInt(1)}")
      dims.getInt(0)
    }
    require(d % m == 0, s"dims=$d not divisible by m=$m")
    val w = d / m

    val sv = scope.persist(embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("vec_id"), col("sub"),
        slice(col("v"), col("sub") * lit(w) + lit(1), lit(w)).as("sv")))

    // seeds: the k smallest affine-hashed ids (the IVF seed family) —
    // one TakeOrdered(k), their subvectors initialize every subspace
    val h = (col("vec_id") % lit(2147483648L)) * lit(2654435761L) %
      lit(2147483648L)
    val seeds = embeddings.select(col("vec_id"), h.as("h"))
      .orderBy(col("h"), col("vec_id")).limit(k).select("vec_id")
    val init = sv.join(seeds, "vec_id")
      .select(col("sub"), col("vec_id").as("cent_id"), col("sv").as("cv"))

    // one refinement pass: fixed-point per-(subspace, cell) dim means
    val refined = assign(sv, init)
      .select(col("sub"), col("code").as("cell"),
        posexplode(col("sv")).as(Seq("d", "x")))
      .withColumn("f", floor(col("x") * lit(1048576.0)).cast("long"))
      .groupBy(col("sub"), col("cell"), col("d"))
      .agg(sum(col("f")).as("fs"), count(lit(1)).as("cnt"))
      .groupBy(col("sub"), col("cell"))
      .agg(sort_array(collect_list(struct(col("d"), col("fs"),
        col("cnt")))).as("ds"))
      .select(col("sub"), col("cell").as("cent_id"),
        transform(col("ds"), s => s.getField("fs").cast("double") /
          (s.getField("cnt").cast("double") * lit(1048576.0))).as("cv"))
    (sv, refined)
  }

  /** PQ-ADC approximate top-k search — the query path that makes
    * [[pqCodes]] an INDEX (the "AD" in IVF-ADC/PQ search): each query
    * computes one small (m·k)-entry table of partial squared distances
    * to every per-subspace centroid, and a candidate's approximate
    * distance is the SUM of the table entries its codes select —
    * O(m·k·dim) per query to build the table, O(m) per candidate to
    * score, never O(dim) per candidate like the exact path (q20).
    *
    * Scale shape: the table frame (queries·m·k rows) is BROADCAST onto
    * the codes frame; scoring shuffles only the fixed-point partial
    * sums (map-side combined per (query, vec)); the per-query top-k
    * plans as WindowGroupLimit like q46/q51. Partial distances are
    * floored to 2^-20-grid longs BEFORE summing, so the total is
    * order-independent and engine-exact — the trade is quantization of
    * the ranking metric itself, which IS the PQ-ADC approximation. */
  def pqTopK(embeddings: DataFrame, m: Int = 8, k: Int = 8,
      topK: Int = 5, queryStride: Long = 50,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val (sv, refined) = trainPq(embeddings, m, k, scope)
    val codes = assign(sv, refined)
      .select(col("vec_id"), col("sub"), col("code"))
    val table = sv.where(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sv").as("qsv"))
      .join(refined, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id").as("code"),
        floor(greatest(sqDist(col("qsv"), col("cv")), lit(0.0))
          * lit(1048576.0)).cast("long").as("pd_fp"))
    val adc = codes.join(broadcast(table), Seq("sub", "code"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd_fp")).as("adist_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adist_fp"), col("vec_id"))
    adc.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("adist_fp"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ top-k — the full FAISS-layout composition and the 100 TB
    * form of [[pqTopK]]: a COARSE whole-vector quantizer (the same
    * training core with m=1, C=⌈√N⌉ centroids — exactly the IVF cell
    * structure, built from PQ's machinery) restricts each query to its
    * `probes` nearest cells, and only the vectors IN those cells pay
    * the O(m) ADC scoring. Per query that is probes·(N/C)·m table
    * lookups instead of N·m ([[pqTopK]]) instead of N·dim (exact q20)
    * — the three rungs of the same ladder, all oracle-replayable.
    *
    * Scale shape: both quantizers train exactly like [[pqCodes]]
    * (seeds TakeOrdered, fixed-point means, broadcast row-local
    * assignment); the candidate restriction is an equi-join on the
    * cell id; the ADC join/aggregation then runs over candidate pairs
    * only. Recall is the IVF trade (a true neighbor outside the probed
    * cells is missed) ON TOP of the PQ quantization of the metric —
    * both deterministic, both replayed by the oracle. */
  def ivfPqTopK(embeddings: DataFrame, m: Int = 8, k: Int = 8,
      probes: Int = 2, topK: Int = 5, queryStride: Long = 50,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(probes > 0, s"need probes > 0, got $probes")
    // NOTE: the two trainPq calls each scan the (columnar, pruned)
    // store — measured FASTER here than sharing one persisted cast
    // frame, which adds a cache-materialization barrier and breaks the
    // scan→cast→slice codegen fusion (tried and reverted: q61
    // 3.2 s → 4.3 s at sf0.1). Revisit only if the store scan itself
    // becomes the bottleneck.
    // ONE shape job: N (for C = ⌈√N⌉) and the ragged-dims check share a
    // single aggregate scan; both trainPq calls then skip their own
    // dims pass (r7 verdict item 4 — the standalone count() was a
    // third scan for one scalar).
    val shape = embeddings.agg(count(lit(1)).as("n"),
      min(size(col("embedding"))).as("lo"),
      max(size(col("embedding"))).as("hi")).head()
    val n = shape.getLong(0)
    require(n > 0, "ivfPqTopK: empty embeddings")
    require(shape.getInt(1) == shape.getInt(2),
      s"ragged embedding lengths: ${shape.getInt(1)}..${shape.getInt(2)}")
    val dim = shape.getInt(1)
    val c = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    // coarse: whole-vector cells (m = 1 — subvector 0 IS the vector)
    val (csv, coarse) = trainPq(embeddings, 1, c, scope, Some(dim))
    val corpusCells = assign(csv, coarse)
      .select(col("vec_id"), col("code").as("cell"))
    val queryCells = assignProbes(
      csv.where(col("vec_id") % queryStride === 0), coarse, probes)
      .select(col("vec_id").as("query_id"), col("cell"))
    val cand = queryCells.join(corpusCells, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    // fine: PQ codes + per-query ADC tables, scored on candidates only
    val (fsv, refined) = trainPq(embeddings, m, k, scope, Some(dim))
    val codes = assign(fsv, refined)
      .select(col("vec_id"), col("sub"), col("code"))
    val table = fsv.where(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sv").as("qsv"))
      .join(refined, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id").as("code"),
        floor(greatest(sqDist(col("qsv"), col("cv")), lit(0.0))
          * lit(1048576.0)).cast("long").as("pd_fp"))
    val adc = cand.join(codes, Seq("vec_id"))
      .join(broadcast(table), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd_fp")).as("adist_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adist_fp"), col("vec_id"))
    adc.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("adist_fp"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The coarse IVF quantizer as a STORED artifact — whole-vector
    * cells, C = ⌈√N⌉ centroids, exactly the structure [[ivfPqTopK]]
    * trains inline — so a persisted index can freeze it next to the
    * PQ codebook and serve probed searches without retraining
    * ([[ivfPqSearch]]). Same training core, same determinism. */
  def trainCoarseCodebook(embeddings: DataFrame,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val shape = embeddings.agg(count(lit(1)).as("n"),
      min(size(col("embedding"))).as("lo"),
      max(size(col("embedding"))).as("hi")).head()
    val n = shape.getLong(0)
    require(n > 0, "trainCoarseCodebook: empty embeddings")
    require(shape.getInt(1) == shape.getInt(2),
      s"ragged embedding lengths: ${shape.getInt(1)}..${shape.getInt(2)}")
    val c = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    trainPq(embeddings, 1, c, scope, Some(shape.getInt(1)))._2
  }

  /** Assign vectors to their IVF cell against a FROZEN coarse
    * codebook — (vec_id, cell), row-local per vector like
    * [[encodeWith]]; the maintenance path that appends new vectors'
    * cells to a stored index. */
  def assignCells(coarseBook: DataFrame)(embeddings: DataFrame)
      : DataFrame = {
    val (m1, dim) = bookShape(coarseBook)
    require(m1 == 1, s"coarse codebook must be whole-vector (m=1), got m=$m1")
    assign(slicedAgainst(embeddings, 1, dim), coarseBook)
      .select(col("vec_id"), col("code").as("cell"))
  }

  /** ADC top-k against a FROZEN index — the query path of [[pqTopK]]
    * decoupled from training: the codebook and codes come from a
    * store (`graft.Main index`), only the QUERY vectors are live.
    * Per query: one (m·k)-entry partial-distance table built from the
    * stored codebook, broadcast onto the stored codes, fixed-point
    * sums, WindowGroupLimit top-k — identical arithmetic to
    * [[pqTopK]], so searching a frozen index over the corpus it was
    * built from reproduces it row for row (SearchSpec pins it).
    * Query ids share the index id namespace; a stored vector never
    * matches itself. */
  def pqSearch(queries: DataFrame, codebook: DataFrame, codes: DataFrame,
      topK: Int = 5): DataFrame = {
    require(topK > 0, s"need topK > 0, got $topK")
    val (m, w) = bookShape(codebook)
    val table = slicedAgainst(queries, m, w)
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sv").as("qsv"))
      .join(codebook, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id").as("code"),
        floor(greatest(sqDist(col("qsv"), col("cv")), lit(0.0))
          * lit(1048576.0)).cast("long").as("pd_fp"))
    val adc = codes.select(col("vec_id"), col("sub"), col("code"))
      .join(broadcast(table), Seq("sub", "code"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd_fp")).as("adist_fp"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adist_fp"), col("vec_id"))
    adc.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("adist_fp"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ top-k against a FROZEN index — [[ivfPqTopK]]'s query path
    * over stored artifacts (coarse codebook + cell assignments + PQ
    * codebook + codes): each query probes its `probes` nearest stored
    * cells, and only candidates IN those cells pay the O(m) ADC
    * scoring — probes·(N/C)·m lookups per query at any stored-index
    * scale. Identical arithmetic to [[ivfPqTopK]] (SearchSpec pins
    * the row-for-row replay over the build corpus). */
  def ivfPqSearch(queries: DataFrame, codebook: DataFrame,
      codes: DataFrame, coarseBook: DataFrame, cells: DataFrame,
      probes: Int = 2, topK: Int = 5): DataFrame = {
    require(probes > 0, s"need probes > 0, got $probes")
    require(topK > 0, s"need topK > 0, got $topK")
    val (m1, dim) = bookShape(coarseBook)
    require(m1 == 1, s"coarse codebook must be whole-vector (m=1), got m=$m1")
    val queryCells = assignProbes(
      slicedAgainst(queries, 1, dim), coarseBook, probes)
      .select(col("vec_id").as("query_id"), col("cell"))
    val cand = queryCells
      .join(cells.select(col("vec_id"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    val (m, w) = bookShape(codebook)
    val table = slicedAgainst(queries, m, w)
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sv").as("qsv"))
      .join(codebook, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cent_id").as("code"),
        floor(greatest(sqDist(col("qsv"), col("cv")), lit(0.0))
          * lit(1048576.0)).cast("long").as("pd_fp"))
    val adc = cand
      .join(codes.select(col("vec_id"), col("sub"), col("code")),
        Seq("vec_id"))
      .join(broadcast(table), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd_fp")).as("adist_fp"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adist_fp"), col("vec_id"))
    adc.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("adist_fp"))
      .orderBy(col("query_id"), col("rank"))
  }
}
