package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring — the ranking side of the training-data
  * pipeline (SURVEY.md §2.11): given a small fixed term set (a user
  * query, a topic lexicon, a contamination probe), score every
  * document by a BM25-family relevance function so a corpus team can
  * pull "most on-topic" slices at 100 TB.
  *
  * Scale shape: tokens are exploded ROW-LOCALLY and filtered to the
  * query terms BEFORE any shuffle, so the only data that moves is the
  * (doc, matched-term) stream — for a q-term query that is at most
  * q·N_docs rows, independent of corpus token count. Document frequency
  * is a |terms|-row aggregate joined back by broadcast; document length
  * and the global average length are one small aggregate broadcast the
  * same way. Nothing driver-side, no window, no second corpus scan.
  *
  * Engine-exactness (the property that lets the DuckDB oracle
  * hash-verify a *ranking* function): the usual BM25 `ln((N-df+0.5)/
  * (df+0.5))` is replaced by the rational idf `(N-df+0.5)/(df+0.5)`
  * itself — transcendental functions differ across libm
  * implementations; field operations on doubles are IEEE-exact
  * everywhere. `k1 = 1.25` and `b = 0.75` are dyadic, every
  * division/multiplication is written with pinned parenthesization on
  * both engines, and per-term contributions are floored to 2^-20-grid
  * longs and summed as integers — the same order-independent
  * fixed-point trick as the IVF centroid means (Similarity.scala) —
  * so the per-doc total never depends on Spark's reduce order.
  */
object Retrieval {

  /** `(k1 + 1)` and the length-normalization constants, dyadic so the
    * literal parses to the same double in every engine. */
  private val K1 = 1.25
  private val K1p1 = 2.25
  private val B = 0.75
  private val OneMinusB = 0.25

  /** Word tokens only (letters / digit runs) — punctuation carries no
    * relevance signal; mirrors the `[a-z]+|[0-9]+` classes of
    * [[TextAnalysis.tokenStats]]'s tokenizer minus the punct class. */
  private val wordRe = "([a-z]+|[0-9]+)"

  /** Per-document log-free BM25 over `terms`.
    *
    * Output: `(doc_id, n_terms_matched, score_fp)` for every document
    * matching at least one term, ordered by `doc_id`; `score_fp` is
    * the fixed-point score (units of 2^-20) as a BIGINT — exact,
    * comparable, and engine-portable where a float sum would not be.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25Scores needs at least one query term")
    require(terms.forall(t => t.matches("[a-z0-9]+")),
      s"terms must be lowercase word tokens: $terms")

    val tok = docs.select(col(idCol).as("doc_id"),
      expr(s"regexp_extract_all(lower($textCol), '$wordRe', 1)").as("w"))

    // per-doc length (row-local) + the two corpus scalars in ONE pass:
    // sum/count partials combine map-side, the result is a 1-row frame
    val dl = tok.select(col("doc_id"), size(col("w")).as("dl"))
    val stats = dl.agg(
      sum(col("dl").cast("long")).as("tot_tokens"),
      count(lit(1)).as("n_docs"))

    // matched-term stream: filter precedes the (doc, term) shuffle
    val tf = tok
      .select(col("doc_id"), explode(col("w")).as("term"))
      .where(col("term").isInCollection(terms))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // |terms|-row document frequency; broadcast back onto the stream
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val scored = tf
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("tot_tokens").cast("double") / col("n_docs").cast("double"))
      // idf * (tf*(k1+1)) / (tf + k1*(1-b + b*(dl/avgdl))) — identical
      // parenthesization in the oracle SQL; floor to 2^-20 grid
      .withColumn("fp", floor(
        ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
        ((col("tf").cast("double") * lit(K1p1)) /
          (col("tf").cast("double") + lit(K1) *
            (lit(OneMinusB) + lit(B) *
              (col("dl").cast("double") / col("avgdl"))))) *
        lit(1048576.0)).cast("long"))

    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_terms_matched"),
        sum(col("fp")).as("score_fp"))
      .orderBy(col("doc_id"))
  }

  /** Inverted-index posting lists — the materialized index artifact
    * under [[bm25Scores]] (scoring re-derives the matched-term stream
    * per query; a served search system reads it from this table): for
    * every term with `df >= minDf` that appears in at most HALF the
    * corpus, the sorted doc_id posting list. `terms` is any per-doc
    * term-array column — word tokens, hashed shingles
    * ([[graft.functions.TextHash.shingleHashesOf]]), minhash bands —
    * so the same build serves a text index or an n-gram
    * contamination-lookup index. The band is semantics,
    * not just safety — below minDf is typo noise, above n_docs/2 is
    * stopword mass no ranked query reads (a FRACTIONAL cap, so the
    * rule means the same thing at every corpus size) — but it is ALSO
    * what makes the build safe at 100 TB: document frequency is
    * aggregated FIRST (a cheap partial-aggregable count) and the band
    * filter runs BEFORE any list materializes, so a stopword's
    * corpus-wide posting list (|postings| = n_docs) is never collected
    * anywhere. Posting length is bounded by n_docs/2 by construction.
    *
    * Shape: distinct (term, doc) presence pairs (one shuffle); the
    * |vocab|-row df aggregate with the ONE-ROW corpus count appended
    * via `crossJoin(broadcast(...))` (the bm25 scalar-append shape —
    * the count itself is a parquet count-pushdown scan, no data read);
    * an equi-join back (AQE broadcasts the band dictionary when it is
    * small); and a hash-based collect (ObjectHashAggregate — no sort
    * of the pair stream; only each term's bounded postings sort,
    * row-locally). */
  def postingLists(docs: DataFrame, idCol: String, terms: Column,
      minDf: Long = 2L): DataFrame = {
    require(minDf >= 1, s"need minDf >= 1, got $minDf")
    val pairs = docs.select(col(idCol).as("doc_id"),
        explode(terms).as("term"))
      .distinct()
    val nd = docs.agg(count(lit(1)).as("nd"))
    val dfs = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd))
      // integer form of df/n_docs <= 1/2 — no division, no doubles
      .where(col("df") >= minDf && col("df") * 2 <= col("nd"))
      .select(col("term"), col("df"))
    pairs.join(dfs, Seq("term"))
      .groupBy(col("term"), col("df"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
      .orderBy(col("term"))
  }

  /** RECIPROCAL-RANK FUSION — the standard hybrid-retrieval merge
    * (Cormack et al.'s RRF, the default fusion of every modern
    * lexical+semantic search stack): given two per-query rankings,
    * score each candidate `Σ 1/(k + rank_i)` over the lists it
    * appears in and re-rank. Rank-based on purpose — BM25 scores and
    * cosines live on incomparable scales, and any score-normalization
    * constant would be corpus-dependent; ranks are scale-free, and
    * `k` (default 60, the published constant) damps the head so one
    * list's top hit can't drown the other's consensus.
    *
    * Engine-exactness: each addend is one IEEE division of exact
    * integers (`1/(k + rank)`), the two-addend sum is written in
    * fixed a-then-b order, and the re-rank breaks score ties on
    * doc_id — so the fused order is bit-reproducible on any engine.
    *
    * Scale shape: the inputs are ALREADY top-k frames (|queries|·k
    * rows — the expensive retrieval happened upstream); the full-outer
    * join keys on (query, doc) and the re-rank windows over ≤ 2k rows
    * per query. Fusion cost is independent of corpus size — the whole
    * point of fusing ranks instead of re-scoring documents.
    *
    * Inputs must both be (query_id, doc_id, rank) with rank ≥ 1;
    * output: (query_id, doc_id, rank, rrf_score, rank_a, rank_b),
    * topK rows per query, ordered. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60,
      topK: Int = 10): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(topK >= 1, s"topK=$topK must be >= 1")
    Seq(a, b).foreach { df =>
      val need = Set("query_id", "doc_id", "rank")
      require(need.subsetOf(df.columns.toSet),
        s"rrfFuse inputs need columns $need, got ${df.columns.toSeq}")
    }
    import org.apache.spark.sql.expressions.Window
    val aa = a.select(col("query_id"), col("doc_id"),
      col("rank").cast("int").as("rank_a"))
    val bb = b.select(col("query_id"), col("doc_id"),
      col("rank").cast("int").as("rank_b"))
    val score =
      coalesce(lit(1.0) / (lit(k) + col("rank_a")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(k) + col("rank_b")), lit(0.0))
    aa.join(bb, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_score").desc, col("doc_id"))))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("rrf_score"), col("rank_a"), col("rank_b"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** TF-IDF KEYWORD EXTRACTION — the per-document "what is this about"
    * readout ([[bm25Scores]] ranks docs for a QUERY; this ranks TERMS
    * for a doc): top-`k` terms by term frequency × inverse document
    * frequency. The idf is the log-free fixed-point reciprocal
    * `((N+1)·2²⁰) div (df+1)` — transcendental log differs across
    * libm implementations (the BM25 rationale above), and the
    * reciprocal keeps the rare-term ordering exact-integer end to end
    * (documented variance vs log-idf: rare-term emphasis is stronger;
    * within one document the ranking is what matters). Add-one
    * smoothing keeps corpus-absent probes finite.
    *
    * Scale shape: ONE corpus-sized explode feeding a persisted
    * partial-aggregable (doc, term) count; df is a |vocab|-row
    * aggregate of that frame; the doc count rides a one-row broadcast
    * scalar append (q84 shape); the top-k window partitions by doc
    * over the reduced distinct-terms frame, ties pinned (score DESC,
    * term ASC). Scores multiply in DECIMAL(38,0) — tf × idf_fp can
    * pass 2⁶³ on a web-scale corpus. */
  def tfIdfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3,
      scope: graft.engine.CacheScope = graft.engine.CacheScope.unmanaged)
      : DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextHash
    val tf = scope.persist(
      docs.select(col(idCol).as("doc_id"),
          explode(TextHash.tokens(col(textCol))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("idf_fp", expr("((__n + 1) * 1048576) div (df + 1)"))
      .withColumn("score_fp",
        expr("CAST(tf AS DECIMAL(38,0)) * idf_fp"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("term"))
    scored.withColumn("kw_rank", row_number().over(w))
      .where(col("kw_rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score_fp").cast("double").as("score"), col("kw_rank"))
      .orderBy(col("doc_id"), col("kw_rank"))
  }
}
