package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Sampling/mixing semantics on the sf0.001 documents fixture:
  * hash-stratified sampling's determinism contract (q32's operator) and
  * the training-order shuffle's permutation/epoch properties (q40's).
  */
class SamplingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  test("stratifiedByHash: a doc's fate never changes as the corpus grows") {
    val pcts = Map("en" -> 60, "es" -> 30)
    val full = Sampling.stratifiedByHash(docs, "doc_id", "lang", pcts,
      defaultPct = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    // rerun over HALF the corpus: every survivor from the half must be
    // a survivor of the full run restricted to that half (incremental
    // growth can only ADD docs to the sample, never flip old ones)
    val halfIds = docs.where(col("doc_id") % 2 === 0)
    val half = Sampling.stratifiedByHash(halfIds, "doc_id", "lang", pcts,
      defaultPct = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half == full.filter(_ % 2 == 0))
  }

  test("mixToTokenBudget: realized mixture tracks the weights, capped strata kept whole") {
    val weights = Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.125,
      "fr" -> 0.125)
    val budget = 20000L
    val out = Sampling.mixToTokenBudget(docs, "doc_id", "lang", "text",
      weights, budget)
    val realized = out.groupBy("lang")
      .agg(sum(col("n_tokens")).cast("long").as("rt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // zero-weight strata contribute nothing
    assert(realized.keySet.subsetOf(weights.keySet))
    // per-stratum totals of the WHOLE corpus, to find capped strata
    val totals = docs
      .groupBy("lang")
      .agg(sum(size(graft.functions.TextHash.tokens(col("text"))))
        .cast("long").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.foreach { case (lang, w) =>
      val target = budget * w
      if (totals(lang) <= target)
        // under-supplied stratum: kept whole, shortfall visible
        assert(realized(lang) == totals(lang))
      else {
        // hash sampling hits the target in expectation; the fixture
        // draw is deterministic, so this tolerance cannot flake
        val ratio = realized(lang) / target
        assert(ratio > 0.5 && ratio < 1.5,
          s"$lang realized ${realized(lang)} vs target $target")
      }
    }
  }

  test("mixToByteBudget: realized byte mixture tracks the weights, " +
    "under-supplied strata kept whole, no-quota strata dropped") {
    val s2 = spark; import s2.implicits._
    // synthetic media meta: 'image' heavy (400 × 100 B), 'audio'
    // light enough that its quota exceeds its mass (20 × 10 B vs a
    // 2000·0.25 = 500 B target → kept whole), 'unknown' has no quota
    val rows = (0L until 400L).map(i => (i, "image", 100L)) ++
      (1000L until 1020L).map(i => (i, "audio", 10L)) ++
      (2000L until 2010L).map(i => (i, "unknown", 50L))
    val df = rows.toDF("doc_id", "modality", "n_bytes")
    val out = Sampling.mixToByteBudget(df, "doc_id", "modality",
      col("n_bytes"), Map("image" -> 0.75, "audio" -> 0.25), 2000L)
    val realized = out.groupBy("modality")
      .agg(sum(col("n_bytes")).cast("long").as("rb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!realized.contains("unknown"), "no quota → dropped")
    // audio: 200 B total < 500 B target → kept whole
    assert(realized("audio") == 200L)
    // image: 40 KB mass vs 1500 B target → sampled near target (the
    // fixture draw is deterministic; cannot flake)
    val ratio = realized("image") / 1500.0
    assert(ratio > 0.5 && ratio < 1.5, s"image realized $realized")
    // deterministic across runs
    val again = Sampling.mixToByteBudget(df, "doc_id", "modality",
      col("n_bytes"), Map("image" -> 0.75, "audio" -> 0.25), 2000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect()
      .map(_.getLong(0)).toSet)
  }

  test("mixToTokenBudget: deterministic and a subset of the corpus") {
    val weights = Map("en" -> 0.5, "es" -> 0.5)
    def run() = Sampling.mixToTokenBudget(docs, "doc_id", "lang", "text",
      weights, 5000L).select("doc_id").collect().map(_.getLong(0)).toSet
    val first = run()
    assert(first.nonEmpty && run() == first)
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first.subsetOf(all))
  }

  test("trainingOrder: a permutation — every doc once, positions contiguous per shard") {
    val out = Sampling.trainingOrder(docs, "doc_id", shards = 8, seed = 0L)
      .select("doc_id", "shard", "pos").collect()
    val n = docs.count()
    assert(out.length == n) // nothing dropped, nothing duplicated
    assert(out.map(_.getLong(0)).distinct.length == n)
    out.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      assert(0 <= shard && shard < 8)
      // positions are exactly 1..|shard| — a dense total order
      assert(rows.map(_.getInt(2)).toSeq.sorted == (1 to rows.length))
    }
  }

  test("trainingOrder: seed is the epoch — different seed, different order") {
    def order(seed: Long): Seq[(Long, Int, Int)] =
      Sampling.trainingOrder(docs, "doc_id", shards = 8, seed = seed)
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq.sorted
    val e0 = order(0L)
    assert(order(0L) == e0) // deterministic run to run
    val e1 = order(1L)
    assert(e0 != e1, "epoch reshuffle must move documents")
    // same doc set either way — reshuffling never loses data
    assert(e0.map(_._1) == e1.map(_._1))
  }

  test("priorityKPerStratum: exact counts, nested prefixes, growth stability") {
    val k5 = Sampling.priorityKPerStratum(docs, "doc_id", "lang", k = 5)
      .select("lang", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // exactly min(k, |stratum|) per stratum, ranks dense 1..k
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    k5.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length == math.min(5L, strata(lang)))
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // nesting: the k=3 sample IS the rank<=3 prefix of the k=5 sample
    val k3 = Sampling.priorityKPerStratum(docs, "doc_id", "lang", k = 3)
      .select("lang", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(k3 == k5.filter(_._3 <= 3).toSet)
    // determinism: same draw on a rerun
    val again = Sampling.priorityKPerStratum(docs, "doc_id", "lang", k = 5)
      .select("lang", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == k5.toSet)
  }

  test("weightedPriorityK: replays the hand-computed PPS order; weights bias the draw") {
    val s = spark; import s.implicits._
    val P = graft.functions.TextHash.P
    val rows = Seq(
      (1L, "a", 100L), (2L, "a", 1L), (3L, "a", 5000L), (4L, "a", 40L),
      (5L, "a", 900L), (6L, "b", 10L), (7L, "b", 10L))
      .toDF("id", "g", "w")
    val got = Sampling.weightedPriorityK(rows, "id", "g", "w", k = 3)
      .select("g", "id", "sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // hand replay: key = (affine-hash(id)+1) / w, k smallest per group
    def h(id: Long) = ((id % P) * 2654435761L % P + 12345L) % P
    val weights = Map(1L -> 100L, 2L -> 1L, 3L -> 5000L, 4L -> 40L,
      5L -> 900L, 6L -> 10L, 7L -> 10L)
    def expectFor(g: String, ids: Seq[Long], k: Int) =
      ids.map(id => id -> (h(id) + 1).toDouble / weights(id))
        .sortBy { case (id, key) => (key, id) }.take(k).zipWithIndex
        .map { case ((id, _), i) => (g, id, i + 1) }.toSet
    val expect = expectFor("a", Seq(1L, 2L, 3L, 4L, 5L), 3) ++
      expectFor("b", Seq(6L, 7L), 3)
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("weightedPriorityK: growth stability — keys never recompute, only displace") {
    val s = spark; import s.implicits._
    // a doc's key is a pure function of (id, weight): growing the
    // corpus can only DISPLACE docs whose keys now rank below the new
    // arrivals — survivors keep their relative order (nested-sample
    // stability, the re-run contract training draws rely on)
    val base = (1L to 30L).map(i => (i, "a", (i % 7) * 100L + 1L))
    val grown = base ++ (31L to 60L).map(i => (i, "a", (i % 5) * 90L + 1L))
    def ranked(rows: Seq[(Long, String, Long)]) =
      Sampling.weightedPriorityK(rows.toDF("id", "g", "w"), "id", "g", "w",
        k = 10).select("id", "sample_rank")
        .as[(Long, Int)].collect().sortBy(_._2).map(_._1).toSeq
    val before = ranked(base)
    val after = ranked(grown)
    val survivors = after.filter(before.contains)
    assert(survivors == before.filter(survivors.contains),
      s"survivor order changed: before=$before after=$after")
  }

  test("weightedPriorityK: zero/negative weights carry no mass; contract size") {
    val s = spark; import s.implicits._
    val rows = Seq((1L, "a", 0L), (2L, "a", -5L), (3L, "a", 7L))
      .toDF("id", "g", "w")
    val got = Sampling.weightedPriorityK(rows, "id", "g", "w", k = 2)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(3L)) // min(k, |positive-weight stratum|) rows
  }

  test("leakageSafeSplit: a near-dup family never straddles the fence") {
    val s = spark; import s.implicits._
    // ids 1 (bucket 97 → test) and 2 (bucket 11 → train) land in
    // different id-hash buckets (an id-keyed split WOULD separate
    // them) but share a cluster — they must co-locate
    val clusters = Seq((1L, 1L), (2L, 1L), (7L, 7L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq(1L, 2L, 7L).toDF("doc_id")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", clusters)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out(1L) == out(2L), s"family split apart: $out")
    // sanity: the id-keyed split really would have separated them —
    // the scenario is live, not vacuous
    val idSplit = Sampling.holdoutSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(idSplit(1L) != idSplit(2L),
      s"fixture ids no longer demonstrate id-split leakage: $idSplit")
    // per-cluster split uniqueness over the real fixture machinery
    val fix = Tables.documents(spark, sf)
    val cl = Dedup.nearDupClusters(fix, "doc_id",
      Dedup.minhashLshPairs(fix, "doc_id", "text", threshold = 0.5))
    val perCluster = Sampling.leakageSafeSplit(
      fix.select("doc_id"), "doc_id", cl)
      .groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(perCluster == 0L)
  }

  test("trainingOrder: shards stay balanced enough to own a writer each") {
    val sizes = Sampling.trainingOrder(docs, "doc_id", shards = 8, seed = 0L)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8, "every shard must be non-empty on the fixture")
    val avg = sizes.sum.toDouble / sizes.length
    assert(sizes.forall(s => s < 2 * avg),
      s"hash sharding skewed: ${sizes.mkString(",")}")
  }

  test("holdoutSplit: total partition; docs never migrate as the corpus grows") {
    val assigned = Sampling.holdoutSplit(docs, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assigned.size == docs.count())
    assert(assigned.values.toSet.subsetOf(Set("train", "val", "test")))
    val shares = assigned.values.groupBy(identity).view.mapValues(_.size)
    // 80/10/10 in expectation; loose bounds so the pin is about the
    // partition being total and deterministic, not sampling noise
    assert(shares("train") > shares.getOrElse("val", 0), shares.toMap.toString)
    // growth stability: assigning over half the corpus gives the same
    // split for every doc in that half
    val half = Sampling.holdoutSplit(
      docs.where(col("doc_id") % 2 === 0), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half == assigned.filter { case (id, _) => id % 2 == 0 })
    intercept[IllegalArgumentException] {
      Sampling.holdoutSplit(docs, "doc_id", trainPct = 95, valPct = 10)
    }
    // a pre-existing output column fails loudly instead of being
    // silently replaced by withColumn (ADVICE r7); a caller-chosen
    // outCol sidesteps the clash
    val pre = Sampling.holdoutSplit(docs, "doc_id")
    intercept[IllegalArgumentException] {
      Sampling.holdoutSplit(pre, "doc_id")
    }
    val re = Sampling.holdoutSplit(pre, "doc_id", outCol = "split2")
    assert(re.columns.count(_ == "split") == 1 &&
      re.columns.contains("split2"))
  }

  test("temperatureMix: α=1/2 boosts the tail, damps the head; shares sum to 1") {
    val out = Sampling.temperatureMix(docs, "lang", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.size >= 2)
    val sumNat = out.values.map(_._2).sum
    val sumShare = out.values.map(_._3).sum
    assert(math.abs(sumNat - 1.0) < 1e-9 &&
      math.abs(sumShare - 1.0) < 1e-9)
    val byTokens = out.toSeq.sortBy(_._2._1)
    val (tail, head) = (byTokens.head._2, byTokens.last._2)
    assert(tail._1 < head._1, "fixture needs unequal strata")
    // sqrt-tempering: smallest stratum upsampled, largest damped
    assert(tail._4 > 1.0, s"tail boost ${tail._4}")
    assert(head._4 < 1.0, s"head boost ${head._4}")
    // tempered shares preserve the size ORDER (flatten, not invert)
    assert(byTokens.map(_._2._3) == byTokens.map(_._2._3).sorted)
  }

  test("temperatureMix: α=1 is the identity mixture (boost ≈ 1)") {
    val out = Sampling.temperatureMix(docs, "lang", "text",
      alphaQuarters = 4)
      .collect().map(r => r.getDouble(5))
    // fixed-point flooring costs at most 2^-20 relative — boost is 1
    // to ~6 decimal places for every stratum
    out.foreach(b => assert(math.abs(b - 1.0) < 1e-5, b.toString))
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "lang", "text", alphaQuarters = 0)
    }
  }

  test("temporalSplit: fences anchor to max ts; embargo excluded from " +
    "both sides; shared-with-test counts the straddlers") {
    val s = spark; import s.implicits._
    val usDay = 86400000000L
    // anchor = day 30; test = (23, 30], embargo = (21, 23], train ≤ 21
    val ev = Seq(
      (1L, 1L * usDay), (1L, 20L * usDay),   // u1: train only
      (2L, 5L * usDay), (2L, 30L * usDay),   // u2: train + test (leak)
      (3L, 22L * usDay),                     // u3: embargo only
      (4L, 25L * usDay), (4L, 29L * usDay),  // u4: test only
      (5L, 22L * usDay), (5L, 24L * usDay)   // u5: embargo + test
    ).toDF("u", "ts_us")
    val out = Sampling.temporalSplit(ev, col("ts_us"), col("u"),
      testDays = 7, embargoDays = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "train" -> ((3L, 2L, 1L)),     // u1, u2 rows; u2 straddles
      "embargo" -> ((2L, 2L, 1L)),   // u3, u5; u5 straddles
      "test" -> ((4L, 3L, 3L))))     // u2, u4, u5
  }

  test("contrastiveTriplets: positives are same-cluster neighbors " +
    "(first borrows second, singletons NULL); negatives always cross " +
    "clusters; fully deterministic") {
    val s5 = spark; import s5.implicits._
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // one 3-member family
      (10L, 10L),                     // singleton
      (20L, 20L), (21L, 20L),         // a pair
      (30L, 30L), (40L, 40L)          // two more singletons
    ).toDF("doc_id", "cluster_id")
    // shards = 1 so the tiny fixture has hash neighbors (at corpus
    // scale the default shards keep the windows partitioned)
    val out = Sampling.contrastiveTriplets(clusters, shards = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(out(1L)._2 == Some(2L))   // first borrows the second
    assert(out(2L)._2 == Some(1L))   // previous member
    assert(out(3L)._2 == Some(2L))
    assert(out(10L)._2.isEmpty)      // singleton: no positive
    assert(out(20L)._2 == Some(21L) && out(21L)._2 == Some(20L))
    // negatives, where present, never share the anchor's cluster
    val byId = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (a, (c, _, n)) =>
      n.foreach(neg => assert(byId(neg) != c, s"anchor $a")) }
    // 5 clusters over 8 docs in one hash order: everyone except the
    // hash-tail finds a cross-cluster neighbor within 3 hops
    assert(out.values.count(_._3.isDefined) >= 5)
    val again = Sampling.contrastiveTriplets(clusters, shards = 1)
      .collect().map(r => r.toSeq).toSeq
    assert(Sampling.contrastiveTriplets(clusters, shards = 1).collect()
      .map(r => r.toSeq).toSeq == again)
  }

  test("effectiveSampleSize: uniform weights read ESS = N; " +
    "concentration collapses toward the heavy stratum") {
    val s = spark; import s.implicits._
    // α = 4/4 keeps natural weights; equal-token strata -> uniform
    // per-doc weight -> ESS exactly N (ratio 1.0)
    val uniform = Seq(
      (0L, "a", "t t t"), (1L, "a", "t t t"),
      (2L, "b", "t t t"), (3L, "b", "t t t"))
      .toDF("doc_id", "src", "text")
    val u = Sampling.effectiveSampleSize(uniform, "src", "text",
      alphaQuarters = 4).collect()(0)
    assert(u.getLong(0) == 4L && u.getLong(1) == 2L)
    assert(u.getDouble(2) == 4.0 && u.getDouble(3) == 1.0)

    // one stratum 100x the token mass at α = 1 (natural weights):
    // doc weights concentrate, ESS drops well under N
    val skewed = Seq(
      (0L, "a", ("t " * 400).trim), (1L, "b", "t"), (2L, "b", "t"),
      (3L, "b", "t"), (4L, "b", "t"))
      .toDF("doc_id", "src", "text")
    val k = Sampling.effectiveSampleSize(skewed, "src", "text",
      alphaQuarters = 4).collect()(0)
    assert(k.getLong(0) == 5L)
    assert(k.getDouble(3) < 0.5, s"expected collapsed ESS, got $k")
  }

  private def waterfill(masses: Seq[(String, Long)], budget: Long) = {
    val s = spark; import s.implicits._
    val rows = masses.flatMap { case (g, m) =>
      // split each mass into two rows to prove the fold aggregates
      Seq((g, m / 2), (g, m - m / 2))
    }
    Sampling.waterfillQuota(rows.toDF("src", "w"), "src", "w", budget)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
  }

  test("waterfillQuota: small sources untouched, capped sources share " +
    "one level, budget met exactly") {
    val out = waterfill(Seq("a" -> 10L, "b" -> 20L, "c" -> 70L), 50L)
    assert(out == Map(
      "a" -> ((10L, 10L, false)),
      "b" -> ((20L, 20L, false)),
      "c" -> ((70L, 20L, true))))
  }

  test("waterfillQuota: integer remainder goes +1 to the largest " +
    "capped strata, ties by name") {
    val out = waterfill(
      Seq("a" -> 10L, "b" -> 20L, "c" -> 70L, "d" -> 70L), 56L)
    assert(out == Map(
      "a" -> ((10L, 10L, false)),
      "b" -> ((20L, 15L, true)),
      "c" -> ((70L, 16L, true)),  // remainder 1 -> largest, name asc
      "d" -> ((70L, 15L, true))))
    assert(out.values.map(_._2).sum == 56L)
  }

  test("poissonBootstrapCI: constant values collapse to zero SE and a " +
    "degenerate CI at the exact mean; runs are deterministic") {
    val s = spark; import s.implicits._
    val df = (1L to 300L).map(i => (i, 7L)).toDF("id", "v")
    val r = Sampling.poissonBootstrapCI(df, "id", "v",
      replicates = 16, seed = 3L).collect()(0)
    val M = 1L << 20
    assert(r.getLong(0) == 16L)
    assert(r.getLong(1) == 7L * M)
    assert(r.getDouble(2) == 0.0)
    assert(r.getLong(3) == 7L * M && r.getLong(4) == 7L * M)
    val again = Sampling.poissonBootstrapCI(df, "id", "v",
      replicates = 16, seed = 3L).collect()(0)
    assert(r.toSeq == again.toSeq)
  }

  test("poissonBootstrapCI: CI brackets the true mean on a mixed " +
    "frame and the thresholds ladder is the shared constant set") {
    val s = spark; import s.implicits._
    // Poisson(1) CDF fp thresholds must be the published constants
    assert(Sampling.PoissonT ==
      Seq(385749L, 771499L, 964373L, 1028665L))
    val df = (1L to 500L).map(i => (i, (i % 10) * 100L))
      .toDF("id", "v")
    val r = Sampling.poissonBootstrapCI(df, "id", "v",
      replicates = 32, seed = 1L).collect()(0)
    val M = 1L << 20
    val trueMeanFp = 450L * M // mean of 0,100,...,900 = 450
    assert(r.getLong(0) == 32L)
    assert(r.getLong(3) <= r.getLong(4))
    assert(r.getLong(3) < trueMeanFp + 50 * M &&
      r.getLong(4) > trueMeanFp - 50 * M,
      s"CI [${r.getLong(3)}, ${r.getLong(4)}] vs $trueMeanFp")
    assert(r.getDouble(2) > 0.0)
  }

  test("waterfillQuota: budget over total satisfies everyone; budget " +
    "zero allocates zero") {
    val rich = waterfill(Seq("a" -> 10L, "b" -> 20L), 100L)
    assert(rich == Map("a" -> ((10L, 10L, false)),
      "b" -> ((20L, 20L, false))))
    val broke = waterfill(Seq("a" -> 10L, "b" -> 20L), 0L)
    assert(broke("a")._2 == 0L && broke("b")._2 == 0L)
  }
}
