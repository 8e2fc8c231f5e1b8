package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Column-profile semantics (q62's operator). */
class ProfilingSpec extends SparkSpec {

  private def frame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(
        Row(1L, "a"), Row(2L, "a"), Row(3L, null), Row(null, "b")).asJava,
      StructType(Seq(StructField("k", LongType),
        StructField("s", StringType))))
  }

  test("counts nulls and distincts per column; distinct excludes null") {
    val out = Profiling.columnProfile(frame, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("k") == ((4L, 1L, 3L)))
    assert(out("s") == ((4L, 1L, 2L)))
  }

  test("unknown column fails loudly") {
    intercept[IllegalArgumentException] {
      Profiling.columnProfile(frame, Seq("nope"))
    }
  }

  test("histogram: dyadic buckets, NULL bucket accounted, every row counted") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, Long)](
      (0.0, 1L), (7.9, 2L), (8.0, 3L), (16.1, 4L), (null, 5L), (-0.5, 6L)
    ).toDF("v", "id")
    val h = Profiling.histogram(df, Seq("v" -> 8.0)).collect()
      .map(r => (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(3))).toSeq
    // -0.5 → bucket -1 (floor, not truncate); 8.0 lands in bucket 1
    assert(h == Seq((None, 1L), (Some(-1L), 1L), (Some(0L), 2L),
      (Some(1L), 1L), (Some(2L), 1L)))
    assert(h.map(_._2).sum == df.count())
  }

  test("histogram rejects non-dyadic widths and unknown columns") {
    import spark.implicits._
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Profiling.histogram(df, Seq("a" -> 10.0))   // not a power of two
    }
    intercept[IllegalArgumentException] {
      Profiling.histogram(df, Seq("nope" -> 8.0))
    }
    intercept[IllegalArgumentException] {
      Profiling.histogram(df, Seq("a" -> 0.0))
    }
  }

  test("column names with quotes, backticks, and dots profile safely") {
    import scala.jdk.CollectionConverters._
    val nasty = "o'brien.`col"
    val df = spark.createDataFrame(
      Seq(Row(1L, "x"), Row(null, "x"), Row(3L, "y")).asJava,
      StructType(Seq(StructField(nasty, LongType),
        StructField("plain", StringType))))
    val out = Profiling.columnProfile(df, Seq(nasty, "plain")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(nasty) == ((3L, 1L, 2L)))
    assert(out("plain") == ((3L, 0L, 2L)))
  }

  test("equiDepthHistogram: quartile splits by hand, NULLs in bucket -1") {
    import scala.jdk.CollectionConverters._
    // values 1..8: p25/p50/p75 = 2.75/4.5/6.25 (dyadic interpolation
    // over integers — exact), so buckets hold {1,2} {3,4} {5,6} {7,8}
    val df = spark.createDataFrame(
      ((1L to 8L).map(v => Row(v: java.lang.Long)) :+ Row(null)).asJava,
      StructType(Seq(StructField("v", LongType))))
    val out = Profiling.equiDepthHistogram(df, Seq("v")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("v", -1, 1L), ("v", 0, 2L), ("v", 1, 2L), ("v", 2, 2L),
      ("v", 3, 2L)))
  }

  test("stratumPercentile: rank arithmetic by hand; ties share; singleton is 0") {
    val s = spark; import s.implicits._
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L), ("a", 4L, 40L),
      ("a", 5L, 50L),
      ("b", 6L, 7L))
      .toDF("g", "id", "v")
    val got = Profiling.stratumPercentile(rows, "g", "v")
      .select("id", "pct").as[(Long, Double)].collect().toMap
    // stratum a (n=5): ranks 1,2,2,4,5 -> (rank-1)/4
    assert(got(1L) == 0.0)
    assert(got(2L) == 0.25 && got(3L) == 0.25) // ties share a rank
    assert(got(4L) == 0.75)
    assert(got(5L) == 1.0)
    assert(got(6L) == 0.0) // single-row stratum scores 0, never NaN
  }

  test("stratumPercentile: top-quartile filter is a per-stratum cut") {
    val s = spark; import s.implicits._
    // global top-25% by value would keep ONLY stratum b's rows; the
    // per-stratum percentile keeps each stratum's own tail
    val rows = (1L to 8L).map(i => ("a", i, i)) ++
      (9L to 16L).map(i => ("b", i, i * 100))
    val kept = Profiling.stratumPercentile(rows.toDF("g", "id", "v"), "g", "v")
      .where(org.apache.spark.sql.functions.col("pct") >= 0.75)
      .select("g", "id")
      .as[(String, Long)].collect().toSet
    assert(kept == Set(("a", 7L), ("a", 8L), ("b", 15L), ("b", 16L)))
  }

  test("winsorize: exact interpolated bounds; tails clamp, body and NULLs pass") {
    val s = spark; import s.implicits._
    // values 1..10 with one wild outlier and a NULL; p10/p90 over the
    // 11 non-null values interpolate exactly: p10 = 2.0, p90 = 10.0
    val df = ((1 to 10).map(i => Some(i.toDouble)) :+ Some(1000.0) :+
      (None: Option[Double])).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Profiling.winsorize(df, "v", pLo = 0.1, pHi = 0.9)
      .collect().map(r => (r.getLong(0),
        (if (r.isNullAt(1)) null else r.getDouble(1),
          r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(out(0L) == ((1.0, 2.0, 10.0, 2.0)))    // low tail clamps up
    assert(out(4L) == ((5.0, 2.0, 10.0, 5.0)))    // body untouched
    assert(out(10L) == ((1000.0, 2.0, 10.0, 10.0))) // outlier clamps down
    assert(out(11L) == ((null, 2.0, 10.0, null)))  // NULL passes through
  }

  test("madOutliers: median/MAD by hand; only the far tail flags; NULL stays NULL") {
    import spark.implicits._
    val vals: Seq[(Long, java.lang.Double)] =
      (1 to 9).map(i => (i.toLong, java.lang.Double.valueOf(i.toDouble))) :+
        (10L, java.lang.Double.valueOf(100.0)) :+
        (11L, null.asInstanceOf[java.lang.Double])
    val df = vals.toDF("id", "value")
    // median of {1..9, 100} = 5.5; absdev sorted:
    // {0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5} → MAD 2.5; cut 7.5
    val out = Profiling.madOutliers(df, "value", k = 3.0)
      .collect().map { r =>
        r.getLong(0) -> (r.getDouble(3), r.getDouble(2),
          if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
      }.toMap
    out.values.foreach { case (med, mad, _) =>
      assert(med == 5.5 && mad == 2.5)
    }
    assert(out(10L)._3.contains(true))   // |100 − 5.5| = 94.5 > 7.5
    (1L to 9L).foreach(i => assert(out(i)._3.contains(false)))
    assert(out(11L)._3.isEmpty)          // NULL value → NULL flag
  }

  test("gridPercentile: lower-edge answers by hand; NULLs excluded; " +
    "estimate within width of the exact percentile") {
    val s = spark; import s.implicits._
    // 8 values on a width-0.5 grid: bins floor(v/0.5) =
    //   0.3→0, 0.4→0, 0.9→1, 1.1→2, 1.6→3, 2.2→4, 2.4→4, 3.9→7
    val df = (Seq(0.3, 0.4, 0.9, 1.1, 1.6, 2.2, 2.4, 3.9)
      .map(v => Some(v)) :+ (None: Option[Double]))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Profiling.gridPercentile(df, "v", width = 0.5,
      ps = Seq(0.25, 0.5, 1.0)).collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // N = 8 (NULL excluded). p=.25 → rank 2 → cum hits at bin 0 → 0.0
    assert(out(0.25) == ((8L, 2L, 0.0)))
    // p=.5 → rank 4 → bins cum 2,3,4 → bin 2 → 1.0 (true p50 ≤ 1.35)
    assert(out(0.5) == ((8L, 4L, 1.0)))
    // p=1 → rank 8 → last bin 7 → 3.5 (true max 3.9, within width)
    assert(out(1.0) == ((8L, 8L, 3.5)))
  }

  test("gridPercentile state is mergeable: split-half bin counters " +
    "sum to the one-shot counters") {
    val s = spark; import s.implicits._
    val all = (1 to 100).map(i => (i.toLong, (i * 37 % 100) / 8.0))
      .toDF("id", "v")
    val (h1, h2) = (all.where("id % 2 = 0"), all.where("id % 2 = 1"))
    val merged = Profiling.gridBins(h1, "v", 0.25)
      .unionByName(Profiling.gridBins(h2, "v", 0.25))
      .groupBy("bin").agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .as[(Long, Long)].collect().toMap
    val oneShot = Profiling.gridBins(all, "v", 0.25)
      .as[(Long, Long)].collect().toMap
    assert(merged == oneShot)
  }

  test("correlationMatrix: ±1 on linear pairs, complete-case NULL " +
    "exclusion, zero-variance pairs dropped") {
    val s = spark; import s.implicits._
    // x ↑, y = 2x (r = 1), z = 4 − x (r = −1), w constant (dropped);
    // the 4th row's NULL x excludes it everywhere (complete-case)
    val df = Seq(
      (Some(1.0), 2.0, 3.0, 7.0), (Some(2.0), 4.0, 2.0, 7.0),
      (Some(3.0), 6.0, 1.0, 7.0), (None: Option[Double], 9.0, 9.0, 9.0))
      .toDF("x", "y", "z", "w")
    val out = Profiling.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    out.values.foreach { case (n, _) => assert(n == 3L) }
    assert(math.abs(out(("x", "y"))._2 - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z"))._2 + 1.0) < 1e-12)
    assert(math.abs(out(("y", "z"))._2 + 1.0) < 1e-12)
  }

  test("benfordProfile: first digits from integer rendering; sub-1 and " +
    "NULL excluded; shares and fixed expectations by hand") {
    val s = spark; import s.implicits._
    // digits: 10→1, 1.5→1, 25→2, 9.9→9; 0.5 and NULL excluded
    val df = (Seq(10.0, 1.5, 25.0, 9.9, 0.5).map(Some(_)) :+
      (None: Option[Double])).map(Tuple1(_)).toDF("v")
    val out = Profiling.benfordProfile(df, Seq("v")).collect()
      .map(r => r.getInt(1) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(1, 2, 9))
    assert(out(1) == ((2L, 0.5, 0.3010299956639812)))
    assert(out(2) == ((1L, 0.25, 0.17609125905568124)))
    assert(out(9) == ((1L, 0.25, 0.04575749056067514)))
  }

  test("correlationMatrix rejects unknown or too-few columns") {
    val s = spark; import s.implicits._
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Profiling.correlationMatrix(df, Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Profiling.correlationMatrix(df, Seq("a", "nope"))
    }
  }

  test("gridPercentile rejects a non-dyadic width and empty/invalid ps") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Profiling.gridPercentile(df, "v", width = 0.3, ps = Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      Profiling.gridPercentile(df, "v", width = 0.5, ps = Seq())
    }
    intercept[IllegalArgumentException] {
      Profiling.gridPercentile(df, "v", width = 0.5, ps = Seq(0.0))
    }
  }

  test("missingnessLift: co-missing fields lift above 1, disjoint " +
    "missingness lifts to 0, never-null columns keep NULL lift") {
    val s = spark; import s.implicits._
    // a,b null together on 2 of 8 rows (P=1/4 each, both=1/4 → lift
    // 4); c null on DIFFERENT rows than a (disjoint → lift 0);
    // d never null → NULL lift everywhere it appears
    val df = Seq(
      (Option("x"), Option("x"), None: Option[String], "k"),
      (Option("x"), Option("x"), None: Option[String], "k"),
      (None: Option[String], None: Option[String], Option("x"), "k"),
      (None: Option[String], None: Option[String], Option("x"), "k"),
      (Option("x"), Option("x"), Option("x"), "k"),
      (Option("x"), Option("x"), Option("x"), "k"),
      (Option("x"), Option("x"), Option("x"), "k"),
      (Option("x"), Option("x"), Option("x"), "k")
    ).toDF("a", "b", "c", "d")
    val out = Profiling.missingnessLift(df, Seq("a", "b", "c", "d"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(5), if (r.isNullAt(6)) null else r.getLong(6))))
      .toMap
    assert(out(("a", "b")) == ((2L, 4L * 1048576)))
    assert(out(("a", "c")) == ((0L, 0L)))
    assert(out(("a", "d")) == ((0L, null)))
    assert(out(("c", "d")) == ((0L, null)))
  }

  test("trimmedMean: exact IQR band by hand; an outlier cannot drag the " +
    "mean; off-grid percentiles rejected") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 0L), ("a", 100L), ("a", 200L), ("a", 300L),
      ("a", 400L),
      ("b", 0L), ("b", 0L), ("b", 0L), ("b", 0L), ("b", 1000000L))
      .toDF("g", "v")
    val out = Profiling.trimmedMean(df, "g", "v").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // a: Q1=100, Q3=300 → kept {100,200,300} → mean 200
    assert(out("a") == ((5L, 3L, 100.0, 300.0, 200.0)))
    // b: Q1=Q3=0 → the outlier is OUT, ties at the threshold stay IN
    assert(out("b") == ((5L, 4L, 0.0, 0.0, 0.0)))
    intercept[IllegalArgumentException] {
      Profiling.trimmedMean(df, "g", "v", pLo = 0.1, pHi = 0.9)
    }
  }

  test("keyCandidates: the verdict needs zero nulls AND full " +
    "distinctness; max_dup sizes the worst collision; floats rejected") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Option(10L), "a"), (2L, Option(10L), "a"),
      (3L, Option(10L), "b"), (4L, None, "b")
    ).toDF("pk", "dup", "pair")
    val out = Profiling.keyCandidates(df, Seq("pk", "dup", "pair"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out("pk") == ((4L, 0L, 4L, 1L, true)))
    assert(out("dup") == ((4L, 1L, 1L, 3L, false)))  // nulls disqualify
    assert(out("pair") == ((4L, 0L, 2L, 2L, false))) // dups disqualify
    intercept[IllegalArgumentException] {
      Profiling.keyCandidates(
        Seq((1L, 0.5)).toDF("k", "f"), Seq("k", "f"))
    }
  }

  test("cramersV: perfect association scores 1, independence scores 0, " +
    "constant margins keep NULL stats") {
    val s = spark; import s.implicits._
    // b is a pure function of a -> V = 1 (chi2 = N*min(R-1,C-1))
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"),
      ("y", "q")).toDF("a", "b")
    val p = Profiling.cramersV(perfect, "a", "b").collect()(0)
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) ==
      ((5L, 2L, 2L, 1L)))
    assert(p.getDouble(4) == 5.0 && p.getDouble(5) == 1.0)
    // uniform 2x2 -> chi2 = 0 exactly (each cell's o2/(rc) = 1/4 is
    // exact on the 2^-20 grid)
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val i = Profiling.cramersV(indep, "a", "b").collect()(0)
    assert(i.getDouble(4) == 0.0 && i.getDouble(5) == 0.0)
    // one-valued column -> dof undefined -> NULL chi2/V, counts real
    val flat = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val f = Profiling.cramersV(flat, "a", "b").collect()(0)
    assert(f.getLong(0) == 2L && f.getLong(1) == 1L && f.isNullAt(3) &&
      f.isNullAt(4) && f.isNullAt(5))
  }

  test("concentrationProfile: hand-computed Gini/HHI/top-share; equal " +
    "groups score Gini 0") {
    val s = spark; import s.implicits._
    // sizes {a:1, b:1, c:2}: sorted ranks 1,2,3 -> sum(i*x) = 9
    // gini = (2*9 - 4*4)/(3*4) = 1/6; hhi = 6/16; top1 = 2/4
    val df = Seq("a", "b", "c", "c").toDF("g")
    val r = Profiling.concentrationProfile(df, "g").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((3L, 4L)))
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.375 &&
      r.getDouble(4) == 1.0 / 6)
    val eq = Seq("a", "a", "b", "b").toDF("g")
    val e = Profiling.concentrationProfile(eq, "g").collect()(0)
    assert(e.getDouble(4) == 0.0 && e.getDouble(3) == 0.5)
  }

  test("tailBands: dyadic tail points interpolate exactly on integers") {
    val s2 = spark; import s2.implicits._
    val df = (0L until 64L).map(v => ("g", v)).toDF("k", "v")
    val r = Profiling.tailBands(df,
      org.apache.spark.sql.functions.col("k"),
      org.apache.spark.sql.functions.col("v")).collect()(0)
    assert(r.getLong(1) == 64L)
    // index = p * 63: every weight is an exponent shift — exact
    assert(r.getDouble(2) == 31.5)        // .5      -> 31.5
    assert(r.getDouble(3) == 47.25)       // .75     -> 47.25
    assert(r.getDouble(4) == 55.125)      // .875    -> 55.125
    assert(r.getDouble(5) == 59.0625)     // .9375
    assert(r.getDouble(6) == 61.03125)    // .96875
    assert(r.getDouble(7) == 62.015625)   // .984375
    assert(r.getLong(8) == 63L)
  }

  test("keyGapAudit: cross-bucket gaps fold with within-bucket ones; " +
    "equal max gaps pin to the earliest start; dense keys audit clean") {
    val s3 = spark
    import s3.implicits._
    import org.apache.spark.sql.functions.col
    val M = 1L << 20
    // buckets 0 and 1: within-gaps 3@7 and 2@(M+3); boundary gap
    // (M+2) - 10 - 1 = M - 9 starting at 11 — the largest
    val df = Seq(5L, 6L, 10L, M + 2L, M + 5L).toDF("k")
    val r = Profiling.keyGapAudit(df, col("k")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((5L, M + 5L, 5L)))
    assert(r.getLong(3) == M - 4L)      // total missing mass
    assert(r.getLong(4) == 3L)          // three gaps
    assert(r.getLong(5) == M - 9L && r.getLong(6) == 11L)
    // tie: gaps 3@1 and 3@5 — earliest start wins
    val tie = Profiling.keyGapAudit(Seq(0L, 4L, 8L).toDF("k"), col("k"))
      .collect()(0)
    assert(tie.getLong(5) == 3L && tie.getLong(6) == 1L)
    // dense: zero gaps, NULL start
    val dense = Profiling.keyGapAudit(Seq(3L, 4L, 5L).toDF("k"), col("k"))
      .collect()(0)
    assert(dense.getLong(3) == 0L && dense.getLong(4) == 0L &&
      dense.getLong(5) == 0L && dense.isNullAt(6))
  }

  test("headTailRollup: residual row carries the tail mass; NULLs fold " +
    "into (null) and compete; empty tail emits no (other) row") {
    val s4 = spark
    import s4.implicits._
    import org.apache.spark.sql.functions.col
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d") ++
      Seq.fill(4)(null: String)).toDF("cat")
    val out = Profiling.headTailRollup(df, col("cat"), k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // counts: a 5, (null) 4, b 3, c 1, d 1; total 14
    assert(out.toSeq == Seq(
      ("a", 1, 5L, 1L, 5.0 / 14),
      ("(null)", 2, 4L, 1L, 4.0 / 14),
      ("(other)", 3, 5L, 3L, 5.0 / 14)))
    // k covers everything → no residual row
    val all = Profiling.headTailRollup(df, col("cat"), k = 10).collect()
    assert(all.length == 5 && !all.exists(_.getString(0) == "(other)"))
  }

  test("contributionShares: child shares of parent and total from " +
    "exact decimal sums") {
    val s11 = spark
    import s11.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("r1", "a", 4.00), ("r1", "a", 6.00),
      ("r1", "b", 30.00), ("r2", "c", 60.00)).toDF("p", "c", "v")
    val out = Profiling.contributionShares(df, col("p"), col("c"),
      col("v")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(("r1", "a")) == ((10.0, 0.25, 0.1)))
    assert(out(("r1", "b")) == ((30.0, 0.75, 0.3)))
    assert(out(("r2", "c")) == ((60.0, 1.0, 0.6)))
  }

  test("skyline2D: dominated points drop, equal points tie into the " +
    "frontier together, same-x lower-y drops") {
    val s12 = spark
    import s12.implicits._
    import org.apache.spark.sql.functions.col
    val pts = Seq((1L, 5L, 1L), (2L, 3L, 3L), (3L, 3L, 2L),
      (4L, 1L, 5L), (5L, 4L, 1L), (6L, 3L, 3L))
      .toDF("id", "x", "y")
    val out = Profiling.skyline2D(pts, col("id"), col("x"), col("y"))
      .collect().map(_.getLong(0)).toSet
    // (5,1) kills (4,1); (3,3) kills (3,2); (1,5) stands alone;
    // ids 2 and 6 share (3,3) — neither dominates, both stay
    assert(out == Set(1L, 2L, 4L, 6L))
  }

  test("sampleRepresentativeness: fixed-point shares and signed " +
    "distortion; empty-stratum samples read zero, not NULL") {
    val s13 = spark
    import s13.implicits._
    val full = (Seq.fill(6)("en") ++ Seq.fill(2)("es") ++ Seq.fill(2)("de"))
      .toDF("lang")
    val sample = (Seq.fill(3)("en") ++ Seq.fill(1)("es")).toDF("lang")
    val out = Profiling.sampleRepresentativeness(full, sample, "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val M = 1L << 20
    // full shares: en 6/10, es 2/10, de 2/10; sample: en 3/4, es 1/4
    assert(out("en") == ((6L, 3L, 6 * M / 10, 3 * M / 4,
      3 * M / 4 - 6 * M / 10)))
    assert(out("es") == ((2L, 1L, 2 * M / 10, M / 4, M / 4 - 2 * M / 10)))
    assert(out("de") == ((2L, 0L, 2 * M / 10, 0L, -(2 * M / 10))))
  }

  test("scoreOutcomeCalibration: exact rational bin edges, the top " +
    "bin absorbs ratio 1, zero denominators drop, positives dedupe") {
    val s = spark; import s.implicits._
    // 4 bins over num/den: 0/4 -> bin 0, 1/4 -> bin 1 (edge lands UP:
    // (1·4) div 4 = 1), 2/4 -> bin 2, 4/4 -> bin 3 (clamped), 0/0 drops
    val scored = Seq(
      (10L, 0L, 4L), (11L, 1L, 4L), (12L, 2L, 4L), (13L, 4L, 4L),
      (14L, 1L, 0L))
      .toDF("id", "num", "den")
    // 11 listed twice: the membership join must not double-count it
    val pos = Seq(11L, 11L, 13L).toDF("pid")
    val out = Profiling.scoreOutcomeCalibration(scored, "id", "num",
      "den", pos, "pid", bins = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      0 -> ((1L, 0L, 0.0)),
      1 -> ((1L, 1L, 1.0)),
      2 -> ((1L, 0L, 0.0)),
      3 -> ((1L, 1L, 1.0))))
  }

  test("columnProfileSketch: exact counters, HLL estimate near exact " +
    "distinct, all-NULL column estimates 0, empty string is a value") {
    val s = spark; import s.implicits._
    val df = (1L to 400L).map(i => (i, s"v${i % 50}",
      null.asInstanceOf[String])) :+ ((401L, "", null))
    val out = Profiling.columnProfileSketch(df.toDF("id", "sv", "nul"),
      Seq("id", "sv", "nul"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (idN, idNull, idEst) = out("id")
    assert(idN == 401L && idNull == 0L)
    assert(math.abs(idEst / 401.0 - 1.0) < 0.25, idEst) // ±1.04/√256 ≈ 6.5%
    val (svN, svNull, svEst) = out("sv")
    assert(svN == 401L && svNull == 0L)
    assert(math.abs(svEst / 51.0 - 1.0) < 0.25, svEst) // 50 values + ""
    assert(out("nul") == ((401L, 401L, 0.0)))
  }

  test("calibrationEce: perfectly calibrated bins give 0; hand case") {
    val s = spark; import s.implicits._
    // bins=2 midpoints at 1/4 and 3/4 in 2^20 fp
    val perfect = Seq((0, 4L, 1L), (1, 4L, 3L))
      .toDF("bin_id", "n_rows", "n_positive")
    assert(Profiling.calibrationEce(perfect, bins = 2)
      .collect()(0).getDouble(1) == 0.0)
    // bin0: rate 1 vs mid 1/4 -> 3/4 off; bin1: rate 0 vs 3/4
    val worst = Seq((0, 2L, 2L), (1, 2L, 0L))
      .toDF("bin_id", "n_rows", "n_positive")
    assert(Profiling.calibrationEce(worst, bins = 2)
      .collect()(0).getDouble(1) == 0.75)
  }

  test("columnProfileSketch: non-portable column types fail loudly") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 0.5)).toDF("id", "d")
    intercept[IllegalArgumentException] {
      Profiling.columnProfileSketch(df, Seq("id", "d"))
    }
    intercept[IllegalArgumentException] {
      Profiling.columnProfileSketch(df, Seq("nope"))
    }
  }

  test("scoreAuc: midrank tie handling matches the pairwise definition") {
    val s = spark; import s.implicits._
    // pos scores {1, 3}, neg scores {1, 2}: pairwise AUC =
    // (tie 0.5 + 0 + 1 + 1) / 4 = 0.625
    val scored = Seq((1L, 0), (1L, 1), (2L, 0), (3L, 1))
      .toDF("score", "label")
    val r = Profiling.scoreAuc(scored, "score", "label").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 3L)))
    assert(r.getDouble(3) == 0.625)
  }

  test("scoreAuc: perfect separation is 1.0; single-class AUC is NULL; " +
    "NULL scores/labels drop") {
    val s = spark; import s.implicits._
    val perfect = Seq((5L, 1), (4L, 1), (2L, 0), (1L, 0))
      .toDF("score", "label")
    assert(Profiling.scoreAuc(perfect, "score", "label")
      .collect()(0).getDouble(3) == 1.0)
    val onlyPos = Seq((5L, 1), (4L, 1)).toDF("score", "label")
    assert(Profiling.scoreAuc(onlyPos, "score", "label")
      .collect()(0).isNullAt(3))
    val withNulls = Seq[(java.lang.Long, Integer)](
      (5L, 1), (4L, 1), (2L, 0), (1L, 0), (null, 0), (9L, null))
      .toDF("score", "label")
    val r = Profiling.scoreAuc(withNulls, "score", "label").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(3) == 1.0)
  }

  test("gainCurve: equal-population bands, fixed-point capture/lift") {
    val s = spark; import s.implicits._
    val M = 1L << 20
    // desc groups: s=3 (n=2, np=2) above=0 -> band 0;
    //              s=2 (n=1, np=0) above=2 -> band 1;
    //              s=1 (n=1, np=0) above=3 -> band 1
    val scored = Seq((3L, 1), (3L, 1), (2L, 0), (1L, 0))
      .toDF("score", "label")
    val out = Profiling.gainCurve(scored, "score", "label", bands = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out == Map(
      0 -> ((2L, 2L, 2L, 2L, M, 2 * M)),
      1 -> ((2L, 0L, 4L, 2L, M, M))))
  }

  test("gainCurve: a tied score run lands wholly in the band where it " +
    "starts — ties never split") {
    val s = spark; import s.implicits._
    // s=5 has n=3 starting at above=0 -> all three rows in band 0 even
    // though equal-population banding would cut at 2
    val scored = Seq((5L, 1), (5L, 0), (5L, 0), (1L, 1))
      .toDF("score", "label")
    val out = Profiling.gainCurve(scored, "score", "label", bands = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    assert(out == Map(0 -> ((3L, 3L)), 1 -> ((1L, 4L))))
  }
}
