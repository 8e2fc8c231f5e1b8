package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** [[Sampling.waterfillQuota]]'s closed-form integer solve must
  * satisfy the max-min fairness CONTRACT on arbitrary mass vectors
  * and budgets — the invariants a brute-force water level would give:
  * exact budget conservation, no allocation above its own mass,
  * uncapped strata keep everything, capped strata differ by at most
  * one token and never exceed any uncapped stratum's... (capped are
  * the largest masses by construction). Any violated invariant is a
  * bug in the boundary arithmetic, not noise. */
object WaterfillProps extends Properties("WaterfillQuota") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("WaterfillProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val caseGen: Gen[(List[Long], Long)] = for {
    n <- Gen.choose(1, 12)
    masses <- Gen.listOfN(n, Gen.choose(0L, 200L))
    budget <- Gen.choose(0L, 1500L)
  } yield (masses, budget)

  property("budget conserved exactly, per-stratum bounds, max-min " +
    "fairness") = forAll(caseGen) { case (masses, budget) =>
    val s = spark; import s.implicits._
    val df = masses.zipWithIndex
      .map { case (m, i) => (f"s$i%02d", m) }.toDF("src", "w")
    val out = Sampling.waterfillQuota(df, "src", "w", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val total = masses.sum
    val allocSum = out.map(_._3).sum
    val conserved = allocSum == math.min(budget, total)
    val bounded = out.forall(r => r._3 >= 0 && r._3 <= r._2)
    val uncappedKeepAll = out.filter(!_._4).forall(r => r._3 == r._2)
    // capped allocations differ by at most one (same water level
    // modulo the remainder), and no capped stratum receives less
    // than any smaller-mass stratum's allocation
    val capped = out.filter(_._4).map(_._3)
    val levelled = capped.isEmpty ||
      (capped.max - capped.min) <= 1
    val monotone = out.sortBy(r => (r._2, r._1)).map(_._3)
      .toList.sliding(2).forall {
        case List(a, b) => a <= b + 1 // remainder +1 can locally invert
        case _ => true
      }
    conserved && bounded && uncappedKeepAll && levelled && monotone
  }
}
