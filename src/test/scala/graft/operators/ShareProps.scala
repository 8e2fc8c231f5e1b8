package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Conservation invariants of the share-producing readouts over
  * GENERATED data: [[Profiling.contributionShares]]' per-parent
  * shares must sum to 1 within each parent and the total shares to 1
  * overall, and [[Profiling.headTailRollup]]'s head + residual mass
  * must equal the input row count exactly with shares summing to 1 —
  * the "nothing lost, nothing double-counted" contract a report
  * reader silently assumes. */
object ShareProps extends Properties("ShareConservation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ShareProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rowGen = for {
    p <- Gen.oneOf("r1", "r2", "r3")
    c <- Gen.oneOf("a", "b", "c", "d")
    // positive cents so parent totals can't cancel to zero
    v <- Gen.choose(1L, 9999L)
  } yield (p, c, v / 100.0)

  private val frameGen = Gen.choose(1, 60).flatMap(Gen.listOfN(_, rowGen))

  property("contributionShares: per-parent and total shares conserve") =
    forAll(frameGen) { rows =>
      val s = spark; import s.implicits._
      val df = rows.toDF("p", "c", "v")
      val out = Profiling.contributionShares(df, col("p"), col("c"),
        col("v")).collect()
        .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
      val byParent = out.groupBy(_._1).values
      byParent.forall(g => math.abs(g.map(_._2).sum - 1.0) < 1e-9) &&
        math.abs(out.map(_._3).sum - 1.0) < 1e-9
    }

  private val catGen = Gen.choose(1, 80).flatMap(Gen.listOfN(_,
    Gen.option(Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))))

  property("headTailRollup: mass and shares conserve; ranks dense") =
    forAll(catGen, Gen.choose(1, 5)) { (cats, k) =>
      val s = spark; import s.implicits._
      val df = cats.map(c => Tuple1(c.orNull)).toDF("cat")
      val out = Profiling.headTailRollup(df, col("cat"), k)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      val massOk = out.map(_._2).sum == cats.size.toLong
      val shareOk = math.abs(out.map(_._4).sum - 1.0) < 1e-9
      val ranksOk = out.map(_._1).toSeq == (1 to out.length)
      massOk && shareOk && ranksOk
    }
}
