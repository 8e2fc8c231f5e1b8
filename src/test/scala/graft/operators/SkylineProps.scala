package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** [[Profiling.skyline2D]]'s sorted-cumulative-maxima formulation
  * must equal the LITERAL dominance definition (no a with a ≥ b on
  * both axes and > on one) on arbitrary point sets — including the
  * duplicate-point and same-x/same-y ties the window rules exist
  * for. The brute force runs in plain Scala; disagreement on any
  * generated set is a bug in the reduction, not noise. */
object SkylineProps extends Properties("Skyline2D") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("SkylineProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // small coordinate range forces heavy ties and duplicates
  private val ptsGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 8L))))

  private def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)

  property("equals the brute-force dominance filter, ties included") =
    forAll(ptsGen) { pts =>
      val s = spark; import s.implicits._
      val df = pts.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val got = Profiling.skyline2D(df,
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"))
        .collect().map(_.getLong(0)).toSet
      val want = pts.zipWithIndex.collect {
        case ((x, y), i) if !pts.exists(a => dominates(a, (x, y))) =>
          i.toLong
      }.toSet
      got == want
    }
}
