package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for [[Joins.asOf]] over GENERATED keyed histories: the
  * single-shuffle union-window rewrite must equal the obvious
  * per-row reference (scan the right history, keep the greatest
  * qualifying timestamp) for any data — including timestamp ties
  * between sides, multiple probes per key, and keys existing on only
  * one side. Small dense domains make collisions the common case, not
  * the corner case.
  */
object JoinsProps extends Properties("Joins.asOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("JoinsProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // dense domains: few keys, few timestamps -> ties everywhere
  private val leftGen: Gen[List[(Long, Long, Long)]] = Gen.sized { _ =>
    Gen.listOfN(25, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 9L)
    } yield (k, t))
  }.map(_.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })

  // right side: unique (key, ts) per the determinism contract
  private val rightGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 9L)
      v <- Gen.choose(100L, 999L)
    } yield ((k, t), v)).map(_.toMap.toList.map { case ((k, t), v) =>
      (k, t, v)
    })

  private def reference(left: List[(Long, Long, Long)],
      right: List[(Long, Long, Long)], inclusive: Boolean)
      : Map[Long, Option[Long]] =
    left.map { case (lid, k, t) =>
      val qualifying = right.filter { case (rk, rt, _) =>
        rk == k && (if (inclusive) rt <= t else rt < t)
      }
      lid -> (if (qualifying.isEmpty) None
              else Some(qualifying.maxBy(_._2)._3))
    }.toMap

  private def run(left: List[(Long, Long, Long)],
      right: List[(Long, Long, Long)], inclusive: Boolean)
      : Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("lid", "k", "t")
    val r = right.toDF("k", "t", "rv")
    Joins.asOf(l, r, "k", "t", inclusive)
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
  }

  property("inclusive ≡ greatest-qualifying-timestamp reference") =
    forAll(leftGen, rightGen) { (l, r) =>
      run(l, r, inclusive = true) == reference(l, r, inclusive = true)
    }

  property("strict ≡ reference with rt < t") =
    forAll(leftGen, rightGen) { (l, r) =>
      run(l, r, inclusive = false) == reference(l, r, inclusive = false)
    }
}
