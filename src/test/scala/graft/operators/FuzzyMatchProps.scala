package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Properties of [[Dedup.fuzzyMatchPairs]] over generated two-token
  * catalog names: every emitted pair is ordered, within the distance
  * bound, shares the blocking key, and carries the exact row mass of
  * its names — and NOTHING below the bound that shares a block is
  * missed (completeness inside blocks, the half of the contract the
  * fixed spec cases can't sweep). */
object FuzzyMatchProps extends Properties("FuzzyMatchPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("FuzzyMatchProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val adj = Gen.oneOf("cold", "old", "bold", "gold", "red", "new")
  private val noun = Gen.oneOf("bolt", "ring", "gear")
  private val nameGen = for { a <- adj; n <- noun } yield s"$a $n"
  private val corpusGen: Gen[List[String]] = Gen.listOfN(25, nameGen)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("sound and complete within blocks; exact row mass") =
    forAll(corpusGen) { names =>
      import spark.implicits._
      val got = Dedup.fuzzyMatchPairs(names.toDF("name"), "name",
        maxDist = 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
          r.getLong(3), r.getLong(4))).toSet
      val byName = names.groupBy(identity).view.mapValues(_.size.toLong)
      val distinct = byName.keys.toSeq
      def block(n: String) = n.split(" ", -1).lift(1).getOrElse("")
      val expect = (for {
        a <- distinct; b <- distinct
        if a < b && block(a) == block(b) && lev(a, b) <= 2
      } yield (a, b, lev(a, b), byName(a), byName(b))).toSet
      got == expect
    }
}
