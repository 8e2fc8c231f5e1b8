package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Properties of [[Dedup.fuzzyMatchPairs]] over generated catalog
  * names — two-token names AND the single-token-heavy mix that used
  * to pile into one degenerate `""` block: every emitted pair is
  * ordered, within the distance bound, shares the blocking key, and
  * carries the exact row mass of its names — and NOTHING below the
  * bound that shares a (kept) block is missed (completeness inside
  * blocks, the half of the contract the fixed spec cases can't
  * sweep). The block cap's contract is pinned too: oversized blocks
  * drop WHOLE (bounding the worst block's pair count), and blocks
  * under the cap are untouched. */
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
  private val twoToken = for { a <- adj; n <- noun } yield s"$a $n"
  // single-token names: brand/username-shaped, typo-adjacent clusters
  // sharing 4-char prefixes plus outliers that don't
  private val oneToken = Gen.oneOf("boltz", "bolts", "boltzz", "ring",
    "rings", "ringo", "gear", "gears", "ax", "axe")
  private val nameGen = Gen.frequency(1 -> twoToken, 1 -> oneToken)
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

  // the DEFAULT blockOf, modeled: 4-char prefix for single-token
  // names, second whitespace token otherwise (Spark split keeps
  // trailing empties at limit -1, hence split(" ", -1))
  private def block(n: String): String =
    if (!n.contains(" ")) n.take(4)
    else n.split(" ", -1).lift(1).getOrElse("")

  private def run(names: List[String], maxBlockNames: Long) = {
    import spark.implicits._
    Dedup.fuzzyMatchPairs(names.toDF("name"), "name", maxDist = 2,
      maxBlockNames = maxBlockNames)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
  }

  private def expectPairs(names: List[String], keptBlocks: String => Boolean) = {
    val byName = names.groupBy(identity).view.mapValues(_.size.toLong)
    val distinct = byName.keys.toSeq
    (for {
      a <- distinct; b <- distinct
      if a < b && block(a) == block(b) && keptBlocks(block(a)) &&
        lev(a, b) <= 2
    } yield (a, b, lev(a, b), byName(a), byName(b))).toSet
  }

  property("sound and complete within blocks; exact row mass") =
    forAll(corpusGen) { names =>
      run(names, maxBlockNames = 4096) == expectPairs(names, _ => true)
    }

  property("oversized blocks drop whole; small blocks are untouched") =
    forAll(corpusGen) { names =>
      val cap = 3L
      val blockSizes = names.distinct.groupBy(block).view.mapValues(_.size)
      val got = run(names, maxBlockNames = cap)
      val expect = expectPairs(names, b => blockSizes(b) <= cap)
      // the structural bound the cap buys: no kept block can emit
      // more than cap*(cap-1)/2 pairs
      val pairsPerBlock = got.toSeq.groupBy(p => block(p._1)).view
        .mapValues(_.size)
      got == expect && pairsPerBlock.forall(_._2 <= cap * (cap - 1) / 2)
    }
}
