package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** The MOSS detection guarantee of [[Dedup.winnowingPairs]], swept
  * over GENERATED documents: any two docs sharing a contiguous run of
  * at least `window + span − 1` tokens MUST pair (minShared = 1, no
  * df cap) wherever the run sits inside arbitrary filler — the
  * property the fixed spec case samples once, exercised across
  * positions, fillers and run contents; and docs over disjoint
  * vocabularies never pair (fingerprints are token-content hashes,
  * filler cannot collide by construction). */
object WinnowingProps extends Properties("WinnowingPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("WinnowingProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // disjoint vocabularies: run tokens, left filler, right filler
  private val runWord = Gen.oneOf("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta")
  private val fillA = Gen.oneOf("red", "blue", "green", "gold", "pink")
  private val fillB = Gen.oneOf("one", "two", "three", "four", "five")

  private def words(g: Gen[String], n: Int): Gen[List[String]] =
    Gen.listOfN(n, g)

  private val caseGen = for {
    runLen <- Gen.choose(6, 10) // ≥ window + span − 1 = 6
    run <- words(runWord, runLen)
    aPre <- Gen.choose(0, 8).flatMap(words(fillA, _))
    aPost <- Gen.choose(0, 8).flatMap(words(fillA, _))
    bPre <- Gen.choose(0, 8).flatMap(words(fillB, _))
    bPost <- Gen.choose(0, 8).flatMap(words(fillB, _))
  } yield (
    (aPre ++ run ++ aPost).mkString(" "),
    (bPre ++ run ++ bPost).mkString(" "))

  property("a shared >= w+k-1 token run is ALWAYS detected") =
    forAll(caseGen) { case (textA, textB) =>
      val s = spark; import s.implicits._
      val docs = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      val pairs = Dedup.winnowingPairs(docs, "doc_id", "text",
        span = 3, window = 4, maxDf = Int.MaxValue, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs.contains((1L, 2L))
    }

  private val disjointGen = for {
    a <- Gen.choose(6, 20).flatMap(words(fillA, _))
    b <- Gen.choose(6, 20).flatMap(words(fillB, _))
  } yield (a.mkString(" "), b.mkString(" "))

  property("disjoint-vocabulary docs never pair") =
    forAll(disjointGen) { case (textA, textB) =>
      val s = spark; import s.implicits._
      val docs = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      Dedup.winnowingPairs(docs, "doc_id", "text",
        span = 3, window = 4, maxDf = Int.MaxValue, minShared = 1)
        .count() == 0L
    }
}
