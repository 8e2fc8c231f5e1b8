package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.TextAnalysis

/** The NoveltyStore split-invariance PROPERTY over generated corpora
  * and RANDOM split points: any id-ordered batching of a corpus
  * through the store reproduces the one-shot
  * [[TextAnalysis.noveltyDecay]] scores exactly. The fixed-fixture
  * spec (NoveltyStoreSpec) pins the semantics; this pins them against
  * corpora and cut points nobody hand-picked.
  */
object NoveltyStoreProps extends Properties("NoveltyStore") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("NoveltyStoreProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab = Vector("lago", "rio", "monte", "valle", "costa",
    "puente")

  private val caseGen: Gen[(List[String], Int)] = for {
    n <- Gen.choose(2, 10)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(3, 9) // >= 3 tokens: every doc has shingles
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    cut <- Gen.choose(1, n - 1) // a proper two-batch split
  } yield (docs, cut)

  private def frame(docs: Seq[(Long, String)]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      docs.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  property("any id-ordered split through the store == one-shot noveltyDecay") =
    forAll(caseGen) { case (docs, cut) =>
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val oneShot = rows(TextAnalysis.noveltyDecay(frame(ids), "doc_id",
        "text"))
      val dir = Files.createTempDirectory("graft_nsp").toString + "/store"
      val store = new NoveltyStore(spark, dir)
      val batched = rows(store.scoreAndRecord(frame(ids.take(cut)),
        "doc_id", "text")) ++
        rows(store.scoreAndRecord(frame(ids.drop(cut)), "doc_id", "text"))
      batched == oneShot
    }
}
