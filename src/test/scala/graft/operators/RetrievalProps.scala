package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Structural invariants of BM25 scoring over GENERATED corpora: the
  * output set is exactly the docs containing ≥ 1 query term,
  * n_terms_matched counts DISTINCT matched terms, and every score is
  * strictly positive (the rational idf is positive by construction, so
  * a zero/negative score would mean a broken fold).
  */
object RetrievalProps extends Properties("Retrieval") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("RetrievalProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab = Vector("spark", "query", "table", "row", "scan",
    "merge", "sort", "hash", "key", "value")
  private val terms = Seq("spark", "query", "hash")

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(3, 15)
    docs <- Gen.listOfN(n, Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" ")))
  } yield docs

  private def frame(docs: List[String]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  property("output = docs with >=1 term; distinct-term counts; positive scores") =
    forAll(corpusGen) { docs =>
      val rows = Retrieval.bm25Scores(frame(docs), "doc_id", "text", terms)
        .collect()
      val expected = docs.zipWithIndex.collect {
        case (t, i) if t.split(" ").exists(terms.contains) => i.toLong
      }.toSet
      rows.map(_.getLong(0)).toSet == expected &&
        rows.forall { r =>
          val matched =
            docs(r.getLong(0).toInt).split(" ").toSet.intersect(terms.toSet)
          r.getInt(1) == matched.size && r.getLong(2) > 0L
        }
    }
}
