package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Structural invariants of the round-7 vocabulary operators over
  * GENERATED corpora: richness bounds (hapax ≤ types ≤ tokens, TTR on
  * the closed 2^-20 grid), Zipf rank/count monotonicity, and novelty
  * conservation (a shingle's first sighting is never counted seen;
  * every doc absent iff under 3 tokens).
  */
object TextAnalysisProps extends Properties("TextAnalysisExt") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("TextAnalysisProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab = Vector("uno", "dos", "tres", "cuatro", "cinco",
    "seis", "siete", "ocho")

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(2, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 10)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs

  private def frame(docs: List[String]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  property("lexicalRichness: hapax <= types <= tokens; TTR grid-exact") =
    forAll(corpusGen) { docs =>
      val rows = TextAnalysis.lexicalRichness(frame(docs), "doc_id", "text")
        .collect()
      val nonEmpty = docs.zipWithIndex.collect {
        case (t, i) if t.trim.nonEmpty => i.toLong
      }.toSet
      rows.map(_.getLong(0)).toSet == nonEmpty &&
        rows.forall { r =>
          val (tok, typ, hap, fp) =
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
          hap <= typ && typ <= tok && tok > 0 &&
            fp == typ * 1048576L / tok && fp >= 1048576L / tok &&
            fp <= 1048576L
        }
    }

  property("zipfProfile: ranks dense from 1; cf non-increasing; df <= cf and <= n_docs") =
    forAll(corpusGen) { docs =>
      val rows = TextAnalysis.zipfProfile(frame(docs), "doc_id", "text",
        topK = 5).collect()
      val ranks = rows.map(_.getInt(0)).toSeq
      val cfs = rows.map(_.getLong(2)).toSeq
      ranks == (1 to rows.length) &&
        cfs.zip(cfs.drop(1)).forall { case (a, b) => a >= b } &&
        rows.forall(r => r.getLong(3) <= r.getLong(2) &&
          r.getLong(3) <= docs.length)
    }

  property("noveltyDecay: first sightings never count seen; totals conserve") =
    forAll(corpusGen) { docs =>
      val rows = TextAnalysis.noveltyDecay(frame(docs), "doc_id", "text")
        .collect()
      // the minimum doc_id present can have seen nothing
      val byId = rows.map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
      val firstDoc = byId.keySet.minOption
      firstDoc.forall(f => byId(f)._2 == 0L) &&
        rows.forall { r =>
          r.getLong(2) <= r.getLong(1) && r.getLong(1) > 0 &&
            r.getLong(3) == r.getLong(2) * 1048576L / r.getLong(1)
        }
    }
}
