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

/** The BM25 per-term fixed-point contribution is a pure function of
  * five INTEGERS (tf, df, dl, N=n_docs, T=tot_tokens), so its exact
  * value is a BigInt rational:
  *
  *   idf·tfpart·2^20
  *     = [(2N−2df+1)·36·tf·T·2^20] / [(2df+1)·(16·tf·T + 5·T + 15·dl·N)]
  *
  * (idf scaled by 2/2; the tf part by 16T/16T — k1=5/4, b=3/4, k1+1=9/4
  * are all dyadic, so the scalings are exact). This pins the IEEE
  * double chain — the exact parenthesization `Retrieval.bm25Scores`
  * and the q52 oracle both evaluate — to the BigInt floor over the
  * full corpus-realistic input range: the rounding error accumulated
  * across the ~8 field ops never crosses a floor boundary, so ANY
  * engine replaying the parenthesization in IEEE doubles lands on the
  * identical long. (A 2M-sample offline sweep found 0 mismatches; this
  * suite keeps the pin honest per CI run.) Pure JVM — no Spark — so it
  * runs a real sample count, separate from RetrievalProps' 5-test cap. */
object RetrievalFixedPointProps extends Properties("RetrievalFixedPoint") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(2000).withWorkers(1)

  private def ieeeFp(tf: Long, df: Long, dl: Long, n: Long, t: Long): Long = {
    val avgdl = t.toDouble / n.toDouble
    math.floor(
      ((n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)) *
      ((tf.toDouble * 2.25) /
        (tf.toDouble + 1.25 * (0.25 + 0.75 * (dl.toDouble / avgdl)))) *
      1048576.0).toLong
  }

  private def exactFp(tf: Long, df: Long, dl: Long, n: Long, t: Long): Long = {
    val num = BigInt(2 * n - 2 * df + 1) * 36 * tf * t * 1048576
    val den = BigInt(2 * df + 1) *
      (BigInt(16) * tf * t + BigInt(5) * t + BigInt(15) * dl * n)
    (num / den).toLong
  }

  property("IEEE double chain == exact BigInt rational floor") =
    forAll(for {
      n <- Gen.choose(1L, 1000000L)
      t <- Gen.choose(n, 100000000L)
      df <- Gen.choose(1L, n)
      dl <- Gen.choose(1L, math.min(t, 100000L))
      tf <- Gen.choose(1L, dl)
    } yield (tf, df, dl, n, t)) { case (tf, df, dl, n, t) =>
      ieeeFp(tf, df, dl, n, t) == exactFp(tf, df, dl, n, t)
    }
}
