package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Portability invariants of the TextHash folds over GENERATED text:
  * every hash stays in [0, P) — the no-overflow/no-negative claim the
  * scaladoc makes (negative values would make `%` engine-dependent and
  * break every oracle replay) — and tokenization is whitespace-robust.
  */
object TextHashProps extends Properties("TextHash") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("TextHashProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(30, wordGen)
    sep <- Gen.oneOf(" ", "  ", "\t", " \n ")
  } yield words.mkString(sep)

  private def hashesOf(texts: Seq[String]): Seq[Seq[Long]] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(i.toLong, t)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    df.select(TextHash.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 3)
      .select(TextHash.tokenHashes("w").as("wh"))
      .select(TextHash.shingleHashes("wh").as("hs"))
      .collect().toSeq.map(_.getSeq[Long](0).toSeq)
  }

  property("all token/shingle hashes stay in [0, P) — never negative") =
    forAll(Gen.listOfN(5, textGen)) { texts =>
      hashesOf(texts).flatten.forall(h => h >= 0 && h < TextHash.P)
    }

  property("native folds == HOF folds on generated text; results in [0, P)") =
    forAll(Gen.listOfN(5, textGen)) { texts =>
      import scala.jdk.CollectionConverters._
      val P = TextHash.P
      val markers = Seq("the", "a0", "zz")
      val df = spark.createDataFrame(
        texts.zipWithIndex.map { case (t, i) =>
          org.apache.spark.sql.Row(i.toLong, t)
        }.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
      val base = df.select(col("id"), TextHash.tokens(col("text")).as("w"),
        TextHash.tokenHashesOf(col("text")).as("wh"))
      val native = base.select(col("id"),
        TextHash.rollingFoldOf(col("wh")).as("r"),
        TextHash.minGramFoldOf(col("wh"), 8).as("m"),
        TextHash.sumTokenLengthsOf(col("w")).as("s"),
        TextHash.markerCountOf(col("w"), markers).as("c"))
        .orderBy("id").collect()
      val hof = base.select(col("id"),
        TextHash.rollingFold("wh").as("r"),
        when(size(col("wh")) >= 8, array_min(expr(s"""
          transform(sequence(1, size(wh) - 7), i ->
            aggregate(slice(wh, i, 8), 0L, (a, x) -> ((a * 131L) + x) % ${P}L))""")))
          .otherwise(lit(null).cast("long")).as("m"),
        expr("aggregate(transform(w, x -> length(x)), 0L, (a, b) -> a + b)").as("s"),
        size(filter(col("w"), t => t.isin(markers.map(lit): _*))).as("c"))
        .orderBy("id").collect()
      native.zip(hof).forall { case (n, h) =>
        n.getLong(1) == h.getLong(1) && n.getLong(1) >= 0 && n.getLong(1) < P &&
        n.isNullAt(2) == h.isNullAt(2) &&
        (n.isNullAt(2) || (n.getLong(2) == h.getLong(2) &&
          n.getLong(2) >= 0 && n.getLong(2) < P)) &&
        n.getLong(3) == h.getLong(3) &&
        n.getInt(4) == h.getInt(4)
      }
    }

  property("rolling windowHashes == HOF slice/aggregate reference") =
    forAll(Gen.listOfN(5, textGen), Gen.oneOf(1, 3, 8, 20, 40)) {
      (texts, span) =>
        import scala.jdk.CollectionConverters._
        val df = spark.createDataFrame(
          texts.zipWithIndex.map { case (t, i) =>
            org.apache.spark.sql.Row(i.toLong, t)
          }.asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
        // HOF reads the token-hash array column; build it first
        val out = df
          .select(col("id"), TextHash.tokenHashesOf(col("text")).as("wh"),
            TextHash.windowHashesOf(col("text"), span).as("native"))
          .select(col("id"), col("native"),
            TextHash.windowHashes("wh", span).as("hof"))
          .orderBy("id").collect()
        out.forall { r =>
          val n = r.getSeq[Long](1)
          val h = r.getSeq[Long](2)
          n == h && n.forall(x => x >= 0 && x < TextHash.P)
        }
    }

  property("tokenization collapses arbitrary whitespace runs") =
    forAll(Gen.listOfN(20, wordGen)) { words =>
      val spaced = words.mkString(" ")
      val messy = "  " + words.mkString(" \t ") + "\n"
      val out = spark.createDataFrame(
        java.util.List.of(
          org.apache.spark.sql.Row(spaced),
          org.apache.spark.sql.Row(messy)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
        .select(TextHash.tokens(col("text")).as("w"))
        .collect().map(_.getSeq[String](0).toSeq)
      out(0) == out(1) && out(0) == words
    }
}
