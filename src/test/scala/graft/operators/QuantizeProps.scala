package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Structural invariants of the quantizers over GENERATED embedding
  * matrices — the claims the scaladocs make that the fixture alone
  * can't falsify: int8 codes stay in [0, 255] with bounded
  * reconstruction error; PQ codes always come from the seed set with
  * non-negative error; a frozen codebook never re-codes on append.
  */
object QuantizeProps extends Properties("Quantize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("QuantizeProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dims = 16

  private val matrixGen: Gen[List[List[Float]]] = for {
    n <- Gen.choose(4, 12)
    m <- Gen.listOfN(n, Gen.listOfN(dims,
      Gen.choose(-100, 100).map(_ / 8.0f)))
  } yield m

  private def frame(m: List[List[Float]]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      m.zipWithIndex.map { case (v, i) => Row(i.toLong, v.toArray) }.asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
  }

  property("int8 codes stay in [0,255]; error bounded by one step") =
    forAll(matrixGen) { m =>
      val byDim = m.transpose.map(c => (c.min.toDouble, c.max.toDouble))
      val rows = Quantize.int8Codes(frame(m)).collect()
      rows.forall { r =>
        val (mn, mx) = byDim(r.getInt(1))
        val step = if (mx > mn) (mx - mn) / 255.0 else 0.0
        val bound = math.ceil(step * step * 1048576.0).toLong
        r.getInt(2) >= 0 && r.getInt(2) <= 255 &&
          r.getLong(3) >= 0 && r.getLong(3) <= bound
      }
    }

  property("PQ codes come from the seed set; err_fp never negative") =
    forAll(matrixGen) { m =>
      val ids = m.indices.map(_.toLong).toSet
      val rows = Quantize.pqCodes(frame(m), m = 4, k = 3).collect()
      rows.length == m.size * 4 &&
        rows.forall(r => ids.contains(r.getLong(2)) && r.getLong(3) >= 0)
    }

  property("frozen codebook: appends never re-code indexed vectors") =
    forAll(matrixGen) { m =>
      val half = m.take(math.max(2, m.size / 2))
      val book = Quantize.trainCodebook(frame(half), m = 4, k = 2)
      val before = Quantize.encodeWith(book)(frame(half)).collect().toSeq
      val after = Quantize.encodeWith(book)(frame(m)).collect()
        .filter(_.getLong(0) < half.size).toSeq
      before == after
    }
}
