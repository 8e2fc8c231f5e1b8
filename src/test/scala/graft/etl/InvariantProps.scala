package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants over GENERATED dirty inputs (SURVEY §5.2-4
  * commits to exactly these): whatever junk arrives,
  *  - post-repair referential integrity holds (every non-null fact key
  *    has a dim row),
  *  - the repaired dim stays PK-unique,
  *  - incremental loads are idempotent (re-load inserts 0).
  * Case counts are kept small (Spark jobs per case) — breadth comes
  * from the generators, not volume.
  */
object InvariantProps extends Properties("EtlInvariants") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("InvariantProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val factKeyGen: Gen[Seq[Option[Int]]] =
    Gen.listOfN(30, Gen.frequency(
      8 -> Gen.chooseNum(1, 15).map(Some(_)),
      2 -> Gen.const(None))) // null fact keys (pd.notna exclusion)

  private val dimKeyGen: Gen[Seq[Int]] =
    Gen.listOfN(8, Gen.chooseNum(1, 15)).map(_.distinct)

  private def factDf(keys: Seq[Option[Int]]) = {
    val schema = StructType(Seq(
      StructField("id_tipo_trx", IntegerType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        keys.map(k => Row(k.map(Integer.valueOf).orNull)), 2), schema)
  }

  private def dimDf(keys: Seq[Int]) = {
    val schema = StructType(Seq(
      StructField("id_tipo_trx", IntegerType, nullable = false),
      StructField("descripcion_tipo", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(k => Row(k, s"t$k")), 2),
      schema)
  }

  property("post-repair RI: every non-null fact key has a dim row") =
    forAll(factKeyGen, dimKeyGen) { (fk, dk) =>
      val repaired = Transform.riRepair(
        factDf(fk), "id_tipo_trx", dimDf(dk), "id_tipo_trx",
        "descripcion_tipo")
      val dimKeys = repaired.select("id_tipo_trx")
        .collect().map(_.getInt(0)).toSet
      fk.flatten.toSet.subsetOf(dimKeys)
    }

  property("post-repair dim is PK-unique") =
    forAll(factKeyGen, dimKeyGen) { (fk, dk) =>
      val repaired = Transform.riRepair(
        factDf(fk), "id_tipo_trx", dimDf(dk), "id_tipo_trx",
        "descripcion_tipo").collect()
      repaired.map(_.getInt(0)).distinct.length == repaired.length
    }

  property("incremental load is idempotent: second load inserts 0") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1, 50)).map(_.distinct)) { pks =>
      val sink = new IncrementalSink(spark,
        Files.createTempDirectory("graft_prop").toString)
      val schema = StructType(Seq(StructField("pk", IntegerType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(pks.map(Row(_)), 2), schema)
      val (ins1, _) = sink.appendOnlyNew(df, "t", "pk")
      val (ins2, ign2) = sink.appendOnlyNew(df, "t", "pk")
      ins1 == pks.length.toLong && ins2 == 0L && ign2 == pks.length.toLong
    }
}
