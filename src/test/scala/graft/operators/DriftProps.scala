package graft.operators

import java.sql.Date

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Overflow pin for [[Drift.mixDriftFromCounts]] (r7 verdict item 3):
  * the DECIMAL(38,0) cross-products must equal exact BigInt arithmetic
  * for counts far past the old BIGINT wrap point (~3·10^9 events per
  * day-pair) — generated day mixes draw per-type counts up to ~2^51
  * (the documented exact ceiling), where every c·np / cp·n / n·np
  * product overflows a long by ~10 orders of magnitude; before the
  * decimal cast these produced plausible-looking wrapped drift_fp
  * values, not errors (spark.sql.ansi.enabled=false in GraftSession).
  * Past the exact ceiling the raise_error guard must fire — no input
  * anywhere in the Long range ever yields a silently wrong number.
  */
object DriftProps extends Properties("Drift.mixDriftFromCounts") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("DriftProps")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val types = Seq("view", "click", "error")

  // per-type daily counts: tiny and huge mixed freely; each count is
  // bounded by maxExactDayTotal/3 so a day's TOTAL (<= 3 types) stays
  // inside the documented exact range — every c·np / cp·n / n·np here
  // still overflows BIGINT by ~10 orders of magnitude
  private val countGen: Gen[Long] = Gen.oneOf(
    Gen.choose(1L, 100L),
    Gen.choose(1L << 40, Drift.maxExactDayTotal / 3))

  private val mixGen: Gen[List[(Int, String, Long)]] = for {
    nDays <- Gen.choose(2, 4)
    rows <- Gen.sequence[List[List[(Int, String, Long)]], List[(Int, String, Long)]](
      (0 until nDays).toList.map { d =>
        for {
          nTypes <- Gen.choose(1, types.size)
          ts <- Gen.pick(nTypes, types)
          cs <- Gen.listOfN(nTypes, countGen)
        } yield ts.toList.zip(cs).map { case (t, c) => (d, t, c) }
      })
  } yield rows.flatten

  /** Exact BigInt replay of the L1 formula: for day d with previous
    * day present, drift_fp = ⌊Σ_t |c_d(t)·n_prev − c_prev(t)·n_d| ·
    * 2^20 / (n_d·n_prev)⌋. */
  private def reference(rows: List[(Int, String, Long)])
      : Seq[(Int, Long, Long)] = {
    val byDay = rows.groupBy(_._1).map { case (d, rs) =>
      d -> rs.map(r => r._2 -> BigInt(r._3)).toMap
    }
    byDay.keys.toSeq.sorted.flatMap { d =>
      byDay.get(d - 1).map { prev =>
        val cur = byDay(d)
        val n = cur.values.sum
        val np = prev.values.sum
        val num = (cur.keySet ++ prev.keySet).toSeq.map { t =>
          (cur.getOrElse(t, BigInt(0)) * np -
            prev.getOrElse(t, BigInt(0)) * n).abs
        }.sum
        (d, n.toLong, ((num * 1048576) / (n * np)).toLong)
      }
    }
  }

  private val day0 = Date.valueOf("2024-01-01").toLocalDate

  property("day totals past the exact range raise, never wrap") =
    forAll(Gen.choose(Drift.maxExactDayTotal + 1, Long.MaxValue / 2)) { c =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        Seq(0, 1).map { d =>
          Row(Date.valueOf(day0.plusDays(d.toLong)), "view", c)
        }.asJava,
        StructType(Seq(StructField("day", DateType),
          StructField("t", StringType), StructField("c", LongType))))
      // the raise_error guard, not a wrapped value or a decimal NULL
      try {
        Drift.mixDriftFromCounts(df).collect()
        false
      } catch {
        case e: Throwable =>
          Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
            .take(5).exists(t => Option(t.getMessage)
              .exists(_.contains("exceed the exact range")))
      }
    }

  property("decimal path == BigInt at counts near 2^51 (BIGINT products wrap)") =
    forAll(mixGen) { rows =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        rows.map { case (d, t, c) =>
          Row(Date.valueOf(day0.plusDays(d.toLong)), t, c)
        }.asJava,
        StructType(Seq(StructField("day", DateType),
          StructField("t", StringType), StructField("c", LongType))))
      val got = Drift.mixDriftFromCounts(df).collect().toSeq
        .map(r => (r.getDate(0).toLocalDate.toEpochDay -
          day0.toEpochDay, r.getLong(1), r.getLong(2)))
        .map { case (d, n, fp) => (d.toInt, n, fp) }
      val want = reference(rows)
      if (got != want) println(s"got=$got want=$want rows=$rows")
      got == want
    }
}
