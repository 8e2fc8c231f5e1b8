package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** [[Tables.tsUs]]'s encoding adaptation: the INT64 branch exists ONLY
  * for the nanosAsLong read path; plain-BIGINT microseconds arriving
  * there must fail loudly rather than be silently divided by 1000
  * (which would shift every temporal query by 1000x). */
class TablesSpec extends SparkSpec {

  private def tsDf(vals: java.lang.Long*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(vals.map(Row(_)).asJava,
      StructType(Seq(StructField("ts", LongType))))
  }

  test("tsUs: epoch-nanos long divides to micros; NULL passes through") {
    val df = tsDf(1700000000000000000L, null)
    val out = df.select(Tables.tsUs(df).as("us")).collect()
    assert(out(0).getLong(0) == 1700000000000000L)
    assert(out(1).isNullAt(0))
  }

  test("tsUs: micro-magnitude long fails loudly, never a silent div-1000") {
    val df = tsDf(1700000000000000L) // 2023 in micros, 1970 in nanos
    val e = intercept[Exception] {
      df.select(Tables.tsUs(df).as("us")).collect()
    }
    assert(e.getMessage.contains("too small to be epoch"),
      s"wrong failure: ${e.getMessage}")
  }
}
