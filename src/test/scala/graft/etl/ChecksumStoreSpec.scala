package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.Diff

/** The incremental integrity invariants: row-disjoint batch splits
  * merge to EXACTLY the one-shot q243 fingerprint (modular sum + XOR
  * are the whole merge), a re-delivered batch shows the documented
  * sum-moves/XOR-cancels disagreement pattern, and compact preserves
  * the merged state. */
class ChecksumStoreSpec extends SparkSpec {

  private def rows(rs: (Long, String, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rs.map { case (i, g, t) => Row(i, g, t) }.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("src", StringType), StructField("t", StringType))))
  }

  private val corpus = Seq(
    (1L, "a", "hello"), (2L, "a", "world"), (3L, "a", null),
    (4L, "b", "hello"), (5L, "b", "again"))

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("row-disjoint batches merge to the one-shot fingerprint; " +
    "compact preserves it") {
    val dir = Files.createTempDirectory("graft_cks").toString + "/store"
    val store = new ChecksumStore(spark, dir)
    assert(store.fingerprint.collect().isEmpty)
    store.ingest(rows(corpus.take(2): _*), "src", "t")
    store.ingest(rows(corpus.drop(2): _*), "src", "t")
    val oneShot = table(Diff.contentChecksum(
      rows(corpus: _*), "src", "t"))
    assert(table(store.fingerprint) == oneShot)
    val (filesBefore, filesAfter) = store.compact()
    assert(filesBefore >= 2L && filesAfter >= 1L)
    assert(table(store.fingerprint) == oneShot)
  }

  test("a re-delivered batch moves the count and sum but cancels in " +
    "the XOR — the documented disagreement pattern") {
    val dir = Files.createTempDirectory("graft_cks2").toString + "/store"
    val store = new ChecksumStore(spark, dir)
    val batch = rows((1L, "a", "x"), (2L, "a", "y"))
    store.ingest(batch, "src", "t")
    val clean = table(store.fingerprint)("a")
    store.ingest(batch, "src", "t") // violates the delivery contract
    val dup = table(store.fingerprint)("a")
    assert(dup._1 == 2 * clean._1)          // count doubled
    assert(dup._3 != clean._3)              // sum moved
    assert(dup._4 == 0L)                    // XOR self-cancelled
  }
}
