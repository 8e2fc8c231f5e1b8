package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Edge-case pins for [[TextAnalysis.repetitionSignals]] (the q35
  * operator; bulk correctness is the DuckDB oracle gate). */
class TextAnalysisSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("repetition signals: degenerate and saturated documents") {
    val out = TextAnalysis.repetitionSignals(
      docs(
        "",                       // 0: empty -> all zero, both ratios null
        "uno dos",                // 1: 2 tokens -> no grams, gram ratio null
        "a b c d",                // 2: all distinct -> both ratios 0.0
        "spam spam spam spam spam" // 3: one token repeated -> saturated
      ), "doc_id", "text").collect()

    def row(i: Int) = out(i)
    assert(row(0).getInt(1) == 0 && row(0).isNullAt(5) && row(0).isNullAt(6))
    assert(row(1).getInt(3) == 0 && row(1).isNullAt(6))
    assert(row(1).getDouble(5) == 0.0) // 2 distinct tokens of 2
    assert(row(2).getDouble(5) == 0.0 && row(2).getDouble(6) == 0.0)
    // 5 copies of one token: 1 distinct of 5 -> 0.8; 3 grams all equal
    // -> 1 distinct of 3 -> 2/3
    assert(row(3).getDouble(5) == 1.0 - 1.0 / 5)
    assert(row(3).getInt(3) == 3 && row(3).getInt(4) == 1)
    assert(row(3).getDouble(6) == 1.0 - 1.0 / 3)
  }

  test("repetition signals: repeated passage raises the gram ratio above the token ratio signal") {
    // 8 tokens, 4 distinct; grams: 6 total, "a b c" appears twice etc.
    val out = TextAnalysis.repetitionSignals(
      docs("a b c d a b c d"), "doc_id", "text").collect().head
    assert(out.getInt(1) == 8 && out.getInt(2) == 4)
    // 6 grams: abc bcd cda dab abc bcd -> 4 distinct
    assert(out.getInt(3) == 6 && out.getInt(4) == 4)
    assert(out.getDouble(6) == 1.0 - 4.0 / 6)
  }
}
