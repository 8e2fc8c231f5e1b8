package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Cluster-closure semantics on crafted graphs: transitivity across
  * chains (a-b, b-c ⇒ one cluster), singleton preservation, canonical
  * = min id.
  */
class DedupSpec extends SparkSpec {

  private def docs(ids: Long*) = spark.createDataFrame(
    spark.sparkContext.parallelize(ids.map(Row(_)), 2),
    StructType(Seq(StructField("doc_id", LongType))))

  private def pairs(ps: (Long, Long)*) = spark.createDataFrame(
    spark.sparkContext.parallelize(ps.map(p => Row(p._1, p._2)), 2),
    StructType(Seq(StructField("doc_a", LongType),
      StructField("doc_b", LongType))))

  test("chains close transitively; singletons stay; canonical is min id") {
    // components: {1,2,3,4} (a chain), {5,6}, {7} (singleton)
    val out = Dedup.nearDupClusters(
      docs(1, 2, 3, 4, 5, 6, 7),
      "doc_id",
      pairs(1L -> 2L, 2L -> 3L, 3L -> 4L, 5L -> 6L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (5L, 5L, true), (6L, 5L, false),
      (7L, 7L, true)))
  }

  test("a long chain converges within the diameter bound") {
    val n = 12
    val chain = (1 until n).map(i => i.toLong -> (i + 1).toLong)
    val out = Dedup.nearDupClusters(docs((1 to n).map(_.toLong): _*),
      "doc_id", pairs(chain: _*), maxIters = n + 2)
      .collect().map(_.getLong(1)).distinct
    assert(out.toSeq == Seq(1L)) // one component, all labeled min id
  }

  test("an unconverged run fails loudly at the maxIters cap") {
    // diameter 11 chain cannot close in 3 passes; the final-pass check
    // must detect the still-changing labels and trip the require, not
    // return a partially-propagated labeling
    val n = 12
    val chain = (1 until n).map(i => i.toLong -> (i + 1).toLong)
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupClusters(docs((1 to n).map(_.toLong): _*),
        "doc_id", pairs(chain: _*), maxIters = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("pairs reaching ids OUTSIDE docs still propagate to their fixpoint") {
    // ids 2..4 exist only as pair endpoints: they join in as label rows
    // with null prev on their first appearance, which the convergence
    // check must read as CHANGE — filtering nulls would declare an
    // early fixpoint and leave the chain tail unlabeled
    val out = Dedup.nearDupClusters(docs(1), "doc_id",
      pairs(1L -> 2L, 2L -> 3L, 3L -> 4L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("convergence is correct when the first check lands past the fixpoint") {
    // a single edge converges in 1 pass; with uncheckedIters = 5 the
    // first check runs at pass 5 and must still report the fixpoint
    val out = Dedup.nearDupClusters(docs(1, 2, 3), "doc_id",
      pairs(1L -> 2L), maxIters = 8, uncheckedIters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
  }

  private def textDocs(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("cross-corpus pairs: only left×right, equal to the union self-join restricted to cross pairs") {
    // 1≈2 within LEFT (must NOT appear), 3≈11 across (must appear),
    // 12≈13 within RIGHT (must not), 4 and 14 unrelated
    val mk = (s: String) => s + " relleno para alcanzar suficientes tokens"
    val left = textDocs(
      1L -> mk("uno dos tres cuatro cinco seis"),
      2L -> mk("uno dos tres cuatro cinco seis"),
      3L -> mk("alfa beta gamma delta epsilon zeta"),
      4L -> "texto completamente distinto sin pareja en ningun lado aqui")
    val right = textDocs(
      11L -> mk("alfa beta gamma delta epsilon zeta"),
      12L -> mk("rojo verde azul morado amarillo gris"),
      13L -> mk("rojo verde azul morado amarillo gris"),
      14L -> "otro texto aislado que no se parece a nada mas tampoco")
    val cross = Dedup.crossNgramJaccardPairs(left, right, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross == Set(3L -> 11L))
    // property: the cross operator ≡ the self-join over the union,
    // restricted to pairs that straddle the sides (id < 10 vs >= 10
    // encodes the side here, and union ids are distinct)
    val all = Dedup.ngramJaccardPairs(left.unionByName(right),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a < 10) != (b < 10) }
      .map { case (a, b) => if (a < 10) (a, b) else (b, a) }.toSet
    assert(cross == all)
  }
}
