package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench harness's data tables against registry drift: a
  * floor keyed to a renamed or deleted query silently stops gating
  * (time floors fall back to the default; byte floors simply stop
  * applying), which is exactly the failure mode a floors table cannot
  * be allowed to have. Pure-map checks — no SparkSession needed. */
class BenchSpec extends AnyFunSuite {

  private lazy val names = SparkEntry.registry.map(_.name).toSet

  test("every time floor keys a live registry query, positively") {
    val stale = Bench.floors.keySet -- names
    assert(stale.isEmpty, s"floors keyed to absent queries: $stale")
    assert(Bench.floors.values.forall(_ > 0))
  }

  test("byteFloors cover the ENTIRE registry (the q9 lesson: the " +
    "smallest floors catch lost broadcasts), all non-negative") {
    val stale = Bench.byteFloors.keySet -- names
    assert(stale.isEmpty, s"byteFloors keyed to absent queries: $stale")
    val missing = names -- Bench.byteFloors.keySet
    assert(missing.isEmpty,
      s"queries without a byte floor (re-seed from the canonical): $missing")
    assert(Bench.byteFloors.values.forall(_ >= 0))
  }

  test("registry names are unique and every query has an oracle or " +
    "is a known rows-only exception") {
    val dupes = SparkEntry.registry.groupBy(_.name).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.keys}")
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"queries without a DuckDB oracle (driver downgrades them to a " +
        s"weaker rows-only check): $noOracle")
  }
}
