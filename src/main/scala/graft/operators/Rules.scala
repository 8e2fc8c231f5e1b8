package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Dec

/** Declarative data-quality rule audit (SURVEY.md §2.11) — the
  * "constraint suite" every ingest gate runs before data is allowed
  * into a training mix (the role Deequ/Great-Expectations checks play
  * in production pipelines, re-expressed as plain aggregates): each
  * rule is a named row-local predicate, the audit reports one row per
  * rule with the violation count and rate over ONE scan of the fact.
  *
  * NULL handling is the part naive `WHERE NOT pred` audits get wrong:
  * under ANSI three-valued logic a NULL predicate is neither true nor
  * false, so violations silently vanish from both the keep- and the
  * reject-side of a filter. Here a rule HOLDS only when its predicate
  * is literally true — `coalesce(pred, false)` — so a NULL in the
  * audited column is a violation, which is what a constraint check
  * means by "holds".
  */
object Rules {

  /** One named rule: `holds` must evaluate TRUE for a clean row; NULL
    * (and false) count as violations. */
  final case class Rule(name: String, holds: Column)

  /** Audit row-local rules in a single pass: one aggregate row with
    * (total, violations_1..k) — partial-aggregated map-side, the only
    * shuffle is k+1 counters per partition — exploded back to one row
    * per rule. Scale shape: counters, never rows, cross the wire. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
    val aggs = count(lit(1)).cast("long").as("n_rows") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L))
          .cast("long").as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__v$i").as("n_violations"))
    }
    one.select(col("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("e.rule").as("rule"), col("n_rows"),
        col("e.n_violations").as("n_violations"))
      .withColumn("violation_rate",
        col("n_violations").cast("double") / col("n_rows").cast("double"))
  }

  /** Referential-integrity rule in the same report shape: violations =
    * child rows whose key finds no parent (NULL keys can never match,
    * so they violate — the FK semantics of the audit, not of SQL
    * joins). One pass over the child with the DISTINCT parent keys
    * broadcast — dims broadcast, the fact never shuffles. */
  def refAudit(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame =
    child.select(col(childKey).as("__k"))
      .join(broadcast(parent.select(col(parentKey).as("__k"))
        .where(col("__k").isNotNull).distinct
        .withColumn("__hit", lit(1))), Seq("__k"), "left_outer")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"))
      .withColumn("violation_rate",
        col("n_violations").cast("double") / col("n_rows").cast("double"))

  /** FUNCTIONAL-DEPENDENCY AUDIT — the cross-row constraint the
    * row-local [[audit]] can't express: `lhs → rhs` ("a part has ONE
    * name", "a zip has ONE city") holds iff no lhs value maps to more
    * than one rhs value. Violated determinants are the joinable
    * denormalization-drift report: each output row is one lhs value
    * whose rows disagree, with how many distinct rhs values it spans
    * and how many rows sit under it — the blast radius of fixing it.
    * NULL semantics: a NULL rhs is a DISTINCT assertion (a row that
    * claims "no value" disagrees with a row that claims one), counted
    * via the audit's own distinct fold, not `countDistinct` (which
    * ignores NULL and would pass `{x, NULL}` as clean); NULL lhs rows
    * group together (one determinant, same as SQL GROUP BY).
    *
    * Scale shape: ONE partial-aggregated pass to (lhs, rhs) pairs —
    * the map-side combine collapses duplicate pairs, so the shuffle
    * carries the pair cardinality, not rows — then a second
    * |pairs|-keyed fold to per-determinant stats, filtered to
    * violations. No row ever leaves its partition unaggregated. */
  def fdAudit(df: DataFrame, lhs: String, rhs: String): DataFrame = {
    val pairs = df.groupBy(col(lhs).as("determinant"),
        col(rhs).as("__rhs"))
      .agg(count(lit(1)).as("__rows"))
    pairs.groupBy(col("determinant"))
      .agg(count(lit(1)).as("n_distinct_rhs"),
        sum(col("__rows")).as("n_rows"))
      .where(col("n_distinct_rhs") > 1)
      .orderBy(col("determinant"))
  }

  /** CATALOG STALENESS AUDIT — the dead-SKU / dead-feed report: per
    * dimension group, how many catalog items have EVER appeared in the
    * facts and how many appeared within `horizonDays` of the corpus's
    * LAST activity — anchored to the data's own clock, never
    * wall-clock `now()` (a wall-clock-dependent result can neither
    * hash-verify nor rerun reproducibly — the q85 censoring rule).
    * The classic catalog-health question ("40% of this brand hasn't
    * shipped in a year — prune or investigate") and, corpus-side, the
    * dead-source detector.
    *
    * Recency compares INTEGER day distances (casts to DATE, the q72
    * discipline — interval arithmetic is not engine-portable). Scale
    * shape: ONE partial-aggregable per-key max over the facts, one
    * key-join to the dimension, the global-last anchor as a ONE-ROW
    * aggregate of the per-key maxes broadcast-appended before the
    * rollup (r15 — was an unpartitioned window over the joined
    * catalog frame, which funneled \|items\| rows through one task;
    * the window sweep caught it). */
  def stalenessAudit(dim: DataFrame, dimKey: String, groupCol: String,
      facts: DataFrame, factKey: String, tsCol: Column,
      horizonDays: Int): DataFrame = {
    require(horizonDays >= 0, s"need horizonDays >= 0, got $horizonDays")
    val last = facts.groupBy(col(factKey).as("k"))
      .agg(max(tsCol).as("last_ts"))
    // max over the reduced |keys| frame == max over the joined frame
    // (items without facts carry NULL, which can never be the max)
    val anchor = last.agg(max(col("last_ts")).as("gl"))
    dim.select(col(dimKey).as("k"), col(groupCol).as("g"))
      .join(last, Seq("k"), "left")
      .crossJoin(broadcast(anchor))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("last_ts").isNotNull, 1L).otherwise(0L))
          .as("n_active"),
        sum(when(col("last_ts").isNotNull &&
          datediff(to_date(col("gl")), to_date(col("last_ts")))
            <= horizonDays, 1L).otherwise(0L)).as("n_recent"))
      .select(col("g").as(groupCol), col("n_items"), col("n_active"),
        col("n_recent"),
        ((col("n_items") - col("n_recent")).cast("double") /
          col("n_items").cast("double")).as("stale_rate"))
      .orderBy(col(groupCol))
  }

  /** FACT RECONCILIATION AUDIT — does the header agree with its
    * detail rows: per parent, the stored rollup value vs the exact
    * decimal sum of its detail lines, reported as the `topK` WORST
    * ABSOLUTE discrepancies `abs(diff) DESC` (ties pinned by key;
    * `rel_fp` is carried as a readout column, not the sort key — a
    * $0.01 drift on a $1M invoice matters less to the closer than a
    * $500 drift on a $600 one) — the classic
    * header-vs-lines closing check (invoice total vs line items,
    * order total vs lineitems), and the first thing an auditor asks
    * of a denormalized store. Parents with NO detail rows surface
    * with NULL detail_total (a vanished detail set is the worst
    * discrepancy of all, not a skip).
    *
    * Exactness: both sides fold as DECIMAL(12,2) ([[graft.engine.Dec]]);
    * the diff is exact decimal; the relative magnitude is the
    * fixed-point `|diff|·2²⁰ div |parent|` (q97's integral division)
    * so the ranking never touches IEEE. Scale shape: ONE
    * partial-aggregable detail rollup, a parent-keyed left join, and
    * a TakeOrdered top-k — no window over the parent space. */
  def factReconciliation(parent: DataFrame, parentKey: String,
      parentValue: Column, detail: DataFrame, detailKey: String,
      detailValue: Column, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val p = parent.select(col(parentKey).as("key"),
      Dec.d2(parentValue).as("pv"))
    val d = detail.groupBy(col(detailKey).as("key"))
      .agg(sum(Dec.d2(detailValue)).as("dv"))
    p.join(d, Seq("key"), "left")
      .withColumn("diff", col("pv") - coalesce(col("dv"),
        lit(0).cast("decimal(12,2)")))
      .where(col("diff") =!= 0 || col("dv").isNull)
      // the fixed point divides INTEGER CENTS: decimal // on either
      // engine rounds the intermediate quotient (DuckDB) or the
      // precision-loss product (Spark) — pure int64 arithmetic is the
      // only encoding both replay exactly
      .withColumn("rel_fp",
        when(col("pv") =!= 0, expr(
          "(CAST(abs(diff) * 100 AS BIGINT) * 1048576) " +
            "div CAST(abs(pv) * 100 AS BIGINT)")))
      .orderBy(abs(col("diff")).desc, col("key"))
      .limit(topK)
      .select(col("key"),
        Dec.outD(col("pv")).as("parent_value"),
        Dec.outD(col("dv")).as("detail_total"),
        Dec.outD(col("diff")).as("diff"), col("rel_fp"))
  }
}
