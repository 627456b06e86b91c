package org.apache.spark.sql.graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Answer whole-table `approx_count_distinct` from the store's per-batch
  * HLL digests instead of scanning the column — the planner face of the
  * `sketch_columns` stats-row fusion (the reference's AQP tier routes
  * approximate queries to pre-built summaries the same way; here the
  * summary lives inside the batch stats and the route is one optimizer
  * rewrite to a [[LocalRelation]]).
  *
  * The rewrite fires only when it is SEMANTICS-PRESERVING under the
  * function's own contract (an estimate within `relativeSD`):
  *  - grouping-free Aggregate whose every output is a bare
  *    `approx_count_distinct(col)` (no FILTER clause, no DISTINCT
  *    modifier) over a column in the table's `sketch_columns`;
  *  - the child is the bare scan relation (optionally a column-pruning
  *    Project of plain attributes) — any Filter means the question is
  *    not "the whole table" and the scan must run;
  *  - the snapshot holds NO deletes and NO update deltas: sealed digests
  *    cannot subtract, so on a mutated table the union is an upper bound
  *    rather than an estimate — the rewrite declines and the scan path
  *    answers exactly from live rows (compact() restores eligibility);
  *  - every batch carries a digest (a table that enabled the option
  *    mid-life declines until compact);
  *  - the requested `relativeSD` is no tighter than the digest's own
  *    standard error (1.04 / sqrt(2^lgK) ≈ 1.63% at lgK 12).
  *
  * 100 TB shape: the answer is a driver-side union of O(batches) ~4 KB
  * digests already resident in table metadata — no job, no scan, no
  * executor involvement at all.
  */
case class StatsApproxDistinctRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val DigestRse = 1.04 / math.sqrt(1 << GraftColumnStore.DistinctSketch.LgK)

  private def enabled: Boolean =
    spark.conf.get("spark.sql.graft.statsApproxDistinct", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan transformUp {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        rewrite(agg, aggExprs, child).getOrElse(agg)
    }
  }

  private def scanTable(child: LogicalPlan): Option[GraftTable] = child match {
    case r: DataSourceV2Relation => r.table match {
      case gt: GraftTable => Some(gt)
      case _ => None
    }
    case Project(projList, r: DataSourceV2Relation)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      scanTable(r)
    case _ => None
  }

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val gt = scanTable(child).getOrElse(return None)
    if (gt.sketchColumns.isEmpty) return None
    val cols = aggExprs.map {
      case Alias(AggregateExpression(
          HyperLogLogPlusPlus(attr: AttributeReference, rsd, _, _),
          Complete, false, None, _), _)
          if gt.sketchColumns.contains(attr.name) && rsd >= DigestRse =>
        attr.name
      case _ => return None
    }
    val snap = GraftColumnStore.get(gt.storeName).getOrElse(return None).snapshot
    // digests cannot subtract: any delete/update means the union is an
    // upper bound, not an estimate — let the scan answer exactly
    if (snap.deletes.nonEmpty || snap.updates.nonEmpty) return None
    // liveRefs, not refs: an EXPIRE table's hidden batches must not
    // resurface through the metadata answer (one TTL cut for all cols)
    val refs = snap.liveRefs
    val estimates = cols.map { c =>
      val idx = snap.schema.fieldIndex(c)
      val digests = refs.map(_.stats(idx).distinctSketch)
      if (digests.exists(_ == null)) return None // pre-option batches
      GraftColumnStore.DistinctSketch.estimate(digests.iterator)
    }
    Some(LocalRelation(agg.output,
      Seq(InternalRow.fromSeq(estimates)), isStreaming = false))
  }
}
