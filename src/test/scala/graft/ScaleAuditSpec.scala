package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.LocalTableScanExec

/** Plan lint over EVERY driver-contract query: the 100 TB scale audit as
  * an executable spec instead of a per-round manual read.
  *
  * Rules:
  *  - no CartesianProductExec anywhere (an all-pairs product of two
  *    SF-scaling inputs can never ship);
  *  - BroadcastNestedLoopJoinExec only when its broadcast side is
  *    PROVABLY tiny: a grouping-free (global) aggregate — ≤ 1 row by
  *    construction — or a literal LocalTableScan of bounded size. Those
  *    are the "join the single-row total/threshold onto every row"
  *    shapes (e.g. market-share denominators, AQP exact-side checks),
  *    which stay O(1) broadcast bytes at any SF. Anything else —
  *    e.g. a non-equi join against an SF-scaling side that Spark can
  *    only plan as BNLJ — fails the suite.
  *
  * The queries are built (and their ingest side effects run) at
  * sf0.001; the lint walks the pre-execution physical plan including
  * subqueries, so it sees the same join strategy decisions the static
  * planner would make at scale before AQE's runtime refinements.
  */
class ScaleAuditSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  /** A broadcast side that is ≤ 1 row (global aggregate) or a bounded
    * literal table — the only sides BNLJ is allowed to carry.
    */
  private def provablyTiny(side: SparkPlan): Boolean =
    collectWithSubqueries(side) {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
      case l: LocalTableScanExec if l.rows.lengthCompare(100) <= 0 => true
    }.nonEmpty

  /** ANN top-k queries broadcast the QUERY-VECTOR BATCH against the
    * corpus (the canonical distributed ANN shape: the corpus scan
    * parallelizes, per-partition top-k partials flow to a k-row merge).
    * The broadcast side is bounded by the API contract — a batch of
    * query vectors — not by SF, but that bound lives in the query-id
    * predicate, which the plan can't prove tiny. Whitelisted BY NAME so
    * any NEW query that introduces a BNLJ still fails the audit.
    * q_hard_negatives_approx adds the other canonical IVF broadcast:
    * every probe crossJoins the CENTROID table (nlist rows — index
    * metadata, ~sqrt(corpus), never the corpus itself) plus the
    * recall-claim's bounded query batch.
    */
  private val annQueryBatchBroadcast: Set[String] =
    Set("q_ann_bruteforce", "q_ann_store", "q_ann_lsh", "q_ann_ivf",
      "q_ann_quantized", "q_ann_pq", "q_ann_ivfpq", "q_hard_negatives_approx")

  test("no query plans a cartesian product or an unbounded BNLJ") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.allDefs.foreach { d =>
      try {
        val plan = d.fn(spark, sf).queryExecution.executedPlan
        val cartesian = collectWithSubqueries(plan) {
          case c: CartesianProductExec => c
        }
        if (cartesian.nonEmpty) offenders += s"${d.name}: CartesianProduct"
        if (!annQueryBatchBroadcast.contains(d.name)) {
          collectWithSubqueries(plan) {
            case j: BroadcastNestedLoopJoinExec => j
          }.foreach { j =>
            val broadcastSide = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
              case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
            }
            if (!provablyTiny(broadcastSide))
              offenders += s"${d.name}: BNLJ with non-tiny broadcast side"
          }
        }
      } catch {
        case e: Throwable =>
          offenders += s"${d.name}: audit could not build plan (${e.getMessage})"
      }
    }
    assert(offenders.isEmpty, s"scale-audit offenders:\n  ${offenders.mkString("\n  ")}")
  }
}
