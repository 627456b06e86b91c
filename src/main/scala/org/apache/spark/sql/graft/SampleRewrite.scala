package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, Literal, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.types.LongType

/** AQP sample-substitution rewrite — the reference's `WITH ERROR` hook
  * (reference: closed-source `sampleSnappyCase`, SnappySessionState.scala:69,
  * SURVEY.md §4 "the one genuinely custom optimizer piece"; SQL contract
  * docs/sde/hac_contracts.md:38-74).
  *
  * Given a parsed-but-unresolved plan over a base table that has a
  * registered stratified sample, rewrite:
  *  - `UnresolvedRelation(base)` → `UnresolvedRelation(sample)` (the
  *    sample carries `_weight` = inverse inclusion probability);
  *  - inside every Aggregate:
  *      count(*)/count(1) → CAST(round(sum(_weight))) AS BIGINT  (HT count)
  *      sum(x)            → sum(x * _weight)                      (HT total)
  *      avg(x)            → sum(x * _weight) / sum(_weight)       (HT mean)
  * Operating on the UNRESOLVED tree keeps this a pure syntactic rule —
  * name resolution, type coercion and optimization all happen in the
  * stock analyzer afterwards.
  */
object SampleRewrite {

  private def weight: Expression = UnresolvedAttribute("_weight")

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  private def rewriteAgg(e: Expression): Expression = e match {
    case UnresolvedFunction(Seq(n), args, false, _, _, _, _)
        if n.equalsIgnoreCase("count") &&
          (args.isEmpty || args == Seq(Literal(1)) ||
            args.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedStar])) =>
      Cast(fn("round", fn("sum", weight)), LongType)
    case UnresolvedFunction(Seq(n), Seq(arg), false, _, _, _, _)
        if n.equalsIgnoreCase("sum") =>
      fn("sum", Multiply(arg, weight))
    case UnresolvedFunction(Seq(n), Seq(arg), false, _, _, _, _)
        if n.equalsIgnoreCase("avg") || n.equalsIgnoreCase("mean") =>
      Divide(fn("sum", Multiply(arg, weight)), fn("sum", weight))
    case other => other.mapChildren(rewriteAgg)
  }

  /** Rewrite `plan` to run on `sampleTable` wherever `baseTable` appears. */
  def rewrite(plan: LogicalPlan, baseTable: String, sampleTable: String): LogicalPlan =
    plan.transformUp {
      case r: UnresolvedRelation
          if r.multipartIdentifier.map(_.toLowerCase) == Seq(baseTable.toLowerCase) =>
        UnresolvedRelation(Seq(sampleTable))
      case a: Aggregate =>
        a.copy(aggregateExpressions = a.aggregateExpressions.map(ne =>
          rewriteAgg(ne).asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
    }

  /** Parse `sql` (already stripped of the WITH ERROR suffix), substitute
    * the sample, and return the rewritten DataFrame.
    */
  def run(spark: SparkSession, sql: String, baseTable: String, sampleTable: String): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val parsed = classic.sessionState.sqlParser.parsePlan(sql)
    Dataset.ofRows(classic, rewrite(parsed, baseTable, sampleTable))
  }
}
