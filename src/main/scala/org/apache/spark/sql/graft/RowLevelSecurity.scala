package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

import scala.collection.concurrent.TrieMap

/** Row-level security: policies are filter predicates injected under the
  * matching relation during analysis — the rebuild of the reference's
  * `CREATE POLICY ... FOR SELECT TO user USING <filter>` surface
  * (reference: SnappyDDLParser.createPolicy:392, analyzer rule
  * SnappySessionState.RowLevelSecurity:422, sql/policy/policies.scala).
  */
object PolicyRegistry {

  /** A policy applies to `users` ("*" = everyone except the owner). */
  case class Policy(name: String, table: String, filterSql: String,
      users: Set[String], owner: String)

  private val policies = TrieMap.empty[String, Policy]
  @volatile var currentUser: String = "default"

  def create(name: String, table: String, filterSql: String,
      users: Set[String] = Set("*"), owner: String = "admin"): Unit =
    policies.put(name.toLowerCase, Policy(name, table.toLowerCase, filterSql, users, owner))

  def drop(name: String): Unit = policies.remove(name.toLowerCase)

  def forTable(table: String): Seq[Policy] =
    policies.values.filter { p =>
      p.table == table.toLowerCase &&
        p.owner != currentUser &&
        (p.users.contains("*") || p.users.contains(currentUser))
    }.toSeq.sortBy(_.name)

  def clear(): Unit = policies.clear()
}

/** Analyzer rule: wrap any relation (matched by its subquery alias) that
  * has active policies in a Filter over the parsed policy predicates.
  * Runs during resolution, so the injected predicate resolves against the
  * relation's own attributes like a hand-written WHERE clause.
  */
case class RowLevelSecurityRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val applied = TreeNodeTag[Boolean]("graft.rls.applied")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case s @ SubqueryAlias(ident, child) if s.getTagValue(applied).isEmpty =>
      val policies = PolicyRegistry.forTable(ident.name)
      if (policies.isEmpty) s
      else {
        val predicate = policies
          .map(p => spark.sessionState.sqlParser.parseExpression(p.filterSql))
          .reduce(org.apache.spark.sql.catalyst.expressions.And.apply)
        val out = SubqueryAlias(ident.name, Filter(predicate, child))
        out.setTagValue(applied, true)
        out
      }
  }
}
