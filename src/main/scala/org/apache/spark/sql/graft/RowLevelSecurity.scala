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

  /** Every registered policy regardless of the current user — the
    * metadata surface (`sys.policies`), not the enforcement path
    * ([[forTable]] stays user-filtered).
    */
  def all: Seq[Policy] = policies.values.toSeq.sortBy(_.name)

  def forTable(table: String): Seq[Policy] =
    policies.values.filter { p =>
      p.table == table.toLowerCase &&
        p.owner != currentUser &&
        (p.users.contains("*") || p.users.contains(currentUser))
    }.toSeq.sortBy(_.name)

  def clear(): Unit = policies.clear()

  /** Internal-materialization bypass: session plumbing (e.g.
    * `GraftSession.createTable`'s catalog read of the table it just
    * wrote) analyzes plans that must NOT bake the current user's
    * policies/grants into a session-shared DataFrame — enforcement
    * belongs at each user QUERY's analysis, which re-runs the rules.
    * Thread-local because Dataset analysis runs synchronously on the
    * calling thread.
    */
  private val bypass = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }
  def withBypass[T](f: => T): T = {
    bypass.set(true)
    try f finally bypass.set(false)
  }
  private[graft] def bypassed: Boolean = bypass.get()
}

/** True when a SubqueryAlias child is an actual RELATION (base table,
  * DSv2 table, or registered view) rather than an arbitrary subplan — a
  * user-written `region AS nation` alias or a CTE named like a governed
  * table wraps a Project/Aggregate/other alias, NOT a relation, and must
  * not trip table-name-keyed security rules.
  */
private[graft] object RelationAlias {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.View
  import org.apache.spark.sql.execution.datasources.LogicalRelation
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  def isRelation(child: LogicalPlan): Boolean = child match {
    case _: LogicalRelation | _: DataSourceV2Relation | _: View |
         _: UnresolvedRelation => true
    // an RLS-injected policy Filter still aliases the relation itself —
    // the grant check must keep seeing through it
    case Filter(_, grandchild) => isRelation(grandchild)
    case _ => false
  }
}

/** Analyzer rule: wrap any RELATION (matched by its subquery alias) that
  * has active policies in a Filter over the parsed policy predicates.
  * Runs during resolution, so the injected predicate resolves against the
  * relation's own attributes like a hand-written WHERE clause. Aliases
  * over non-relations (CTEs, `x AS governed_name`) are ignored — the
  * name match applies only where the name IS the table.
  */
case class RowLevelSecurityRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val applied = TreeNodeTag[Boolean]("graft.rls.applied")

  /** Resolve a parsed policy predicate against `child`'s output by hand
    * (attributes by resolver-name, functions via the session registry).
    * Needed INSIDE `View` nodes: a View stores its ANALYZED child and its
    * copy() re-asserts resolution, so the usual trick of injecting the
    * unresolved parse and letting the analyzer finish it crashes there.
    * Returns None when something cannot be resolved — the caller must
    * then FAIL CLOSED, never skip the policy.
    */
  private def resolveAgainst(child: LogicalPlan,
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    val resolver = spark.sessionState.conf.resolver
    var ok = true
    val out = e.transformUp {
      case u: UnresolvedAttribute =>
        child.output.find(a => resolver(a.name, u.nameParts.last)) match {
          case Some(a) => a
          case None => ok = false; u
        }
      case f: UnresolvedFunction =>
        try spark.sessionState.catalog.lookupFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(
            f.nameParts.last, f.nameParts.dropRight(1).lastOption),
          f.arguments)
        catch { case _: Exception => ok = false; f }
    }
    if (ok && out.resolved) Some(out) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (PolicyRegistry.bypassed) return plan
    // Subtrees under a View need the pre-resolved injection (see
    // resolveAgainst); everywhere else the plain parse is injected and
    // the analyzer resolves it like a hand-written WHERE.
    val protectedNodes = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case v: org.apache.spark.sql.catalyst.plans.logical.View =>
        v.child.foreach(protectedNodes.add)
      case _ => ()
    }
    plan.transformUp {
      case s @ SubqueryAlias(ident, child) if s.getTagValue(applied).isEmpty &&
          RelationAlias.isRelation(child) =>
        val policies = PolicyRegistry.forTable(ident.name)
        if (policies.isEmpty) s
        else {
          val parsed = policies
            .map(p => spark.sessionState.sqlParser.parseExpression(p.filterSql))
            .reduce(org.apache.spark.sql.catalyst.expressions.And.apply)
          val predicate =
            if (!protectedNodes.contains(s)) parsed
            else resolveAgainst(child, parsed).getOrElse(
              // fail CLOSED: a governed relation inside a view whose
              // policy cannot be applied must not silently return rows
              throw new org.apache.spark.SparkException(
                s"graft row-level security: cannot resolve policy " +
                  s"predicate for table '${ident.name}' inside a view; " +
                  "query the table directly or drop/recreate the view"))
          val out = SubqueryAlias(ident.name, Filter(predicate, child))
          out.setTagValue(applied, true)
          out
        }
    }
  }
}

/** Table-level privileges: `GRANT/REVOKE <priv> ON t TO/FROM user` —
  * the rebuild of the reference's SQL-routed authorization surface
  * (reference: SnappyDDLParser.grantRevokeExternal:837, which forwards
  * grant/revoke to the store's SQL auth). A table becomes RESTRICTED on
  * its first GRANT: from then on only the owner and granted users pass
  * the check; REVOKE removes privileges, and dropping the last grant
  * keeps the table restricted (matching SQL-auth semantics — revoking
  * everyone does not re-open the table).
  *
  * Enforcement is at the SQL/analysis surface like the reference's
  * (SELECT via [[GrantCheckRule]] during resolution; mutation statements
  * check in their commands). `PolicyRegistry.currentUser` doubles as the
  * session identity, so RLS and grants agree on who is asking.
  */
object GrantRegistry {

  private val grants = TrieMap.empty[(String, String), Set[String]]
  private val restricted = TrieMap.empty[String, String] // table -> owner

  /** GRANT/REVOKE are themselves privileged: once a table is restricted,
    * only its owner may change its grants (SQL-auth semantics — without
    * this, any user could grant themselves in, or seize an open table by
    * being first to GRANT; the first GRANT still restricts and records
    * the REQUESTER as owner, which is the table-creating session in the
    * SQL flow).
    */
  private def requireOwner(t: String, requester: String): Unit =
    restricted.get(t).foreach { owner =>
      if (owner.toLowerCase != requester.toLowerCase)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3105",
          messageParameters = Map("message" ->
            s"only owner '$owner' may change grants on table '$t' (requester '$requester')"))
    }

  def grant(table: String, users: Seq[String], privs: Seq[String],
      requester: String): Unit = {
    val t = table.toLowerCase
    requireOwner(t, requester)
    restricted.putIfAbsent(t, requester)
    val ps = privs.map(_.toUpperCase).toSet
    users.foreach { u =>
      grants.updateWith((t, u.toLowerCase)) {
        case Some(existing) => Some(existing ++ ps)
        case None => Some(ps)
      }
    }
  }

  def revoke(table: String, users: Seq[String], privs: Seq[String],
      requester: String): Unit = {
    val t = table.toLowerCase
    requireOwner(t, requester)
    val ps = privs.map(_.toUpperCase).toSet
    users.foreach { u =>
      grants.updateWith((t, u.toLowerCase)) {
        case Some(existing) =>
          val left = if (ps.contains("ALL")) Set.empty[String] else existing -- ps
          if (left.isEmpty) None else Some(left)
        case None => None
      }
    }
  }

  /** True when `user` may perform `priv` on `table` (tables with no
    * grants ever issued are unrestricted).
    */
  def allowed(table: String, user: String, priv: String): Boolean = {
    val t = table.toLowerCase
    restricted.get(t) match {
      case None => true
      case Some(owner) =>
        val u = user.toLowerCase
        u == owner.toLowerCase || {
          val ps = grants.getOrElse((t, u), Set.empty)
          ps.contains("ALL") || ps.contains(priv.toUpperCase)
        }
    }
  }

  def check(table: String, priv: String): Unit = {
    val user = PolicyRegistry.currentUser
    if (!allowed(table, user, priv))
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3105",
        messageParameters = Map("message" ->
          s"user '$user' lacks $priv permission on table '$table'"))
  }

  def clear(): Unit = { grants.clear(); restricted.clear() }

  def isEmpty: Boolean = restricted.isEmpty
}

/** Analyzer rule enforcing SELECT grants: any restricted RELATION read by
  * a non-privileged user fails analysis (mutation privileges are checked
  * in the Graft DML commands, which is where those statements route).
  * Only aliases directly over relations are checked — a CTE or
  * `x AS restricted_name` alias shares the name, not the data
  * ([[RelationAlias]]).
  */
case class GrantCheckRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (GrantRegistry.isEmpty || PolicyRegistry.bypassed) return plan
    plan.foreachUp {
      case SubqueryAlias(ident, child) if RelationAlias.isRelation(child) =>
        GrantRegistry.check(ident.name, "SELECT")
      case _ =>
    }
    plan
  }
}
