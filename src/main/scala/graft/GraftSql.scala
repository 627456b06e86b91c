package graft

import org.apache.spark.sql.DataFrame

import scala.util.matching.Regex

/** SQL front-end for GraftSession.sql. The Snappy STATEMENT surface
  * (PUT INTO, UPDATE/DELETE on managed tables, CREATE POLICY, CREATE
  * SAMPLE TABLE, CREATE TABLE USING column AS ...) is handled by the
  * session parser installed via GraftExtensions
  * ([[org.apache.spark.sql.graft.parser.GraftSqlParser]]) — so it also
  * works through plain `spark.sql`. What remains here is the `WITH
  * ERROR` QUERY suffix: its semantics (sample lookup, error-bound
  * enforcement, BEHAVIOR re-routing) are execution-time decisions against
  * this session's registered samples, exactly like the reference routes
  * HAC queries in SnappySession.sql.
  */
object GraftSql {

  private val withError: Regex =
    """(?is)(.*\S)\s+WITH\s+ERROR\s+([0-9.]+)(?:\s+CONFIDENCE\s+([0-9.]+))?(?:\s+BEHAVIOR\s+'([a-z_]+)')?\s*""".r

  def sql(g: GraftSession, text: String): DataFrame = {
    val spark = g.spark
    text match {
      // `SELECT ... WITH ERROR f [CONFIDENCE c] [BEHAVIOR 'b']` —
      // reference AQP SQL surface (docs/sde/hac_contracts.md): substitute
      // the registered sample table, HT-weight the aggregates, expand
      // error result functions, enforce the bound per BEHAVIOR
      // (SampleRewrite).
      case withError(body, err, conf, behavior) =>
        val params = org.apache.spark.sql.graft.SampleRewrite.AqpParams(
          err.toDouble,
          Option(conf).map(_.toDouble).getOrElse(0.95),
          Option(behavior).map(_.toLowerCase).getOrElse("strict"))
        require(Set("strict", "run_on_full_table", "partial_run_on_base_table",
          "local_omit", "do_nothing")(params.behavior),
          s"WITH ERROR BEHAVIOR '${params.behavior}' not supported (strict | " +
            "run_on_full_table | partial_run_on_base_table | local_omit | do_nothing)")
        g.samples.collectFirst {
          case (base, candidates)
              if candidates.nonEmpty && s"(?is).*\\b$base\\b.*".r.matches(body) =>
            val sample = GraftSql.selectSample(spark, body, candidates)
            org.apache.spark.sql.graft.SampleRewrite.run(spark, body, base, sample, params)
        }.getOrElse(spark.sql(body))

      case _ => spark.sql(text)
    }
  }

  /** Pick the registered sample whose QCS best matches the query's
    * grouping columns (reference: HAC queries route to the most
    * appropriate sample table). Scoring: a sample whose QCS is a SUBSET
    * of the grouping wins outright (stratification ⊆ grouping ⇒ HT
    * counts are exact per group), then largest overlap, then
    * registration order. With one candidate there is nothing to choose.
    */
  def selectSample(spark: org.apache.spark.sql.SparkSession, sql: String,
      candidates: Vector[GraftSession.SampleInfo]): String = {
    if (candidates.size == 1) return candidates.head.table
    val grouping: Set[String] =
      try {
        val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val plan = classic.sessionState.sqlParser.parsePlan(sql)
        val cols = scala.collection.mutable.Set.empty[String]
        plan.foreach {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
            a.groupingExpressions.foreach {
              case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
                cols += u.nameParts.last.toLowerCase
              case _ =>
            }
          case _ =>
        }
        cols.toSet
      } catch { case _: Exception => Set.empty }
    candidates.zipWithIndex.maxBy { case (c, idx) =>
      val overlap = c.qcs.count(grouping)
      val subsetBonus = if (c.qcs.nonEmpty && c.qcs.forall(grouping)) 1000 else 0
      // negated index: earliest registration wins ties
      (subsetBonus + overlap, -idx)
    }._1.table
  }
}
