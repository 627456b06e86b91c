package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, window}

import scala.util.matching.Regex

/** SQL front-end for the Snappy-specific statement surface
  * (reference grammar: SnappyParser.put:1173, update:1177, delete:1198,
  * SnappyDDLParser.createPolicy:392, createTable:301). Statements that
  * stock Spark SQL already understands pass straight through to
  * `spark.sql`; the additive statements are dispatched to the
  * [[GraftSession]] APIs.
  *
  * This is a deliberately small dispatcher over documented statement
  * shapes, not a full grammar — the expression language inside each
  * statement is Spark's own (`expr(...)` / subordinate `spark.sql`), so
  * anything Catalyst can parse works in WHERE/SET/SELECT position.
  */
object GraftSql {

  private val putInto: Regex =
    """(?is)\s*PUT\s+INTO\s+(\w+)\s+(SELECT\b.*|TABLE\s+\w+.*)""".r
  private val deleteFrom: Regex =
    """(?is)\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.*)""".r
  private val updateStmt: Regex =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.*?)\s+WHERE\s+(.*)""".r
  private val createPolicy: Regex =
    """(?is)\s*CREATE\s+POLICY\s+(\w+)\s+ON\s+(\w+)\s+TO\s+(\S+)\s+USING\s+(.*)""".r
  private val createTableAs: Regex =
    """(?is)\s*CREATE\s+TABLE\s+(\w+)\s+USING\s+(?:column|row)(?:\s+OPTIONS\s*\(([^)]*)\))?\s+AS\s+(SELECT\b.*)""".r
  private val dropPolicy: Regex =
    """(?is)\s*DROP\s+POLICY\s+(\w+)\s*""".r
  private val withError: Regex =
    """(?is)(.*\S)\s+WITH\s+ERROR\s+([0-9.]+)(?:\s+CONFIDENCE\s+([0-9.]+))?(?:\s+BEHAVIOR\s+'([a-z_]+)')?\s*""".r

  /** Parse OPTIONS (partition_by 'a,b', buckets '8', key_columns 'k'). */
  private def parseOptions(s: String): Map[String, String] =
    if (s == null) Map.empty
    else """(?i)(\w+)\s+'([^']*)'""".r.findAllMatchIn(s)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap

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
        require(Set("strict", "run_on_full_table", "do_nothing")(params.behavior),
          s"WITH ERROR BEHAVIOR '${params.behavior}' not supported " +
            "(strict | run_on_full_table | do_nothing)")
        g.samples.collectFirst {
          case (base, sample)
              if s"(?is).*\\b$base\\b.*".r.matches(body) =>
            org.apache.spark.sql.graft.SampleRewrite.run(spark, body, base, sample, params)
        }.getOrElse(spark.sql(body))

      case putInto(table, source) =>
        val src =
          if (source.trim.toUpperCase.startsWith("TABLE"))
            spark.table(source.trim.split("\\s+")(1))
          else spark.sql(source)
        g.putInto(table, src)

      case updateStmt(table, setClause, where) =>
        val assignments = setClause.split(",").toSeq.map { a =>
          val Array(k, v) = a.split("=", 2)
          k.trim -> expr(v.trim)
        }
        g.update(table, expr(where), assignments: _*)

      case deleteFrom(table, where) if g.isManaged(table) =>
        g.delete(table, expr(where))

      case createPolicy(name, table, users, filter) =>
        g.createPolicy(name, table, filter.trim.stripPrefix("(").stripSuffix(")"),
          users.split(",").map(_.trim).toSet)
        spark.emptyDataFrame

      case dropPolicy(name) =>
        g.dropPolicy(name)
        spark.emptyDataFrame

      case createTableAs(name, opts, select) =>
        val o = parseOptions(opts)
        g.createTable(name, spark.sql(select),
          keyColumns = o.get("key_columns").toSeq.flatMap(_.split(",").map(_.trim)),
          partitionBy = o.get("partition_by").toSeq.flatMap(_.split(",").map(_.trim)),
          buckets = o.getOrElse("buckets", "32").toInt)

      case _ => spark.sql(text)
    }
  }
}
