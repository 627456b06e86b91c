package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CmsTopK, RowLevelSecurityRule, VectorExpressions => VE}

/** Session extensions — the library's Catalyst integration point
  * (the Spark-4 equivalent of the reference's SnappySessionState wiring,
  * SURVEY.md §3.1): row-level-security analyzer rule + SQL registration
  * of the custom expressions, so `spark.sql("SELECT vec_cosine(a,b) ...")`
  * works next to the Column API.
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions) or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(session => RowLevelSecurityRule(session))

    // Snappy statement surface (PUT INTO, UPDATE/DELETE on managed
    // tables, CREATE POLICY, CREATE SAMPLE TABLE, CREATE TABLE USING
    // column AS ...) — a combinator grammar delegating embedded
    // expressions/queries to the stock parser.
    e.injectParser((session, delegate) =>
      new org.apache.spark.sql.graft.parser.GraftSqlParser(session, delegate))

    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of float vectors"),
      (args: Seq[Expression]) => VE.VectorDot(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of float vectors"),
      (args: Seq[Expression]) => VE.VectorCosine(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a float vector"),
      (args: Seq[Expression]) => VE.VectorNorm(args(0))))
    e.injectFunction((FunctionIdentifier("approx_topk"),
      info("approx_topk", "approx_topk(key, k) - CMS top-k keys by frequency"),
      (args: Seq[Expression]) => CmsTopK(args(0),
        args(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))

    // DuckDB-parity rounding as a SQL function (see graft.dround scaladoc)
    e.injectFunction((FunctionIdentifier("graft_round"),
      info("graft_round", "graft_round(x, s) - round half-away-from-zero on the binary double"),
      (args: Seq[Expression]) => VE.graftRoundExpr(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))

    // bootstrap error estimation (reference NumBootStrapTrials contract,
    // Literals.scala:259-303) — composable surface: bootstrap_trials
    // yields the raw per-trial estimates so non-linear estimators get CIs
    // closed-form can't provide; bootstrap_ci turns any ARRAY<DOUBLE> of
    // trials into a percentile interval
    e.injectFunction((FunctionIdentifier("bootstrap_trials"),
      info("bootstrap_trials",
        "bootstrap_trials(x, w, mode, trials, seed[, rowKey]) - poissonized-bootstrap trial estimates"),
      (args: Seq[Expression]) =>
        (if (args.length >= 6)
          org.apache.spark.sql.graft.BootstrapTrials(
            args(0), args(1), args(2), args(3), args(4), args(5))
        else
          org.apache.spark.sql.graft.BootstrapTrials(
            args(0), args(1), args(2), args(3), args(4))).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("bootstrap_ci"),
      info("bootstrap_ci",
        "bootstrap_ci(trials, confidence) - percentile CI struct(abs_err, lo, hi)"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.graft.BootstrapCI(args(0), args(1))))

    // reference io/snappydata/functions.scala:46-53: dsid() (executor
    // member id — here the partition id, the Spark-native analog) and
    // current_schema() (alias of current_database)
    e.injectFunction((FunctionIdentifier("dsid"),
      info("dsid", "dsid() - id of the executor partition computing the row"),
      (_: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.SparkPartitionID()))
    e.injectFunction((FunctionIdentifier("current_schema"),
      info("current_schema", "current_schema() - current database name"),
      (_: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.CurrentDatabase()))
  }
}
