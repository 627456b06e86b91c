package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.{CmsTopK, VectorExpressions => VE}

/** Insurance for sessions built WITHOUT `spark.sql.extensions=
  * graft.GraftExtensions` (e.g. a host harness session): registers the
  * SQL functions into the session's function registry on demand. The
  * RLS analyzer rule cannot be injected post-hoc — callers that depend
  * on policies must verify they applied (see SecurityQueries).
  */
object Compat {

  def ensureFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_round"))) {
      reg.createOrReplaceTempFunction("vec_dot",
        (args: Seq[Expression]) => VE.VectorDot(args(0), args(1)), "scala_udf")
      reg.createOrReplaceTempFunction("vec_cosine",
        (args: Seq[Expression]) => VE.VectorCosine(args(0), args(1)), "scala_udf")
      reg.createOrReplaceTempFunction("vec_norm",
        (args: Seq[Expression]) => VE.VectorNorm(args(0)), "scala_udf")
      reg.createOrReplaceTempFunction("approx_topk",
        (args: Seq[Expression]) => CmsTopK(args(0),
          args(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
        "scala_udf")
      reg.createOrReplaceTempFunction("graft_round",
        (args: Seq[Expression]) => VE.graftRoundExpr(args(0),
          args(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    }
  }
}
