package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** Literal-tokenization parity (the rebuild of the reference's
  * TokenizationTest / TPCHDUnitTest:690-705): the reference tokenizes
  * literals (ParamLiteral) so the same query text with different
  * constants reuses one cached plan. Spark 3.4+ parameterized SQL —
  * `spark.sql(text, args)` — is the stock equivalent: the TEXT parses
  * once to a literal-free parameterized plan, and values bind at
  * analysis. These tests pin the contract the plan cache relies on:
  * determinism across repeats, correctness across different bindings,
  * and a literal-independent optimized plan shape.
  */
class TokenizationSpec extends SparkTestBase {

  private def normalized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case l: Literal => Literal(0L) // erase the bound constants
    }.canonicalized.toString

  test("parameterized query: same args twice → identical result; plan shape literal-free") {
    Tables.registerAll(spark, sf)
    val text = """SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
                 |FROM orders
                 |WHERE o_totalprice < :cap AND o_custkey > :minCust
                 |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

    def run(cap: Double, minCust: Long) =
      spark.sql(text, Map("cap" -> cap, "minCust" -> minCust))

    val r1 = run(100000.0, 10L).collect().toSeq
    val r2 = run(100000.0, 10L).collect().toSeq
    assert(r1 == r2, "same bindings must reproduce identical results")

    val r3 = run(500000.0, 0L).collect().toSeq
    assert(r3 != r1, "different bindings must actually rebind")
    // cross-check one binding against the directly-inlined query
    val direct = spark.sql(
      "SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total FROM orders " +
        "WHERE o_totalprice < 100000.0 AND o_custkey > 10 " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority").collect().toSeq
    assert(r1 == direct)

    // the tokenization property itself: with literals erased, both
    // bindings optimize to the SAME plan — the cache-key invariant the
    // reference's ParamLiteral machinery exists to provide
    val shapeA = normalized(run(100000.0, 10L))
    val shapeB = normalized(run(73000.5, 42L))
    assert(shapeA == shapeB, s"plan shape must not depend on literal values:\n$shapeA\nvs\n$shapeB")
  }

  test("positional parameters and IN-list binding") {
    Tables.registerAll(spark, sf)
    val byFlag = spark.sql(
      "SELECT count(*) FROM lineitem WHERE l_returnflag = ? AND l_quantity > ?",
      Array("R", 10))
    val n = byFlag.head().getLong(0)
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 10).count()
    assert(n == expected)
  }
}
