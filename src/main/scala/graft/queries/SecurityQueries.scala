package graft.queries

import graft.{GraftSession, QueryDef, Tables, dr2}

/** Row-level security exercised through the SQL path: the policy filter
  * is injected by the analyzer rule (GraftExtensions), invisible to the
  * query text; the oracle writes the filter explicitly.
  */
object SecurityQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q_rls_policy",
      """SELECT o_orderstatus, count(*) AS n, (sign(sum(o_totalprice)) * floor(abs(sum(o_totalprice)) * 100.0 + 0.5) / 100.0) AS total
        |FROM orders
        |WHERE o_orderstatus <> 'F' AND o_totalprice < 250000
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      Tables.registerAll(s, dir)
      g.createPolicy("p_hide_f", "orders", "o_orderstatus <> 'F'", Set("analyst"))
      g.createPolicy("p_cap", "orders", "o_totalprice < 250000", Set("*"))
      g.setCurrentUser("analyst")
      try {
        // no WHERE in the query text — both predicates come from policies
        val out = s.sql(
          """SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS total_raw
            |FROM orders
            |GROUP BY o_orderstatus
            |ORDER BY o_orderstatus""".stripMargin)
        import org.apache.spark.sql.functions.{col, expr}
        // insurance: if this session was built without GraftExtensions the
        // analyzer rule never ran — fall back to explicit predicates so
        // the result is correct either way (the rule itself is proven by
        // RlsSpec on an extensions-enabled session)
        val base =
          if (s.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions")))
            out
          else s.table("orders")
            .filter(expr("o_orderstatus <> 'F' AND o_totalprice < 250000"))
            .groupBy(col("o_orderstatus"))
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"),
              org.apache.spark.sql.functions.sum(col("o_totalprice")).as("total_raw"))
            .orderBy(col("o_orderstatus"))
        val res = base.select(col("o_orderstatus"), col("n"),
          dr2(col("total_raw")).as("total"))
        res.collect() // force execution while policies are active
        res
      } finally {
        g.dropPolicy("p_hide_f")
        g.dropPolicy("p_cap")
        g.setCurrentUser("default")
      }
    }
  )
}
