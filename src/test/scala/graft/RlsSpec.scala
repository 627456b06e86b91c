package graft

import org.apache.spark.sql.graft.PolicyRegistry

class RlsSpec extends SparkTestBase {

  test("policy filters apply per-user and compose") {
    val g = GraftSession(spark)
    Tables.registerAll(spark, sf)
    val all = spark.sql("SELECT count(*) FROM orders").head().getLong(0)
    try {
      g.createPolicy("t_f", "orders", "o_orderstatus = 'O'", Set("restricted"))

      g.setCurrentUser("someone_else")
      val unaffected = spark.sql("SELECT count(*) FROM orders").head().getLong(0)
      assert(unaffected == all, "policy must not apply to other users")

      g.setCurrentUser("restricted")
      val filtered = spark.sql("SELECT count(*) FROM orders").head().getLong(0)
      val expected = spark.sql("SELECT count(*) FROM orders WHERE o_orderstatus = 'O'")
        .head().getLong(0)
      // note: the WHERE query above ALSO passes through the policy —
      // conjunction with itself, same result
      assert(filtered == expected && filtered < all)
    } finally {
      g.dropPolicy("t_f")
      g.setCurrentUser("default")
      PolicyRegistry.clear()
    }
  }

  test("policies apply THROUGH views of the governed table (no fail-open)") {
    // regression: relations inside a View (which stores its ANALYZED
    // child) used to be skipped entirely — a temp view over a governed
    // table silently returned every row. The rule now injects a
    // pre-resolved predicate inside View subtrees.
    val g = GraftSession(spark)
    Tables.registerAll(spark, sf)
    val all = spark.sql("SELECT count(*) FROM orders").head().getLong(0)
    try {
      g.createPolicy("t_v", "orders", "o_orderstatus = 'O'", Set("restricted"))
      spark.sql("CREATE OR REPLACE TEMP VIEW ord_view AS SELECT * FROM orders")
      val expected = spark.sql(
        "SELECT count(*) FROM orders WHERE o_orderstatus = 'O'").head().getLong(0)
      g.setCurrentUser("restricted")
      val throughView = spark.sql("SELECT count(*) FROM ord_view").head().getLong(0)
      assert(throughView == expected && throughView < all,
        s"policy bypassed through view: $throughView of $all rows visible")
      // a nested view over the view still filters
      spark.sql("CREATE OR REPLACE TEMP VIEW ord_view2 AS SELECT * FROM ord_view")
      assert(spark.sql("SELECT count(*) FROM ord_view2").head().getLong(0) == expected)
      // a FUNCTION-bearing policy resolves through the registry on the
      // in-view path too (the manual resolution handles UnresolvedFunction)
      g.setCurrentUser("default")
      g.dropPolicy("t_v")
      g.createPolicy("t_vf", "orders", "upper(o_orderstatus) = 'O'", Set("restricted"))
      g.setCurrentUser("restricted")
      assert(spark.sql("SELECT count(*) FROM ord_view").head().getLong(0) == expected)
      g.setCurrentUser("default")
      g.dropPolicy("t_vf")
      g.createPolicy("t_v", "orders", "o_orderstatus = 'O'", Set("restricted"))
      // a view that RENAMES the governed column still filters (the
      // policy resolves against the relation's own output, upstream of
      // the view's projection). Created as an UNgoverned user so the
      // assertion exercises query-time resolution, not creation-time
      // filter baking
      spark.sql("CREATE OR REPLACE TEMP VIEW ord_view3 AS " +
        "SELECT o_orderkey, o_orderstatus AS st FROM orders")
      g.setCurrentUser("restricted")
      assert(spark.sql("SELECT count(*) FROM ord_view3").head().getLong(0) == expected)
      // other users through the same view stay unfiltered
      g.setCurrentUser("someone_else")
      assert(spark.sql("SELECT count(*) FROM ord_view").head().getLong(0) == all)
    } finally {
      g.dropPolicy("t_v")
      g.setCurrentUser("default")
      spark.catalog.dropTempView("ord_view")
      spark.catalog.dropTempView("ord_view2")
      spark.catalog.dropTempView("ord_view3")
      PolicyRegistry.clear()
    }
  }

  test("createTable under an active wildcard policy must not bake the filter into the shared df") {
    // regression: the catalog read inside createTable analyzes the new
    // table's plan — without the internal bypass, the CURRENT user's
    // policy filter became part of the session-shared TableState df and
    // every other user saw permanently filtered rows.
    val g = GraftSession(spark)
    import spark.implicits._
    val data = Seq((1L, "O"), (2L, "F"), (3L, "O")).toDF("id", "st")
    try {
      PolicyRegistry.create("t_bake", "bake_t", "st = 'O'", Set("*"), owner = "admin")
      g.setCurrentUser("someone") // policy applies to this user
      g.createTable("bake_t", data)
      // the policy must still filter SQL access for governed users...
      assert(spark.sql("SELECT count(*) FROM bake_t").head().getLong(0) == 2)
      // ...but the OWNER (exempt) must see everything — if the filter
      // was baked at create time, this returns 2
      g.setCurrentUser("admin")
      assert(spark.sql("SELECT count(*) FROM bake_t").head().getLong(0) == 3,
        "policy filter was baked into the shared df at createTable time")
      assert(g.table("bake_t").count() == 3)
    } finally {
      g.dropPolicy("t_bake")
      g.setCurrentUser("default")
      g.dropTable("bake_t")
      PolicyRegistry.clear()
    }
  }

  test("GRANT/REVOKE: select gate, mutation gate, owner immunity") {
    import org.apache.spark.sql.graft.GrantRegistry
    val g = GraftSession(spark)
    Tables.registerAll(spark, sf)
    try {
      g.setCurrentUser("owner_a")
      spark.sql("GRANT SELECT ON TABLE nation TO alice")

      // owner always passes
      assert(spark.sql("SELECT count(*) FROM nation").head().getLong(0) == 25)

      // granted user passes
      g.setCurrentUser("alice")
      assert(spark.sql("SELECT count(*) FROM nation").head().getLong(0) == 25)

      // ungranted user fails analysis
      g.setCurrentUser("mallory")
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT count(*) FROM nation").collect()
      }
      assert(e.getMessage.contains("lacks SELECT"))

      // unrestricted tables stay open for everyone
      assert(spark.sql("SELECT count(*) FROM region").head().getLong(0) == 5)

      // SELECT grant does not imply UPDATE on a managed table
      g.setCurrentUser("owner_a")
      spark.sql("CREATE TABLE gr_t USING column AS SELECT * FROM nation")
      spark.sql("GRANT SELECT ON gr_t TO alice")
      g.setCurrentUser("alice")
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("UPDATE gr_t SET n_name = 'X' WHERE n_nationkey = 1")
      }
      assert(e2.getMessage.contains("lacks UPDATE"))

      // after GRANT UPDATE it goes through
      g.setCurrentUser("owner_a")
      spark.sql("GRANT UPDATE ON gr_t TO alice")
      g.setCurrentUser("alice")
      spark.sql("UPDATE gr_t SET n_name = 'X' WHERE n_nationkey = 1")

      // REVOKE closes the gate again
      g.setCurrentUser("owner_a")
      spark.sql("REVOKE SELECT, UPDATE ON gr_t FROM alice")
      g.setCurrentUser("alice")
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT count(*) FROM gr_t").collect()
      }

      // GRANT itself is privileged: a non-owner cannot grant themselves in
      g.setCurrentUser("mallory")
      val e3 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("GRANT SELECT ON nation TO mallory")
      }
      assert(e3.getMessage.contains("only owner"))
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("REVOKE SELECT ON nation FROM alice")
      }

      // crosswired keyword forms must not parse as grant statements
      // (they fall through to Spark's parser, which rejects them)
      intercept[Exception] {
        spark.sql("REVOKE SELECT ON nation TO alice")
      }
      assert(org.apache.spark.sql.graft.GrantRegistry
        .allowed("nation", "alice", "SELECT"), "crosswired REVOKE must not fire")

      // a CTE or table alias sharing a restricted name is NOT the table
      assert(spark.sql(
        "WITH nation AS (SELECT 1 AS x) SELECT count(*) FROM nation")
        .head().getLong(0) == 1)
      assert(spark.sql("SELECT count(*) FROM region AS nation")
        .head().getLong(0) == 5)
    } finally {
      g.setCurrentUser("default")
      GrantRegistry.clear()
      spark.sql("DROP TABLE IF EXISTS gr_t")
    }
  }

  test("sql-registered custom functions work through the extension") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      "SELECT vec_norm(embedding) AS n, vec_cosine(embedding, embedding) AS c " +
        "FROM embeddings WHERE vec_id = 0").head()
    assert(r.getDouble(0) > 0 && math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }
}
