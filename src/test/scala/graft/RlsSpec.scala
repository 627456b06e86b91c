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
