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

  test("sql-registered custom functions work through the extension") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      "SELECT vec_norm(embedding) AS n, vec_cosine(embedding, embedding) AS c " +
        "FROM embeddings WHERE vec_id = 0").head()
    assert(r.getDouble(0) > 0 && math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }
}
