package graft

class TpchQueriesSpec extends SparkTestBase {

  test("all registered queries run and return rows on sf0.001") {
    SparkEntry.allDefs.foreach { d =>
      val out = d.fn(spark, sf)
      assert(out.count() > 0, s"query ${d.name} returned 0 rows")
    }
  }

  test("q1 aggregates are self-consistent") {
    val q1 = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(q1.length == 6) // 3 returnflags x 2 linestatus
    val total = q1.map(_.getAs[Long]("count_order")).sum
    val liCount = Tables.load(spark, sf, "lineitem")
      .filter("l_shipdate <= timestamp'1998-09-02 00:00:00'").count()
    assert(total == liCount)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name is a query name") {
    val q = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(q.contains(k)))
  }
}
