package graft

import org.apache.spark.sql.functions._

/** Stock-Spark compatibility net (the rebuild of the reference's
  * `compatibilityTests/` idea — re-running Spark's own SQL behavior
  * against the extended session, SURVEY §5.4): with the graft parser,
  * analyzer rules, catalog and extensions installed, ordinary Spark SQL
  * must behave exactly as stock. Each case runs a representative
  * statement family through `spark.sql` on the EXTENDED session and
  * checks it against an independently-computed expectation — a
  * regression here means a graft rule/parser leaked into stock paths.
  */
class CompatibilitySpec extends SparkTestBase {

  private def ord = Tables.load(spark, sf, "orders")

  test("CTEs, subqueries, EXISTS and scalar subqueries parse through the graft parser") {
    ord.createOrReplaceTempView("c_ord")
    Tables.load(spark, sf, "customer").createOrReplaceTempView("c_cust")
    val got = spark.sql(
      """WITH big AS (SELECT * FROM c_ord WHERE o_totalprice > 100000)
        |SELECT c_mktsegment, count(*) AS n
        |FROM c_cust c
        |WHERE EXISTS (SELECT 1 FROM big b WHERE b.o_custkey = c.c_custkey)
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM c_cust)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin).collect()
    val cust = Tables.load(spark, sf, "customer")
    val avgBal = cust.agg(avg("c_acctbal")).head().getDouble(0)
    val bigCust = ord.filter(col("o_totalprice") > 100000)
      .select(col("o_custkey")).distinct()
    val expect = cust.filter(col("c_acctbal") > avgBal)
      .join(bigCust, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect()
    assert(got.toSeq == expect.toSeq)
  }

  test("intervals, date arithmetic and timestamp functions behave stock") {
    val r = spark.sql(
      """SELECT DATE '2024-01-31' + INTERVAL '1' MONTH AS m,
        |  date_add(DATE '2024-01-01', 45) AS d45,
        |  datediff(DATE '2024-03-01', DATE '2024-01-01') AS dd,
        |  date_trunc('quarter', TIMESTAMP '2024-05-15 10:30:00') AS q,
        |  unix_timestamp(TIMESTAMP '1970-01-02 00:00:00') AS u""".stripMargin).head()
    assert(r.getDate(0).toString == "2024-02-29")
    assert(r.getDate(1).toString == "2024-02-15")
    assert(r.getInt(2) == 60)
    assert(r.getTimestamp(3).toString.startsWith("2024-04-01"))
    assert(r.getLong(4) == 86400L)
  }

  test("LATERAL VIEW, higher-order and JSON functions behave stock") {
    val r = spark.sql(
      """SELECT tok, n FROM (SELECT 'a b c' AS s) t
        |LATERAL VIEW posexplode(split(s, ' ')) x AS n, tok
        |ORDER BY n""".stripMargin).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val h = spark.sql(
      """SELECT transform(sequence(1, 4), x -> x * x) AS sq,
        |  aggregate(sequence(1, 4), 0, (a, x) -> a + x) AS s,
        |  filter(array(1, 2, 3, 4), x -> x % 2 = 0) AS ev,
        |  get_json_object('{"a": {"b": 7}}', '$.a.b') AS j""".stripMargin).head()
    assert(h.getSeq[Int](0) == Seq(1, 4, 9, 16))
    assert(h.getInt(1) == 10)
    assert(h.getSeq[Int](2) == Seq(2, 4))
    assert(h.getString(3) == "7")
  }

  test("PIVOT, windows with named frames and GROUPING SETS parse stock") {
    ord.createOrReplaceTempView("c_ord2")
    val p = spark.sql(
      """SELECT * FROM (SELECT o_orderstatus, o_orderpriority FROM c_ord2)
        |PIVOT (count(*) FOR o_orderstatus IN ('O', 'F', 'P'))
        |ORDER BY o_orderpriority""".stripMargin).collect()
    assert(p.nonEmpty)
    val w = spark.sql(
      """SELECT o_orderkey, sum(o_totalprice) OVER w AS run
        |FROM c_ord2 WINDOW w AS (ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey LIMIT 5""".stripMargin).collect()
    assert(w.length == 5)
    val gs = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM c_ord2
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      .count()
    val distinctStatuses = ord.select("o_orderstatus").distinct().count()
    val distinctPrios = ord.select("o_orderpriority").distinct().count()
    assert(gs == distinctStatuses + distinctPrios + 1)
  }

  test("UPDATE/DELETE on non-managed persistent V2 paths still reach Spark's handler") {
    // a DELETE against a nonexistent table must produce Spark's own
    // analysis error, not a graft parser error — proving unmatched DML
    // flows to the delegate untouched
    val e = intercept[Exception] {
      spark.sql("DELETE FROM nonexistent_table_xyz WHERE x = 1")
    }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"))
  }

  test("parameterized SQL still binds through the graft parser") {
    ord.createOrReplaceTempView("c_ord3")
    val got = spark.sql(
      "SELECT count(*) AS n FROM c_ord3 WHERE o_totalprice > ?", Array(150000)).head().getLong(0)
    assert(got == ord.filter(col("o_totalprice") > 150000).count())
  }
}
