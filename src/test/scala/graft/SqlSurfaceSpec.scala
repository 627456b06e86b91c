package graft

import org.apache.spark.sql.functions._

/** The Snappy-specific SQL statement surface end-to-end: CREATE TABLE
  * USING column AS, PUT INTO, UPDATE, DELETE, policies, session APIs.
  */
case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

class SqlSurfaceSpec extends SparkTestBase {

  private lazy val g = GraftSession(spark)

  test("create table / put into / update / delete via SQL text") {
    Tables.registerAll(spark, sf)
    g.sql("CREATE TABLE sql_t USING column OPTIONS (key_columns 'o_orderkey', " +
      "partition_by 'o_orderkey', buckets '4') AS SELECT * FROM orders")
    val n0 = g.table("sql_t").count()
    assert(n0 == 1500)

    // PUT INTO: replace 10 rows, add 5 new keys
    g.sql("PUT INTO sql_t SELECT o_orderkey, o_custkey, 'Z' AS o_orderstatus, " +
      "o_totalprice, o_orderdate, o_orderpriority FROM orders WHERE o_orderkey < 10")
    g.sql("PUT INTO sql_t SELECT o_orderkey + 5000000, o_custkey, 'N', " +
      "o_totalprice, o_orderdate, o_orderpriority FROM orders WHERE o_orderkey < 5")
    assert(g.table("sql_t").count() == n0 + 5)
    assert(g.table("sql_t").filter(col("o_orderstatus") === "Z").count() == 10)

    g.sql("UPDATE sql_t SET o_totalprice = o_totalprice * 2 WHERE o_orderstatus = 'Z'")
    val doubled = g.table("sql_t").filter(col("o_orderstatus") === "Z")
      .agg(sum("o_totalprice")).head().getDouble(0)
    val orig = spark.table("orders").filter(col("o_orderkey") < 10)
      .agg(sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(doubled - orig * 2) < 1e-6)

    g.sql("DELETE FROM sql_t WHERE o_orderstatus = 'Z'")
    assert(g.table("sql_t").filter(col("o_orderstatus") === "Z").count() == 0)
    g.dropTable("sql_t")
  }

  test("sample table + approx ts topk session APIs") {
    val ev = Tables.load(spark, sf, "events")
    g.createSampleTable("ev_sample", ev, qcs = Seq("event_type"),
      fraction = 0.2, reservoirFloor = 10, rankKey = Seq("event_id"))
    val kept = g.table("ev_sample")
    assert(kept.count() > 0 && kept.columns.contains("_weight"))

    g.createApproxTSTopK("ev_topk", ev, keyCol = "user_id", tsCol = "ts",
      timeInterval = "6 hours", k = 3)
    assert(g.table("ev_topk").count() > 0)
    val merged = g.queryApproxTSTopK("ev_topk", "2024-01-01 00:00:00",
      "2024-02-01 00:00:00", 3).collect()
    assert(merged.length == 3)
    g.dropTable("ev_sample"); g.dropTable("ev_topk")
  }

  test("dsid and current_schema SQL functions") {
    val r = spark.sql("SELECT dsid() AS d, current_schema() AS s FROM range(1)").head()
    assert(r.getInt(0) >= 0 && r.getString(1) == "default")
  }

  test("scala UDF / UDAF registration surface (stock Spark, sanity check)") {
    spark.udf.register("plus_one", (x: Long) => x + 1)
    assert(spark.sql("SELECT plus_one(41)").head().getLong(0) == 42L)
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.Encoders
    val geoMean = new Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double) = (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
      def finish(b: (Double, Long)) = math.exp(b._1 / b._2)
      def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder = Encoders.scalaDouble
    }
    spark.udf.register("geo_mean", org.apache.spark.sql.functions.udaf(geoMean))
    Tables.registerAll(spark, sf)
    val gm = spark.sql("SELECT geo_mean(l_quantity) FROM lineitem").head().getDouble(0)
    assert(gm > 1 && gm < 50)
  }

  test("typed Dataset API (EncoderScanExec analog)") {
    import spark.implicits._
    val ds = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Line]
    val byFlag = ds.groupByKey(_.l_returnflag)
      .mapValues(_.l_quantity).reduceGroups(_ + _).collect().toMap
    val oracle = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    byFlag.foreach { case (k, v) => assert(math.abs(v - oracle(k)) < 1e-6) }
  }
}
