package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Scale-critical property: two managed tables created with the same
  * PARTITION_BY/BUCKETS are colocated — joining them on the partition key
  * plans WITHOUT a new shuffle on either side (the reference's
  * collocated-join fast path, SnappyStrategies.getCollocatedPartitioning).
  * Works because the materialized snapshot preserves the repartition's
  * HashPartitioning as its outputPartitioning.
  */
class ColocationSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("colocated tables join without an exchange") {
    val g = GraftSession(spark)
    val ord = Tables.load(spark, sf, "orders")
    val li = Tables.load(spark, sf, "lineitem")
    g.createTable("co_orders", ord, partitionBy = Seq("o_orderkey"), buckets = 4)
    g.createTable("co_lineitem", li, partitionBy = Seq("l_orderkey"), buckets = 4)

    val joined = g.table("co_lineitem")
      .join(g.table("co_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
    joined.collect()

    val exec = joined.queryExecution.executedPlan
    val shuffles = collectWithSubqueries(exec) { case s: ShuffleExchangeExec => s }
    // the only allowed exchange is the one AFTER the join for the final
    // aggregation — neither join input may reshuffle
    assert(shuffles.size <= 1,
      s"expected colocated join without input shuffles, got ${shuffles.size}:\n$exec")

    // and the result is still correct
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
    g.dropTable("co_orders"); g.dropTable("co_lineitem")
  }
}
