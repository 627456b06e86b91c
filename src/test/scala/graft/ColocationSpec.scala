package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Scale-critical property: two graftstore tables bucketed the same way
  * are colocated — joining them on the bucket key plans WITHOUT an
  * exchange on either input (the reference's collocated-join fast path,
  * SnappyStrategies.getCollocatedPartitioning / ExistingPlans.scala:49).
  * The store scan reports bucket-grouped KeyGroupedPartitioning resolved
  * through GraftCatalog's bucket function, so stock Spark plans a
  * storage-partitioned join. Broadcast is disabled in these tests —
  * otherwise a small side would hide the property being proven.
  */
class ColocationSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def withNoBroadcast[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  test("co-bucketed graftstore tables join without any input exchange") {
    val g = GraftSession(spark)
    val ord = Tables.load(spark, sf, "orders")
    val li = Tables.load(spark, sf, "lineitem")
    g.createTable("co_orders", ord, partitionBy = Seq("o_orderkey"), buckets = 4)
    g.createTable("co_lineitem", li, partitionBy = Seq("l_orderkey"), buckets = 4)

    withNoBroadcast {
      val joined = spark.table("graft.co_lineitem")
        .join(spark.table("graft.co_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      joined.collect()

      val exec = joined.queryExecution.executedPlan
      val shuffles = collectWithSubqueries(exec) { case s: ShuffleExchangeExec => s }
      // the only allowed exchange is the one AFTER the join for the final
      // aggregation — neither join input may reshuffle
      assert(shuffles.size <= 1,
        s"expected storage-partitioned join without input shuffles, got ${shuffles.size}:\n$exec")

      // and the result is still correct
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    }
    g.dropTable("co_orders"); g.dropTable("co_lineitem")
  }

  test("multi-column bucketed tables stay correct (SPJ limited to 1 key upstream)") {
    // Spark's storage-partitioned-join machinery resolves only
    // single-column bucket transforms today; multi-column bucketed
    // graftstore tables still route writes consistently and answer
    // correctly — the join just pays its exchanges.
    val g = GraftSession(spark)
    val ord = Tables.load(spark, sf, "orders")
    g.createTable("co_m1", ord,
      partitionBy = Seq("o_custkey", "o_orderpriority"), buckets = 4)
    g.createTable("co_m2", ord.select(col("o_custkey").as("k"),
        col("o_orderpriority").as("p"), col("o_totalprice").as("tp")),
      partitionBy = Seq("k", "p"), buckets = 4)
    withNoBroadcast {
      val n = spark.table("graft.co_m1")
        .join(spark.table("graft.co_m2"),
          col("o_custkey") === col("k") && col("o_orderpriority") === col("p"))
        .count()
      val want = ord.join(ord.select(col("o_custkey").as("k"),
          col("o_orderpriority").as("p"), col("o_totalprice").as("tp")),
        col("o_custkey") === col("k") && col("o_orderpriority") === col("p"))
        .count()
      assert(n == want)
    }
    g.dropTable("co_m1"); g.dropTable("co_m2")
  }

  test("aggregation on the bucket key reuses the stored partitioning") {
    val g = GraftSession(spark)
    g.createTable("co_agg", Tables.load(spark, sf, "orders"),
      partitionBy = Seq("o_custkey"), buckets = 4)
    withNoBroadcast {
      val agg = spark.table("graft.co_agg")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      agg.collect()
      val shuffles = collectWithSubqueries(agg.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"groupBy on the bucket key must not exchange:\n${agg.queryExecution.executedPlan}")
      val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Tables.load(spark, sf, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    }
    g.dropTable("co_agg")
  }
}
