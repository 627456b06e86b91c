package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.store.{GraftAggPushdown, GraftColumnStore, GraftStoreOps}

/** DSv2 aggregate pushdown into the graftstore scan (the Spark-idiomatic
  * rebuild of the reference's dictionary-optimized aggregation +
  * stats-served aggregates — see GraftAggScan). Properties:
  *  - pushed and un-pushed plans produce IDENTICAL results, for global
  *    and grouped aggregates, clean and mutated (deltas/bitmaps) tables;
  *  - the plan actually pushes (scan description + telemetry), and the
  *    dictionary code-indexed path serves dict-encoded group columns;
  *  - a WHERE clause blocks pushdown (this source reports all filters
  *    as residual, so an accepted push is always over the full table);
  *  - empty-table global COUNT is 0, not null.
  */
class AggPushdownSpec extends SparkTestBase {

  private def g = GraftSession(spark)

  private def withPushdown[T](on: Boolean)(body: => T): T = {
    spark.conf.set(GraftAggPushdown.CONF_KEY, on.toString)
    try body finally spark.conf.unset(GraftAggPushdown.CONF_KEY)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("pushed aggregates match the un-pushed plan, clean and mutated") {
    g.createTable("agg_li", Tables.load(spark, sf, "lineitem"))
    def grouped = g.table("agg_li").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sq"),
        min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"),
        count("l_returnflag").as("nc"))
    def global = g.table("agg_li")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sk"),
        min("l_shipdate").as("mn"), max("l_shipdate").as("mx"))
    val (gOff, glOff) = withPushdown(false) { (sortedRows(grouped), sortedRows(global)) }
    val (gOn, glOn) = withPushdown(true) { (sortedRows(grouped), sortedRows(global)) }
    assert(gOn == gOff, "grouped pushdown must match the un-pushed plan")
    assert(glOn == glOff, "global pushdown must match the un-pushed plan")

    // mutate: update deltas + delete bitmaps → dirty batches take the
    // decoded path, results still identical
    g.update("agg_li", col("l_orderkey") % 5 === 0,
      "l_quantity" -> (col("l_quantity") * 2))
    g.delete("agg_li", col("l_linenumber") === 3)
    val gOff2 = withPushdown(false) { sortedRows(grouped) }
    val gOn2 = withPushdown(true) { sortedRows(grouped) }
    assert(gOn2 == gOff2, "pushdown over mutated table must match")
    g.dropTable("agg_li")
  }

  test("plan pushes; dict-encoded group column takes the code-indexed path") {
    g.createTable("agg_dict", Tables.load(spark, sf, "lineitem"))
    val before = GraftColumnStore.aggPushes.get()
    val dictBefore = GraftColumnStore.aggDictBatches.get()
    val q = g.table("agg_dict").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sq"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"expected a pushed aggregation in the plan:\n$plan")
    q.collect()
    assert(GraftColumnStore.aggPushes.get() > before, "pushAggregation telemetry")
    // l_returnflag has 3 distinct values → dictionary-encoded → the
    // per-batch code-indexed accumulator path must have served batches
    assert(GraftColumnStore.aggDictBatches.get() > dictBefore,
      "dictionary group-by fast path was not exercised")
    g.dropTable("agg_dict")
  }

  test("a WHERE clause blocks pushdown (residual filters)") {
    g.createTable("agg_flt", Tables.load(spark, sf, "orders"))
    val q = g.table("agg_flt").filter(col("o_totalprice") > 1000.0)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"),
      s"filtered aggregate must NOT push (filters are residual):\n$plan")
    // and it is still correct
    val expected = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 1000.0)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(sortedRows(q) == sortedRows(expected))
    g.dropTable("agg_flt")
  }

  test("bucket-key grouping is NOT pushed (storage partitioning wins)") {
    g.createTable("agg_bkt", Tables.load(spark, sf, "orders"),
      partitionBy = Seq("o_custkey"), buckets = 4)
    // grouping on the bucket key: the storage-partitioned scan satisfies
    // it with ZERO exchange — pushdown would trade that for a shuffle
    val onKey = g.table("agg_bkt").groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(!onKey.queryExecution.executedPlan.toString.contains("PushedAggregation"),
      "bucket-key grouping must stay with the storage-partitioned plan")
    // grouping on a NON-bucket column shuffles either way → push
    val offKey = g.table("agg_bkt").groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(offKey.queryExecution.executedPlan.toString.contains("PushedAggregation"),
      "non-bucket grouping should push")
    val expected = Tables.load(spark, sf, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(sortedRows(offKey) == sortedRows(expected))
    g.dropTable("agg_bkt")
  }

  test("global COUNT over an empty table is 0") {
    g.sql("CREATE TABLE agg_empty (a BIGINT, b STRING) USING column")
    val row = g.table("agg_empty")
      .agg(count(lit(1)).as("n"), sum("a").as("s"), min("a").as("mn")).head()
    assert(row.getLong(0) == 0L)
    assert(row.isNullAt(1) && row.isNullAt(2))
    g.dropTable("agg_empty")
  }
}
