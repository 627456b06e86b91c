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
    val glOff2 = withPushdown(false) { sortedRows(global) }
    val glOn2 = withPushdown(true) { sortedRows(global) }
    assert(glOn2 == glOff2, "global pushdown over mutated table must match")
    g.dropTable("agg_li")
  }

  test("stats-served integer sums: nulls, negatives, all-null batches") {
    import spark.implicits._
    // one all-null batch, negatives, and int widening — the edge shapes
    // of the seal-time longSum (batch_size 4 forces multiple batches)
    val rows = Seq[(Long, java.lang.Long, java.lang.Integer)](
      (1L, 10L, 7), (2L, -20L, -3), (3L, null, null), (4L, 30L, 1),
      (5L, null, null), (6L, null, null), (7L, null, null), (8L, null, null),
      (9L, 1L << 60, Int.MaxValue), (10L, -(1L << 59), Int.MinValue))
    val df = rows.toDF("k", "lv", "iv")
    df.write.format(GraftStoreOps.FORMAT).option("table", "agg_sum_edge")
      .option("batch_size", "4").mode("overwrite").save()
    def global = GraftStoreOps.read(spark, "agg_sum_edge")
      .agg(sum("lv").as("sl"), sum("iv").as("si"), count("lv").as("cl"))
    val off = withPushdown(false) { sortedRows(global) }
    val on = withPushdown(true) { sortedRows(global) }
    assert(on == off, s"stats-served sums must match the row loop: $on vs $off")
    GraftColumnStore.drop("agg_sum_edge")

    // intra-batch overflow: the seal nulls the stat, the fallback row
    // loop reproduces Spark's ANSI per-value overflow error — the pushed
    // and un-pushed plans FAIL THE SAME WAY
    val big = Seq[(Long, java.lang.Long)](
      (1L, Long.MaxValue), (2L, 10L), (3L, 5L)).toDF("k", "lv")
    big.write.format(GraftStoreOps.FORMAT).option("table", "agg_sum_ovf")
      .option("batch_size", "4").mode("overwrite").save()
    def ovfSum = GraftStoreOps.read(spark, "agg_sum_ovf").agg(sum("lv")).collect()
    val offErr = withPushdown(false) { intercept[Exception](ovfSum) }
    val onErr = withPushdown(true) { intercept[Exception](ovfSum) }
    assert(offErr.getMessage.contains("overflow") ||
      offErr.getCause != null, s"baseline must overflow: $offErr")
    assert(onErr.getMessage.contains("overflow") ||
      onErr.getCause != null, s"pushed plan must overflow identically: $onErr")
    GraftColumnStore.drop("agg_sum_ovf")
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
