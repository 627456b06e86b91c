package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational analytics: TPC-H-shaped queries adapted to the columns
  * present in the driver test data (TESTDATA.md). Mirrors the reference's
  * golden-output TPC-H suite
  * (reference: cluster/src/test/.../benchmark/TPCH_Queries.scala) —
  * re-expressed as idiomatic Spark DataFrame plans so Catalyst handles
  * pushdown, pruning, join selection and whole-stage codegen.
  *
  * Scale notes (100 TB design intent):
  *  - every filter is a plain `Column` predicate → pushed into the parquet
  *    scan (PushedFilters) with row-group stats skipping;
  *  - only GENUINELY constant dimension tables (region = 5 rows, nation =
  *    25 rows at every SF) are explicitly `broadcast()`; every SF-scaling
  *    table (customer, part, supplier, and any derived frame over them)
  *    carries NO hint — `broadcast()` is mandatory, not advisory, so a
  *    hard hint on an SF×N-row side OOMs the build side at 100× while
  *    AQE's size gate picks BroadcastHashJoin at bench scale anyway and
  *    degrades to a shuffle join when the side outgrows the threshold
  *    (asserted by BroadcastPolicySpec);
  *  - aggregations are declarative groupBy/agg → partial (map-side) + final
  *    HashAggregate, AQE coalesces post-shuffle partitions.
  */
object TpchQueries {

  private def ts(s: String): Column = lit(s).cast("timestamp")
  private def r2(c: Column): Column = graft.dr2(c)

  val defs: Seq[QueryDef] = Seq(

    // ---- Q1: pricing summary report (scan + filter + multi-agg + sort) ----
    QueryDef.sql(
      "q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
        |  (sign(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * floor(abs(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0) AS avg_qty,
        |  (sign(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * floor(abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0) AS avg_price,
        |  (sign(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * floor(abs(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0) AS avg_disc,
        |  count(*)                           AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      import graft.{decSum, decSumRaw}
      val n = count(lit(1))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          decSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")),
            outScale = 2, decScale = 6).as("sum_charge"),
          graft.dround(decSumRaw(col("l_quantity")) / n, 2).as("avg_qty"),
          graft.dround(decSumRaw(col("l_extendedprice")) / n, 2).as("avg_price"),
          graft.dround(decSumRaw(col("l_discount")) / n, 4).as("avg_disc"),
          n.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- Q6: forecast revenue change (tight scan filter + global agg) ----
    QueryDef.sql(
      "q6_forecast_revenue",
      """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.04 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount").between(0.04, 0.07) &&
          col("l_quantity") < 24)
        .agg(graft.decSum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // ---- Q3: shipping priority (3-way join + agg + top-N) ----
    QueryDef.sql(
      "q3_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.load(s, dir, "orders").filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
      val li = Tables.load(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
      // lineitem⋈orders shuffles on orderkey (the natural key for both
      // sides at 100 TB). customer scales with SF, so no broadcast hint:
      // AQE broadcasts it while it fits and shuffles on o_custkey beyond.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(graft.decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- Q5: local supplier volume (6-way join + agg) ----
    QueryDef.sql(
      "q5_local_supplier",
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |  JOIN orders   ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val li = Tables.load(s, dir, "lineitem")
      val supp = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      // region→nation are constant-size → broadcast; supplier/customer
      // scale with SF → no hint, AQE size-gates the broadcast.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(graft.decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- Q10: returned-item reporting (join + agg + top-N) ----
    QueryDef.sql(
      "q10_returned_items",
      """SELECT c_custkey, c_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer
        |  JOIN orders   ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-10-01 00:00:00") &&
          col("o_orderdate") < ts("1997-01-01 00:00:00"))
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val nat = Tables.load(s, dir, "nation")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(graft.decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }
  )
}
