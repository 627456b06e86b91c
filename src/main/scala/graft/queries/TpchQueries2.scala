package graft.queries

import graft.{QueryDef, Tables, dr2, dround}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second TPC-H wave, adapted to the columns present in the test schema
  * (no shipmode / commitdate — those queries are re-targeted to
  * equivalent plan shapes: EXISTS-agg, two-sided nation joins, correlated
  * avg subqueries, HAVING groups, multi-disjunct pushdown). The four
  * partsupp queries (q2/q11/q16/q20) live in [[TpchQueries3]] over a
  * deterministic synthesized partsupp.
  * Broadcast policy (see TpchQueries + BroadcastPolicySpec): only
  * constant-size nation/region and single-row aggregates carry hints;
  * part/supplier/customer scale with SF and are left to AQE's size gate.
  */
object TpchQueries2 {

  private def ts(s: String): Column = lit(s).cast("timestamp")
  private def r2(c: Column): Column = dr2(c)

  val defs: Seq[QueryDef] = Seq(

    // ---- Q4: order priority checking (EXISTS semi join + agg) ----
    QueryDef.sql(
      "q4_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
          col("o_orderdate") < ts("1996-10-01 00:00:00"))
      val li = Tables.load(s, dir, "lineitem")
      // day-granularity source data → interval arithmetic is exact in
      // both engines; semi join keeps each order once
      ord.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- Q7: volume shipping between two nations (dual nation join) ----
    QueryDef.sql(
      "q7_volume_shipping",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM lineitem
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders   ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name < n2.n_name) t
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val supp = Tables.load(s, dir, "supplier")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val n1 = nat.select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = nat.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      li.join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(supp, col("s_suppkey") === col("l_suppkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(graft.decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // ---- Q8: national market share ----
    QueryDef.sql(
      "q8_market_share",
      """SELECT o_year,
        |  (sign(CAST(sum(CAST(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        |        / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE)) * floor(abs(CAST(sum(CAST(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        |        / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    n1.n_name AS nation
        |  FROM lineitem
        |    JOIN part     ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders   ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |    JOIN region   ON n2.n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY') t
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val part = Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val supp = Tables.load(s, dir, "supplier")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val n1 = nat.select(col("n_nationkey").as("n1_key"), col("n_name").as("nation"))
      val n2 = nat.select(col("n_nationkey").as("n2_key"), col("n_regionkey").as("n2_region"))
      val reg = Tables.load(s, dir, "region").filter(col("r_name") === "AMERICA")
      li.join(part, col("p_partkey") === col("l_partkey"))
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(supp, col("s_suppkey") === col("l_suppkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .join(broadcast(reg), col("n2_region") === col("r_regionkey"))
        .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(dround(
          graft.decSumRaw(when(col("nation") === "BRAZIL", col("volume")).otherwise(0.0)) /
            graft.decSumRaw(col("volume")), 4).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // ---- Q9: product-type profit (retailprice as cost proxy) ----
    QueryDef.sql(
      "q9_product_profit",
      """SELECT nation, o_year,
        |  CAST(round(sum(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1 AS amount
        |  FROM lineitem
        |    JOIN part     ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders   ON o_orderkey = l_orderkey
        |    JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%') t
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val part = Tables.load(s, dir, "part").filter(col("p_name").like("%red%"))
      val supp = Tables.load(s, dir, "supplier")
      val ord = Tables.load(s, dir, "orders")
      val nat = Tables.load(s, dir, "nation")
      li.join(part, col("p_partkey") === col("l_partkey"))
        .join(supp, col("s_suppkey") === col("l_suppkey"))
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .withColumn("amount",
          col("l_extendedprice") * (lit(1) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity") * 0.1)
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(graft.decSum(col("amount")).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // ---- Q12-shape: quantity-band classification (CASE agg over join) ----
    QueryDef.sql(
      "q12_quantity_bands",
      """SELECT band,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM (
        |  SELECT CASE WHEN l_quantity < 10 THEN 'small'
        |              WHEN l_quantity < 30 THEN 'medium'
        |              ELSE 'large' END AS band, o_orderpriority
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00') t
        |GROUP BY band
        |ORDER BY band""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00"))
      val ord = Tables.load(s, dir, "orders")
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(ord, col("o_orderkey") === col("l_orderkey"))
        .withColumn("band",
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 30, "medium")
            .otherwise("large"))
        .groupBy(col("band"))
        .agg(
          sum(when(hi, 1).otherwise(0)).as("high_line_count"),
          sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
        .orderBy(col("band"))
    },

    // ---- Q13: customer order-count distribution (outer join + double agg) ----
    QueryDef.sql(
      "q13_customer_distribution",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---- Q14: promo revenue share ----
    QueryDef.sql(
      "q14_promo_revenue",
      """SELECT (sign(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)) * floor(abs(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-03-01 00:00:00") &&
          col("l_shipdate") < ts("1996-04-01 00:00:00"))
      val part = Tables.load(s, dir, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .agg(dround(lit(100.0) *
          graft.decSumRaw(when(col("p_type") === "PROMO", rev).otherwise(0.0)) /
            graft.decSumRaw(rev), 4)
          .as("promo_revenue"))
    },

    // ---- Q17: small-quantity-order revenue (correlated avg subquery) ----
    QueryDef.sql(
      "q17_small_quantity",
      """SELECT (sign(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0) * floor(abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0) * 100.0 + 0.5) / 100.0) AS avg_yearly
        |FROM lineitem l1
        |  JOIN part ON p_partkey = l1.l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l1.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val part = Tables.load(s, dir, "part").filter(col("p_brand") === "Brand#1")
      val partAvg = li.groupBy(col("l_partkey").as("avg_partkey"))
        .agg((avg(col("l_quantity")) * 0.5).as("half_avg_qty"))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("avg_partkey"))
        .filter(col("l_quantity") < col("half_avg_qty"))
        .agg(r2(graft.decSumRaw(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // ---- Q18: large-volume customers (HAVING over grouped join) ----
    QueryDef.sql(
      "q18_large_volume",
      """SELECT c_custkey, o_orderkey, (sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5) / 100.0) AS price,
        |  (sign(total_qty) * floor(abs(total_qty) * 100.0 + 0.5) / 100.0) AS total_qty
        |FROM (
        |  SELECT l_orderkey AS o_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey) x
        |JOIN orders USING (o_orderkey)
        |JOIN customer ON c_custkey = o_custkey
        |WHERE total_qty > 150
        |ORDER BY price DESC, o_orderkey""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val bigOrders = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150)
      bigOrders.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          r2(col("o_totalprice")).as("price"), r2(col("total_qty")).as("total_qty"))
        .orderBy(col("price").desc, col("o_orderkey"))
    },

    // ---- Q19: discounted revenue (multi-disjunct predicate pushdown) ----
    QueryDef.sql(
      "q19_disjunct_revenue",
      """SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val part = Tables.load(s, dir, "part")
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40))
      li.join(part, col("p_partkey") === col("l_partkey"))
        .filter(cond)
        .agg(graft.decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // ---- Q22: global sales opportunity (anti join + scalar subquery) ----
    QueryDef.sql(
      "q22_sales_opportunity",
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1999-01-01 00:00:00"))
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      cust.join(broadcast(avgBal)).filter(col("c_acctbal") > col("avg_bal"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), graft.decSum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    },

    // ---- TPC-H q15: top supplier by quarterly revenue. The revenue
    // "view" materializes once and feeds both the winner filter and the
    // scalar-max subquery; sums are exact decimals (Int128Sum), so the
    // = max(total_revenue) comparison is exact in BOTH engines — a
    // double-sum equality would be engine-order-dependent ----
    QueryDef.sql(
      "q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val revenue = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1996-04-01 00:00:00"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(graft.decSumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val maxRev = revenue.agg(max(col("total_revenue")).as("max_revenue"))
      Tables.load(s, dir, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_revenue"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_revenue"), 2).cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // ---- TPC-H q21 (shape-adapted): suppliers who alone failed an
    // order. The synthetic lineitem has no commit/receipt dates, so the
    // canonical "kept orders waiting" predicate maps to the returnflag:
    // supplier s has an 'R' line in a finished order, some OTHER supplier
    // shares the order (EXISTS), and no other supplier's line in it is
    // 'R' (NOT EXISTS). The semi/anti self-joins on l_orderkey are the
    // canonical plan; supplier/nation broadcast ----
    QueryDef.sql(
      "q21_waiting_suppliers",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |  JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND n_name LIKE 'NATION_1%'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o1"), col("l_suppkey").as("s1"))
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      val ordF = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val suppNat = Tables.load(s, dir, "supplier")
        .join(Tables.load(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").like("NATION_1%"))
        .select(col("s_suppkey"), col("s_name"))
      l1.join(ordF, col("o1") === col("o_orderkey"))
        .join(l2, col("o2") === col("o1") && col("s2") =!= col("s1"), "left_semi")
        .join(l3, col("o3") === col("o1") && col("s3") =!= col("s1"), "left_anti")
        .join(suppNat, col("s1") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }
  )
}
