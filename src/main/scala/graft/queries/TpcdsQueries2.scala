package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shaped wave 4 (reference: cluster/src/test/.../benchmark/snappy/
  * tpcds/): the remaining plan mechanics the first three waves did not
  * exercise — derived-threshold semi joins where the filter set is itself
  * an aggregate compared against a global statistic (q23's frequent items
  * x best customers), the group-HAVING-join-back basket-band shape
  * (q34/q73), COUNT(DISTINCT) feeding a histogram behind an anti join
  * (q16), EXCEPT/INTERSECT cardinality accounting over key sets (q87/q38),
  * and the steady-demand ratio-bound filter where every period must sit
  * within a band of the period average (q58/q83).
  *
  * Determinism/parity: thresholds that are conceptually fractional
  * ("1.5x the average", "within 50% of the mean", "25% of the max") are
  * evaluated by INTEGER cross-multiplication over exact unit counts
  * (cents / 1e-4 units), so no engine's float rounding can flip a
  * boundary row. Money totals surface either as exact integer units or
  * through the portable sign*floor(abs*10^n + 0.5) rounding.
  *
  * 100 TB shapes: every derived filter set is key-column-bounded
  * (|parts| or |customers| rows, not fact rows); global statistics reach
  * the comparison as one-row broadcasts (BNLJ over a provably <=1-row
  * side, the ScaleAuditSpec-sanctioned shape); the fact table is scanned
  * once per CTE with filters pushed to the scan; semi/anti joins never
  * row-multiply.
  */
object TpcdsQueries2 {

  val defs: Seq[QueryDef] = Seq(

    // ---- q23 shape: frequent parts x best customers feeding a later-
    // period sales rollup. "Frequent" = 1996 order count > 1.5x the
    // per-part average (integer cross-multiply: 2*cnt*n_parts >
    // 3*total); "best" = lifetime spend > 25% of the max customer's
    // (4*cents > max_cents). ----
    QueryDef.sql(
      "q_ds_best_customers",
      """WITH pc AS (
        |  SELECT l_partkey, count(DISTINCT l_orderkey) AS cnt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1996
        |  GROUP BY l_partkey),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_cnt,
        |               count(*) AS n_parts FROM pc),
        |freq AS (SELECT l_partkey FROM pc, tot
        |         WHERE 2 * cnt * n_parts > 3 * total_cnt),
        |cs AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |mx AS (SELECT max(cents) AS maxc FROM cs),
        |best AS (SELECT o_custkey FROM cs, mx WHERE 4 * cents > maxc)
        |SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE year(o_orderdate) = 1997
        |  AND l_partkey IN (SELECT l_partkey FROM freq)
        |  AND o_custkey IN (SELECT o_custkey FROM best)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.decSum
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val li96 = li.join(
        ord.filter(year(col("o_orderdate")) === 1996).select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      val pc = li96.groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_orderkey")).as("cnt"))
      val tot = pc.agg(sum(col("cnt")).cast("long").as("total_cnt"),
        count(lit(1)).as("n_parts"))
      val freq = pc.join(broadcast(tot))
        .filter(lit(2) * col("cnt") * col("n_parts") > lit(3) * col("total_cnt"))
        .select(col("l_partkey").as("fp"))
      val cs = ord.groupBy(col("o_custkey").as("ck"))
        .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
          .cast("long").as("cents"))
      val mx = cs.agg(max(col("cents")).as("maxc"))
      val best = cs.join(broadcast(mx))
        .filter(lit(4) * col("cents") > col("maxc"))
        .select(col("ck"))
      li.join(ord.filter(year(col("o_orderdate")) === 1997),
          col("l_orderkey") === col("o_orderkey"))
        .join(freq, col("l_partkey") === col("fp"), "left_semi")
        .join(best, col("o_custkey") === col("ck"), "left_semi")
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("mon"))
    },

    // ---- q34/q73 shape: basket-size band, HAVING on the per-order item
    // count, joined back to the customer dimension. Pure integer counts,
    // no float anywhere. ----
    QueryDef.sql(
      "q_ds_basket_bands",
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, count(*) AS n_items
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_orderkey, o_custkey),
        |b AS (
        |  SELECT o_custkey, count(*) AS n_big
        |  FROM t WHERE n_items BETWEEN 5 AND 7
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_mktsegment, n_big
        |FROM b JOIN customer ON o_custkey = c_custkey
        |WHERE n_big >= 2
        |ORDER BY n_big DESC, c_custkey""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val t = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(count(lit(1)).as("n_items"))
      val b = t.filter(col("n_items").between(5, 7))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_big"))
        .filter(col("n_big") >= 2)
      b.join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"), col("n_big"))
        .orderBy(col("n_big").desc, col("c_custkey"))
    },

    // ---- q16 shape: orders untouched by an excluded supplier set (anti
    // join), then a COUNT(DISTINCT supplier) histogram over the
    // survivors. ----
    QueryDef.sql(
      "q_ds_supplier_spread",
      """WITH bad AS (
        |  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'GERMANY'),
        |touched AS (
        |  SELECT DISTINCT l_orderkey FROM lineitem
        |  JOIN bad ON l_suppkey = s_suppkey),
        |o AS (
        |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
        |  FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT l_orderkey FROM touched)
        |  GROUP BY l_orderkey)
        |SELECT n_supp, count(*) AS n_orders
        |FROM o WHERE n_supp >= 2
        |GROUP BY n_supp
        |ORDER BY n_supp""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val bad = sup
        .join(broadcast(nat.filter(col("n_name") === "GERMANY")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("bk"))
      val touched = li.join(bad, col("l_suppkey") === col("bk"), "left_semi")
        .select(col("l_orderkey").as("tk")).distinct()
      li.join(touched, col("l_orderkey") === col("tk"), "left_anti")
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
        .filter(col("n_supp") >= 2)
        .groupBy(col("n_supp"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_supp"))
    },

    // ---- q87/q38 shape: EXCEPT / INTERSECT cardinalities over yearly
    // customer key sets — the one set-op pairing (EXCEPT on derived key
    // sets) no other driver row exercises. ----
    QueryDef.sql(
      "q_ds_except_counts",
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT * FROM (
        |  SELECT 'both' AS segment, count(*) AS n
        |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'only_1996' AS segment, count(*) AS n
        |  FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'only_1997' AS segment, count(*) AS n
        |  FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
        |ORDER BY segment""".stripMargin) { (s, dir) =>
      // presence-vector form (the q_ds_triple_channel /
      // q_ds_cross_channel pattern): INTERSECT and both EXCEPTs of the
      // two yearly key sets fall out of ONE orders pass aggregating
      // per-customer year flags, then one |customers|-row count pass —
      // vs two scans + three set ops (each two distinct-shuffles + a
      // join). The three output rows unpack from the single count row.
      val flags = Tables.load(s, dir, "orders")
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .groupBy(col("o_custkey"))
        .agg(max(when(year(col("o_orderdate")) === 1996, 1).otherwise(0)).as("a"),
          max(when(year(col("o_orderdate")) === 1997, 1).otherwise(0)).as("b"))
      // coalesce: with NO orders in either year, sum() over the empty
      // flags frame is NULL while the spec's count(*) is 0 — degenerate-
      // input parity with the declared SQL (ADVICE r15)
      val counts = flags.agg(
        coalesce(sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L)),
          lit(0L)).as("nboth"),
        coalesce(sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L)),
          lit(0L)).as("n96"),
        coalesce(sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L)),
          lit(0L)).as("n97"))
      counts.select(explode(array(
          struct(lit("both").as("segment"), col("nboth").as("n")),
          struct(lit("only_1996").as("segment"), col("n96").as("n")),
          struct(lit("only_1997").as("segment"), col("n97").as("n")))).as("r"))
        .select(col("r.segment").as("segment"), col("r.n").as("n"))
        .orderBy(col("segment"))
    },

    // ---- q58/q83 shape: parts whose demand is steady across three
    // consecutive months — every month within 50% of the three-month
    // mean. Revenue tracked in exact 1e-2 units (cents); the band
    // check is integer cross-multiplication (6*m >= s && 2*m <= s ⇔
    // 0.5*avg <= m <= 1.5*avg), so no float boundary exists. ----
    QueryDef.sql(
      "q_ds_steady_parts",
      """WITH m AS (
        |  SELECT l_partkey, month(o_orderdate) AS mo,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1996 AND month(o_orderdate) IN (3, 4, 5)
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT l_partkey,
        |    CAST(sum(CASE WHEN mo = 3 THEN cents ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN mo = 4 THEN cents ELSE 0 END) AS BIGINT) AS c4,
        |    CAST(sum(CASE WHEN mo = 5 THEN cents ELSE 0 END) AS BIGINT) AS c5,
        |    count(*) AS nm
        |  FROM m GROUP BY 1)
        |SELECT l_partkey, CAST(c3 + c4 + c5 AS BIGINT) AS total_cents
        |FROM p
        |WHERE nm = 3
        |  AND 6 * c3 >= (c3 + c4 + c5) AND 2 * c3 <= (c3 + c4 + c5)
        |  AND 6 * c4 >= (c3 + c4 + c5) AND 2 * c4 <= (c3 + c4 + c5)
        |  AND 6 * c5 >= (c3 + c4 + c5) AND 2 * c5 <= (c3 + c4 + c5)
        |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val m = li.join(
          ord.filter(year(col("o_orderdate")) === 1996 &&
            month(col("o_orderdate")).isin(3, 4, 5))
            .select(col("o_orderkey"), month(col("o_orderdate")).as("mo")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"), col("mo"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,4)")) * 100)
          .cast("long").as("cents"))
      def mon(i: Int) =
        sum(when(col("mo") === i, col("cents")).otherwise(0L)).cast("long")
      val p = m.groupBy(col("l_partkey"))
        .agg(mon(3).as("c3"), mon(4).as("c4"), mon(5).as("c5"),
          count(lit(1)).as("nm"))
      val tot = col("c3") + col("c4") + col("c5")
      def steady(c: Column) = (lit(6) * c >= tot) && (lit(2) * c <= tot)
      p.filter(col("nm") === 3 && steady(col("c3")) && steady(col("c4")) &&
          steady(col("c5")))
        .select(col("l_partkey"), tot.cast("long").as("total_cents"))
        .orderBy(col("l_partkey"))
    }
  )
}
