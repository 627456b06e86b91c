package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS-shaped wave: plan shapes the TPC-H slice misses, mirroring the
  * reference's TPC-DS harness coverage
  * (reference: cluster/src/test/.../benchmark/snappy/tpcds/) over the
  * driver's own tables — multi-level ROLLUP with a window over the
  * grouping level (q36 shape), EXISTS-combinator customer profiling
  * (q10/q35), channel-union analysis (q71), year-over-year self-joined
  * ratios (q74), cumulative-share windows (q51), multi-band scalar
  * count cross-join (q88), and CTE + per-group-threshold filtering (q1).
  *
  * Determinism/parity notes: every money aggregate goes through the
  * exact decimal-sum spelling (see [[graft.decSum]]); running/total
  * window sums use integer CENTS so no double accumulation order can
  * flip a comparison; every output ends in a total ORDER BY.
  *
  * 100 TB shapes: all filters are scan-pushed predicates; nation/region
  * (constant-size) are the only broadcast joins; EXISTS combinators are
  * left-semi joins on pre-filtered key sets (never row-multiplying);
  * the rollup is one partial+final aggregate pass and its window runs
  * over per-group rows (metadata scale), not fact rows.
  */
object TpcdsQueries {

  private def ts(s: String): Column = lit(s).cast("timestamp")

  val defs: Seq[QueryDef] = Seq(

    // ---- q36 shape: rollup margin levels ranked within hierarchy ----
    QueryDef.sql(
      "q_ds_rollup_rank",
      """WITH g AS (
        |  SELECT r_name, n_name,
        |    CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |    CAST(GROUPING(r_name) + GROUPING(n_name) AS INTEGER) AS lochierarchy,
        |    CAST(GROUPING(n_name) AS INTEGER) AS gn
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY ROLLUP(r_name, n_name))
        |SELECT r_name, n_name, revenue, lochierarchy,
        |  rank() OVER (PARTITION BY lochierarchy,
        |                 CASE WHEN gn = 0 THEN r_name END
        |               ORDER BY revenue DESC, coalesce(n_name, '')) AS rk
        |FROM g
        |ORDER BY lochierarchy, coalesce(r_name, ''), coalesce(n_name, '')""".stripMargin) { (s, dir) =>
      import graft.decSum
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      val joined = li
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      val g = joined.rollup(col("r_name"), col("n_name"))
        .agg(
          decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          (grouping(col("r_name")) + grouping(col("n_name"))).cast("int").as("lochierarchy"),
          grouping(col("n_name")).cast("int").as("gn"))
      val w = Window
        .partitionBy(col("lochierarchy"), when(col("gn") === 0, col("r_name")))
        .orderBy(col("revenue").desc, coalesce(col("n_name"), lit("")))
      g.withColumn("rk", rank().over(w))
        .select("r_name", "n_name", "revenue", "lochierarchy", "rk")
        .orderBy(col("lochierarchy"), coalesce(col("r_name"), lit("")),
          coalesce(col("n_name"), lit("")))
    },

    // ---- q10/q35 shape: EXISTS AND (EXISTS OR EXISTS) customer profile ----
    QueryDef.sql(
      "q_ds_exists_profile",
      """SELECT c_mktsegment, n_name, count(*) AS n_cust,
        |  (sign(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * floor(abs(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0) AS avg_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |                AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |  AND (EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |               WHERE o_custkey = c_custkey AND l_returnflag = 'R')
        |       OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT'))
        |GROUP BY c_mktsegment, n_name
        |ORDER BY c_mktsegment, n_name""".stripMargin) { (s, dir) =>
      import graft.{decSumRaw, dround}
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val active94 = ord
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-01-01 00:00:00"))
        .select(col("o_custkey").as("k1"))
      // OR of two EXISTS = one semi join against the UNION of key sets
      val returned = li.filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("k2"))
      val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k2"))
      val n = count(lit(1))
      cust
        .join(active94, col("c_custkey") === col("k1"), "left_semi")
        .join(returned.union(urgent), col("c_custkey") === col("k2"), "left_semi")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment"), col("n_name"))
        .agg(n.as("n_cust"),
          dround(decSumRaw(col("c_acctbal")) / n, 2).as("avg_bal"))
        .orderBy(col("c_mktsegment"), col("n_name"))
    },

    // ---- q71 shape: union of channel scans, grouped across channels ----
    QueryDef.sql(
      "q_ds_channel_union",
      """WITH ch AS (
        |  SELECT 'urgent' AS channel, o_custkey, o_totalprice FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT 'high' AS channel, o_custkey, o_totalprice FROM orders
        |  WHERE o_orderpriority = '2-HIGH'
        |  UNION ALL
        |  SELECT 'routine' AS channel, o_custkey, o_totalprice FROM orders
        |  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
        |SELECT channel, n_name, count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM ch
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY channel, n_name
        |ORDER BY channel, n_name""".stripMargin) { (s, dir) =>
      import graft.decSum
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      def arm(chan: String, pred: Column) = ord.filter(pred)
        .select(lit(chan).as("channel"), col("o_custkey"), col("o_totalprice"))
      val ch = arm("urgent", col("o_orderpriority") === "1-URGENT")
        .unionAll(arm("high", col("o_orderpriority") === "2-HIGH"))
        .unionAll(arm("routine", !col("o_orderpriority").isin("1-URGENT", "2-HIGH")))
      ch.join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("channel"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          decSum(col("o_totalprice")).as("revenue"))
        .orderBy(col("channel"), col("n_name"))
    },

    // ---- q74 shape: year-over-year customer spend ratio (self-join) ----
    QueryDef.sql(
      "q_ds_yoy_ratio",
      """WITH y AS (
        |  SELECT o_custkey, year(o_orderdate) AS yr,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        |  FROM orders
        |  WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY o_custkey, year(o_orderdate))
        |SELECT a.o_custkey AS custkey,
        |  (sign(b.spend / a.spend) * floor(abs(b.spend / a.spend) * 10000.0 + 0.5) / 10000.0) AS yoy
        |FROM y a JOIN y b ON a.o_custkey = b.o_custkey
        |WHERE a.yr = 1996 AND b.yr = 1997 AND b.spend > a.spend
        |ORDER BY yoy DESC, custkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      import graft.{decSumRaw, dround}
      // the oracle keeps q74's self-join spelling; the scale-correct
      // plan is ONE conditional-aggregation pass (the self-join derives
      // the yearly CTE twice — two full orders scans). A customer
      // missing either year yields a NULL spend, and NULL comparisons
      // drop exactly the rows the inner self-join would not produce.
      Tables.load(s, dir, "orders")
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .groupBy(col("o_custkey").as("custkey"))
        .agg(
          decSumRaw(when(year(col("o_orderdate")) === 1996,
            col("o_totalprice"))).as("spend_a"),
          decSumRaw(when(year(col("o_orderdate")) === 1997,
            col("o_totalprice"))).as("spend_b"))
        .filter(col("spend_b") > col("spend_a"))
        .select(col("custkey"),
          dround(col("spend_b") / col("spend_a"), 4).as("yoy"))
        .orderBy(col("yoy").desc, col("custkey"))
        .limit(100)
    },

    // ---- q51 shape: month each segment crossed half its total revenue
    // (cumulative window vs whole-partition window, integer cents so no
    // double accumulation order can flip the comparison) ----
    QueryDef.sql(
      "q_ds_cume_share",
      """WITH m AS (
        |  SELECT c_mktsegment AS seg, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT seg, mon,
        |    CAST(sum(cents) OVER (PARTITION BY seg ORDER BY mon) AS BIGINT) AS cume,
        |    CAST(sum(cents) OVER (PARTITION BY seg) AS BIGINT) AS total
        |  FROM m)
        |SELECT seg, min(mon) AS half_month
        |FROM w WHERE 2 * cume >= total
        |GROUP BY seg ORDER BY seg""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val m = ord.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          date_trunc("month", col("o_orderdate")).as("mon"))
        .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
          .cast("long").as("cents"))
      val wc = Window.partitionBy(col("seg")).orderBy(col("mon"))
      val wt = Window.partitionBy(col("seg"))
      m.withColumn("cume", sum(col("cents")).over(wc))
        .withColumn("total", sum(col("cents")).over(wt))
        .filter(lit(2) * col("cume") >= col("total"))
        .groupBy(col("seg")).agg(min(col("mon")).as("half_month"))
        .orderBy(col("seg"))
    },

    // ---- q88 shape: time-band scalar counts cross-joined to one row ----
    QueryDef.sql(
      "q_ds_hour_bands",
      """SELECT * FROM
        |  (SELECT count(*) AS h_night FROM events WHERE hour(ts) < 6) a
        |CROSS JOIN
        |  (SELECT count(*) AS h_morning FROM events
        |   WHERE hour(ts) >= 6 AND hour(ts) < 12) b
        |CROSS JOIN
        |  (SELECT count(*) AS h_afternoon FROM events
        |   WHERE hour(ts) >= 12 AND hour(ts) < 18) c
        |CROSS JOIN
        |  (SELECT count(*) AS h_evening FROM events WHERE hour(ts) >= 18) d""".stripMargin) { (s, dir) =>
      // one conditional-aggregation pass over the scan — the plan the DS
      // eight-subquery text WANTS at scale (the oracle keeps the
      // cross-join spelling; output is the identical single row)
      Tables.load(s, dir, "events")
        .agg(
          sum(when(hour(col("ts")) < 6, 1L).otherwise(0L)).as("h_night"),
          sum(when(hour(col("ts")) >= 6 && hour(col("ts")) < 12, 1L)
            .otherwise(0L)).as("h_morning"),
          sum(when(hour(col("ts")) >= 12 && hour(col("ts")) < 18, 1L)
            .otherwise(0L)).as("h_afternoon"),
          sum(when(hour(col("ts")) >= 18, 1L).otherwise(0L)).as("h_evening"))
    },

    // ---- DS q1 shape: CTE aggregate + per-group threshold filter ----
    QueryDef.sql(
      "q_ds_returns_above_avg",
      """WITH ret AS (
        |  SELECT o_custkey AS custkey, c_nationkey AS nk,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS ret_cents
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT custkey, ret_cents,
        |    CAST(sum(ret_cents) OVER (PARTITION BY nk) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY nk) AS nation_avg
        |  FROM ret)
        |SELECT custkey, CAST(ret_cents AS DOUBLE) / 100.0 AS returned
        |FROM w
        |WHERE ret_cents > 1.2 * nation_avg
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val ret = li.filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey").as("custkey"), col("c_nationkey").as("nk"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,4)")) * 100)
          .cast("long").as("ret_cents"))
      // per-nation threshold as a WINDOW over the aggregate, not a
      // groupBy + self-join: the CTE-twice plan re-scans the fact side
      // for the average — one pass over per-customer rows instead
      val wn = Window.partitionBy(col("nk"))
      ret
        .withColumn("nation_avg",
          sum(col("ret_cents")).over(wn).cast("double") /
            count(lit(1)).over(wn))
        .filter(col("ret_cents") > lit(1.2) * col("nation_avg"))
        .select(col("custkey"),
          (col("ret_cents").cast("double") / 100.0).as("returned"))
        .orderBy(col("custkey"))
    },

    // ---- q17/q29 shape: buy → return → buy-again chain (doubly-nested
    // correlated EXISTS in the oracle; the scale plan rewrites the
    // temporal exists-pair to per-customer MIN/MAX aggregates — one pass
    // over orders + one semi join, no fact-fact row-multiplying join) ----
    QueryDef.sql(
      "q_ds_ret_rebuy",
      """SELECT n_name, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o1
        |  WHERE o1.o_custkey = c_custkey
        |    AND EXISTS (SELECT 1 FROM lineitem
        |                WHERE l_orderkey = o1.o_orderkey AND l_returnflag = 'R')
        |    AND EXISTS (SELECT 1 FROM orders o2
        |                WHERE o2.o_custkey = c_custkey
        |                  AND o2.o_orderdate > o1.o_orderdate))
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      // ∃ returned order o1 with some order strictly later ⇔
      // min(returned-order dates) < max(all-order dates)
      val firstRet = ord
        .join(li.filter(col("l_returnflag") === "R").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_custkey").as("ck"))
        .agg(min(col("o_orderdate")).as("first_ret"))
      val lastOrd = ord.groupBy(col("o_custkey").as("ck2"))
        .agg(max(col("o_orderdate")).as("last_ord"))
      firstRet.join(lastOrd, col("ck") === col("ck2"))
        .filter(col("last_ord") > col("first_ret"))
        .join(cust, col("c_custkey") === col("ck"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("n_name"))
    },

    // ---- q47/q57 shape: months deviating >10% from their year's mean,
    // with lag/lead neighbors — the deviation test stays in INTEGER
    // cents (|12·m − T|·10 > T ⇔ |m − T/12| > 0.1·T/12) so no double
    // accumulation order can flip a row in or out ----
    QueryDef.sql(
      "q_ds_monthly_dev",
      """WITH m AS (
        |  SELECT o_orderpriority AS prio, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT prio, yr, mon, cents,
        |    CAST(sum(cents) OVER (PARTITION BY prio, yr) AS BIGINT) AS t,
        |    CAST(count(*) OVER (PARTITION BY prio, yr) AS BIGINT) AS nm,
        |    lag(cents) OVER (PARTITION BY prio, yr ORDER BY mon) AS prev_cents,
        |    lead(cents) OVER (PARTITION BY prio, yr ORDER BY mon) AS next_cents
        |  FROM m)
        |SELECT prio, yr, mon, cents, prev_cents, next_cents
        |FROM w WHERE nm = 12 AND 10 * abs(12 * cents - t) > t
        |ORDER BY prio, yr, mon""".stripMargin) { (s, dir) =>
      val m = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          year(col("o_orderdate")).as("yr"),
          date_trunc("month", col("o_orderdate")).as("mon"))
        .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
          .cast("long").as("cents"))
      val wy = Window.partitionBy(col("prio"), col("yr"))
      val wm = wy.orderBy(col("mon"))
      m.withColumn("t", sum(col("cents")).over(wy))
        .withColumn("nm", count(lit(1)).over(wy))
        .withColumn("prev_cents", lag(col("cents"), 1).over(wm))
        .withColumn("next_cents", lead(col("cents"), 1).over(wm))
        .filter(col("nm") === 12 &&
          lit(10) * abs(lit(12) * col("cents") - col("t")) > col("t"))
        .select("prio", "yr", "mon", "cents", "prev_cents", "next_cents")
        .orderBy("prio", "yr", "mon")
    },

    // ---- q97 shape: channel-overlap counts via FULL OUTER join of two
    // distinct (customer, month) key sets — the one join type no other
    // driver row exercises ----
    QueryDef.sql(
      "q_ds_channel_overlap",
      """WITH a AS (
        |  SELECT DISTINCT o_custkey AS ck, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |b AS (
        |  SELECT DISTINCT o_custkey AS ck, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon
        |  FROM orders WHERE o_orderpriority = '5-LOW')
        |SELECT
        |  CAST(sum(CASE WHEN a.ck IS NOT NULL AND b.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_ch,
        |  CAST(sum(CASE WHEN a.ck IS NOT NULL AND b.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS urgent_only,
        |  CAST(sum(CASE WHEN a.ck IS NULL AND b.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS low_only
        |FROM a FULL OUTER JOIN b ON a.ck = b.ck AND a.mon = b.mon""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      def side(prio: String, ck: String, mon: String) = ord
        .filter(col("o_orderpriority") === prio)
        .select(col("o_custkey").as(ck),
          date_trunc("month", col("o_orderdate")).as(mon))
        .distinct()
      val a = side("1-URGENT", "ck_a", "mon_a")
      val b = side("5-LOW", "ck_b", "mon_b")
      a.join(b, col("ck_a") === col("ck_b") && col("mon_a") === col("mon_b"),
          "full_outer")
        .agg(
          sum(when(col("ck_a").isNotNull && col("ck_b").isNotNull, 1L)
            .otherwise(0L)).as("both_ch"),
          sum(when(col("ck_a").isNotNull && col("ck_b").isNull, 1L)
            .otherwise(0L)).as("urgent_only"),
          sum(when(col("ck_a").isNull && col("ck_b").isNotNull, 1L)
            .otherwise(0L)).as("low_only"))
    },

    // ---- q93 shape: net customer spend after excluding returned lines
    // (fact LEFT JOIN returns-subset + COALESCE-style arithmetic; sums in
    // exact 10⁻⁴ units so the BIGINT cast is lossless on both engines) ----
    QueryDef.sql(
      "q_ds_returns_net",
      """WITH r AS (
        |  SELECT l_orderkey AS rk, l_linenumber AS rl
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT o_custkey AS custkey,
        |  CAST(sum(CASE WHEN r.rk IS NULL
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) * 10000
        |    ELSE 0 END) AS BIGINT) AS net_e4
        |FROM lineitem l
        |JOIN orders ON l.l_orderkey = o_orderkey
        |LEFT JOIN r ON l.l_orderkey = r.rk AND l.l_linenumber = r.rl
        |GROUP BY o_custkey
        |ORDER BY net_e4 DESC, custkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val r = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("rk"), col("l_linenumber").as("rl"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(r, col("l_orderkey") === col("rk") &&
          col("l_linenumber") === col("rl"), "left_outer")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(sum(when(col("rk").isNull,
            (col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,4)") * 10000)
          .otherwise(lit(0))).cast("long").as("net_e4"))
        .orderBy(col("net_e4").desc, col("custkey"))
        .limit(100)
    },

    // ---- q39 shape: demand-volatility screen — per (priority, year)
    // coefficient of variation of monthly order counts, consecutive
    // years joined (the inventory mean/stdev + period self-join shape).
    // The CV is one double division over aggregates of exact integers,
    // rounded 4dp on both engines ----
    QueryDef.sql(
      "q_ds_inventory_cv",
      """WITH m AS (
        |  SELECT o_orderpriority AS prio, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    CAST(month(o_orderdate) AS INTEGER) AS mon, count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2, 3),
        |s AS (
        |  SELECT prio, yr,
        |    (sign(stddev_samp(n_orders) / avg(n_orders)) * floor(abs(stddev_samp(n_orders) / avg(n_orders)) * 10000.0 + 0.5) / 10000.0) AS cv,
        |    count(*) AS n_months
        |  FROM m GROUP BY 1, 2)
        |SELECT a.prio, a.yr AS yr1, a.cv AS cv1, b.cv AS cv2
        |FROM s a JOIN s b ON a.prio = b.prio AND b.yr = a.yr + 1
        |WHERE a.n_months = 12 AND b.n_months = 12
        |ORDER BY a.prio, a.yr""".stripMargin) { (s, dir) =>
      import graft.dround
      val m = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n_orders"))
      val st = m.groupBy(col("prio"), col("yr"))
        .agg(dround(stddev_samp(col("n_orders")) / avg(col("n_orders")), 4).as("cv"),
          count(lit(1)).as("n_months"))
      val a = st.select(col("prio"), col("yr"), col("cv").as("cv1"),
        col("n_months").as("nm1"))
      val b = st.select(col("prio").as("prio2"), col("yr").as("yr2"),
        col("cv").as("cv2"), col("n_months").as("nm2"))
      a.join(b, col("prio") === col("prio2") && col("yr2") === col("yr") + 1)
        .filter(col("nm1") === 12 && col("nm2") === 12)
        .select(col("prio"), col("yr").as("yr1"), col("cv1"), col("cv2"))
        .orderBy("prio", "yr1")
    },

    // ---- q49 shape: worst-return ranking — per (priority, year) the
    // returned-quantity ratio, ranked; exact decimal sums, ONE portable
    // IEEE division, deterministic rank tiebreak ----
    QueryDef.sql(
      "q_ds_return_rank",
      """WITH r AS (
        |  SELECT o_orderpriority AS prio, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS ret_qty,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS tot_qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |k AS (
        |  SELECT prio, yr,
        |    (sign(ret_qty / tot_qty) * floor(abs(ret_qty / tot_qty) * 10000.0 + 0.5) / 10000.0) AS ratio
        |  FROM r)
        |SELECT prio, yr, ratio,
        |  CAST(rank() OVER (ORDER BY ratio DESC, prio, yr) AS INTEGER) AS rk
        |FROM k
        |ORDER BY rk, prio, yr""".stripMargin) { (s, dir) =>
      import graft.{decSumRaw, dround}
      val r = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("prio"),
          year(col("o_orderdate")).as("yr"))
        .agg(
          decSumRaw(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(lit(0))).cast("double").as("ret_qty"),
          decSumRaw(col("l_quantity")).cast("double").as("tot_qty"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ratio").desc, col("prio"), col("yr"))
      r.select(col("prio"), col("yr"),
          dround(col("ret_qty") / col("tot_qty"), 4).as("ratio"))
        .withColumn("rk", rank().over(w).cast("int"))
        .orderBy("rk", "prio", "yr")
    },

    // ---- q14 shape: parts sold through BOTH channels (INTERSECT of the
    // channel key sets — bounded by |part|, metadata scale — feeding a
    // semi join back into the fact aggregation) ----
    QueryDef.sql(
      "q_ds_cross_channel",
      """WITH both_parts AS (
        |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderpriority = '5-LOW')
        |SELECT p_brand, count(*) AS n_items,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_partkey IN (SELECT l_partkey FROM both_parts)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      import graft.decSum
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val part = Tables.load(s, dir, "part")
      // the INTERSECT of two per-channel part sets is ONE fact pass with
      // two channel flags (guide §2.4 — aggregate instead of a second
      // pass + intersect's two distinct shuffles): a part is in both
      // channels iff its per-partkey max-flags are both set
      val both = li.select(col("l_orderkey"), col("l_partkey"))
        .join(ord.filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"))
        .agg(max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("u"),
          max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0)).as("w"))
        .filter(col("u") === 1 && col("w") === 1)
        .select(col("l_partkey").as("bp"))
      li.join(both, col("l_partkey") === col("bp"), "left_semi")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("p_brand"))
    })
}
