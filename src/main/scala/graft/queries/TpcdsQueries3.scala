package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS-shaped wave 5 (reference: cluster/src/test/.../benchmark/snappy/
  * tpcds/): four mechanics the earlier waves still missed — a temporal
  * follow-on window anchored at each customer's FIRST event (q54's
  * "became a customer, then…" shape), composite-key repeat-purchase
  * across periods (q64), the weekday revenue pivot (q59), and
  * growth-vs-global comparison done as ratio-of-ratios (q31) — evaluated
  * by INTEGER cross-multiplication over exact cents so no division ever
  * happens on the comparison path.
  *
  * Parity notes: the follow-on window is a FIXED 90-day interval (month
  * arithmetic clamps differently at month ends across engines; day
  * arithmetic is exact everywhere); weekday uses ISO numbering (Spark
  * `weekday()+1` == DuckDB `isodow`); week numbers are ISO in both
  * engines.
  */
object TpcdsQueries3 {

  val defs: Seq[QueryDef] = Seq(

    // ---- q54 shape: first urgent order, then high-priority follow-on
    // within 90 days — per-customer anchor via a min-aggregate, the
    // follow-on count via one conditional re-join-free pass over the
    // same orders scan (join on custkey against the anchor set, which is
    // customer-bounded metadata, not fact-scale). ----
    QueryDef.sql(
      "q_ds_follow_on",
      """WITH anchor AS (
        |  SELECT o_custkey AS ck, min(o_orderdate) AS fu
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  GROUP BY o_custkey),
        |f AS (
        |  SELECT a.ck, count(*) AS n_follow
        |  FROM anchor a JOIN orders o ON o.o_custkey = a.ck
        |  WHERE o.o_orderpriority = '2-HIGH'
        |    AND o.o_orderdate > a.fu
        |    AND o.o_orderdate <= a.fu + INTERVAL 90 DAY
        |  GROUP BY a.ck)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(n_follow) AS BIGINT) AS n_follow_orders
        |FROM f JOIN customer ON ck = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val anchor = ord.filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey").as("ck"))
        .agg(min(col("o_orderdate")).as("fu"))
      val follow = ord.filter(col("o_orderpriority") === "2-HIGH")
        .join(anchor, col("o_custkey") === col("ck"))
        .filter(col("o_orderdate") > col("fu") &&
          col("o_orderdate") <= col("fu") + expr("INTERVAL 90 DAY"))
        .groupBy(col("ck")).agg(count(lit(1)).as("n_follow"))
      follow.join(cust, col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("n_follow")).cast("long").as("n_follow_orders"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- q64 shape: composite-key repeat purchase — (customer, part)
    // pairs active in BOTH 1996 and 1997. The oracle spells the self-
    // join; the Spark side is ONE conditional-aggregation pass over the
    // fact (the scale-correct plan: no second fact scan). ----
    QueryDef.sql(
      "q_ds_repeat_pairs",
      """WITH cp AS (
        |  SELECT o_custkey AS ck, l_partkey AS pk,
        |    CAST(sum(CASE WHEN year(o_orderdate) = 1996
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q96,
        |    CAST(sum(CASE WHEN year(o_orderdate) = 1997
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q97
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, count(*) AS n_pairs,
        |  CAST(sum(q96) AS BIGINT) AS qty96,
        |  CAST(sum(q97) AS BIGINT) AS qty97
        |FROM cp JOIN customer ON ck = c_custkey
        |WHERE q96 > 0 AND q97 > 0
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      def yq(y: Int) = sum(when(year(col("o_orderdate")) === y,
        col("l_quantity").cast("long")).otherwise(0L)).cast("long")
      val cp = li.join(
          ord.filter(year(col("o_orderdate")).isin(1996, 1997))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
        .agg(yq(1996).as("q96"), yq(1997).as("q97"))
        .filter(col("q96") > 0 && col("q97") > 0)
      cp.join(cust, col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("q96")).cast("long").as("qty96"),
          sum(col("q97")).cast("long").as("qty97"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- q59 shape: weekly revenue pivoted to ISO weekdays. Spark
    // weekday()+1 == DuckDB isodow (Mon=1..Sun=7); the week key is the
    // ISO (year, week) pair — calendar year would merge early-January
    // and late-December into one "week 1" bucket; revenue in exact
    // cents, one conditional-agg pass per ISO week. ----
    QueryDef.sql(
      "q_ds_weekday_pivot",
      """SELECT isoyear(o_orderdate) AS yr, week(o_orderdate) AS wk,
        |  CAST(sum(CASE WHEN isodow(o_orderdate) = 1 THEN cents ELSE 0 END) AS BIGINT) AS mon_c,
        |  CAST(sum(CASE WHEN isodow(o_orderdate) = 2 THEN cents ELSE 0 END) AS BIGINT) AS tue_c,
        |  CAST(sum(CASE WHEN isodow(o_orderdate) = 3 THEN cents ELSE 0 END) AS BIGINT) AS wed_c,
        |  CAST(sum(CASE WHEN isodow(o_orderdate) = 4 THEN cents ELSE 0 END) AS BIGINT) AS thu_c,
        |  CAST(sum(CASE WHEN isodow(o_orderdate) = 5 THEN cents ELSE 0 END) AS BIGINT) AS fri_c,
        |  CAST(sum(CASE WHEN isodow(o_orderdate) = 6 THEN cents ELSE 0 END) AS BIGINT) AS sat_c,
        |  CAST(sum(CASE WHEN isodow(o_orderdate) = 7 THEN cents ELSE 0 END) AS BIGINT) AS sun_c
        |FROM (
        |  SELECT o_orderdate,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
        |  FROM orders WHERE year(o_orderdate) = 1997)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderdate"),
          (col("o_totalprice").cast("decimal(18,4)") * 100)
            .cast("long").as("cents"))
      def dow(i: Int) = sum(when(weekday(col("o_orderdate")) + 1 === i,
        col("cents")).otherwise(0L)).cast("long")
      ord.groupBy(expr("extract(YEAROFWEEK FROM o_orderdate)").as("yr"),
          weekofyear(col("o_orderdate")).as("wk"))
        .agg(dow(1).as("mon_c"), dow(2).as("tue_c"), dow(3).as("wed_c"),
          dow(4).as("thu_c"), dow(5).as("fri_c"), dow(6).as("sat_c"),
          dow(7).as("sun_c"))
        .orderBy(col("yr"), col("wk"))
    },

    // ---- q31 shape: nations whose Q1→Q2 1996 revenue growth beats the
    // GLOBAL Q1→Q2 growth. Ratio-of-ratios with no division anywhere:
    // nation_q2 * global_q1 > nation_q1 * global_q2 — the products
    // overflow BIGINT at scale (1e11-cent quarters), so the comparison
    // runs in exact DECIMAL(38,0) on both engines (the one-row global
    // aggregate broadcasts). ----
    QueryDef.sql(
      "q_ds_growth_vs_global",
      """WITH n AS (
        |  SELECT n_name,
        |    CAST(sum(CASE WHEN month(o_orderdate) IN (1,2,3)
        |      THEN cents ELSE 0 END) AS BIGINT) AS q1,
        |    CAST(sum(CASE WHEN month(o_orderdate) IN (4,5,6)
        |      THEN cents ELSE 0 END) AS BIGINT) AS q2
        |  FROM (
        |    SELECT o_custkey, o_orderdate,
        |      CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
        |    FROM orders
        |    WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 6)
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |g AS (SELECT CAST(sum(q1) AS BIGINT) AS gq1,
        |             CAST(sum(q2) AS BIGINT) AS gq2 FROM n)
        |SELECT n_name, q1, q2
        |FROM n, g
        |WHERE q1 > 0
        |  AND CAST(q2 AS DECIMAL(38,0)) * gq1 > CAST(q1 AS DECIMAL(38,0)) * gq2
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996 &&
          month(col("o_orderdate")) <= 6)
        .select(col("o_custkey"), col("o_orderdate"),
          (col("o_totalprice").cast("decimal(18,4)") * 100)
            .cast("long").as("cents"))
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      def qtr(ms: Seq[Int]) = sum(when(month(col("o_orderdate")).isin(ms: _*),
        col("cents")).otherwise(0L)).cast("long")
      val n = ord
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(qtr(Seq(1, 2, 3)).as("q1"), qtr(Seq(4, 5, 6)).as("q2"))
      val g = n.agg(sum(col("q1")).cast("long").as("gq1"),
        sum(col("q2")).cast("long").as("gq2"))
      n.join(broadcast(g))
        .filter(col("q1") > 0 &&
          col("q2").cast("decimal(38,0)") * col("gq1") >
            col("q1").cast("decimal(38,0)") * col("gq2"))
        .select(col("n_name"), col("q1"), col("q2"))
        .orderBy(col("n_name"))
    }
  )
}
