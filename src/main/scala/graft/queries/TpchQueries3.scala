package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H q2/q11/q16/q20 — the partsupp wave (reference:
  * cluster/src/test/.../benchmark/TPCH_Queries.scala).
  *
  * The driver's test schema has no partsupp table, so these four run
  * over a DETERMINISTIC SYNTHESIZED partsupp: 4 supplier rows per part,
  * derived from (p_partkey, supplier count) by a fixed integer formula
  * that both engines replay exactly (same trick as q_text_redact's
  * fabricated PII). The formula is pure column arithmetic, so the
  * "table" materializes scan-side with zero shuffle and zero storage —
  * at 100 TB it is 4×|part| generated rows that fuse into whatever join
  * consumes them.
  */
object TpchQueries3 {

  private def ts(s: String): Column = lit(s).cast("timestamp")
  private def r2(c: Column): Column = graft.dr2(c)

  /** Synthesized partsupp: for each part, i in 0..3,
    *   ps_suppkey    = (p_partkey + 7·i) mod |supplier|
    *   ps_availqty   = 1 + (13·ps_partkey + 7·ps_suppkey) mod 9999
    *   ps_supplycost = 1.0 + ((17·ps_partkey + 31·ps_suppkey) mod 10000)/100.0
    * The 7-step keeps the four suppkeys distinct for every supplier
    * count in the test data (10/100/1000). Integer-only arithmetic →
    * bit-identical across Spark and DuckDB.
    */
  def partsupp(s: SparkSession, dir: String): DataFrame = {
    val nSupp = Tables.load(s, dir, "supplier").count()
    Tables.load(s, dir, "part")
      .select(col("p_partkey").as("ps_partkey"),
        explode(array((0 to 3).map(lit): _*)).as("i"))
      .select(col("ps_partkey"),
        ((col("ps_partkey") + col("i") * 7) % nSupp).as("ps_suppkey"))
      .select(col("ps_partkey"), col("ps_suppkey"),
        (lit(1) + (col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 9999)
          .as("ps_availqty"),
        (lit(1.0) + (col("ps_partkey") * 17 + col("ps_suppkey") * 31) % 10000 / 100.0)
          .as("ps_supplycost"))
  }

  /** The DuckDB replay of [[partsupp]], prepended to each oracle. */
  private val PS_SQL =
    """WITH ps0 AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey + i.i * 7) % (SELECT count(*) FROM supplier) AS ps_suppkey
      |  FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
      |), partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |         1 + (ps_partkey * 13 + ps_suppkey * 7) % 9999 AS ps_availqty,
      |         1.0 + ((ps_partkey * 17 + ps_suppkey * 31) % 10000) / 100.0 AS ps_supplycost
      |  FROM ps0
      |)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- Q2: minimum-cost supplier (correlated regional min) ----
    QueryDef.sql(
      "q2_min_cost_supplier",
      s"""$PS_SQL,
        |regional AS (
        |  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
        |  FROM partsupp
        |    JOIN supplier ON s_suppkey = ps_suppkey
        |    JOIN nation   ON n_nationkey = s_nationkey
        |    JOIN region   ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
        |),
        |min_cost AS (
        |  SELECT ps_partkey, min(ps_supplycost) AS mc FROM regional GROUP BY ps_partkey
        |)
        |SELECT (sign(s_acctbal) * floor(abs(s_acctbal) * 100.0 + 0.5) / 100.0) AS s_acctbal, s_name, n_name,
        |       p_partkey, (sign(ps_supplycost) * floor(abs(ps_supplycost) * 100.0 + 0.5) / 100.0) AS ps_supplycost
        |FROM regional
        |  JOIN part ON p_partkey = ps_partkey AND p_size = 15
        |  JOIN min_cost ON min_cost.ps_partkey = regional.ps_partkey
        |              AND ps_supplycost = mc
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val supp = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE")
      // partsupp restricted to the region once, reused for both the
      // per-part min and the final probe (nation/region broadcast —
      // constant dims; supplier joins via AQE's size gate)
      val regional = partsupp(s, dir)
        .join(supp, col("s_suppkey") === col("ps_suppkey"))
        .join(broadcast(nat), col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(reg), col("r_regionkey") === col("n_regionkey"))
        .select(col("ps_partkey"), col("ps_suppkey"), col("ps_supplycost"),
          col("s_acctbal"), col("s_name"), col("n_name"))
      val minCost = regional.groupBy(col("ps_partkey").as("mc_partkey"))
        .agg(min(col("ps_supplycost")).as("mc"))
      val part = Tables.load(s, dir, "part")
        .filter(col("p_size") === 15)
      regional
        .join(part, col("p_partkey") === col("ps_partkey"))
        .join(minCost,
          col("mc_partkey") === col("ps_partkey") && col("ps_supplycost") === col("mc"))
        .select(r2(col("s_acctbal")).as("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), r2(col("ps_supplycost")).as("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

    // ---- Q11: important stock identification (HAVING vs global scalar) ----
    QueryDef.sql(
      "q11_important_stock",
      s"""$PS_SQL,
        |national AS (
        |  SELECT ps_partkey,
        |    CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty AS v
        |  FROM partsupp
        |    JOIN supplier ON ps_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |)
        |SELECT ps_partkey, CAST(sum(v) AS DOUBLE) AS value
        |FROM national
        |GROUP BY ps_partkey
        |HAVING sum(v) > (SELECT sum(v) * 0.001 FROM national)
        |ORDER BY value DESC, ps_partkey""".stripMargin) { (s, dir) =>
      val supp = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation").filter(col("n_name") === "NATION_3")
      // the HAVING threshold compares against a global sum: keep the
      // arithmetic DECIMAL end to end (supplycost has exactly 2
      // decimals, so the cast is representation-exact) — a double sum
      // is partition-order-dependent and could flip a borderline group
      // against the oracle's differently-ordered sum
      val national = partsupp(s, dir)
        .join(supp, col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost").cast("decimal(12,2)") * col("ps_availqty")).as("v"))
      val threshold = national.agg(
        (sum(col("v")) * lit(new java.math.BigDecimal("0.001"))).as("thr"))
      national.groupBy(col("ps_partkey"))
        .agg(sum(col("v")).as("raw_value"))
        // single-row global aggregate → broadcast is provably safe
        .join(broadcast(threshold))
        .filter(col("raw_value") > col("thr"))
        .select(col("ps_partkey"), col("raw_value").cast("double").as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },

    // ---- Q16: parts/supplier relationship (anti-join + count distinct) ----
    QueryDef.sql(
      "q16_parts_supplier",
      s"""$PS_SQL
        |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#3'
        |  AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
      val part = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#3" &&
          !col("p_type").like("MEDIUM%") &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      // the reference's comment-based supplier blacklist, re-keyed to an
      // available column (negative balance stands in for complaints)
      val badSupp = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      partsupp(s, dir)
        .join(part, col("p_partkey") === col("ps_partkey"))
        .join(badSupp, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // ---- Q20: potential part promotion (nested semi joins + correlated agg) ----
    QueryDef.sql(
      "q20_potential_promotion",
      s"""$PS_SQL
        |SELECT s_name, (sign(s_acctbal) * floor(abs(s_acctbal) * 100.0 + 0.5) / 100.0) AS s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND ps_availqty > COALESCE(
        |        (SELECT 0.5 * sum(l_quantity) FROM lineitem
        |         WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'), 0))
        |ORDER BY s_name""".stripMargin) { (s, dir) =>
      val redParts = Tables.load(s, dir, "part")
        .filter(col("p_name").like("red%")).select(col("p_partkey"))
      // decorrelated: per-(part, supplier) shipped quantity, left-joined
      // under the availability predicate (COALESCE keeps never-shipped
      // stock eligible — it is all surplus)
      val shipped = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg((sum(col("l_quantity")) * 0.5).as("half_qty"))
      val qualifying = partsupp(s, dir)
        .join(redParts, col("p_partkey") === col("ps_partkey"), "left_semi")
        .join(shipped,
          col("l_partkey") === col("ps_partkey") && col("l_suppkey") === col("ps_suppkey"),
          "left")
        .filter(col("ps_availqty") > coalesce(col("half_qty"), lit(0.0)))
        .select(col("ps_suppkey"))
      val nat = Tables.load(s, dir, "nation").filter(col("n_name") === "NATION_3")
      Tables.load(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(qualifying, col("ps_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("s_name"), r2(col("s_acctbal")).as("s_acctbal"))
        .orderBy(col("s_name"))
    }
  )
}
