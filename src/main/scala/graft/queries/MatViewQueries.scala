package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.store.MatViews

import graft.{GraftSession, Plans, QueryDef, Tables}

/** Materialized views over store tables: transparent rewrite, O(delta)
  * incremental refresh, and the freshness gate (a stale view NEVER
  * serves). Each query asserts the PLAN it claims (rewrite fired / was
  * refused) before returning rows, so a silently-degraded rewrite fails
  * the oracle gate, not just a spec.
  *
  * 100 TB story: the dashboards-over-a-fact-table pattern — a GROUP BY
  * over the full table becomes a scan of a dimension-cardinality summary
  * whose freshness proof is O(batch metadata), and whose maintenance
  * after appends is O(new rows).
  */
object MatViewQueries {

  private def assertServedBy(df: DataFrame, mv: String): DataFrame = {
    require(Plans.scansStoreTable(df, mv),
      s"matview rewrite did not fire; scanned ${Plans.scannedTables(df)}")
    df
  }

  private def assertNotServedBy(df: DataFrame, mv: String): DataFrame = {
    require(!Plans.scansStoreTable(df, mv),
      s"stale matview $mv must not serve")
    df
  }

  /** Idempotent per-run reset: bench/verify call each query repeatedly. */
  private def reset(g: GraftSession, mv: String, base: String): Unit = {
    if (MatViews.isMatView(mv)) g.dropMaterializedView(mv)
    else if (g.isManaged(mv)) g.dropTable(mv)
    if (g.isManaged(base)) g.dropTable(base)
  }

  def defs: Seq[QueryDef] = Seq(

    // ---- transparent rewrite + rollup: the view groups by (status,
    // priority); the query rolls up to status alone — sums/counts add,
    // min/min, max/max — and MUST be served from the view (asserted on
    // the optimized plan). Decimal sums keep the compare exact ----
    QueryDef.sql(
      "q_matview_rewrite",
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS mn,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS mx
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mv_sum", "q_mv_base")
      g.createTable("q_mv_base", Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("amt")),
        partitionBy = Seq("o_orderstatus"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mv_sum AS " +
        "SELECT o_orderstatus, o_orderpriority, sum(amt) AS s, count(*) AS n, " +
        "min(amt) AS mn, max(amt) AS mx FROM q_mv_base " +
        "GROUP BY o_orderstatus, o_orderpriority")
      val rolled = s.sql(
        "SELECT o_orderstatus, sum(amt) AS ts, count(*) AS n, " +
          "min(amt) AS tmn, max(amt) AS tmx FROM q_mv_base GROUP BY o_orderstatus")
      assertServedBy(rolled, "q_mv_sum")
        .select(col("o_orderstatus"), col("ts").cast("double").as("total"),
          col("n"), col("tmn").cast("double").as("mn"),
          col("tmx").cast("double").as("mx"))
        .orderBy("o_orderstatus")
    },

    // ---- O(delta) maintenance: build the view on two thirds of orders,
    // append the remaining third, REFRESH — the path MUST be
    // "incremental" (only the new batches are aggregated and merged by
    // key), and the served rollup must equal the full-table oracle ----
    QueryDef.sql(
      "q_matview_incremental",
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvi_sum", "q_mvi_base")
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("amt"))
      g.createTable("q_mvi_base", orders.filter(col("o_orderkey") % 3 =!= 0),
        partitionBy = Seq("o_orderpriority"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvi_sum AS " +
        "SELECT o_orderpriority, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvi_base GROUP BY o_orderpriority")
      g.insert("q_mvi_base", orders.filter(col("o_orderkey") % 3 === 0))
      val path = g.refreshMaterializedView("q_mvi_sum")
      require(path == "incremental", s"append-only refresh took '$path'")
      val served = s.sql("SELECT o_orderpriority, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvi_base GROUP BY o_orderpriority")
      assertServedBy(served, "q_mvi_sum")
        .select(col("o_orderpriority"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderpriority")
    },

    // ---- sketch-typed summary: the view stores a MERGEABLE DataSketches
    // HLL per (priority, status); rolling up to priority UNIONS the
    // sketches, deduplicating customers ACROSS status groups (a numeric
    // count rollup would overcount) — estimate pinned within 5% of the
    // exact distinct; count(DISTINCT status) derives EXACTLY from the
    // summary's own rows. Both plan-asserted MV-served ----
    QueryDef.sql(
      "q_matview_distinct_rollup",
      """SELECT o_orderpriority,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  count(*) AS n,
        |  count(DISTINCT o_custkey) AS exact_cust,
        |  CAST(1 AS BOOLEAN) AS hll_within_5pct
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvd_sum", "q_mvd_base")
      g.createTable("q_mvd_base", Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus"), col("o_custkey")),
        partitionBy = Seq("o_orderpriority"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvd_sum AS " +
        "SELECT o_orderpriority, o_orderstatus, " +
        "approx_count_distinct(o_custkey) AS ac, count(*) AS n " +
        "FROM q_mvd_base GROUP BY o_orderpriority, o_orderstatus")
      val served = s.sql(
        "SELECT o_orderpriority, count(DISTINCT o_orderstatus) AS n_status, " +
          "count(*) AS n, approx_count_distinct(o_custkey) AS ac " +
          "FROM q_mvd_base GROUP BY o_orderpriority")
      assertServedBy(served, "q_mvd_sum")
      // exact side deliberately scans the base — it is the accuracy pin
      val exact = s.sql(
        "SELECT o_orderpriority AS p, count(DISTINCT o_custkey) AS exact_cust " +
          "FROM q_mvd_base GROUP BY o_orderpriority")
      served.join(exact, col("o_orderpriority") === col("p"))
        .select(col("o_orderpriority"), col("n_status"), col("n"), col("exact_cust"),
          (abs(col("ac") - col("exact_cust")) <= col("exact_cust") * 0.05)
            .as("hll_within_5pct"))
        .orderBy("o_orderpriority")
    },

    // ---- FILTERED view: the view pre-filters to one status; a query
    // restating the predicate VERBATIM is served (plan-asserted), one
    // omitting or changing it is refused (exact containment — rows the
    // view excluded can never come back from the summary) ----
    QueryDef.sql(
      "q_matview_filtered",
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvf_sum", "q_mvf_base")
      g.createTable("q_mvf_base", Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("amt")),
        partitionBy = Seq("o_orderpriority"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvf_sum AS " +
        "SELECT o_orderpriority, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvf_base WHERE o_orderstatus = 'F' GROUP BY o_orderpriority")
      // no predicate / different literal → the view must NOT serve
      assertNotServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
        "FROM q_mvf_base GROUP BY o_orderpriority"), "q_mvf_sum")
      assertNotServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
        "FROM q_mvf_base WHERE o_orderstatus = 'O' GROUP BY o_orderpriority"),
        "q_mvf_sum")
      val served = s.sql(
        "SELECT o_orderpriority, sum(amt) AS ts, count(*) AS n " +
          "FROM q_mvf_base WHERE o_orderstatus = 'F' GROUP BY o_orderpriority")
      assertServedBy(served, "q_mvf_sum")
        .select(col("o_orderpriority"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderpriority")
    },

    // ---- RANGE-filtered view (the "recent window" dashboard slice):
    // the view pre-filters `o_orderdate >= <cutoff>`; a query restating
    // the range VERBATIM is served — including with the operands
    // FLIPPED (`lit <= col` canonicalizes to `col >= lit`) — while a
    // different cutoff, a strict `>`, or no predicate is refused (exact
    // containment, no range-implication engine) ----
    QueryDef.sql(
      "q_matview_range",
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvr_sum", "q_mvr_base")
      g.createTable("q_mvr_base", Tables.load(s, dir, "orders")
        .select(col("o_orderdate"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("amt")),
        partitionBy = Seq("o_orderpriority"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvr_sum AS " +
        "SELECT o_orderpriority, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvr_base WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' " +
        "GROUP BY o_orderpriority")
      // no predicate / different cutoff / strict > → must NOT serve
      assertNotServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
        "FROM q_mvr_base GROUP BY o_orderpriority"), "q_mvr_sum")
      assertNotServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
        "FROM q_mvr_base WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' " +
        "GROUP BY o_orderpriority"), "q_mvr_sum")
      assertNotServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
        "FROM q_mvr_base WHERE o_orderdate > TIMESTAMP '1999-01-01 00:00:00' " +
        "GROUP BY o_orderpriority"), "q_mvr_sum")
      // flipped operand order canonicalizes identically → served
      assertServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
        "FROM q_mvr_base WHERE TIMESTAMP '1999-01-01 00:00:00' <= o_orderdate " +
        "GROUP BY o_orderpriority"), "q_mvr_sum")
      val served = s.sql(
        "SELECT o_orderpriority, sum(amt) AS ts, count(*) AS n " +
          "FROM q_mvr_base WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' " +
          "GROUP BY o_orderpriority")
      assertServedBy(served, "q_mvr_sum")
        .select(col("o_orderpriority"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderpriority")
    },

    // ---- BETWEEN window view: BETWEEN desugars to the >=/<= conjunct
    // pair at CREATE and at query time, so a view defined with BETWEEN
    // serves a query writing the explicit pair (and vice versa) — the
    // canonical-form discipline, not syntax matching. The build path
    // re-applies BOTH stored conjuncts through expr(): an O(delta)
    // refresh after an append must keep out-of-window rows excluded ----
    QueryDef.sql(
      "q_matview_between",
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvb_sum", "q_mvb_base")
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,4)").as("amt"))
      g.createTable("q_mvb_base", orders.filter(col("o_orderkey") % 3 =!= 0),
        partitionBy = Seq("o_orderstatus"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvb_sum AS " +
        "SELECT o_orderstatus, sum(amt) AS s, count(*) AS n FROM q_mvb_base " +
        "WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' " +
        "AND TIMESTAMP '1997-12-31 00:00:00' GROUP BY o_orderstatus")
      // append (rows inside AND outside the window) → O(delta) refresh
      // re-applies the stored range to the delta scan
      g.insert("q_mvb_base", orders.filter(col("o_orderkey") % 3 === 0))
      val path = g.refreshMaterializedView("q_mvb_sum")
      require(path == "incremental", s"append-only refresh took '$path'")
      // a half-window query (only one conjunct restated) must NOT serve
      assertNotServedBy(s.sql("SELECT o_orderstatus, sum(amt) AS ts " +
        "FROM q_mvb_base WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "GROUP BY o_orderstatus"), "q_mvb_sum")
      // the explicit >=/<= pair hits the BETWEEN-defined view
      val served = s.sql(
        "SELECT o_orderstatus, sum(amt) AS ts, count(*) AS n FROM q_mvb_base " +
          "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
          "AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00' " +
          "GROUP BY o_orderstatus")
      assertServedBy(served, "q_mvb_sum")
        .select(col("o_orderstatus"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderstatus")
    },

    // ---- decimal AVG: materializes exactly (sum slot already carries
    // Average's internal decimal buffer type); the rollup re-derives the
    // average through Average's own decimal evaluate tree, pinned
    // BIT-exact against the base scan inside the query body ----
    QueryDef.sql(
      "q_matview_decimal_avg",
      """SELECT o_orderstatus,
        |  (sign(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * floor(abs(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0) AS avg_price,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mva_sum", "q_mva_base")
      g.createTable("q_mva_base", Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("amt")),
        partitionBy = Seq("o_orderstatus"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mva_sum AS " +
        "SELECT o_orderstatus, o_orderpriority, avg(amt) AS a, count(*) AS n " +
        "FROM q_mva_base GROUP BY o_orderstatus, o_orderpriority")
      val q = "SELECT o_orderstatus, avg(amt) AS a, count(*) AS n " +
        "FROM q_mva_base GROUP BY o_orderstatus"
      val served = assertServedBy(s.sql(q), "q_mva_sum")
      // bit-exactness pin: the view-derived decimal average must equal
      // the base-scan decimal average EXACTLY (same type, same rounding)
      s.conf.set("spark.sql.graft.matviewRewrite", "false")
      val truth = try s.sql(q).collect().map(_.toString).sorted.toSeq
      finally s.conf.set("spark.sql.graft.matviewRewrite", "true")
      require(served.collect().map(_.toString).sorted.toSeq == truth,
        "view-derived decimal avg diverged from the base scan")
      served.select(col("o_orderstatus"),
        graft.dround(col("a").cast("double"), 2).as("avg_price"), col("n"))
        .orderBy("o_orderstatus")
    },

    // ---- STAR-SCHEMA view: the defining query is a fact ⋈ dim inner
    // equi-join; the rewrite matches the query's table set + canonical
    // join-condition set (join order / condition flips immune), rolls
    // up to the dim attribute, and a fact append refreshes O(delta)
    // (dim fingerprint carries; the delta join touches only new
    // batches). All plan-asserted ----
    QueryDef.sql(
      "q_matview_join",
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvj_sum", "q_mvj_fact")
      if (g.isManaged("q_mvj_dim")) g.dropTable("q_mvj_dim")
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,4)").as("amt"))
      g.createTable("q_mvj_fact", orders.filter(col("o_orderkey") % 4 =!= 0),
        partitionBy = Seq("o_custkey"), buckets = 4)
      g.createTable("q_mvj_dim", Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")))
      g.sql("CREATE MATERIALIZED VIEW q_mvj_sum AS " +
        "SELECT c_mktsegment, o_orderstatus, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvj_fact JOIN q_mvj_dim ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment, o_orderstatus")
      // fact append → stale → O(delta) refresh with the dim untouched
      g.insert("q_mvj_fact", orders.filter(col("o_orderkey") % 4 === 0))
      val qs = "SELECT c_mktsegment, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvj_fact JOIN q_mvj_dim ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment"
      assertNotServedBy(s.sql(qs), "q_mvj_sum")
      val path = g.refreshMaterializedView("q_mvj_sum")
      require(path == "incremental", s"fact-append refresh took '$path'")
      // the rollup over the JOIN (flipped condition) serves from the view
      val served = s.sql("SELECT c_mktsegment, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvj_dim JOIN q_mvj_fact ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment")
      assertServedBy(served, "q_mvj_sum")
        .select(col("c_mktsegment"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("c_mktsegment")
    },

    // ---- SNOWFLAKE view (fact ⋈ dim ⋈ dim): the connectivity walk and
    // per-table freshness at N=3 — a fact append AND a dim append each
    // take the O(delta) single-moving-table refresh (the other two
    // tables' fingerprints carry), and the rollup over the re-ordered
    // three-way join serves from the view. All plan-asserted ----
    QueryDef.sql(
      "q_matview_snowflake",
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvw_sum", "q_mvw_fact")
      Seq("q_mvw_cust", "q_mvw_nat").foreach(t =>
        if (g.isManaged(t)) g.dropTable(t))
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,4)").as("amt"))
      val customer = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      g.createTable("q_mvw_fact", orders.filter(col("o_orderkey") % 4 =!= 0),
        partitionBy = Seq("o_custkey"), buckets = 4)
      // dim built WITHOUT its last third; appended below to prove the
      // dim-side O(delta) arm (new customers join existing facts)
      g.createTable("q_mvw_cust", customer.filter(col("c_custkey") % 3 =!= 0),
        partitionBy = Seq("c_custkey"), buckets = 4)
      g.createTable("q_mvw_nat", Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name")))
      g.sql("CREATE MATERIALIZED VIEW q_mvw_sum AS " +
        "SELECT n_name, o_orderstatus, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvw_fact JOIN q_mvw_cust ON o_custkey = c_custkey " +
        "JOIN q_mvw_nat ON c_nationkey = n_nationkey " +
        "GROUP BY n_name, o_orderstatus")
      // fact append → exactly one moving table → O(delta)
      g.insert("q_mvw_fact", orders.filter(col("o_orderkey") % 4 === 0))
      val p1 = g.refreshMaterializedView("q_mvw_sum")
      require(p1 == "incremental", s"fact-append refresh took '$p1'")
      // dim append (the held-out customers) → also one moving table →
      // O(delta) from the dim side: new-dim ⋈ full fact
      g.insert("q_mvw_cust", customer.filter(col("c_custkey") % 3 === 0))
      val p2 = g.refreshMaterializedView("q_mvw_sum")
      require(p2 == "incremental", s"dim-append refresh took '$p2'")
      // rollup to n_name over the RE-ORDERED join (nat first) serves
      val served = s.sql("SELECT n_name, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvw_nat JOIN q_mvw_cust ON n_nationkey = c_nationkey " +
        "JOIN q_mvw_fact ON c_custkey = o_custkey GROUP BY n_name")
      assertServedBy(served, "q_mvw_sum")
        .select(col("n_name"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("n_name")
    },

    // ---- SUBTRACTIVE O(delta) maintenance: a FIRST delete refreshes by
    // reading ONLY the tombstoned rows of the moved batches and
    // SUBTRACTING them from the touched summary rows (sums/counts
    // invert; avg subtracts both slots) — the path is asserted
    // "incremental_delete", serving resumes plan-asserted, and the
    // result equals the post-delete oracle ----
    QueryDef.sql(
      "q_matview_delete_delta",
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderkey % 9 <> 5
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvdd_sum", "q_mvdd_base")
      g.createTable("q_mvdd_base", Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          // NON-NULLABLE measure: the subtractive path requires it
          // (removing the last non-null value would need the stored sum
          // to flip to NULL); testdata carries no nulls, so the
          // coalesce is type-level only
          coalesce(col("o_totalprice").cast("decimal(18,4)"),
            lit(0).cast("decimal(18,4)")).as("amt")),
        partitionBy = Seq("o_orderpriority"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvdd_sum AS " +
        "SELECT o_orderpriority, sum(amt) AS s, count(*) AS n, avg(amt) AS a " +
        "FROM q_mvdd_base GROUP BY o_orderpriority")
      g.delete("q_mvdd_base", col("o_orderkey") % 9 === 5)
      val q = "SELECT o_orderpriority, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvdd_base GROUP BY o_orderpriority"
      assertNotServedBy(s.sql(q), "q_mvdd_sum")
      val path = g.refreshMaterializedView("q_mvdd_sum")
      require(path == "incremental_delete", s"first-delete refresh took '$path'")
      assertServedBy(s.sql(q), "q_mvdd_sum")
        .select(col("o_orderpriority"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderpriority")
    },

    // ---- freshness gate: after a DELETE the view is provably stale —
    // the SAME aggregate must fall back to the base scan (asserted) and
    // still answer post-delete truth. The would-be "partial" refresh
    // (amt is NULLABLE here, so subtraction declines) DEMOTES to a full
    // rebuild: the delete touches every o_orderstatus group on an
    // UNCLUSTERED layout, so the prunability probe proves the restricted
    // re-aggregate would read every batch anyway and the rebuild is
    // strictly cheaper below the row cap (r14 What's-wrong #1; the
    // clustered counterpart that KEEPS "partial" is
    // q_matview_partial_minmax) ----
    QueryDef.sql(
      "q_matview_stale_fallback",
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderkey % 7 <> 3
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvs_sum", "q_mvs_base")
      g.createTable("q_mvs_base", Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,4)").as("amt")),
        partitionBy = Seq("o_orderkey"), buckets = 4)
      // clustered by the ROW key, not the group column — o_orderstatus
      // stays uniform per batch (the unclustered-for-the-group layout),
      // and the small batches give the demotion probe a real batch list
      // at every SF
      org.apache.spark.sql.graft.store.GraftStoreOps.createIndex(
        s, "q_mvs_base", Seq("o_orderkey"), batchSize = 128)
      g.sql("CREATE MATERIALIZED VIEW q_mvs_sum AS " +
        "SELECT o_orderstatus, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvs_base GROUP BY o_orderstatus")
      g.delete("q_mvs_base", col("o_orderkey") % 7 === 3)
      val q = "SELECT o_orderstatus, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvs_base GROUP BY o_orderstatus"
      // stale: must NOT serve from the view (results would be pre-delete)
      assertNotServedBy(s.sql(q), "q_mvs_sum")
      val path = g.refreshMaterializedView("q_mvs_sum")
      require(path == "full",
        s"all-groups delete on an unclustered layout must demote, took '$path'")
      assertServedBy(s.sql(q), "q_mvs_sum")
        .select(col("o_orderstatus"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderstatus")
    },

    // ---- REPEAT-delete O(delta) maintenance (the daily-retention
    // cadence): a SECOND delete lands on batches that already carry a
    // bitmap — the newly-deleted rows are (current bitmap) MINUS the
    // RECORDED one, whose payload the registration PINNED against the
    // superseding union swap's GC. Both waves plan-assert
    // "incremental_delete"; the result equals post-both-deletes truth ----
    QueryDef.sql(
      "q_matview_delete_delta2",
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderkey % 9 <> 5 AND o_orderkey % 9 <> 7
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvd2_sum", "q_mvd2_base")
      g.createTable("q_mvd2_base", Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          coalesce(col("o_totalprice").cast("decimal(18,4)"),
            lit(0).cast("decimal(18,4)")).as("amt")),
        partitionBy = Seq("o_orderpriority"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvd2_sum AS " +
        "SELECT o_orderpriority, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvd2_base GROUP BY o_orderpriority")
      g.delete("q_mvd2_base", col("o_orderkey") % 9 === 5)
      val p1 = g.refreshMaterializedView("q_mvd2_sum")
      require(p1 == "incremental_delete", s"first-delete refresh took '$p1'")
      g.delete("q_mvd2_base", col("o_orderkey") % 9 === 7)
      val p2 = g.refreshMaterializedView("q_mvd2_sum")
      require(p2 == "incremental_delete", s"repeat-delete refresh took '$p2'")
      val q = "SELECT o_orderpriority, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvd2_base GROUP BY o_orderpriority"
      assertServedBy(s.sql(q), "q_mvd2_sum")
        .select(col("o_orderpriority"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderpriority")
    },

    // ---- UPDATE O(delta) maintenance: the refresh reads ONLY the rows
    // addressed by the new update deltas, twice — valued as of the
    // RECORDED delta set and as of now — and merges the signed
    // difference into the touched summary rows. Wave 1 scales a
    // measure; wave 2 MOVES rows between groups (including into a
    // brand-new group). Both plan-assert "incremental_update" ----
    QueryDef.sql(
      "q_matview_update_delta",
      """SELECT CASE WHEN o_orderkey % 13 = 4
        |    THEN (o_orderkey % 7) + 10 ELSE o_orderkey % 7 END AS band,
        |  CAST(sum(CASE WHEN o_orderkey % 11 = 3
        |    THEN 2 * CAST(o_totalprice AS DECIMAL(18,4))
        |    ELSE CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |GROUP BY 1
        |ORDER BY band""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvu_sum", "q_mvu_base")
      g.createTable("q_mvu_base", Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          (col("o_orderkey") % 7).cast("long").as("band"),
          coalesce(col("o_totalprice").cast("decimal(18,4)"),
            lit(0).cast("decimal(18,4)")).as("amt")),
        partitionBy = Seq("o_orderkey"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvu_sum AS " +
        "SELECT band, sum(amt) AS s, count(*) AS n, avg(amt) AS a " +
        "FROM q_mvu_base GROUP BY band")
      // wave 1: scale a measure in place
      g.update("q_mvu_base", col("o_orderkey") % 11 === 3,
        "amt" -> (col("amt") * 2).cast("decimal(18,4)"))
      val q = "SELECT band, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvu_base GROUP BY band"
      assertNotServedBy(s.sql(q), "q_mvu_sum")
      val p1 = g.refreshMaterializedView("q_mvu_sum")
      require(p1 == "incremental_update", s"measure-update refresh took '$p1'")
      assertServedBy(s.sql(q), "q_mvu_sum")
      // wave 2: move rows to band+10 — groups the view has never seen
      g.update("q_mvu_base", col("o_orderkey") % 13 === 4,
        "band" -> (col("band") + 10))
      val p2 = g.refreshMaterializedView("q_mvu_sum")
      require(p2 == "incremental_update", s"group-move refresh took '$p2'")
      assertServedBy(s.sql(q), "q_mvu_sum")
        .select(col("band"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("band")
    },

    // ---- IN-predicate views: `col IN (a, b, c)` canonicalizes as a
    // SORTED, DEDUPLICATED literal list (single survivor folds to `=`,
    // matching the optimizer's one-element rewrite), so a query's
    // permuted/duplicated IN matches VERBATIM; different sets decline ----
    QueryDef.sql(
      "q_matview_in",
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvi_sum", "q_mvi_base")
      g.createTable("q_mvi_base", Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("amt")),
        partitionBy = Seq("o_orderpriority"), buckets = 4)
      // the view lists the IN elements in the OPPOSITE order
      g.sql("CREATE MATERIALIZED VIEW q_mvi_sum AS " +
        "SELECT o_orderpriority, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvi_base WHERE o_orderstatus IN ('O', 'F') " +
        "GROUP BY o_orderpriority")
      // ... and the query permutes AND duplicates them — same canonical
      val q = "SELECT o_orderpriority, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvi_base WHERE o_orderstatus IN ('F', 'O', 'F') " +
        "GROUP BY o_orderpriority"
      val served = assertServedBy(s.sql(q), "q_mvi_sum")
      // different element sets want rows the view filtered: decline
      Seq("o_orderstatus IN ('F')", "o_orderstatus IN ('F', 'O', 'P')")
        .foreach { w =>
          assertNotServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
            s"FROM q_mvi_base WHERE $w GROUP BY o_orderpriority"), "q_mvi_sum")
        }
      served
        .select(col("o_orderpriority"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderpriority")
    },

    // ---- GROUP-PRUNED partial rebuild: min/max cannot subtract, so a
    // delete refresh re-aggregates ONLY the groups the tombstoned rows
    // touched (left-semi restriction over the current base) — asserted
    // "partial"; a group whose every row vanished loses its summary ROW
    // (not a mask: min/max views may lack the count slot) ----
    QueryDef.sql(
      "q_matview_partial_minmax",
      """SELECT o_orderpriority,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS lo,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS hi,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderkey <= 3000
        |  AND NOT (o_orderpriority = '1-URGENT'
        |           OR (o_orderpriority = '2-HIGH' AND o_orderkey % 5 = 2))
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvp_sum", "q_mvp_base")
      g.createTable("q_mvp_base", Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("amt")),
        partitionBy = Seq("o_orderkey"), buckets = 4)
      // CLUSTER by the group column (CREATE INDEX): per-batch priority
      // ranges narrow, so the partial refresh's prunability probe sees
      // the touched-group restriction skip batches and keeps "partial"
      // (an unclustered layout below the row cap demotes to rebuild —
      // see q_matview_stale_fallback); small batches so every SF has
      // several per bucket. The VIEW windows o_orderkey <= 3000 so a
      // group can vanish from the summary without its deletes emptying
      // whole clustered batches (the > 3000 rows keep every batch live —
      // an emptied batch changes the batch SET and correctly declines
      // the delta paths to full).
      // secondary sort by amt DECORRELATES batch boundaries from
      // o_orderkey (ties in a priority would otherwise keep source key
      // order, letting the windowed delete empty whole leading batches —
      // a changed batch set correctly declines every delta path)
      org.apache.spark.sql.graft.store.GraftStoreOps.createIndex(
        s, "q_mvp_base", Seq("o_orderpriority", "amt"), batchSize = 1024)
      g.sql("CREATE MATERIALIZED VIEW q_mvp_sum AS " +
        "SELECT o_orderpriority, min(amt) AS lo, max(amt) AS hi, " +
        "count(*) AS n FROM q_mvp_base WHERE o_orderkey <= 3000 " +
        "GROUP BY o_orderpriority")
      // the delete touches ONLY the two lowest priority classes — the
      // clustered layout prunes every batch above them; 1-URGENT
      // vanishes from the view window entirely (its summary row must
      // go), 2-HIGH is only partially affected
      g.delete("q_mvp_base",
        col("o_orderkey") <= 3000 &&
          (col("o_orderpriority") === "1-URGENT" ||
            (col("o_orderpriority") === "2-HIGH" && col("o_orderkey") % 5 === 2)))
      val q = "SELECT o_orderpriority, min(amt) AS lo, max(amt) AS hi, " +
        "count(*) AS n FROM q_mvp_base WHERE o_orderkey <= 3000 " +
        "GROUP BY o_orderpriority"
      assertNotServedBy(s.sql(q), "q_mvp_sum")
      val path = g.refreshMaterializedView("q_mvp_sum")
      require(path == "partial", s"min/max delete refresh took '$path'")
      val served = assertServedBy(s.sql(q), "q_mvp_sum")
      require(served.filter(col("o_orderpriority") === "1-URGENT").isEmpty,
        "vanished group's summary row must be deleted")
      served
        .select(col("o_orderpriority"), col("lo").cast("double").as("lo"),
          col("hi").cast("double").as("hi"), col("n"))
        .orderBy("o_orderpriority")
    },

    // ---- MULTI-TABLE simultaneous-move refresh (the nightly-ETL
    // cadence: fact AND dim both gain batches between refreshes): the
    // per-table append deltas compose TELESCOPICALLY — Δfact ⋈ recorded
    // dim, then current fact ⋈ Δdim — so the refresh stays O(sum of
    // deltas) instead of rebuilding; plan-asserted "incremental_multi".
    // The new-fact×new-dim pairs land in the second term (current fact
    // includes Δfact), counted exactly once ----
    QueryDef.sql(
      "q_matview_multi_append",
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvm_sum", "q_mvm_fact")
      if (g.isManaged("q_mvm_dim")) g.dropTable("q_mvm_dim")
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,4)").as("amt"))
      val customer = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      g.createTable("q_mvm_fact", orders.filter(col("o_orderkey") % 4 =!= 0),
        partitionBy = Seq("o_custkey"), buckets = 4)
      g.createTable("q_mvm_dim", customer.filter(col("c_custkey") % 3 =!= 0),
        partitionBy = Seq("c_custkey"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvm_sum AS " +
        "SELECT c_mktsegment, o_orderstatus, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvm_fact JOIN q_mvm_dim ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment, o_orderstatus")
      // BOTH tables gain batches before the single refresh (the ETL
      // wave): new orders of existing customers, existing orders of
      // new customers, AND new orders of new customers all appear
      g.insert("q_mvm_fact", orders.filter(col("o_orderkey") % 4 === 0))
      g.insert("q_mvm_dim", customer.filter(col("c_custkey") % 3 === 0))
      val qs = "SELECT c_mktsegment, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvm_fact JOIN q_mvm_dim ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment"
      assertNotServedBy(s.sql(qs), "q_mvm_sum")
      val path = g.refreshMaterializedView("q_mvm_sum")
      require(path == "incremental_multi",
        s"fact+dim double-append refresh took '$path'")
      assertServedBy(s.sql(qs), "q_mvm_sum")
        .select(col("c_mktsegment"), col("ts").cast("double").as("total"),
          col("n"))
        .orderBy("c_mktsegment")
    },

    // ---- GLOBAL-aggregate view (no GROUP BY): the single most common
    // dashboard tile (`SELECT count(*), sum(x) FROM fact`) maintains
    // O(delta) — the stored summary is ONE row, an append folds the
    // delta-aggregate in ("incremental") and a delete subtracts the
    // tombstoned rows' aggregate ("incremental_delete"); both
    // plan-asserted, serving asserted after each wave ----
    QueryDef.sql(
      "q_matview_global",
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 9 <> 4""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvg_sum", "q_mvg_base")
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          // coalesce: the subtractive gate requires NON-NULLABLE sum
          // inputs (removing the last non-null value cannot be known
          // to subtraction)
          coalesce(col("o_totalprice").cast("decimal(18,4)"),
            lit(0).cast("decimal(18,4)")).as("amt"))
      g.createTable("q_mvg_base", orders.filter(col("o_orderkey") % 5 =!= 0),
        partitionBy = Seq("o_orderkey"), buckets = 4)
      g.sql("CREATE MATERIALIZED VIEW q_mvg_sum AS " +
        "SELECT count(*) AS n, sum(amt) AS s FROM q_mvg_base")
      val qs = "SELECT count(*) AS n, sum(amt) AS ts FROM q_mvg_base"
      // append wave → single-row fold, "incremental"
      g.insert("q_mvg_base", orders.filter(col("o_orderkey") % 5 === 0))
      assertNotServedBy(s.sql(qs), "q_mvg_sum")
      val p1 = g.refreshMaterializedView("q_mvg_sum")
      require(p1 == "incremental", s"global append refresh took '$p1'")
      assertServedBy(s.sql(qs), "q_mvg_sum")
      // retention wave → single-row subtract, "incremental_delete"
      g.delete("q_mvg_base", col("o_orderkey") % 9 === 4)
      assertNotServedBy(s.sql(qs), "q_mvg_sum")
      val p2 = g.refreshMaterializedView("q_mvg_sum")
      require(p2 == "incremental_delete", s"global delete refresh took '$p2'")
      assertServedBy(s.sql(qs), "q_mvg_sum")
        .select(col("n"), col("ts").cast("double").as("total"))
    },

    // ---- DISJUNCTIVE predicates: `a = x OR a = y` is IN in disguise —
    // the canonicalizer folds same-column equality/IN disjunctions into
    // the sorted IN form, so a view created with OR serves a query
    // written with IN (and vice versa, any order, duplicates folded);
    // a disjunct of any other shape (range, different column) declines ----
    QueryDef.sql(
      "q_matview_or",
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderstatus = 'F' OR o_orderstatus = 'O'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvo_sum", "q_mvo_base")
      g.createTable("q_mvo_base", Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("amt")),
        partitionBy = Seq("o_orderpriority"), buckets = 4)
      // view spelled with OR, reversed element order
      g.sql("CREATE MATERIALIZED VIEW q_mvo_sum AS " +
        "SELECT o_orderpriority, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvo_base WHERE o_orderstatus = 'O' OR o_orderstatus = 'F' " +
        "GROUP BY o_orderpriority")
      // ... the IN spelling serves; so does a redundant OR-of-IN mix
      val q = "SELECT o_orderpriority, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvo_base WHERE o_orderstatus IN ('F', 'O') " +
        "GROUP BY o_orderpriority"
      val served = assertServedBy(s.sql(q), "q_mvo_sum")
      assertServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
        "FROM q_mvo_base WHERE o_orderstatus IN ('F') OR o_orderstatus = 'O' " +
        "GROUP BY o_orderpriority"), "q_mvo_sum")
      // a range disjunct or a different column cannot fold — decline
      Seq("o_orderstatus = 'F' OR o_orderstatus > 'N'",
        "o_orderstatus = 'F' OR o_orderpriority = '5-LOW'",
        "o_orderstatus = 'F' OR o_orderstatus = 'P'")
        .foreach { w =>
          assertNotServedBy(s.sql("SELECT o_orderpriority, sum(amt) AS ts " +
            s"FROM q_mvo_base WHERE $w GROUP BY o_orderpriority"), "q_mvo_sum")
        }
      served
        .select(col("o_orderpriority"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderpriority")
    },

    // ---- OR-of-RANGES predicates: a disjunction of ranges on one
    // column normalizes to an interval union (rays merged most-
    // inclusive, covered points dropped, endpoint-closing), so
    // equivalent spellings serve each other and the SAME canonical
    // string re-executes at refresh; near-miss endpoints decline ----
    QueryDef.sql(
      "q_matview_or_ranges",
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderkey < 1000 OR o_orderkey >= 50000
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val g = GraftSession(s)
      reset(g, "q_mvr_sum", "q_mvr_base")
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,4)").as("amt"))
      g.createTable("q_mvr_base", orders.filter(col("o_orderkey") % 5 =!= 0),
        partitionBy = Seq("o_orderkey"), buckets = 4)
      // view spelled rays-reversed with a redundant overlapping ray
      g.sql("CREATE MATERIALIZED VIEW q_mvr_sum AS " +
        "SELECT o_orderstatus, sum(amt) AS s, count(*) AS n " +
        "FROM q_mvr_base " +
        "WHERE o_orderkey >= 50000 OR o_orderkey < 1000 OR o_orderkey < 500 " +
        "GROUP BY o_orderstatus")
      val q = "SELECT o_orderstatus, sum(amt) AS ts, count(*) AS n " +
        "FROM q_mvr_base WHERE o_orderkey < 1000 OR o_orderkey >= 50000 " +
        "GROUP BY o_orderstatus"
      val served = assertServedBy(s.sql(q), "q_mvr_sum")
      // near-miss endpoint / boundary-closedness change the set: decline
      Seq("o_orderkey < 1000 OR o_orderkey >= 50001",
        "o_orderkey <= 1000 OR o_orderkey >= 50000").foreach { w =>
        assertNotServedBy(s.sql("SELECT o_orderstatus, sum(amt) AS ts " +
          s"FROM q_mvr_base WHERE $w GROUP BY o_orderstatus"), "q_mvr_sum")
      }
      // refresh re-executes the canonical union over the append delta
      g.insert("q_mvr_base", orders.filter(col("o_orderkey") % 5 === 0))
      val path = g.refreshMaterializedView("q_mvr_sum")
      require(path == "incremental", s"append refresh took '$path'")
      assertServedBy(s.sql(q), "q_mvr_sum")
        .select(col("o_orderstatus"), col("ts").cast("double").as("total"), col("n"))
        .orderBy("o_orderstatus")
    })
}
