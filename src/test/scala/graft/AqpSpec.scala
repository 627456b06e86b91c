package graft

import graft.operators.Aqp
import org.apache.spark.sql.functions._

class AqpSpec extends SparkTestBase {

  private lazy val li = Tables.load(spark, sf, "lineitem")
  private lazy val sample = Aqp.stratifiedSample(li,
    qcs = Seq("l_returnflag", "l_linestatus"),
    fraction = 0.1, reservoirFloor = 30,
    rankKey = Seq("l_orderkey", "l_linenumber"))

  test("stratified sample is deterministic, tracks floor+fraction, HT-exact weights") {
    val a = sample.agg(count(lit(1))).head().getLong(0)
    val b = sample.agg(count(lit(1))).head().getLong(0)
    assert(a == b && a > 0)
    val perStratum = sample.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("kept"), first("_n_h").as("n_h"),
        sum("_weight").as("w_sum")).collect()
    perStratum.foreach { r =>
      val kept = r.getAs[Long]("kept"); val nh = r.getAs[Long]("n_h")
      // hash-threshold membership: tiny strata keep everything (p = 1);
      // larger strata realize a binomial count around the target — allow
      // 5 sigma
      if (nh <= 30L) assert(kept == nh, s"small stratum must keep all: $r")
      else {
        val target = math.max(30.0, math.ceil(nh * 0.1))
        val p = target / nh
        val sigma = math.sqrt(nh * p * (1 - p))
        assert(math.abs(kept - target) <= 5 * sigma + 1,
          s"kept=$kept target=$target sigma=$sigma: $r")
      }
      // weights always account for the REALIZED sample: sum == n_h exactly
      assert(math.abs(r.getAs[Double]("w_sum") - nh) < 1e-6, s"HT weight sum: $r")
    }
  }

  test("HT count estimate is exact per stratum-aligned group") {
    val est = Aqp.approxSumCount(sample, "l_extendedprice", Seq("l_returnflag"))
      .collect().map(r => r.getString(0) -> math.round(r.getAs[Double]("count_est"))).toMap
    val truth = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == truth)
  }

  test("avg CI brackets the true mean at 95% for each group") {
    val res = Aqp.approxAvgWithError(sample, "l_extendedprice",
      qcs = Seq("l_returnflag", "l_linestatus"),
      groupBy = Seq("l_returnflag")).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("lower_bound"), r.getAs[Double]("upper_bound"),
        r.getAs[Double]("estimate"))).toMap
    val truth = li.groupBy("l_returnflag").agg(avg("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    truth.foreach { case (g, t) =>
      val (lo, hi, est) = res(g)
      assert(lo <= hi && est >= lo && est <= hi)
      // deterministic sample + fixed seed: containment is a stable fact,
      // not a flaky probabilistic assertion
      assert(t >= lo && t <= hi, s"group $g: true $t outside [$lo, $hi]")
    }
  }

  test("base-table inserts fan into registered samples (SampleInsertExec analog)") {
    val g = GraftSession(spark)
    val base = li.filter(col("l_orderkey") <= 2000)
    g.createTable("si_base", base)
    g.createSampleTable("si_sample", g.table("si_base"),
      qcs = Seq("l_returnflag"), fraction = 0.1,
      reservoirFloor = 20, rankKey = Seq("l_orderkey", "l_linenumber"))
    g.registerSample("si_base", "si_sample", Seq("l_returnflag"),
      Some(GraftSession.SampleParams(0.1, 20, Seq("l_orderkey", "l_linenumber"))))
    try {
      val before = g.table("si_sample").count()
      // insert a batch carrying a brand-new stratum value (rank keys
      // shifted so membership hashes are fresh)
      val inc = g.table("si_base").limit(2000)
        .withColumn("l_orderkey", col("l_orderkey") + 1000000)
        .withColumn("l_returnflag", lit("Z"))
        .localCheckpoint(true) // freeze: reads si_base, which the insert mutates
      g.insert("si_base", inc)
      val sample = g.table("si_sample")
      // new stratum must be represented (reservoir floor guarantees it)
      assert(sample.filter(col("l_returnflag") === "Z").count() > 0,
        "inserted stratum missing from maintained sample")
      assert(sample.count() > before)
      // Horvitz-Thompson invariant survives incremental maintenance:
      // sum of weights == exact base row count, overall and per stratum
      val htTotal = sample.agg(sum(col("_weight"))).collect()(0).getDouble(0)
      val baseTotal = g.table("si_base").count()
      assert(math.abs(htTotal - baseTotal) < 1e-6, s"HT $htTotal vs $baseTotal")
      val htZ = sample.filter(col("l_returnflag") === "Z")
        .agg(sum(col("_weight"))).collect()(0).getDouble(0)
      val baseZ = g.table("si_base").filter(col("l_returnflag") === "Z").count()
      assert(math.abs(htZ - baseZ) < 1e-6, s"HT(Z) $htZ vs $baseZ")
      // unregistered-params samples stay untouched by design: re-register
      // without params, insert again, sample count must not change
      g.registerSample("si_base", "si_sample", Seq("l_returnflag"))
      val frozen = g.table("si_sample").count()
      g.insert("si_base", inc.limit(50))
      assert(g.table("si_sample").count() == frozen)
      // dropping a sample table retires its registration: the next base
      // insert must not fail on fan-in to a dead table
      g.registerSample("si_base", "si_sample", Seq("l_returnflag"),
        Some(GraftSession.SampleParams(0.1, 20, Seq("l_orderkey", "l_linenumber"))))
      g.dropTable("si_sample")
      g.insert("si_base", inc.limit(10)) // would throw with a stale entry
      assert(g.samples.get("si_base").forall(_.forall(_.table != "si_sample")))
      // self-registration is rejected outright (would recurse on insert)
      intercept[IllegalArgumentException] {
        g.registerSample("si_base", "si_base", Seq("l_returnflag"))
      }
    } finally {
      g.samples.remove("si_base")
      g.dropTable("si_sample")
      g.dropTable("si_base")
    }
  }

  test("sys.samples freshness: maintained inserts stay fresh, deletes read stale") {
    val g = GraftSession(spark)
    g.createTable("sf_base", li.filter(col("l_orderkey") <= 1500))
    g.createSampleTable("sf_sample", g.table("sf_base"),
      qcs = Seq("l_returnflag"), fraction = 0.1,
      reservoirFloor = 20, rankKey = Seq("l_orderkey", "l_linenumber"))
    g.registerSample("sf_base", "sf_sample", Seq("l_returnflag"),
      Some(GraftSession.SampleParams(0.1, 20, Seq("l_orderkey", "l_linenumber"))))
    try {
      def verdict(): String = spark.sql(
        "SELECT is_fresh FROM sys.samples WHERE sample_table = 'sf_sample'")
        .head().getString(0)
      assert(verdict() == "true", "freshly registered sample reads fresh")
      // an insert fans into the sample AND advances its fingerprint
      g.insert("sf_base", g.table("sf_base").limit(100)
        .withColumn("l_orderkey", col("l_orderkey") + 2000000)
        .localCheckpoint(true))
      assert(verdict() == "true", "maintained insert keeps the sample fresh")
      // a base DELETE leaves sample rows for vanished strata: the skew
      // is now VISIBLE — but routing still answers (reference
      // semantics: SampleInsertExec also fans only inserts)
      g.delete("sf_base", col("l_orderkey") % 5 === 0)
      assert(verdict() == "false", "base delete must read stale")
      val approx = g.sql("SELECT count(*) AS n FROM sf_base WITH ERROR 0.5")
      assert(approx.head().getLong(0) > 0, "WITH ERROR still answers when stale")
      // a LATER maintained insert must not mask the earlier skew
      g.insert("sf_base", g.table("sf_base").limit(50)
        .withColumn("l_orderkey", col("l_orderkey") + 3000000)
        .localCheckpoint(true))
      assert(verdict() == "false", "insert after a delete must not mask staleness")
    } finally {
      g.samples.remove("sf_base")
      g.dropTable("sf_sample")
      g.dropTable("sf_base")
    }
  }

  test("refreshSample repairs a delete-skewed sample; REFRESH SAMPLE is the SQL face") {
    val g = GraftSession(spark)
    g.createTable("rs_base", li.filter(col("l_orderkey") <= 1500))
    g.createSampleTable("rs_sample", g.table("rs_base"),
      qcs = Seq("l_returnflag"), fraction = 0.1,
      reservoirFloor = 20, rankKey = Seq("l_orderkey", "l_linenumber"))
    g.registerSample("rs_base", "rs_sample", Seq("l_returnflag"),
      Some(GraftSession.SampleParams(0.1, 20, Seq("l_orderkey", "l_linenumber"))))
    try {
      def verdict(): String = spark.sql(
        "SELECT is_fresh FROM sys.samples WHERE sample_table = 'rs_sample'")
        .head().getString(0)
      def approxCount(): Long =
        g.sql("SELECT count(*) AS n FROM rs_base WITH ERROR 0.5").head().getLong(0)
      val before = g.table("rs_base").count()
      assert(g.refreshSample("rs_sample") == "noop",
        "a provably-fresh sample must not rebuild")
      // base retention delete: the sample keeps rows for vanished
      // base rows — estimates answer PRE-delete truth until repaired
      g.delete("rs_base", col("l_orderkey") % 3 === 0)
      val after = g.table("rs_base").count()
      assert(after < before)
      assert(verdict() == "false")
      val staleEst = approxCount()
      assert(math.abs(staleEst - before) < math.abs(staleEst - after),
        s"stale sample answers pre-delete truth ($staleEst vs $before/$after)")
      assert(g.refreshSample("rs_sample") == "rebuilt")
      assert(verdict() == "true", "refreshSample restores provable freshness")
      val freshEst = approxCount()
      assert(math.abs(freshEst - after) < math.abs(freshEst - before),
        s"refreshed sample answers post-delete truth ($freshEst vs $after/$before)")
      // the SQL face drives the same path
      g.delete("rs_base", col("l_orderkey") % 7 === 1)
      assert(verdict() == "false")
      assert(spark.sql("REFRESH SAMPLE rs_sample").head().getString(0) == "rebuilt")
      assert(verdict() == "true")
      assert(spark.sql("REFRESH SAMPLE TABLE rs_sample").head().getString(0) == "noop")
      // a registration without build parameters cannot re-draw — refuse
      // loudly instead of silently serving the stale sample
      g.registerSample("rs_base", "rs_ghost", Seq("l_returnflag"))
      intercept[IllegalArgumentException](g.refreshSample("rs_ghost"))
      intercept[IllegalArgumentException](g.refreshSample("rs_nosuch"))
    } finally {
      g.samples.remove("rs_base")
      g.dropTable("rs_sample")
      g.dropTable("rs_base")
    }
  }

  test("WITH ERROR sql rewrites onto the sample with weighted aggregates") {
    val g = GraftSession(spark)
    Tables.registerAll(spark, sf)
    g.createSampleTable("li_sample_t", li,
      qcs = Seq("l_returnflag", "l_linestatus"), fraction = 0.1,
      reservoirFloor = 30, rankKey = Seq("l_orderkey", "l_linenumber"))
    g.registerSample("lineitem", "li_sample_t")
    try {
      val approx = g.sql(
        "SELECT l_returnflag, count(*) AS n, avg(l_extendedprice) AS m, " +
          "sum(l_quantity) AS q FROM lineitem GROUP BY l_returnflag WITH ERROR 0.5")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      val exact = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), avg("l_extendedprice").as("m"), sum("l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      exact.foreach { case (k, (n, m, q)) =>
        val (an, am, aq) = approx(k)
        assert(an == n, s"HT count must be exact: $an vs $n")
        assert(math.abs(am - m) / m < 0.15, s"avg estimate too far: $am vs $m")
        assert(math.abs(aq - q) / q < 0.15, s"sum estimate too far: $aq vs $q")
      }
      // the query really ran on the sample, not the base table
      val scannedRows = g.table("li_sample_t").count()
      assert(scannedRows < li.count() / 2, "sample is not smaller than base?")
    } finally g.samples.remove("lineitem")
  }

  private def withSample[T](name: String)(f: GraftSession => T): T = {
    val g = GraftSession(spark)
    Tables.registerAll(spark, sf)
    g.createSampleTable(name, li,
      qcs = Seq("l_returnflag", "l_linestatus"), fraction = 0.1,
      reservoirFloor = 30, rankKey = Seq("l_orderkey", "l_linenumber"))
    g.registerSample("lineitem", name)
    try f(g) finally g.samples.remove("lineitem")
  }

  test("error result functions: exact-count groups have zero error, bounds collapse") {
    withSample("li_sample_ef") { g =>
      // grouping == stratification ⇒ HT count is exact ⇒ all weights in a
      // group are equal ⇒ var_samp(_weight) = 0 ⇒ absolute_error = 0 and
      // the bounds collapse onto the estimate (deterministic oracle)
      val rows = g.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |  absolute_error(n) AS abs_err, relative_error(n) AS rel_err,
          |  lower_bound(n) AS lo, upper_bound(n) AS hi
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |WITH ERROR 0.1 CONFIDENCE 0.95""".stripMargin).collect()
      assert(rows.nonEmpty)
      val exact = li.groupBy("l_returnflag", "l_linestatus").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      rows.foreach { r =>
        val key = (r.getString(0), r.getString(1))
        assert(r.getLong(2) == exact(key), s"count not exact at $key")
        assert(math.abs(r.getDouble(3)) < 1e-6, s"abs_err must be 0 at $key")
        assert(math.abs(r.getDouble(5) - exact(key)) < 1e-6)
        assert(math.abs(r.getDouble(6) - exact(key)) < 1e-6)
      }
    }
  }

  test("error result functions: avg CI from SQL brackets the truth") {
    withSample("li_sample_ci") { g =>
      val got = g.sql(
        """SELECT l_returnflag, avg(l_extendedprice) AS m,
          |  absolute_error(m) AS e, lower_bound(m) AS lo, upper_bound(m) AS hi
          |FROM lineitem GROUP BY l_returnflag
          |WITH ERROR 0.5 CONFIDENCE 0.95""".stripMargin).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val truth = li.groupBy("l_returnflag").agg(avg("l_extendedprice"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      truth.foreach { case (k, t) =>
        val (m, e, lo, hi) = got(k)
        assert(e > 0, s"avg over non-constant data must have positive error at $k")
        assert(math.abs((m - lo) - e) < 1e-9 && math.abs((hi - m) - e) < 1e-9)
        assert(t >= lo && t <= hi, s"group $k: true $t outside [$lo, $hi]")
      }
    }
  }

  test("BEHAVIOR strict rejects non-estimable aggregates") {
    withSample("li_sample_strict") { g =>
      val e = intercept[IllegalArgumentException] {
        g.sql("SELECT l_returnflag, min(l_extendedprice) AS lo FROM lineitem " +
          "GROUP BY l_returnflag WITH ERROR 0.1 BEHAVIOR 'strict'")
      }
      assert(e.getMessage.contains("min"))
      // count(DISTINCT) is equally non-estimable from an HT sample
      val e2 = intercept[IllegalArgumentException] {
        g.sql("SELECT count(DISTINCT l_orderkey) AS d FROM lineitem WITH ERROR 0.1")
      }
      assert(e2.getMessage.toLowerCase.contains("distinct"))
    }
  }

  test("BEHAVIOR strict enforces the requested error bound") {
    withSample("li_sample_bound") { g =>
      val e = intercept[IllegalStateException] {
        // avg sampling error is far above 0.000001%
        g.sql("SELECT avg(l_extendedprice) AS m FROM lineitem " +
          "WITH ERROR 0.00000001 CONFIDENCE 0.99 BEHAVIOR 'strict'").collect()
      }
      assert(e.getMessage.contains("exceeds"))
    }
  }

  test("BEHAVIOR run_on_full_table re-routes to exact execution") {
    withSample("li_sample_full") { g =>
      // unsupported aggregate → exact run on the base table
      val viaMin = g.sql("SELECT min(l_extendedprice) AS lo FROM lineitem " +
        "WITH ERROR 0.1 BEHAVIOR 'run_on_full_table'").head().getDouble(0)
      val exactMin = li.agg(min("l_extendedprice")).head().getDouble(0)
      assert(viaMin == exactMin)
      // bound violation → exact run on the base table
      val viaAvg = g.sql("SELECT avg(l_extendedprice) AS m FROM lineitem " +
        "WITH ERROR 0.00000001 BEHAVIOR 'run_on_full_table'").head().getDouble(0)
      val exactAvg = li.agg(avg("l_extendedprice")).head().getDouble(0)
      assert(viaAvg == exactAvg)
    }
  }

  test("BEHAVIOR local_omit nulls only the offending estimates") {
    withSample("li_sample_lo") { g =>
      // grouping == stratification ⇒ weights constant per group ⇒ the
      // count's ESTIMATED rel err is exactly 0 and it survives even an
      // impossible bound; avg has real sampling error and is nulled —
      // same row, same query
      val rows = g.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, avg(l_extendedprice) AS m
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |WITH ERROR 0.00000001 BEHAVIOR 'local_omit'""".stripMargin).collect()
      assert(rows.nonEmpty)
      val exactN = li.groupBy("l_returnflag", "l_linestatus").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      rows.foreach { r =>
        assert(r.getLong(2) == exactN((r.getString(0), r.getString(1))),
          "exact count must survive")
        assert(r.isNullAt(3), "imprecise avg must be omitted (null)")
      }
      // loose bound: nothing omitted
      val loose = g.sql(
        """SELECT l_returnflag, count(*) AS n, avg(l_extendedprice) AS m
          |FROM lineitem GROUP BY l_returnflag
          |WITH ERROR 0.5 BEHAVIOR 'local_omit'""".stripMargin).collect()
      loose.foreach(r => assert(!r.isNullAt(2), "loose bound must keep the avg"))
    }
  }

  test("BEHAVIOR partial_run_on_base_table merges exact groups for violations") {
    withSample("li_sample_pr") { g =>
      // impossible bound ⇒ every group's avg violates ⇒ every group comes
      // back exact from the base table (deterministic outcome)
      val got = g.sql(
        """SELECT l_returnflag, avg(l_extendedprice) AS m
          |FROM lineitem GROUP BY l_returnflag
          |WITH ERROR 0.00000001 BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exact = li.groupBy("l_returnflag").agg(avg("l_extendedprice"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == exact, "all-violating groups must be exact")
      // loose bound ⇒ nothing re-routed, estimates stay sample-derived and
      // every group appears exactly once
      val loose = g.sql(
        """SELECT l_returnflag, avg(l_extendedprice) AS m
          |FROM lineitem GROUP BY l_returnflag
          |WITH ERROR 0.5 BEHAVIOR 'partial_run_on_base_table'""".stripMargin).collect()
      assert(loose.map(_.getString(0)).distinct.length == exact.size)
    }
  }

  test("partial_run: aliased grouping column merges via the output alias, ORDER BY kept") {
    withSample("li_sample_pralias") { g =>
      // grouping column aliased in the SELECT (GROUP BY name ≠ output
      // name) + ORDER BY over the alias: merge keys must resolve through
      // the alias and the union must come back sorted
      val got = g.sql(
        """SELECT l_returnflag AS rf, avg(l_extendedprice) AS m
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY rf DESC
          |WITH ERROR 0.00000001 BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val exact = li.groupBy(col("l_returnflag").as("rf"))
        .agg(avg("l_extendedprice").as("m")).orderBy(col("rf").desc)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == exact, "aliased-key merge must be exact AND ordered")
    }
  }

  test("partial_run: ORDER BY preserved when groups split between sample and base") {
    withSample("li_sample_prsort") { g =>
      // loose bound ⇒ all groups pass on the sample; the point is the
      // ordering contract survives the union-shaped plan
      val rows = g.sql(
        """SELECT l_returnflag, count(*) AS n
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag
          |WITH ERROR 0.5 BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
        .collect().map(_.getString(0)).toSeq
      assert(rows == rows.sorted, s"result must honor ORDER BY: $rows")
      assert(rows.nonEmpty)
    }
  }

  test("sample_ alias returns sample answers even on base-table reroutes") {
    withSample("li_sample_rsv2") { g =>
      // min() forces the run_on_full_table reroute; the reserved-alias
      // contract says sample_n must STILL be the raw sample-table count
      val r = g.sql(
        "SELECT count(*) AS n, count(*) AS sample_n, min(l_extendedprice) AS lo " +
          "FROM lineitem WITH ERROR 0.1 BEHAVIOR 'run_on_full_table'").head()
      assert(r.getLong(0) == li.count(), "n exact from the base table")
      assert(r.getLong(1) == g.table("li_sample_rsv2").count(),
        "sample_n from the sample table even though the query rerouted")
      assert(r.getDouble(2) == li.agg(min("l_extendedprice")).head().getDouble(0))
    }
  }

  test("base-table re-runs pin error functions to 0 / NULL") {
    withSample("li_sample_ef0") { g =>
      val r = g.sql(
        """SELECT avg(l_extendedprice) AS m, absolute_error(m) AS e,
          |  relative_error(m) AS re, lower_bound(m) AS lo, upper_bound(m) AS hi
          |FROM lineitem
          |WITH ERROR 0.00000001 BEHAVIOR 'run_on_full_table'""".stripMargin).head()
      assert(r.getDouble(0) == li.agg(avg("l_extendedprice")).head().getDouble(0))
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
      assert(r.isNullAt(3) && r.isNullAt(4))
    }
  }

  test("sample_ reserved alias returns true sample-table answers") {
    withSample("li_sample_resv") { g =>
      val r = g.sql(
        "SELECT count(*) AS n, count(*) AS sample_n FROM lineitem WITH ERROR 0.5")
        .head()
      val baseN = li.count()
      val sampleN = g.table("li_sample_resv").count()
      assert(r.getLong(0) == baseN, "n is the HT estimate of the base count (exact here)")
      assert(r.getLong(1) == sampleN, "sample_n is the raw sample-table count")
      assert(sampleN < baseN)
    }
  }

  test("BEHAVIOR do_nothing stays best-effort on the sample") {
    withSample("li_sample_dn") { g =>
      val n = g.sql("SELECT count(*) AS n FROM lineitem " +
        "WITH ERROR 0.00000001 BEHAVIOR 'do_nothing'").head().getLong(0)
      assert(n == li.count(), "HT count still exact; no bound check, no reroute")
    }
  }

  test("approx_count_distinct within 10% of exact") {
    val r = li.agg(
      approx_count_distinct(col("l_orderkey")).as("a"),
      countDistinct(col("l_orderkey")).as("e")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e")
  }

  private def withBootstrap[T](trials: Int)(f: => T): T = {
    import org.apache.spark.sql.graft.SampleRewrite
    spark.conf.set(SampleRewrite.CLOSED_FORM_KEY, "false")
    spark.conf.set(SampleRewrite.TRIALS_KEY, trials.toString)
    try f finally {
      spark.conf.unset(SampleRewrite.CLOSED_FORM_KEY)
      spark.conf.unset(SampleRewrite.TRIALS_KEY)
    }
  }

  test("bootstrap estimator: deterministic percentile CI brackets the truth") {
    withSample("li_sample_bs") { g =>
      withBootstrap(200) {
        val q =
          """SELECT l_returnflag, avg(l_extendedprice) AS m,
            |  absolute_error(m) AS e, lower_bound(m) AS lo, upper_bound(m) AS hi
            |FROM lineitem GROUP BY l_returnflag
            |WITH ERROR 0.5 CONFIDENCE 0.95""".stripMargin
        def run() = g.sql(q).collect()
          .map(r => r.getString(0) ->
            (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
        val got = run()
        // counter-based multiplier stream: identical across executions
        assert(got == run(), "bootstrap must be deterministic")
        val truth = li.groupBy("l_returnflag").agg(avg("l_extendedprice"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        truth.foreach { case (k, t) =>
          val (m, e, lo, hi) = got(k)
          assert(lo <= hi && e > 0, s"degenerate interval at $k")
          assert(math.abs(e - (hi - lo) / 2) < 1e-9, "abs_err is the CI half-width")
          assert(t >= lo && t <= hi, s"group $k: true $t outside bootstrap [$lo, $hi]")
          assert(m >= lo && m <= hi, s"group $k: estimate $m outside its own CI")
        }
      }
    }
  }

  test("bootstrap beats closed-form on a skewed stratum (asymmetric CI)") {
    withSample("li_sample_skew") { g =>
      // cube the price: heavy right skew — the HT-sum's sampling
      // distribution is visibly non-normal at stratum sample sizes, which
      // is exactly where the normal-theory interval is wrong
      val q =
        """SELECT l_returnflag,
          |  sum(l_extendedprice * l_extendedprice * l_extendedprice) AS s,
          |  lower_bound(s) AS lo, upper_bound(s) AS hi
          |FROM lineitem GROUP BY l_returnflag
          |WITH ERROR 0.9 CONFIDENCE 0.9""".stripMargin
      val bs = withBootstrap(400)(g.sql(q).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap)
      val truth = li.groupBy("l_returnflag")
        .agg(sum(pow(col("l_extendedprice"), 3)).as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      var asymmetric = 0
      truth.foreach { case (k, t) =>
        val (est, lo, hi) = bs(k)
        assert(t >= lo && t <= hi, s"group $k: true $t outside bootstrap [$lo, $hi]")
        // percentile CI keeps the estimator's skew: bounds need not be
        // symmetric around the point estimate (closed-form forces them to)
        if (math.abs((hi - est) - (est - lo)) > 1e-6 * est) asymmetric += 1
      }
      assert(asymmetric > 0, "percentile CI on cubed prices should be asymmetric somewhere")
    }
  }

  test("multiple registered samples route by QCS match") {
    import GraftSession.SampleInfo
    val wide = SampleInfo("s_rf_ls", Seq("l_returnflag", "l_linestatus"))
    val narrow = SampleInfo("s_ls", Seq("l_linestatus"))
    def pick(sql: String) = GraftSql.selectSample(spark, sql, Vector(wide, narrow))
    // both QCS are subsets of the grouping: larger overlap wins
    assert(pick("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem " +
      "GROUP BY l_returnflag, l_linestatus") == "s_rf_ls")
    // only the narrow QCS is covered by the grouping
    assert(pick("SELECT l_linestatus, count(*) AS n FROM lineitem " +
      "GROUP BY l_linestatus") == "s_ls")
    // no grouping signal: registration order wins
    assert(pick("SELECT count(*) AS n FROM lineitem") == "s_rf_ls")

    // e2e: two registered samples, WITH ERROR still answers exactly for
    // a stratum-aligned grouping
    val g = GraftSession(spark)
    Tables.registerAll(spark, sf)
    g.createSampleTable("s_multi_a", li,
      qcs = Seq("l_returnflag", "l_linestatus"), fraction = 0.1,
      reservoirFloor = 30, rankKey = Seq("l_orderkey", "l_linenumber"))
    g.createSampleTable("s_multi_b", li,
      qcs = Seq("l_linestatus"), fraction = 0.1,
      reservoirFloor = 30, rankKey = Seq("l_orderkey", "l_linenumber"))
    g.registerSample("lineitem", "s_multi_a", Seq("l_returnflag", "l_linestatus"))
    g.registerSample("lineitem", "s_multi_b", Seq("l_linestatus"))
    try {
      val got = g.sql("SELECT l_linestatus, count(*) AS n FROM lineitem " +
        "GROUP BY l_linestatus WITH ERROR 0.1").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = li.groupBy("l_linestatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact, "stratum-aligned HT counts must be exact")
    } finally g.samples.remove("lineitem")
  }

  test("bootstrap count(*) draws per-ROW multiplicities, not per-stratum") {
    withSample("li_sample_cnt") { g =>
      withBootstrap(200) {
        // every row of a stratum shares (x=1, w): without the xxhash64(*)
        // row identity the whole stratum would collapse to one Poisson
        // draw per trial and the relative error would be ~100%
        val rows = g.sql(
          """SELECT l_returnflag, count(*) AS n, relative_error(n) AS re
            |FROM lineitem GROUP BY l_returnflag
            |WITH ERROR 0.9 CONFIDENCE 0.95 BEHAVIOR 'do_nothing'""".stripMargin)
          .collect()
        assert(rows.nonEmpty)
        rows.foreach { r =>
          val re = r.getDouble(2)
          assert(re < 0.2,
            s"bootstrap count rel. error must reflect per-row resampling: " +
              s"${r.getString(0)} -> $re")
        }
      }
    }
  }

  test("bootstrap estimator drives the behavior contract (local_omit)") {
    withSample("li_sample_bsb") { g =>
      withBootstrap(100) {
        // impossible bound: every bootstrap relative error exceeds it, so
        // local_omit must NULL every estimate while keeping the rows
        val strictFail = intercept[IllegalStateException] {
          g.sql("SELECT l_returnflag, avg(l_extendedprice) AS m FROM lineitem " +
            "GROUP BY l_returnflag WITH ERROR 0.0000000001 BEHAVIOR 'strict'")
            .collect()
        }
        assert(strictFail.getMessage.contains("exceeds"))
        val omitted = g.sql(
          "SELECT l_returnflag, avg(l_extendedprice) AS m FROM lineitem " +
            "GROUP BY l_returnflag WITH ERROR 0.0000000001 BEHAVIOR 'local_omit'")
          .collect()
        assert(omitted.nonEmpty)
        assert(omitted.forall(_.isNullAt(1)),
          "local_omit under bootstrap must null estimates exceeding the bound")
        // loose bound: everything passes untouched
        val kept = g.sql(
          "SELECT l_returnflag, avg(l_extendedprice) AS m FROM lineitem " +
            "GROUP BY l_returnflag WITH ERROR 0.9 BEHAVIOR 'local_omit'")
          .collect()
        assert(kept.forall(!_.isNullAt(1)))
      }
    }
  }

  test("bootstrap_trials/bootstrap_ci compose CIs for non-linear estimators") {
    withSample("li_sample_nl") { g =>
      // discount-weighted price ratio: sum(price*disc)/sum(price) — a
      // non-linear (ratio-of-sums) estimator closed-form has no formula
      // for; trials of both sums share multipliers (same (x,w) key would
      // differ — use zip_with over two PAIRED trial arrays)
      val r = g.sql(
        """SELECT bootstrap_ci(
          |    zip_with(
          |      bootstrap_trials(l_extendedprice * l_discount, _weight, 'sum', 200, 7),
          |      bootstrap_trials(l_extendedprice, _weight, 'sum', 200, 7),
          |      (a, b) -> a / b),
          |    0.95) AS ci
          |FROM li_sample_nl""".stripMargin).head().getStruct(0)
      val (absErr, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val t = li.agg(sum(col("l_extendedprice") * col("l_discount")) / sum(col("l_extendedprice")))
        .head().getDouble(0)
      assert(absErr > 0 && lo < hi)
      assert(t >= lo && t <= hi, s"true ratio $t outside bootstrap [$lo, $hi]")
    }
  }

  test("sketch tables: persisted HLL sketches roll up to the same estimate (pre-aggregated distincts)") {
    // the OLAP cube pattern at 100 TB: distinct-user counts are
    // pre-aggregated per (day, event_type) as MERGEABLE HLL sketches in
    // a store table (binary column); any rollup — per type, per day,
    // global — is a metadata-scale union over the cube, the raw events
    // never rescan. Spark 4's hll_sketch_agg/hll_union_agg are the
    // codegen'd sketch kernels; the store contributes exact binary
    // round-tripping and the bucketed layout.
    val g = GraftSession(spark)
    val ev = Tables.load(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
    val cube = ev.groupBy(col("day"), col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("users_sketch"),
        count(lit(1)).as("n_events"))
    g.createTable("hll_cube", cube)
    try {
      val stored = g.table("hll_cube")
      // rollup per event_type from the STORED sketches vs the same
      // rollup from the in-memory frame: binary fidelity through the
      // store must be exact, so the estimates match exactly
      def rollup(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("event_type"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(users_sketch))")
          .cast("long").as("approx_users"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val fromStore = rollup(stored)
      val direct = rollup(cube)
      assert(fromStore == direct,
        s"store roundtrip changed sketch estimates: $fromStore vs $direct")
      // and the estimates are estimates of the right thing: within 5%
      // of the exact distinct count per type
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (t, n) =>
        val est = fromStore(t)
        assert(math.abs(est - n).toDouble / n < 0.05,
          s"$t: estimate $est vs exact $n")
      }
      // the global rollup unions ALL cube rows — one tiny agg, no
      // events scan
      val global = g.table("hll_cube")
        .agg(expr("hll_sketch_estimate(hll_union_agg(users_sketch))")
          .cast("long")).head().getLong(0)
      val globalExact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
      assert(math.abs(global - globalExact).toDouble / globalExact < 0.05)
    } finally g.dropTable("hll_cube")
  }
}
