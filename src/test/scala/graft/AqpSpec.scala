package graft

import graft.operators.Aqp
import org.apache.spark.sql.functions._

class AqpSpec extends SparkTestBase {

  private lazy val li = Tables.load(spark, sf, "lineitem")
  private lazy val sample = Aqp.stratifiedSample(li,
    qcs = Seq("l_returnflag", "l_linestatus"),
    fraction = 0.1, reservoirFloor = 30,
    rankKey = Seq("l_orderkey", "l_linenumber"))

  test("stratified sample is deterministic and respects floor+fraction") {
    val a = sample.agg(count(lit(1))).head().getLong(0)
    val b = sample.agg(count(lit(1))).head().getLong(0)
    assert(a == b && a > 0)
    val perStratum = sample.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("kept"), first("_n_h").as("n_h")).collect()
    perStratum.foreach { r =>
      val kept = r.getAs[Long]("kept"); val nh = r.getAs[Long]("n_h")
      assert(kept >= math.min(nh, 30L), s"floor violated: $r")
      assert(kept <= math.max(30L, math.ceil(nh * 0.1).toLong), s"too many kept: $r")
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
          "sum(l_quantity) AS q FROM lineitem GROUP BY l_returnflag WITH ERROR 0.1")
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

  test("approx_count_distinct within 10% of exact") {
    val r = li.agg(
      approx_count_distinct(col("l_orderkey")).as("a"),
      countDistinct(col("l_orderkey")).as("e")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.10, s"approx $a vs exact $e")
  }
}
