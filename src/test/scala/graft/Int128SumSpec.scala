package graft

import graft.functions.MoneyFunctions.int128_sum
import org.apache.spark.sql.functions._

/** Int128Sum: exact 128-bit money sums (declarative two-long buffer). */
class Int128SumSpec extends SparkTestBase {

  test("matches BigDecimal ground truth incl. negatives and nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals: Seq[Option[Long]] = (1 to 10000).map { i =>
      if (i % 97 == 0) None
      else Some((rnd.nextLong() % 1000000000L) - 200000000L)
    }
    val expected = BigDecimal(vals.flatten.map(BigInt(_)).sum, 4)
    val got = vals.toDF("v").repartition(8)
      .agg(int128_sum(col("v"), 4).as("s"))
      .head().getDecimal(0)
    assert(BigDecimal(got) == expected)
  }

  test("lo-word wrap-around carries into hi (values beyond 2^63 total)") {
    import spark.implicits._
    // 4000 copies of 2^61: total = 2^63 * 1000 — far past Long range
    val big = (1 to 4000).map(_ => (1L << 61)).toDF("v").repartition(16)
    val got = big.agg(int128_sum(col("v"), 0).as("s")).head().getDecimal(0)
    assert(BigDecimal(got) == BigDecimal(BigInt(1) << 63) * 1000)
    // and symmetric for negative totals
    val gotNeg = (1 to 4000).map(_ => -(1L << 61)).toDF("v").repartition(16)
      .agg(int128_sum(col("v"), 0).as("s")).head().getDecimal(0)
    assert(BigDecimal(gotNeg) == -BigDecimal(BigInt(1) << 63) * 1000)
  }

  test("empty and all-null groups yield null; grouped sums are per-key") {
    import spark.implicits._
    val df = Seq((1, Some(10L)), (1, Some(-4L)), (2, None), (2, None))
      .toDF("k", "v")
    val rows = df.groupBy("k").agg(int128_sum(col("v"), 2).as("s"))
      .orderBy("k").collect()
    assert(BigDecimal(rows(0).getDecimal(1)) == BigDecimal("0.06"))
    assert(rows(1).isNullAt(1))
    assert(spark.emptyDataset[Long].toDF("v")
      .agg(int128_sum(col("v"), 2)).head().isNullAt(0))
  }

  test("decSum equals the wide-decimal formulation on TPC-H money") {
    val li = Tables.load(spark, sf, "lineitem")
    val a = li.groupBy("l_returnflag")
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("s"))
    val b = li.groupBy("l_returnflag")
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))), 2)
        .cast("double").as("s"))
    assert(a.orderBy("l_returnflag").collect().toSeq ==
      b.orderBy("l_returnflag").collect().toSeq)
  }

  test("stays inside whole-stage codegen (no ObjectHashAggregate)") {
    val li = Tables.load(spark, sf, "lineitem")
    val plan = li.groupBy("l_returnflag")
      .agg(decSum(col("l_extendedprice")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }
}
