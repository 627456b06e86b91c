package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** External-source surface (SURVEY §2.1 external tables): CSV and JSON
  * write/read roundtrips preserve data, with schema inference and
  * explicit schemas, plus a partitioned-parquet write with partition
  * pruning.
  */
class SourcesSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv roundtrip with header + explicit schema") {
    val dir = tmp("graft_csv")
    val cust = Tables.load(spark, sf, "customer")
    cust.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(cust.schema).csv(dir)
    assert(back.count() == cust.count())
    val a = cust.agg(sum("c_acctbal")).head().getDouble(0)
    val b = back.agg(sum("c_acctbal")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("json roundtrip with schema inference") {
    val dir = tmp("graft_json")
    val nat = Tables.load(spark, sf, "nation")
    nat.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 25)
    assert(back.columns.sorted.toSeq == nat.columns.sorted.toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("graft_part")
    Tables.load(spark, sf, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("status") === "O")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-filter
    assert(plan.contains("PartitionFilters") && plan.contains("status"),
      s"expected partition pruning in:\n$plan")
    val expected = Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") === "O").count()
    assert(pruned.count() == expected)
  }
}
