package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe (not part of the library surface). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val li = Tables.load(spark, dir, "lineitem")

    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("hll only") {
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
        .write.format("noop").mode("overwrite").save()
    }
    time("countDistinct only") {
      li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("e"))
        .write.format("noop").mode("overwrite").save()
    }
    time("percentile_approx only") {
      li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("m"))
        .write.format("noop").mode("overwrite").save()
    }
    time("all three together") {
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
          countDistinct(col("l_orderkey")).as("e"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("m"))
        .write.format("noop").mode("overwrite").save()
    }
    time("hll+percentile (no exact distinct)") {
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("m"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
