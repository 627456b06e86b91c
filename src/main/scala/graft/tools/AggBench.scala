package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-bench for aggregate pushdown (GraftAggScan): dictionary
  * code-indexed grouping and stats-served global aggregates, A/B'd
  * against the un-pushed plan on a 10M-row store table.
  */
object AggBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fmt = "org.apache.spark.sql.graft.store.GraftColumnSource"

    val n = sys.env.getOrElse("AGG_BENCH_ROWS", "10000000").toLong
    spark.range(n).selectExpr(
        "id",
        "CAST(id % 7 AS STRING) AS dim7",
        "concat('cat_', id % 1000) AS dim1k",
        "CAST(id % 100 AS DOUBLE) AS x")
      .write.format(fmt).option("table", "aggbench").mode("overwrite").save()

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[aggbench] $tag%-36s ${runs.min}%.3f s (min of 3)")
    }

    val df = spark.read.format(fmt).option("table", "aggbench").load()
    // interleaved A/B (alternating runs) — sequential blocks bias
    // whichever side runs first with JIT warmup
    def ab(tag: String)(f: => Unit): Unit = {
      def run(push: Boolean): Double = {
        spark.conf.set("spark.sql.graft.aggPushdown", push.toString)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      run(true); run(false) // warm both
      val on = Seq(run(true), run(false), run(true), run(false), run(true))
      val ons = Seq(on(0), on(2), on(4)); val offs = Seq(on(1), on(3))
      println(f"[aggbench] $tag%-30s push=${ons.min}%.3f s  nopush=${offs.min}%.3f s  (${offs.min / ons.min}%.2fx)")
    }
    ab("count(*)") {
      df.agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    ab("global min/max/sum") {
      df.agg(min("x"), max("x"), sum("id"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    ab("dict groupBy(7) count+sum") {
      df.groupBy("dim7").agg(count(lit(1)), sum("x"))
        .write.format("noop").mode("overwrite").save()
    }
    ab("dict groupBy(1k) count+sum") {
      df.groupBy("dim1k").agg(count(lit(1)), sum("x"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.unset("spark.sql.graft.aggPushdown")
    spark.stop()
  }
}
