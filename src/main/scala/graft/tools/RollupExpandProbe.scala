package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the q_ds_category_topk Expand cost question (r8 verdict
  * stretch): Spark's ROLLUP plans an Expand that triplicates the fact
  * rows before the partial aggregate. The candidate rewrite
  * pre-aggregates on the full grouping key (p_type, p_brand) first and
  * rolls up the PRE-AGG (valid: sum is reassociative), so the Expand
  * triplicates |types·brands| rows instead of |fact| rows.
  * Interleaved min-of-N in one JVM — the only same-shape comparison
  * this host supports (PERF_NOTES §21).
  */
object RollupExpandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def joined = graft.Tables.load(spark, sfDir, "lineitem")
      .join(graft.Tables.load(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)") * 10000

    // arm A: the committed shape — rollup directly over the fact join
    def armA: DataFrame = joined
      .rollup(col("p_type"), col("p_brand"))
      .agg(sum(rev).cast("long").as("rev_e4"))

    // arm B: pre-aggregate on the full key, rollup the pre-agg
    def armB: DataFrame = joined
      .groupBy(col("p_type"), col("p_brand"))
      .agg(sum(rev).as("prev"))
      .rollup(col("p_type"), col("p_brand"))
      .agg(sum(col("prev")).cast("long").as("rev_e4"))

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // equivalence first
    val a = armA.collect().map(_.toSeq).sortBy(_.toString)
    val b = armB.collect().map(_.toSeq).sortBy(_.toString)
    require(a.toSeq == b.toSeq, "rewrite must be value-identical")
    println(s"[probe] value-identical: ${a.length} rollup rows")
    time(armA); time(armB) // warmup
    val (as, bs) = (Array.fill(5)(0.0), Array.fill(5)(0.0))
    for (i <- 0 until 5) { as(i) = time(armA); bs(i) = time(armB) }
    println(f"[probe] armA(rollup-over-fact)  min=${as.min}%.3f runs=${as.map(t => f"$t%.2f").mkString(",")}")
    println(f"[probe] armB(preagg-then-rollup) min=${bs.min}%.3f runs=${bs.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
