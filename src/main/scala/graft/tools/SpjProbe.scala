package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
object SpjProbe extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "org.apache.spark.sql.graft.store.GraftCatalog")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val g = graft.GraftSession(spark)
    val data = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    g.createTable("spj_t", data, partitionBy = Seq("k"), buckets = 4)
    val other = (1L to 100L).map(i => (i * 3, i)).toDF("k2", "x")
    val j = spark.table("graft.spj_t").join(other, col("k") === col("k2"))
    j.collect()
    val plan = j.queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
    println(s"== exchanges: ${shuffles.size}")
    shuffles.foreach(e => println("  exch over: " + e.child.getClass.getSimpleName + " out=" + e.outputPartitioning.getClass.getSimpleName))
    println(plan.toString.linesIterator.map(_.take(130)).mkString("\n"))
    spark.stop()
  }
}
