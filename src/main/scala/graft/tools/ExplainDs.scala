package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainDs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "org.apache.spark.sql.graft.store.GraftCatalog")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q")
      println(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan ") || l.contains("Expand") || l.contains("Window"))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
