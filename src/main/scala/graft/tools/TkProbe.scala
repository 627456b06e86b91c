package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "org.apache.spark.sql.graft.store.GraftCatalog")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val g = graft.GraftSession(spark)
      val name = s"tkp_${dir.hashCode & 0x7fffffff}"
      g.createApproxTSTopK(name,
        graft.Tables.load(spark, dir, "events")
          .select(col("ts"), col("user_id").cast("string").as("user_key")),
        "user_key", "ts", "1 day", 5, width = 16384)
      val top = g.queryApproxTSTopK(name, "2024-01-05 00:00:00", "2024-01-12 00:00:00", 5)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val exact = graft.Tables.load(spark, dir, "events")
        .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
        .groupBy(col("user_id").cast("string").as("k")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val cut = exact.values.toSeq.sorted.reverse.take(5).min
      println(s"$dir cut=$cut")
      top.foreach { case (k, est) =>
        println(f"  key=$k%6s est=$est exact=${exact.getOrElse(k, 0L)} over=${est - exact.getOrElse(k, 0L)} vs_cut=${exact.getOrElse(k, 0L) - cut}")
      }
    }
    spark.stop()
  }
}
