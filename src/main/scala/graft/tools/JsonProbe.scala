// temporary probe (not committed)
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.1", "events")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; f; f
      println(f"[probe] $tag ${(System.nanoTime()-t0)/3e9}%.3f s")
    }
    time("get_json_object") {
      ev.select((get_json_object(col("props"), "$.k").cast("bigint") % 10).as("k"), col("value"))
        .groupBy("k").agg(count(lit(1)), avg("value")).write.format("noop").mode("overwrite").save()
    }
    time("regexp_extract") {
      ev.select((regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("bigint") % 10).as("k"), col("value"))
        .groupBy("k").agg(count(lit(1)), avg("value")).write.format("noop").mode("overwrite").save()
    }
    time("from_json") {
      ev.select((from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))).getField("k") % 10).as("k"), col("value"))
        .groupBy("k").agg(count(lit(1)), avg("value")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
