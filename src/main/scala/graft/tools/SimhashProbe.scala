package graft.tools
import graft.{Tables}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("tokenize+md5 only") {
      docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        .withColumn("h", Dedup.md5Hash60(col("tok")))
        .write.format("noop").mode("overwrite").save()
    }
    time("tokenize+xxhash only") {
      docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        .withColumn("h", xxhash64(col("tok")))
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures md5/60") {
      Dedup.simhashSignatures(docs, "doc_id", "text",
        tokenHash = Dedup.md5Hash60, sigBits = 60)
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures xxhash/64") {
      Dedup.simhashSignatures(docs, "doc_id", "text", sigBits = 64)
        .write.format("noop").mode("overwrite").save()
    }
    val sig = Dedup.simhashSignatures(docs, "doc_id", "text",
      tokenHash = Dedup.md5Hash60, sigBits = 60).localCheckpoint(true)
    time("neardups 10 chunks combo1") {
      Dedup.simhashNearDups(sig, maxHamming = 8, numChunks = 10, sigBits = 60)
        .write.format("noop").mode("overwrite").save()
    }
    time("neardups 10 chunks combo2") {
      Dedup.simhashNearDups(sig, maxHamming = 8, numChunks = 10, sigBits = 60,
        comboSize = 2).write.format("noop").mode("overwrite").save()
    }
    val c1 = Dedup.simhashNearDups(sig, maxHamming = 8, numChunks = 10, sigBits = 60).count()
    val c2 = Dedup.simhashNearDups(sig, maxHamming = 8, numChunks = 10, sigBits = 60, comboSize = 2).count()
    println(s"[probe] results equal: $c1 == $c2 : ${c1 == c2}")
    spark.stop()
  }
}
