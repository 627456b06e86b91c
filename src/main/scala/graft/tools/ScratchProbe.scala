package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe (not part of the library surface).
  *
  * Current target: where do the minhash-LSH shuffle bytes come from at
  * 16x corpus (ScaleProbe measured ~790 MB)? Prints per-stage shuffle
  * writes and the executed plan of the pair count.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("PROBE_MULT", "16").toInt

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages.add((sc.stageInfo.name.take(80),
          m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead))
      }
    })

    val docs = Tables.load(spark, dir, "documents")
    val dx = docs
      .crossJoin(spark.range(mult).toDF("__rep"))
      .select(
        (col("doc_id") + col("__rep") * lit(1000000000L)).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1x"), col("__rep"))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dx.count()
    Thread.sleep(500); stages.clear()

    def phase(tag: String)(f: => Long): Unit = {
      Thread.sleep(500); stages.clear()
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      var w = 0L; var r = 0L
      stages.forEach { case (_, sw, sr) => w += sw; r += sr }
      println(f"phase $tag%-28s out=$out%10d  ${sec}%6.2fs  write=${w / 1e6}%8.1fMB read=${r / 1e6}%8.1fMB")
    }

    import org.apache.spark.sql.graft.TextHashExpressions
    val base = dx
      .select(col("doc_id").as("sid"),
        TextHashExpressions.minhash_full(col("text"), 3, 16).as("m"))
      .select(col("sid"), col("m.sig").as("sig"), col("m.sh").as("sh"))
      .localCheckpoint(true)
    phase("bands+cands(guard100)") {
      val bands = base.select(col("sid"), posexplode(col("sig")))
        .select(col("sid"), col("pos").as("band_idx"), col("col").as("band_hash"))
      graft.operators.Dedup.lshCandidates(bands, Some(100)).count()
    }
    phase("full pipeline (guard100)") {
      graft.operators.Dedup
        .minhashNearDupsFast(dx, "doc_id", "text", maxBucketSize = Some(100))
        .count()
    }
    println("== stages of last phase > 1MB ==")
    stages.forEach { case (name, w, r) =>
      if (w > 1000000)
        println(f"  write=${w / 1e6}%8.1fMB read=${r / 1e6}%8.1fMB  $name")
    }
    spark.stop()
  }
}
