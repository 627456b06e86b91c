package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe (not part of the library surface).
  *
  * Current target: attribute `q_column_store` ingest time. The host shows
  * large noise PHASES (whole seconds of slowdown that migrate between
  * unrelated queries across runs — see StoreBench round-5 A/B), so arms
  * are INTERLEAVED per round rather than timed back-to-back: each round
  * times every arm once, and per-arm minima across rounds are comparable
  * even when a noise phase eats one round.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val fmt = "org.apache.spark.sql.graft.store.GraftColumnSource"
    val li = Tables.load(spark, dir, "lineitem")
    val sorted = li.orderBy("l_orderkey")

    def arm(name: String)(f: => Unit): (String, () => Double) =
      (name, () => { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 })

    val arms = Seq(
      arm("sort+noop (no store)") {
        sorted.write.format("noop").mode("overwrite").save()
      },
      arm("sort+store bs=4096 auto") {
        System.clearProperty("graft.store.plainOnly")
        sorted.write.format(fmt).option("table", "sp_a").option("batch_size", "4096")
          .mode("overwrite").save()
      },
      arm("sort+store bs=4096 plain") {
        System.setProperty("graft.store.plainOnly", "true")
        sorted.write.format(fmt).option("table", "sp_p").option("batch_size", "4096")
          .mode("overwrite").save()
        System.clearProperty("graft.store.plainOnly")
      },
      arm("sort+store bs=16384 auto") {
        System.clearProperty("graft.store.plainOnly")
        sorted.write.format(fmt).option("table", "sp_b").option("batch_size", "16384")
          .mode("overwrite").save()
      },
      arm("unsorted store bs=4096 auto") {
        System.clearProperty("graft.store.plainOnly")
        li.write.format(fmt).option("table", "sp_u").option("batch_size", "4096")
          .mode("overwrite").save()
      },
      arm("sort_by store bs=4096 auto") {
        System.clearProperty("graft.store.plainOnly")
        li.write.format(fmt).option("table", "sp_s").option("batch_size", "4096")
          .option("sort_by", "l_orderkey")
          .mode("overwrite").save()
      })

    // warmup every arm once
    arms.foreach { case (_, f) => f() }
    val rounds = 5
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to rounds) {
      arms.foreach { case (n, f) =>
        val t = f()
        acc(n) = t :: acc.getOrElse(n, Nil)
        println(f"[probe] round $r $n%-30s $t%.3f s")
      }
      System.gc()
    }
    println("--- minima ---")
    arms.foreach { case (n, _) =>
      println(f"[probe] MIN $n%-30s ${acc(n).min}%.3f s")
    }
    spark.stop()
  }
}
