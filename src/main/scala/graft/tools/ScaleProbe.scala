package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-linearity rehearsal (dev tool): runs three headline shapes —
  * scan-agg (q1), filtered scan (q6), and a fact⋈dim join-agg — over
  * 1×/4×/16× in-memory multiples of sf0.1 lineitem (payload replicated
  * per-partition with a replica column so cardinalities and group keys
  * scale honestly, no files written), and prints seconds per scale. The
  * point is the CURVE: near-linear growth means the plan has no
  * super-linear step (driver collects, global sorts, broadcast blowups)
  * hiding below bench scale. Results are interleaved min-of-3 per scale
  * (the host shows multi-second noise phases — see PERF_NOTES).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")

    def replicate(mult: Int) =
      li.crossJoin(spark.range(mult).toDF("__rep"))
        .withColumn("l_orderkey",
          col("l_orderkey") + col("__rep") * lit(100000000L))
        .drop("__rep")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val mults = Seq(1, 4, 16)
    val frames = mults.map(m => m -> { val df = replicate(m); df.count(); df }).toMap
    val arms: Seq[(String, Int => Unit)] = Seq(
      ("q1_scan_agg", m => frames(m)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
        .collect()),
      ("q6_filter", m => frames(m)
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice") * col("l_discount"))).collect()),
      ("join_agg", m => frames(m)
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity")).collect()))

    val results = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (round <- 1 to 3; (name, f) <- arms; m <- mults) {
      val t = time(f(m))
      val key = (name, m)
      results(key) = math.min(results.getOrElse(key, Double.MaxValue), t)
    }
    println("arm,mult,sec,ratio_vs_1x")
    for ((name, _) <- arms; m <- mults) {
      val t = results((name, m))
      println(f"$name,$m,$t%.3f,${t / results((name, 1))}%.2f")
    }
    frames.valuesIterator.foreach(_.unpersist())

    // ---- minhash-LSH shuffle-volume rehearsal ----
    // The banded-LSH claim is that shuffled data grows with the CORPUS
    // (bands + candidate ids + per-candidate hash arrays), never with
    // PAIRS — the all-pairs formulation it replaces is quadratic. To
    // scale honestly, every token is salted with its replica id
    // (shingle spaces of replicas are disjoint), so each replica
    // carries the same internal near-dup structure and cross-replica
    // collisions cannot manufacture m² candidates.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val docs = Tables.load(spark, dir, "documents")
    def docsX(mult: Int) = docs
      .crossJoin(spark.range(mult).toDF("__rep"))
      .select(
        (col("doc_id") + col("__rep") * lit(1000000000L)).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1x"), col("__rep"))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Step ratios (each row vs the previous) are the readable statistic:
    // the absolute curve contains ONE plan switch (once `bands` outgrows
    // the broadcast threshold the band self-join becomes an SMJ and its
    // pair output physically shuffles into the distinct — a once-off,
    // after which growth must be ~linear-in-step). Final pairs print
    // too: they must scale exactly with the corpus.
    println("minhash_lsh,mult,sec,shuffle_mb,pairs,sec_step,shuffle_step (step = vs prev row; 1->4->16 are 4x steps, 16->32 is 2x)")
    var prevSec = -1.0; var prevMb = -1.0
    for (m <- Seq(1, 4, 16, 32)) {
      val dx = docsX(m); dx.count()
      // settle the listener bus + drop prior checkpoint blocks
      System.gc(); Thread.sleep(500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      // maxBucketSize guards degenerate buckets (e.g. the shingle-less
      // all-MaxValue signature class) — the web-scale configuration
      val pairs = graft.operators.Dedup
        .minhashNearDupsFast(dx, "doc_id", "text", maxBucketSize = Some(100))
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let stage-completed events drain
      val mb = shuffleBytes.get() / 1e6
      val secR = if (prevSec > 0) sec / prevSec else Double.NaN
      val mbR = if (prevMb > 0) mb / prevMb else Double.NaN
      println(f"minhash_lsh,$m,$sec%.3f,$mb%.1f,$pairs,$secR%.2f,$mbR%.2f")
      prevSec = sec; prevMb = mb
      dx.unpersist()
    }

    // ---- incremental near-dup: per-batch cost vs registry size ----
    // The operator's claim is per-BATCH cost only: the same batch probed
    // against a 1x / 4x / 16x registry should cost ~flat time and ~flat
    // shuffle (the probe shuffles batch bands onto the registry's
    // bucketing; history never moves). Shuffle grows only with matched
    // postings (cross-replica matches are impossible — salted tokens).
    println("inc_minhash,regMult,sec,shuffle_mb,pairs (fixed 1x batch)")
    // the batch duplicates replica 0 (same salting, fresh ids): every
    // batch doc cross-matches exactly its replica-0 ancestor at every
    // registry size, so the PAIR count is constant and any cost growth
    // is pure registry-size overhead
    val batch = docs
      .select((col("doc_id") + lit(1000000000000L)).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"), lit("$1x0")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batch.count()
    for (m <- Seq(1, 4, 16)) {
      val hx = docsX(m)
      val (rb, rs) = graft.operators.Dedup.minhashFrames(hx, "doc_id", "text")
      val rbp = rb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rsp = rs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rbp.count(); rsp.count()
      System.gc(); Thread.sleep(500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val (pairs, newBands, newSigs) = graft.operators.Dedup.incrementalMinhash(
        batch, "doc_id", "text", rbp, rsp, maxBucketSize = Some(100))
      val n = pairs.count()
      // the production loop evaluates the append frames every batch —
      // they belong in the measured cost (this is where a registry-side
      // anti join would hide)
      val appended = newBands.count() + newSigs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"inc_minhash,$m,$sec%.3f,${shuffleBytes.get() / 1e6}%.1f,$n (appended $appended)")
      rbp.unpersist(); rsp.unpersist(); hx.unpersist()
    }

    // ---- incremental near-dup, STORE-TABLE registry, broadcasts REFUSED ----
    // The DataFrame-registry arm above holds its flat-cost shape through
    // the measured-broadcast hints. The store-table layout must hold it
    // STRUCTURALLY: registry tables bucketed by their join keys
    // (bands by band_hash, sigs by sid) read through the CATALOG (only
    // catalog-resolved scans carry KeyGroupedPartitioning), so with
    // every broadcast refused the registry side of each join stays
    // unshuffled — Spark shuffles only the batch-scale side into the
    // registry's bucket partitioning (storage-partitioned join). Flat
    // shuffle bytes across the registry sweep is the proof.
    {
      val g = graft.GraftSession(spark)
      // save/restore: a later-appended arm must not inherit the
      // broadcasts-refused regime this block measures under
      val armConfs = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.graft.measuredBroadcastMaxBytes" -> "0")
      val priorConfs = armConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
      armConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
      println("inc_minhash_store,regMult,sec,shuffle_mb,pairs (fixed 1x batch, broadcasts refused)")
      for (m <- Seq(1, 4, 16)) {
        val hx = docsX(m)
        val (rb, rs) = graft.operators.Dedup.minhashFrames(hx, "doc_id", "text")
        g.createTable("sp_reg_bands", rb, partitionBy = Seq("band_hash"), buckets = 32)
        g.createTable("sp_reg_sigs", rs, partitionBy = Seq("sid"), buckets = 32)
        System.gc(); Thread.sleep(500)
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        val (pairs, newBands, newSigs) = graft.operators.Dedup.incrementalMinhash(
          batch, "doc_id", "text",
          spark.table("graft.sp_reg_bands"), spark.table("graft.sp_reg_sigs"),
          maxBucketSize = Some(100))
        val n = pairs.count()
        val appended = newBands.count() + newSigs.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        println(f"inc_minhash_store,$m,$sec%.3f,${shuffleBytes.get() / 1e6}%.1f,$n (appended $appended)")
        g.dropTable("sp_reg_bands"); g.dropTable("sp_reg_sigs")
        hx.unpersist()
      }
      } finally priorConfs.foreach { case (k, old) =>
        old.fold(spark.conf.unset(k))(v => spark.conf.set(k, v)) }
    }
    spark.stop()
  }
}
