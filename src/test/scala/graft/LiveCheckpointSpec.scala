package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.store.{GraftColumnStore, GraftManifest, GraftStoreOps, LiveCheckpoint}

/** Epoch-versioned checkpoint publishing ([[LiveCheckpoint]]) — the
  * commit-marker protocol the two-process serving proof
  * (`tools/live_store_serve.sh`) runs across JVMs. This spec pins the
  * protocol's single-JVM invariants: marker-last publish (in-flight
  * epochs invisible), fingerprint-verified attach (torn snapshots
  * abort, never serve), advancing epochs, retention with continuous
  * numbering.
  */
class LiveCheckpointSpec extends SparkTestBase {

  private val fmt = GraftStoreOps.FORMAT

  private def write(table: String, n: Int): Unit =
    spark.range(n)
      .select((col("id") % 8).as("k"), (col("id") * 2).as("v"))
      .write.format(fmt).option("table", table)
      .option("partition_by", "k").option("buckets", "4")
      .mode("overwrite").save()

  test("publish/attach round-trips; the served snapshot advances with commits") {
    val root = java.nio.file.Files.createTempDirectory("lc_root").toString
    write("lc_src", 1000)
    assert(LiveCheckpoint.publish(spark, "lc_src", root) == 0L)
    assert(LiveCheckpoint.attachLatest(spark, "lc_srv", root) == 0L)
    assert(GraftStoreOps.read(spark, "lc_srv").count() == 1000)
    // writer keeps going: append + delete, then publishes epoch 1
    spark.range(1000, 1500)
      .select((col("id") % 8).as("k"), (col("id") * 2).as("v"))
      .write.format(fmt).option("table", "lc_src").mode("append").save()
    GraftStoreOps.delete(spark, "lc_src", col("v") < 20)
    assert(LiveCheckpoint.publish(spark, "lc_src", root) == 1L)
    // the reader's next attach serves the ADVANCED snapshot
    assert(LiveCheckpoint.attachLatest(spark, "lc_srv", root) == 1L)
    val served = GraftStoreOps.read(spark, "lc_srv")
    assert(served.count() == 1490)
    assert(served.filter(col("v") < 20).count() == 0)
    // the restored table kept the published layout
    val snap = GraftColumnStore("lc_srv").snapshot
    assert(snap.numBuckets == 4 && snap.bucketBy == Seq("k"))
    GraftColumnStore.drop("lc_src"); GraftColumnStore.drop("lc_srv")
  }

  test("an epoch without its marker is invisible; a tampered epoch aborts the attach") {
    val root = java.nio.file.Files.createTempDirectory("lc_torn").toString
    write("lc_t", 500)
    LiveCheckpoint.publish(spark, "lc_t", root)
    // an in-flight (torn) epoch: directory + data, NO marker
    val torn = new java.io.File(s"$root/epoch_00000007/data")
    torn.mkdirs()
    assert(LiveCheckpoint.latestEpoch(spark, root).contains(0L),
      "unmarked epochs must stay invisible to readers")
    assert(LiveCheckpoint.attachLatest(spark, "lc_tsrv", root) == 0L)
    // tamper: corrupt the published fingerprint — the attach must abort
    // rather than serve content that differs from the manifest
    GraftManifest.write(spark, s"$root/epoch_00000000", Seq(
      "epoch" -> "0", "rows" -> "499", "content_hash" -> "1", "table" -> "lc_t"),
      "tampered", LiveCheckpoint.EPOCH_PROPS)
    val e = intercept[IllegalStateException](
      LiveCheckpoint.attach(spark, "lc_tsrv", root, 0L))
    assert(e.getMessage.contains("torn snapshot"))
    // and the known-bad snapshot is not left registered as servable
    assert(GraftColumnStore.get("lc_tsrv").isEmpty)
    GraftColumnStore.drop("lc_t")
  }

  test("retention prunes old epochs but numbering continues") {
    val root = java.nio.file.Files.createTempDirectory("lc_keep").toString
    write("lc_k", 100)
    (0 until 5).foreach { i =>
      assert(LiveCheckpoint.publish(spark, "lc_k", root, keep = 2) == i.toLong)
    }
    assert(LiveCheckpoint.committedEpochs(spark, root) == Seq(3L, 4L))
    // a new publish after pruning continues the sequence — epoch ids
    // never recycle, so a reader can order snapshots across retention
    assert(LiveCheckpoint.publish(spark, "lc_k", root, keep = 2) == 5L)
    GraftColumnStore.drop("lc_k")
  }
}
