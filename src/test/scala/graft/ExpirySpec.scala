package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.store.{GraftColumnStore, GraftRowOps, GraftRowStore, GraftStoreOps, StoreClock}
import org.scalatest.BeforeAndAfterEach

/** EXPIRE time-to-live (batch/pack-granularity TTL): scan-time hiding,
  * sweep reclamation with attached deltas/bitmaps, opportunistic sweep
  * on write commits, DDL surface, the no-expiry default, and the
  * sweep-vs-staged-mutation race. TTL aging is driven through
  * [[StoreClock.advance]] — deterministic, no sleeps, and each test
  * resets the clock.
  */
class ExpirySpec extends SparkTestBase with BeforeAndAfterEach {
  private val fmt = "org.apache.spark.sql.graft.store.GraftColumnSource"
  private val TtlMs = 60000L // well past any test's real elapsed time

  override def afterEach(): Unit = StoreClock.reset()

  test("expired batches vanish from scans and rowCount; sweep reclaims payloads") {
    spark.range(500).select(col("id").as("v"))
      .write.format(fmt).option("table", "exp_t")
      .option("batch_size", "128")
      .option("expire_seconds", "60").mode("overwrite").save()
    val df = spark.read.format(fmt).option("table", "exp_t").load()
    assert(df.count() == 500, "fresh rows visible")
    assert(GraftColumnStore("exp_t").snapshot.rowCount == 500L)
    StoreClock.advance(TtlMs + 1000)
    // scans hide expired batches with no sweep having run
    assert(df.count() == 0, "all rows older than TTL")
    assert(GraftColumnStore("exp_t").snapshot.rowCount == 0L)
    // refs still present until a sweep reclaims them
    val nRefs = GraftColumnStore("exp_t").snapshot.refs.length
    assert(nRefs > 0)
    val removed = GraftStoreOps.expireSweep(spark, "exp_t")
    assert(removed == nRefs)
    assert(GraftColumnStore("exp_t").snapshot.refs.isEmpty)
  }

  test("write commits sweep opportunistically; fresh rows outlive stale ones") {
    spark.range(100).select(col("id").as("v"))
      .write.format(fmt).option("table", "exp_w")
      .option("expire_seconds", "60").mode("overwrite").save()
    StoreClock.advance(TtlMs + 1000)
    // an append arrives after the old batch's TTL: commit sweeps it
    spark.range(100, 150).select(col("id").as("v"))
      .write.format(fmt).option("table", "exp_w").mode("append").save()
    val snap = GraftColumnStore("exp_w").snapshot
    assert(snap.refs.forall(_.numRows <= 50), "stale batch swept at commit")
    val vs = spark.read.format(fmt).option("table", "exp_w").load()
      .agg(min(col("v")), max(col("v")), count(lit(1))).head()
    assert(vs.getLong(0) == 100 && vs.getLong(1) == 149 && vs.getLong(2) == 50)
  }

  test("sweep retires attached delete bitmaps and update deltas with the batch") {
    spark.range(200).select(col("id").as("k"), col("id").as("v"))
      .write.format(fmt).option("table", "exp_m")
      .option("expire_seconds", "60").mode("overwrite").save()
    GraftStoreOps.delete(spark, "exp_m", col("k") < 10)
    GraftStoreOps.update(spark, "exp_m", col("k") >= 190,
      Seq("v" -> (col("v") + 1000)))
    val before = GraftColumnStore("exp_m").snapshot
    assert(before.deletes.nonEmpty && before.updates.nonEmpty)
    StoreClock.advance(TtlMs + 1000)
    assert(GraftStoreOps.expireSweep(spark, "exp_m") > 0)
    val after = GraftColumnStore("exp_m").snapshot
    assert(after.refs.isEmpty && after.deletes.isEmpty && after.updates.isEmpty)
  }

  test("deletes/updates landing after a sweep retired their batch leave no orphan entries") {
    spark.range(300).select(col("id").as("k"), col("id").as("v"))
      .write.format(fmt).option("table", "exp_race")
      .option("expire_seconds", "60").mode("overwrite").save()
    val t = GraftColumnStore("exp_race")
    val deadId = t.snapshot.refs.head.id
    // sweep wins the race: the batch leaves the snapshot while a
    // concurrent mutation had already built artifacts addressed to it
    StoreClock.advance(TtlMs + 1000)
    assert(GraftStoreOps.expireSweep(spark, "exp_race") > 0)
    StoreClock.reset()
    // the late-arriving commit applies its refs for the retired id: both
    // maps must drop them (ids never recycle, so an entry would be
    // immortal) instead of re-inserting
    val bid = GraftColumnStore.BatchRegistry.putBitmap(Array(1L))
    t.applyDeletes(Map(deadId -> GraftColumnStore.DeleteRef(bid, 1)))
    val did = GraftColumnStore.BatchRegistry.putDelta(
      new GraftColumnStore.ColumnDeltaPayload(Array(0), Array[Any](9L)))
    t.applyUpdates(Seq((deadId, 1, GraftColumnStore.ColumnDeltaRef(did, 1))))
    val snap = t.snapshot
    assert(snap.deletes.isEmpty, s"orphan delete entries: ${snap.deletes.keySet}")
    assert(snap.updates.isEmpty, s"orphan update entries: ${snap.updates.keySet}")
  }

  test("metadata approx_count_distinct and sys.sketches respect the TTL cut") {
    spark.range(1000).select((col("id") % 200).as("k"))
      .write.format(fmt).option("table", "exp_sk")
      .option("batch_size", "256")
      .option("sketch_columns", "k")
      .option("expire_seconds", "60").mode("overwrite").save()
    val q = spark.read.format(fmt).option("table", "exp_sk").load()
      .agg(approx_count_distinct(col("k")).as("nd"))
    assert(q.head().getLong(0) > 150L)
    StoreClock.advance(TtlMs + 1000)
    assert(q.head().getLong(0) == 0L,
      "the metadata rewrite must not resurrect expired batches")
    assert(GraftStoreOps.approxDistinct(spark, "exp_sk", "k") == 0L)
    val sysRow = spark.sql(
      "SELECT * FROM sys.sketches WHERE table_name = 'exp_sk'").head()
    assert(sysRow.getAs[Int]("n_batches") == 0)
    assert(sysRow.getAs[Long]("estimate") == 0L)
  }

  test("EXPIRE DDL option is honored for column tables") {
    val g = GraftSession(spark)
    spark.sql(
      """CREATE TABLE exp_ddl USING column OPTIONS (EXPIRE '60') AS
        |SELECT id AS v FROM range(50)""".stripMargin)
    try {
      assert(GraftColumnStore("exp_ddl").snapshot.expireSeconds == 60L)
      assert(spark.sql("SELECT count(*) AS n FROM exp_ddl").head().getLong(0) == 50)
      StoreClock.advance(TtlMs + 1000)
      assert(spark.sql("SELECT count(*) AS n FROM exp_ddl").head().getLong(0) == 0)
    } finally g.dropTable("exp_ddl")
  }

  test("row tables: expired packs vanish from scans and point lookups; sweep reclaims") {
    spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.format(GraftRowOps.FORMAT).option("table", "exp_row")
      .option("key_columns", "k")
      .option("expire_seconds", "60").mode("overwrite").save()
    val df = GraftRowOps.read(spark, "exp_row")
    assert(df.count() == 100)
    // PK point lookup finds a fresh row
    assert(df.filter(col("k") === 42).count() == 1)
    StoreClock.advance(TtlMs + 1000)
    assert(df.count() == 0, "expired packs hidden from scans")
    assert(df.filter(col("k") === 42).count() == 0, "and from PK probes")
    assert(GraftRowStore("exp_row").snapshot.rowCount == 0L)
    // the shared ops entry point routes to the row store
    val n = GraftStoreOps.expireSweep(spark, "exp_row")
    assert(n > 0 && GraftRowStore("exp_row").snapshot.refs.isEmpty)
    // a key whose row expired can be re-inserted (PK invariant checks
    // live rows only)
    spark.range(42, 43).select(col("id").as("k"), lit(7L).as("v"))
      .write.format(GraftRowOps.FORMAT).option("table", "exp_row").mode("append").save()
    StoreClock.reset()
    assert(df.filter(col("k") === 42).count() == 1)
  }

  test("streaming ingest into a sketched TTL table: commits sweep retention, digests stay serveable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("id")
      .select((col("id") % 500).as("k"), col("id").as("v"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.format(fmt).option("table", "exp_stream")
          .option("batch_size", "256")
          .option("sketch_columns", "k")
          .option("expire_seconds", "60")
          .mode("append").save()
      }
      .start()
    try {
      mem.addData(0L until 1000L: _*)
      q.processAllAvailable()
      assert(GraftColumnStore("exp_stream").snapshot.rowCount == 1000L)
      assert(math.abs(
        GraftStoreOps.approxDistinct(spark, "exp_stream", "k") - 500) <= 25)
      // the first micro-batch ages out; the next commit's sweep reclaims
      // it while fresh data keeps flowing
      StoreClock.advance(TtlMs + 1000)
      mem.addData(1000L until 1200L: _*)
      q.processAllAvailable()
      val snap = GraftColumnStore("exp_stream").snapshot
      assert(snap.rowCount == 200L, s"retention: ${snap.rowCount}")
      assert(snap.refs.forall(r => !snap.isExpired(r, StoreClock.nowMs)),
        "commit sweep reclaimed the aged micro-batch")
      // live telemetry follows the retained window only
      val est = GraftStoreOps.approxDistinct(spark, "exp_stream", "k")
      assert(math.abs(est - 200) <= 10, s"estimate over retained rows: $est")
    } finally q.stop()
  }

  test("EXPIRE x FOREIGN KEY: child-side and parent-side checks agree on the TTL cut") {
    val g = GraftSession(spark)
    import spark.implicits._
    g.sql("CREATE TABLE exp_fk_par (pid int primary key, pname string) " +
      "USING row OPTIONS (expire '60')")
    g.sql("CREATE TABLE exp_fk_ch (cid int primary key, pid int, " +
      "constraint fk_exp foreign key (pid) references exp_fk_par (pid)) USING row")
    try {
      g.insert("exp_fk_par", Seq((1, "a"), (2, "b")).toDF("pid", "pname"))
      // live parent: the child insert passes, and the parent-side
      // RESTRICT refuses deleting the referenced key
      g.insert("exp_fk_ch", Seq((10, 1)).toDF("cid", "pid"))
      intercept[Exception](g.delete("exp_fk_par", col("pid") === 1))
      StoreClock.advance(TtlMs + 1000)
      // the parent rows aged out: the FK lookup sees the SAME liveRefs
      // cut every read path uses — pid=2 is gone, so the child insert
      // that passed a minute ago is now an orphan and refuses
      assert(g.table("exp_fk_par").count() == 0, "parent rows expired")
      val e = intercept[Exception](g.insert("exp_fk_ch", Seq((11, 2)).toDF("cid", "pid")))
      assert(e.getMessage.contains("fk_exp"), s"expected FK violation: ${e.getMessage}")
      // parent-side agrees: a DELETE over the expired parent removes no
      // LIVE referenced key, so RESTRICT stays quiet even though a child
      // row still references the (expired) pid=1 — the key vanished via
      // TTL, not via this statement
      g.delete("exp_fk_par", lit(true))
      // and a re-inserted parent key makes the child insert legal again
      // (ids never resurrect, but VALUES may be re-inserted as new rows)
      g.insert("exp_fk_par", Seq((2, "b2")).toDF("pid", "pname"))
      g.insert("exp_fk_ch", Seq((12, 2)).toDF("cid", "pid"))
      assert(g.table("exp_fk_ch").count() == 2)
    } finally {
      StoreClock.reset()
      g.dropTable("exp_fk_ch"); g.dropTable("exp_fk_par")
    }
  }

  test("no TTL (default) never expires; negative option rejected") {
    spark.range(10).select(col("id").as("v"))
      .write.format(fmt).option("table", "exp_off").mode("overwrite").save()
    assert(GraftColumnStore("exp_off").snapshot.expireSeconds == 0L)
    StoreClock.advance(TtlMs * 100)
    assert(spark.read.format(fmt).option("table", "exp_off").load().count() == 10)
    assert(GraftStoreOps.expireSweep(spark, "exp_off") == 0)
    StoreClock.reset()
    val e = intercept[Exception](
      spark.range(10).select(col("id").as("v"))
        .write.format(fmt).option("table", "exp_neg")
        .option("expire_seconds", "-5").mode("overwrite").save())
    assert(e.getMessage.contains("expire_seconds"))
  }
}
