package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.store.{GraftColumnStore, GraftStoreOps}

/** EXPIRE time-to-live (batch-granularity TTL): scan-time hiding, sweep
  * reclamation with attached deltas/bitmaps, opportunistic sweep on
  * write commits, DDL surface, and the no-expiry default.
  */
class ExpirySpec extends SparkTestBase {
  private val fmt = "org.apache.spark.sql.graft.store.GraftColumnSource"

  test("expired batches vanish from scans and rowCount; sweep reclaims payloads") {
    spark.range(500).select(col("id").as("v"))
      .write.format(fmt).option("table", "exp_t")
      .option("batch_size", "128")
      .option("expire_seconds", "2").mode("overwrite").save()
    val df = spark.read.format(fmt).option("table", "exp_t").load()
    assert(df.count() == 500, "fresh rows visible")
    assert(GraftColumnStore("exp_t").snapshot.rowCount == 500L)
    Thread.sleep(2600)
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
      .option("expire_seconds", "2").mode("overwrite").save()
    Thread.sleep(2600)
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
      .option("expire_seconds", "2").mode("overwrite").save()
    GraftStoreOps.delete(spark, "exp_m", col("k") < 10)
    GraftStoreOps.update(spark, "exp_m", col("k") >= 190,
      Seq("v" -> (col("v") + 1000)))
    val before = GraftColumnStore("exp_m").snapshot
    assert(before.deletes.nonEmpty && before.updates.nonEmpty)
    Thread.sleep(2600)
    assert(GraftStoreOps.expireSweep(spark, "exp_m") > 0)
    val after = GraftColumnStore("exp_m").snapshot
    assert(after.refs.isEmpty && after.deletes.isEmpty && after.updates.isEmpty)
  }

  test("EXPIRE DDL option is honored for column tables") {
    val g = GraftSession(spark)
    spark.sql(
      """CREATE TABLE exp_ddl USING column OPTIONS (EXPIRE '2') AS
        |SELECT id AS v FROM range(50)""".stripMargin)
    try {
      assert(GraftColumnStore("exp_ddl").snapshot.expireSeconds == 2L)
      assert(spark.sql("SELECT count(*) AS n FROM exp_ddl").head().getLong(0) == 50)
      Thread.sleep(2600)
      assert(spark.sql("SELECT count(*) AS n FROM exp_ddl").head().getLong(0) == 0)
    } finally g.dropTable("exp_ddl")
  }

  test("row tables: expired packs vanish from scans and point lookups; sweep reclaims") {
    import org.apache.spark.sql.graft.store.{GraftRowOps, GraftRowStore}
    spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.format(GraftRowOps.FORMAT).option("table", "exp_row")
      .option("key_columns", "k")
      .option("expire_seconds", "2").mode("overwrite").save()
    val df = GraftRowOps.read(spark, "exp_row")
    assert(df.count() == 100)
    // PK point lookup finds a fresh row
    assert(df.filter(col("k") === 42).count() == 1)
    Thread.sleep(2600)
    assert(df.count() == 0, "expired packs hidden from scans")
    assert(df.filter(col("k") === 42).count() == 0, "and from PK probes")
    assert(GraftRowStore("exp_row").snapshot.rowCount == 0L)
    val n = GraftRowStore("exp_row").expireSweep()
    assert(n > 0 && GraftRowStore("exp_row").snapshot.refs.isEmpty)
    // a key whose row expired can be re-inserted (PK invariant checks
    // live rows only)
    spark.range(42, 43).select(col("id").as("k"), lit(7L).as("v"))
      .write.format(GraftRowOps.FORMAT).option("table", "exp_row").mode("append").save()
    assert(df.filter(col("k") === 42).count() == 1)
  }

  test("no TTL (default) never expires; negative option rejected") {
    spark.range(10).select(col("id").as("v"))
      .write.format(fmt).option("table", "exp_off").mode("overwrite").save()
    assert(GraftColumnStore("exp_off").snapshot.expireSeconds == 0L)
    assert(GraftStoreOps.expireSweep(spark, "exp_off") == 0)
    val e = intercept[Exception](
      spark.range(10).select(col("id").as("v"))
        .write.format(fmt).option("table", "exp_neg")
        .option("expire_seconds", "-5").mode("overwrite").save())
    assert(e.getMessage.contains("expire_seconds"))
  }
}
