package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.store.{GraftColumnStore, GraftRowOps, GraftRowStore, GraftStoreOps}

/** Cross-JVM persistence proof (the reference's PERSISTENCE/DISKSTORE
  * recovery story, SURVEY §2.1): `write` builds bucketed column + keyed
  * row tables with layout options, mutates them, and checkpoints both to
  * a directory; `read` — run in a SEPARATE JVM (fresh process, empty
  * registries) — restores and verifies content (deletes/updates
  * applied), the full layout (buckets, codec, sketch columns — the
  * restored sketch digests serve estimates), and PK point lookups; the
  * co-bucketed self-join's exchange count is printed as telemetry
  * (ColocationSpec owns the zero-exchange plan proof).
  * `tools/cross_jvm_restore.sh` drives both phases through two sbt
  * invocations and fails on any mismatch.
  */
object CrossJvmRestore {
  private val fmt = GraftStoreOps.FORMAT

  def main(args: Array[String]): Unit = {
    val Array(mode, dir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "org.apache.spark.sql.graft.store.GraftCatalog")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    mode match {
      case "write" => write(spark, dir)
      case "read" => read(spark, dir)
      case other => sys.error(s"unknown mode $other (write|read)")
    }
    spark.stop()
  }

  private def write(spark: SparkSession, dir: String): Unit = {
    spark.range(10000)
      .select((col("id") % 64).as("k"), col("id").as("v"),
        concat(lit("row_"), col("id")).as("s"))
      .write.format(fmt).option("table", "xj_col")
      .option("partition_by", "k").option("buckets", "8")
      .option("batch_size", "1024")
      .option("compression", "lz4")
      .option("sketch_columns", "k")
      .mode("overwrite").save()
    // mutate so the checkpoint carries delete/update effects, not just
    // the pristine write
    GraftStoreOps.delete(spark, "xj_col", col("v") < 100)
    GraftStoreOps.update(spark, "xj_col", col("v") >= 9900,
      Seq("s" -> lit("updated")))
    GraftStoreOps.checkpoint(spark, "xj_col", s"$dir/col")

    spark.range(2000)
      .select(col("id").as("pk"), (col("id") * 3).as("val"))
      .write.format(GraftRowOps.FORMAT).option("table", "xj_row")
      .option("key_columns", "pk").mode("overwrite").save()
    GraftRowOps.checkpoint(spark, "xj_row", s"$dir/row")
    println(s"XJ_WRITE_OK rows_col=${GraftColumnStore("xj_col").snapshot.rowCount} " +
      s"rows_row=${GraftRowStore("xj_row").snapshot.rowCount}")
  }

  private def read(spark: SparkSession, dir: String): Unit = {
    require(GraftColumnStore.get("xj_col").isEmpty,
      "fresh JVM expected: column registry must start empty")
    val colDf = GraftStoreOps.restore(spark, "xj_col", s"$dir/col")
    val n = colDf.count()
    require(n == 9900, s"column rows after restore: $n (want 9900, deletes applied)")
    val upd = colDf.filter(col("s") === "updated").count()
    require(upd == 100, s"updated rows after restore: $upd (want 100)")
    val snap = GraftColumnStore("xj_col").snapshot
    require(snap.numBuckets == 8 && snap.bucketBy == Seq("k"),
      s"bucket layout lost: ${snap.numBuckets}/${snap.bucketBy}")
    require(snap.compression == "lz4", s"codec lost: ${snap.compression}")
    require(snap.sketchBy == Seq("k"), s"sketch layout lost: ${snap.sketchBy}")
    val est = GraftStoreOps.approxDistinct(spark, "xj_col", "k")
    require(math.abs(est - 64) <= 4, s"restored sketch estimate: $est (want ~64)")
    // the restored table still joins exchange-free with a co-bucketed
    // catalog read of itself (bucket function + count survived)
    val a = spark.table("graft.xj_col").groupBy("k").agg(sum("v").as("sa"))
    val b = spark.table("graft.xj_col").groupBy("k").agg(count(lit(1)).as("nb"))
    val joined = a.join(b, "k")
    val exchanges = joined.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    require(joined.count() == 64, "join row count")

    val rowDf = GraftRowOps.restore(spark, "xj_row", s"$dir/row")
    require(rowDf.count() == 2000, "row-table rows after restore")
    require(rowDf.filter(col("pk") === 1234).head().getLong(1) == 3702,
      "point lookup after restore")
    println(s"XJ_READ_OK exchanges=$exchanges")
  }
}
