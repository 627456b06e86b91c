package graft

import org.apache.spark.sql.graft.store.GraftColumnStore
import org.apache.spark.sql.functions._

/** DSv2 column store: write/read roundtrip, per-batch min/max stats
  * skipping, column pruning, columnar scan path.
  */
class ColumnStoreSpec extends SparkTestBase {

  private val fmt = "org.apache.spark.sql.graft.store.GraftColumnSource"

  private lazy val li = Tables.load(spark, sf, "lineitem")
    .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate")
    // sort so batches have tight, disjoint l_orderkey ranges — the
    // layout a clustered ingest produces and stats skipping rewards
    .orderBy("l_orderkey")

  private lazy val written: Unit =
    li.write.format(fmt).option("table", "cs_li").option("batch_size", "512")
      .mode("overwrite").save()

  private def store = { written; spark.read.format(fmt).option("table", "cs_li").load() }

  test("roundtrip + batch stats skipping on a selective filter") {
    val store = this.store
    assert(store.count() == li.count())

    val sk0 = GraftColumnStore.batchesSkipped.get()
    val sc0 = GraftColumnStore.batchesScanned.get()
    val got = store.filter(col("l_orderkey") === 42).collect()
    val expected = li.filter(col("l_orderkey") === 42).collect()
    assert(got.length == expected.length && got.length > 0)
    val skipped = GraftColumnStore.batchesSkipped.get() - sk0
    val scanned = GraftColumnStore.batchesScanned.get() - sc0
    assert(skipped > 0, s"stats skipping never fired (scanned=$scanned)")
    assert(scanned <= 2, s"point lookup should touch at most 2 batches, scanned $scanned")
  }

  test("filters are still exactly applied on surviving batches") {
    val store = this.store
    val a = store.filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .agg(count(lit(1)), sum("l_extendedprice")).head()
    val b = li.filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .agg(count(lit(1)), sum("l_extendedprice")).head()
    assert(a.getLong(0) == b.getLong(0))
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
  }

  /** These two assert properties of the NORMAL columnar scan path, so
    * they pin aggregate pushdown off — with it on, both plans collapse
    * into a pushed aggregation (AggPushdownSpec covers that side).
    */
  private def withoutAggPushdown[T](body: => T): T = {
    spark.conf.set(org.apache.spark.sql.graft.store.GraftAggPushdown.CONF_KEY, "false")
    try body finally spark.conf.unset(
      org.apache.spark.sql.graft.store.GraftAggPushdown.CONF_KEY)
  }

  test("column pruning reaches the scan") {
    withoutAggPushdown {
      val store = this.store
      val plan = store.select("l_returnflag").distinct()
        .queryExecution.executedPlan.toString
      assert(plan.contains("cols=[l_returnflag]"),
        s"expected pruned read schema in scan description:\n$plan")
    }
  }

  test("scan is columnar (no row pivot before codegen)") {
    withoutAggPushdown {
      val df = store.groupBy("l_returnflag").count()
      df.collect() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ColumnarToRow"), s"expected columnar scan:\n$plan")
    }
  }

  test("array columns (embeddings) roundtrip with null elements and rows") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val emb = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    emb.write.format(fmt).option("table", "cs_emb").option("batch_size", "64")
      .mode("overwrite").save()
    val back = spark.read.format(fmt).option("table", "cs_emb").load()
    // full-content equality, order-insensitive by id
    val a = back.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    // null rows + null elements survive
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val rows = java.util.Arrays.asList(
      Row(1L, Seq(1.0, 2.0)), Row(2L, null), Row(3L, Seq(3.0, null, 5.0)))
    spark.createDataFrame(rows, schema)
      .write.format(fmt).option("table", "cs_nulls").mode("overwrite").save()
    val got = spark.read.format(fmt).option("table", "cs_nulls").load()
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(2L).isEmpty)
    assert(got(3L).get.asInstanceOf[scala.collection.Seq[Any]].toList == List(3.0, null, 5.0))
    // vector math runs on the store-backed column
    val n = back.selectExpr(
      "aggregate(embedding, 0D, (s, x) -> s + CAST(x AS DOUBLE) * x) AS sq")
      .agg(sum("sq")).head().getDouble(0)
    val m = emb.selectExpr(
      "aggregate(embedding, 0D, (s, x) -> s + CAST(x AS DOUBLE) * x) AS sq")
      .agg(sum("sq")).head().getDouble(0)
    assert(math.abs(n - m) < 1e-3)
  }

  test("aggregation over the store matches parquet") {
    val store = this.store
    val a = store.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = li.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("NaN doubles enter batch stats: no false pruning, MAX serves NaN") {
    import spark.implicits._
    Seq((1L, 1.0), (2L, Double.NaN), (3L, 2.0)).toDF("id", "x")
      .coalesce(1)
      .write.format(fmt).option("table", "cs_nan").mode("overwrite").save()
    val t = spark.read.format(fmt).option("table", "cs_nan").load()
    // Spark semantics: NaN > any finite value — a max stat that ignored
    // NaN (sealing max=2.0) would wrongly stats-prune this filter
    val hit = t.filter(col("x") > 100.0).collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(2L), s"got ${hit.toSeq}")
    assert(t.agg(max("x")).head().getDouble(0).isNaN)
    // all-NaN batch seals NaN bounds, not garbage sentinels
    Seq((9L, Double.NaN)).toDF("id", "x")
      .write.format(fmt).option("table", "cs_nan2").mode("overwrite").save()
    val t2 = spark.read.format(fmt).option("table", "cs_nan2").load()
    assert(t2.agg(min("x")).head().getDouble(0).isNaN)
    assert(t2.filter(col("x") > 0.0).count() == 1)
  }

  test("update rejects key/bucket column assignments (row would not move buckets)") {
    val g = GraftSession(spark)
    import spark.implicits._
    g.createTable("cs_guard", Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      keyColumns = Seq("k"), partitionBy = Seq("k"), buckets = 4)
    val err = intercept[Exception] {
      g.update("cs_guard", col("k") === 1L, "k" -> lit(9L))
    }
    assert(err.getMessage.contains("cannot assign key/bucket column"), err.getMessage)
    g.dropTable("cs_guard")
  }

  test("catalog CREATE TABLE on an existing table fails instead of replacing") {
    spark.sql("DROP TABLE IF EXISTS graft.cat_dup")
    spark.sql("CREATE TABLE graft.cat_dup (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.cat_dup VALUES (1, 'a')")
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.cat_dup (k BIGINT, v STRING) USING graft")
    }
    // the data survived the failed CREATE
    assert(spark.table("graft.cat_dup").count() == 1)
    spark.sql("DROP TABLE graft.cat_dup")
  }

  test("failed catalog CREATE leaves no phantom table behind") {
    spark.sql("DROP TABLE IF EXISTS graft.cat_bad")
    // invalid codec must fail AT CREATE, and must fail BEFORE the store
    // registers the table — otherwise the corrected retry would hit
    // TableAlreadyExists on a phantom entry
    val err = intercept[Exception] {
      spark.sql("CREATE TABLE graft.cat_bad (k BIGINT, v STRING) USING graft " +
        "OPTIONS (compression 'zstd')")
    }
    assert(err.getMessage.contains("unsupported compression"), err.getMessage)
    spark.sql("CREATE TABLE graft.cat_bad (k BIGINT, v STRING) USING graft " +
      "OPTIONS (compression 'lz4')")
    spark.sql("INSERT INTO graft.cat_bad VALUES (1, 'a')")
    assert(spark.table("graft.cat_bad").count() == 1)
    spark.sql("DROP TABLE graft.cat_bad")
  }

  test("catalog COLOCATE_WITH: bucket-count mismatch rejected at CREATE, layout inherited when omitted") {
    import org.apache.spark.sql.graft.store.GraftColumnStore
    spark.sql("DROP TABLE IF EXISTS graft.cat_colo_child")
    spark.sql("DROP TABLE IF EXISTS graft.cat_par")
    spark.sql("CREATE TABLE graft.cat_par (pk BIGINT, pv STRING) USING graft " +
      "PARTITIONED BY (bucket(8, pk))")
    try {
      // the silent-forfeit case (PERF_NOTES §18): bucket(4) vs the
      // target's bucket(8) would hash-shuffle BOTH sides of every
      // "colocated" join — reject at CREATE, and leave no phantom entry
      val err = intercept[Exception] {
        spark.sql("CREATE TABLE graft.cat_colo_child (ck BIGINT, cv DOUBLE) USING graft " +
          "PARTITIONED BY (bucket(4, ck)) OPTIONS (colocate_with 'cat_par')")
      }
      assert(err.getMessage.contains("cannot colocate"), err.getMessage)
      assert(GraftColumnStore.get("cat_colo_child").isEmpty, "phantom entry after failed CREATE")
      // a matching explicit count binds; the child's own bucket column is kept
      spark.sql("CREATE TABLE graft.cat_colo_child (ck BIGINT, cv DOUBLE) USING graft " +
        "PARTITIONED BY (bucket(8, ck)) OPTIONS (colocate_with 'cat_par')")
      val child = GraftColumnStore("cat_colo_child").snapshot
      assert(child.numBuckets == 8 && child.bucketBy == Seq("ck"))
      spark.sql("DROP TABLE graft.cat_colo_child")
      // omitted layout inherits the target's (column must exist in the schema)
      spark.sql("CREATE TABLE graft.cat_colo_child (pk BIGINT, cv DOUBLE) USING graft " +
        "OPTIONS (colocate_with 'cat_par')")
      val inherited = GraftColumnStore("cat_colo_child").snapshot
      assert(inherited.numBuckets == 8 && inherited.bucketBy == Seq("pk"))
      // an unknown target is rejected
      val e2 = intercept[Exception] {
        spark.sql("CREATE TABLE graft.cat_colo_none (k BIGINT) USING graft " +
          "OPTIONS (colocate_with 'no_such_table')")
      }
      assert(e2.getMessage.contains("not a managed table"), e2.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.cat_colo_child")
      spark.sql("DROP TABLE IF EXISTS graft.cat_par")
    }
  }
}
