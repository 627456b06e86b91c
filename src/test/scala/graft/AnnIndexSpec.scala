package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndexes, Similarity}

/** ANN index DDL (`CREATE INDEX ... USING ivf|ivfpq OPTIONS (...)` /
  * `DROP INDEX`, reference SnappyDDLParser.createIndex:519 +
  * SnappySession.createIndex:1760): the named-index face over the
  * [[Similarity]] builders. State is managed store tables; probes
  * through the name must reproduce the direct-API results exactly
  * (same build parameters, deterministic seeds).
  */
class AnnIndexSpec extends SparkTestBase {

  private def corpus(n: Int) = {
    import spark.implicits._
    // deterministic clustered vectors: 4 obvious clusters in 8-d
    (0 until n).map { i =>
      val c = i % 4
      val base = Array.tabulate(8)(j => if (j % 4 == c) 4.0f else 0.1f)
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        x + 0.01f * ((i * 31 + j * 7) % 13)
      }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("ivfpq DDL: create, sys.indexes, named probe == direct probe, drop releases") {
    val g = GraftSession(spark)
    g.createTable("ann_t", corpus(400))
    g.sql("CREATE INDEX ann_ix ON ann_t (embedding) USING ivfpq " +
      "OPTIONS (id_column 'vec_id', nlist '4', m '4', k '8', nprobe '2', shortlist '32')")
    // sys face
    val row = g.sql("SELECT * FROM sys.indexes WHERE index_name = 'ann_ix'").collect()
    assert(row.length == 1 && row(0).getString(0) == "ann_t" &&
      row(0).getString(3) == "ann_ivfpq", row.mkString)
    // index state is managed store tables
    assert(g.isManaged("ann_ann_ix_codes") && g.isManaged("ann_ann_ix_centroids"))
    val queries = g.table("ann_t").filter(col("vec_id") < 5)
    val viaName = AnnIndexes.probe(spark, "ann_ix", queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    // direct API with the same parameters + seeds must agree exactly
    val direct = Similarity.buildIvfPqIndex(g.table("ann_t"), "vec_id", "embedding",
      nlist = 4, m = 4, k = 8)
    val viaDirect = Similarity.ivfPqTopK(direct, g.table("ann_t"), queries,
        "vec_id", "embedding", k = 5, nprobe = 2, shortlist = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(viaName == viaDirect, s"named probe diverged:\n$viaName\n$viaDirect")
    assert(viaName.size == 25)
    // duplicate name refused; unknown provider refused
    intercept[Exception](g.sql(
      "CREATE INDEX ann_ix ON ann_t (embedding) USING ivfpq OPTIONS (id_column 'vec_id')"))
    intercept[Exception](g.sql(
      "CREATE INDEX ann_ix2 ON ann_t (embedding) USING hnsw OPTIONS (id_column 'vec_id')"))
    // drop releases the store tables and frees the name
    g.sql("DROP INDEX ann_ix ON ann_t")
    assert(!AnnIndexes.contains("ann_ix"))
    assert(!g.isManaged("ann_ann_ix_codes") && !g.isManaged("ann_ann_ix_centroids"))
    assert(g.sql("SELECT * FROM sys.indexes WHERE index_name = 'ann_ix'").isEmpty)
    g.dropTable("ann_t")
  }

  test("ivfpq append: per-batch encode against the frozen quantizer + drift signal") {
    val g = GraftSession(spark)
    g.createTable("ann_ap", corpus(300))
    g.sql("CREATE INDEX ann_apx ON ann_ap (embedding) USING ivfpq " +
      "OPTIONS (id_column 'vec_id', nlist '4', m '4', k '8', nprobe '4', shortlist '64')")
    val before = g.table("ann_ann_apx_codes").count()
    import spark.implicits._
    // new in-distribution vectors: near cluster 0, ids beyond the corpus
    val newVecs = (1000 until 1040).map { i =>
      (i.toLong, Array.tabulate(8)(j => if (j % 4 == 0) 4.0f else 0.1f).toSeq)
    }.toDF("vec_id", "embedding")
    // the append contract: vectors enter the TABLE through the normal
    // insert; AnnIndexes.append maintains the index alongside
    g.insert("ann_ap", newVecs)
    val (n, drift) = AnnIndexes.append(spark, "ann_apx", newVecs,
      driftThreshold = 0.5)
    assert(n == 40 && drift == 0.0, s"($n, $drift)")
    assert(g.table("ann_ann_apx_codes").count() == before + 40)
    // the appended vectors are findable through the named probe
    val q = newVecs.filter(col("vec_id") === 1000L)
    val hits = AnnIndexes.probe(spark, "ann_apx", q, k = 5)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(hits.exists(_ >= 1000L),
      s"appended neighbors must be probe-visible, got $hits")
    // out-of-distribution batch raises the drift signal
    val weird = (2000 until 2010).map { i =>
      (i.toLong, Array.tabulate(8)(j => if (j < 4) -5.0f else 5.0f).toSeq)
    }.toDF("vec_id", "embedding")
    val (_, drift2) = AnnIndexes.append(spark, "ann_apx", weird,
      driftThreshold = 0.5)
    assert(drift2 > 0.5, s"OOD batch must trip the refit signal, got $drift2")
    g.sql("DROP INDEX ann_apx ON ann_ap")
    g.dropTable("ann_ap")
  }

  test("DROP TABLE cascades to its ANN indexes (standard index semantics)") {
    val g = GraftSession(spark)
    g.createTable("ann_ct", corpus(200))
    g.sql("CREATE INDEX ann_ctx ON ann_ct (embedding) USING ivfpq " +
      "OPTIONS (id_column 'vec_id', nlist '4')")
    assert(AnnIndexes.contains("ann_ctx") && g.isManaged("ann_ann_ctx_codes"))
    g.dropTable("ann_ct")
    assert(!AnnIndexes.contains("ann_ctx"),
      "dropping the base table must drop its ANN indexes")
    assert(!g.isManaged("ann_ann_ctx_codes") && !g.isManaged("ann_ann_ctx_centroids"),
      "…and release their state tables")
  }

  test("streaming vector ingest: foreachBatch inserts + appends the named index, probes see new vectors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val g = GraftSession(spark)
    g.createTable("ann_st", corpus(200))
    g.sql("CREATE INDEX ann_stx ON ann_st (embedding) USING ivfpq " +
      "OPTIONS (id_column 'vec_id', nlist '4', nprobe '4', shortlist '64')")
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("id")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // the vector-store ingest shape: rows land in the TABLE and the
        // index maintains alongside, per micro-batch (typed map keeps
        // the element schema identical to the corpus — non-null floats)
        val batch = df.as[Long].map { i =>
          (i, Array.tabulate(8)(j =>
            (if (j % 4 == 0) 4.0f else 0.1f) + (i % 13).toFloat * 0.01f).toSeq)
        }.toDF("vec_id", "embedding").localCheckpoint(true)
        g.insert("ann_st", batch)
        graft.operators.AnnIndexes.append(spark, "ann_stx", batch)
        ()
      }
      .start()
    try {
      (0 until 3).foreach { i =>
        mem.addData(5000L + i * 20 until 5000L + (i + 1) * 20: _*)
        q.processAllAvailable()
      }
      assert(g.table("ann_ann_stx_codes").count() == 260)
      // a query near the streamed cluster finds streamed neighbors
      val probe = g.table("ann_st").filter(col("vec_id") === 5010L)
      val hits = AnnIndexes.probe(spark, "ann_stx", probe, k = 8)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      assert(hits.exists(_ >= 5000L),
        s"streamed vectors must be probe-visible, got $hits")
    } finally {
      q.stop()
      g.sql("DROP INDEX ann_stx ON ann_st")
      g.dropTable("ann_st")
    }
  }

  test("ivf DDL provider routes to the IVF family") {
    val g = GraftSession(spark)
    g.createTable("ann_iv", corpus(200))
    g.sql("CREATE INDEX ann_ivx ON ann_iv (embedding) USING ivf " +
      "OPTIONS (id_column 'vec_id', nlist '4', nprobe '2')")
    assert(g.isManaged("ann_ivx_ivfidx_assigned"))
    val q = g.table("ann_iv").filter(col("vec_id") === 0L)
    val res = AnnIndexes.probe(spark, "ann_ivx", q, k = 3).collect()
    assert(res.length == 3 && res.forall(_.getLong(0) == 0L))
    g.sql("DROP INDEX ann_ivx ON ann_iv")
    assert(!g.isManaged("ann_ivx_ivfidx_assigned"))
    g.dropTable("ann_iv")
  }
}
