package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named ANN indexes behind the DDL face (`CREATE INDEX i ON t (vec)
  * USING ivf|ivfpq OPTIONS (...)` / `DROP INDEX i ON t`) — the
  * reference gives every index a DDL surface
  * (`core/.../SnappyDDLParser.scala` createIndex:519,
  * `SnappySession.createIndex:1760`); its USING clause carries the
  * index provider, which here selects the vector-index family the
  * Scala API already implements ([[Similarity]]). The index STATE is
  * managed store tables (centroids replicated; codes/assignments
  * bucketed BY CELL so probes are storage-partitioned), so it persists,
  * checkpoints and restores exactly like any other table; this registry
  * holds the metadata that binds a NAME to those tables and the build
  * parameters the probe path needs.
  *
  * Probe cost at scale: the query path touches ~nprobe/nlist of the
  * corpus at m byte-lookups per candidate (ivfpq) — neither the corpus
  * nor the full vectors enter the plan; see `Similarity.ivfPqTopK`.
  */
object AnnIndexes {

  final case class AnnIndexMeta(
      name: String,
      table: String,
      vecCol: String,
      idCol: String,
      provider: String, // "ivf" | "ivfpq"
      nlist: Int,
      m: Int,
      k: Int,
      nprobe: Int,
      shortlist: Int)

  private val registry = TrieMap.empty[String, AnnIndexMeta]

  def get(name: String): Option[AnnIndexMeta] = registry.get(name.toLowerCase)
  def contains(name: String): Boolean = registry.contains(name.toLowerCase)
  def list: Seq[AnnIndexMeta] = registry.values.toSeq.sortBy(_.name)

  private def storeNames(name: String): (String, String, String) =
    (s"ann_${name}_centroids", s"ann_${name}_codes", s"ann_${name}_codebook")

  /** Build + persist the index for `table.vecCol`. Options (all string
    * values per the OPTIONS grammar): `id_column` (required — the id the
    * probe returns), `nlist`, `m`, `k`, `nprobe`, `shortlist`, `buckets`.
    */
  def create(spark: SparkSession, name: String, table: String, vecCol: String,
      provider: String, options: Map[String, String]): Unit = {
    val n = name.toLowerCase
    require(!registry.contains(n), s"index already exists: $name")
    require(provider == "ivf" || provider == "ivfpq",
      s"CREATE INDEX $name: unknown USING provider '$provider' (ivf | ivfpq)")
    val g = graft.GraftSession(spark)
    val src = g.table(table)
    require(src.columns.map(_.toLowerCase).contains(vecCol.toLowerCase),
      s"CREATE INDEX $name: no column $vecCol in $table")
    val idCol = options.getOrElse("id_column",
      throw new IllegalArgumentException(
        s"CREATE INDEX $name USING $provider needs OPTIONS (id_column '...')"))
    def num(key: String, dflt: Int): Int = options.get(key).map(_.toInt).getOrElse(dflt)
    val (nlist, m, k) = (num("nlist", 16), num("m", 4), num("k", 8))
    val (nprobe, shortlist) = (num("nprobe", 4), num("shortlist", 64))
    val buckets = num("buckets", 8)
    val (cTab, codesTab, cbTab) = storeNames(n)
    provider match {
      case "ivf" =>
        val idx = Similarity.buildIvfIndex(src, idCol, vecCol, nlist)
        g.createTable(s"${n}_ivfidx_centroids", idx.centroids)
        // saveIvfIndex's layout, under this index's namespace
        g.createTable(s"${n}_ivfidx_assigned", idx.assigned,
          partitionBy = Seq("cell"), buckets = buckets)
      case "ivfpq" =>
        val idx = Similarity.buildIvfPqIndex(src, idCol, vecCol,
          nlist = nlist, m = m, k = k)
        g.createTable(cTab, idx.centroids)
        g.createTable(codesTab, idx.encoded,
          partitionBy = Seq("cell"), buckets = buckets)
        // codebook: m*k rows of (subspace, code, center) — index-sized
        val cbRows = for {
          (sub, j) <- idx.codebook.zipWithIndex
          (center, code) <- sub.zipWithIndex
        } yield (j, code, center.toSeq)
        g.createTable(cbTab,
          spark.createDataFrame(cbRows.toSeq).toDF("j", "code", "center"))
    }
    registry.put(n, AnnIndexMeta(n, table.toLowerCase, vecCol.toLowerCase,
      idCol.toLowerCase, provider, nlist, m, k, nprobe, shortlist))
  }

  /** Top-k probe through the NAMED index: re-hydrates the index view
    * from its store tables (query-path-only work — the build never
    * re-runs) and routes to the family's probe kernel. `queries` must
    * carry the index's id/vector columns.
    */
  def probe(spark: SparkSession, name: String, queries: DataFrame,
      k: Int): DataFrame = {
    val meta = get(name).getOrElse(
      throw new IllegalArgumentException(s"unknown ANN index: $name"))
    val g = graft.GraftSession(spark)
    meta.provider match {
      case "ivf" =>
        val idx = Similarity.IvfIndex(
          g.table(s"${meta.name}_ivfidx_centroids"),
          g.table(s"${meta.name}_ivfidx_assigned"))
        Similarity.ivfProbe(idx, queries, meta.idCol, meta.vecCol, k, meta.nprobe)
      case "ivfpq" =>
        val (cTab, codesTab, cbTab) = storeNames(meta.name)
        val cb = loadCodebook(g.table(cbTab), meta.m, meta.k)
        val idx = Similarity.IvfPqIndex(g.table(cTab), g.table(codesTab), cb)
        Similarity.ivfPqTopK(idx, g.table(meta.table), queries,
          meta.idCol, meta.vecCol, k, meta.nprobe, meta.shortlist)
    }
  }

  /** Incremental maintenance: assign NEW vectors against the frozen
    * coarse quantizer and append their assignment/codes — per-batch cost
    * only, the existing index never rewrites. Contract: the vectors must
    * (also) be inserted into the indexed TABLE — this maintains the
    * index for rows the table ingests, it does not ingest for you (the
    * ivfpq exact-rerank reads the base table, so an id present only in
    * the codes would shortlist and then vanish). Returns (appended
    * count, drift fraction): vectors whose best centroid cosine falls
    * under `driftThreshold` signal that the quantizer wants a re-train.
    */
  def append(spark: SparkSession, name: String, vecs: DataFrame,
      driftThreshold: Double = 0.0): (Long, Double) = {
    val meta = get(name).getOrElse(
      throw new IllegalArgumentException(s"unknown ANN index: $name"))
    val g = graft.GraftSession(spark)
    meta.provider match {
      case "ivf" =>
        Similarity.ivfAppend(spark, s"${meta.name}_ivfidx", vecs,
          meta.idCol, meta.vecCol, driftThreshold)
      case "ivfpq" =>
        val (cTab, codesTab, cbTab) = storeNames(meta.name)
        val centroids = g.table(cTab).collect()
          .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
        val cb = loadCodebook(g.table(cbTab), meta.m, meta.k)
        val scored = Similarity.semanticAssignScored(
            vecs, meta.idCol, meta.vecCol, centroids)
          .localCheckpoint(false)
        val stats = scored.agg(count(lit(1)),
          sum(when(col("_score") < driftThreshold, 1L).otherwise(0L))).head()
        val appended = stats.getLong(0)
        val low = if (stats.isNullAt(1)) 0L else stats.getLong(1)
        val encoded = Similarity.encodeResiduals(
          scored.select(col(meta.idCol), col(meta.vecCol),
            col("cluster_id").cast("int").as("cell")),
          g.table(cTab), meta.idCol, meta.vecCol, cb)
        g.insert(codesTab, encoded)
        (appended, if (appended == 0) 0.0 else low.toDouble / appended)
    }
  }

  def drop(spark: SparkSession, name: String): Unit = {
    val meta = get(name).getOrElse(
      throw new IllegalArgumentException(s"unknown ANN index: $name"))
    val g = graft.GraftSession(spark)
    val tables = meta.provider match {
      case "ivf" => Seq(s"${meta.name}_ivfidx_centroids", s"${meta.name}_ivfidx_assigned")
      case "ivfpq" =>
        val (a, b, c) = storeNames(meta.name); Seq(a, b, c)
    }
    tables.foreach(t => if (g.isManaged(t)) g.dropTable(t))
    registry.remove(meta.name)
    ()
  }

  private def loadCodebook(df: DataFrame, m: Int, k: Int): Array[Array[Array[Double]]] = {
    val cb = Array.ofDim[Array[Double]](m, k)
    df.collect().foreach { r =>
      cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    cb.map(_.map(x => x))
  }
}
