package graft.operators

import graft.functions.TopKAggregate.topk_by
import graft.functions.VectorExpressions.{vec_cosine, vec_norm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — the query set broadcasts, the
  * corpus streams once through a codegen'd cosine loop, and the custom
  * [[graft.functions.TopKByScore]] aggregate reduces each partition to k
  * rows before the single shuffle. At 100 TB the corpus scan dominates and
  * parallelizes linearly; nothing materializes the corpus × query product
  * beyond the fused loop.
  *
  * Scale path: signed-random-projection LSH — bucket the corpus by an
  * n-bit hyperplane signature, probe only matching buckets, rerank
  * exactly. Trades recall for touching ~corpus/2ⁿ per table.
  */
object Similarity {

  /** Exact top-k cosine neighbors for every query vector.
    * Output: (query_id, rank, neighbor_id, score), rank 1-based.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("c_vec"))
    c.join(broadcast(q), col("nid") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(topk_by(vec_cosine(col("q_vec"), col("c_vec")), col("nid"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("score"))
  }

  /** All LSH-table signatures in one fused codegen pass
    * ([[graft.functions.VectorExpressions.srp_sigs]]): hyperplane
    * components are ±1 from bits of one per-dimension hash, so the planes
    * stay independent at any dimensionality, no plane matrix is
    * distributed, and the per-row cost is one hash + `planes` adds per
    * dimension (a functions-composed formulation pays one hash per
    * dimension PER PLANE — measured 3× slower at 8 bits × 4 tables).
    */
  private def signaturesCol(vecCol: String, bits: Int, tables: Int, seed: Long) =
    graft.functions.VectorExpressions.srp_sigs(col(vecCol), bits, tables, seed)

  /** IVF index: `centroids` (cell, center: array<float>) — nlist rows —
    * and `assigned` (nid, c_vec, cell) — the corpus labeled by nearest
    * centroid. Build once, persist (e.g. as GraftSession managed tables
    * partitioned by cell), probe many times.
    */
  case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** Build the IVF coarse quantizer: KMeans over L2-normalized vectors
    * (so euclidean cells align with cosine neighborhoods) + corpus
    * assignment. At 100 TB this is the INDEXING job — the corpus is
    * scanned once to train (on a sample) and once to assign — and must
    * never sit on the query path (reference analog: a CREATE INDEX
    * statement, not a SELECT).
    */
  def buildIvfIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val normalize = {
      val n = vec_norm(col(vecCol))
      transform(col(vecCol), x => when(n > 0, x / n).otherwise(x))
    }
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("c_vec"),
      array_to_vector(normalize).as("fv"))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(c)
    val assigned = model.transform(c).select(col("nid"), col("c_vec"), col("cell"))

    val centers = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.map(_.toFloat).toSeq)
    }.toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    IvfIndex(centers.toDF("cell", "center"), assigned)
  }

  /** Probe-only IVF query: each query scores the (tiny, broadcast)
    * centroid table for its `nprobe` nearest cells, joins the assigned
    * corpus on `cell` (a partition-pruning join when `assigned` is stored
    * partitioned by cell) and reranks exactly — touching ~nprobe/nlist of
    * the corpus, with zero ML-fit work on the query path.
    */
  def ivfProbe(
      index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val probes = q
      .crossJoin(broadcast(index.centroids))
      .groupBy(col("query_id"))
      .agg(topk_by(vec_cosine(col("q_vec"), col("center")), col("cell").cast("long"), nprobe)
        .as("cells"))
      .select(col("query_id"), explode(col("cells.id")).as("cell"))
      .join(q, "query_id")
      .withColumn("cell", col("cell").cast("int"))

    probes.join(index.assigned, "cell")
      .filter(col("nid") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(topk_by(vec_cosine(col("q_vec"), col("c_vec")), col("nid"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("score"))
  }

  /** Build + probe in one call (spec/baseline convenience — real query
    * paths should build once via [[buildIvfIndex]] and [[ivfProbe]] many
    * times).
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame =
    ivfProbe(buildIvfIndex(corpus, idCol, vecCol, nlist, seed),
      queries, idCol, vecCol, k, nprobe)

  /** Recall CLAIM for an approximate ANN result: per query, does the
    * approximate top-k contain at least `minHits` of the TRUE (brute-
    * force) top-k? The exact hit set depends on engine-private hashes /
    * clustering, but the bound is an engine-independent fact an external
    * oracle can pin — this is what upgrades the approximate ANN queries
    * from rows-only to hash-checked rows (thresholds chosen from
    * [[graft.tools.AccuracyProbe]] measurements with ≥ 25% margin).
    */
  def recallClaim(
      corpus: DataFrame, queries: DataFrame, approx: DataFrame,
      idCol: String, vecCol: String, k: Int, minHits: Int,
      claimCol: String): DataFrame = {
    val bf = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = bf.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("_n_hit"))
    queries.select(col(idCol).as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("_n_hit"), lit(0L)) >= minHits).as(claimCol))
  }

  /** Attach (table_idx, sig) rows per input row: one n-bit signature per
    * LSH table. Shared by [[lshTopK]] and [[Dedup.embeddingNearDups]].
    */
  def withSignatures(df: DataFrame, vecCol: String, bits: Int,
      tables: Int, seed: Long = 42L): DataFrame =
    df.select(col("*"), posexplode(signaturesCol(vecCol, bits, tables, seed)))
      .withColumnsRenamed(Map("pos" -> "table_idx", "col" -> "sig"))

  /** LSH ANN: multi-table signature bucketing + exact rerank.
    * Output: (query_id, rank, neighbor_id, score) — same shape as
    * [[bruteForceTopK]] but only candidates sharing a bucket in ≥1 table
    * are scored.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int = 8, tables: Int = 4, seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("c_vec"),
      posexplode(signaturesCol(vecCol, bits, tables, seed)))
      .withColumnRenamed("pos", "table_idx").withColumnRenamed("col", "sig")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      posexplode(signaturesCol(vecCol, bits, tables, seed)))
      .withColumnRenamed("pos", "table_idx").withColumnRenamed("col", "sig")
    // score BEFORE the dedup shuffle: a pair hit in several tables scores
    // more than once (cheap fused loop), but the distinct then moves only
    // (id, id, score) — never the vectors
    val cands = c.join(broadcast(q), Seq("table_idx", "sig"))
      .filter(col("nid") =!= col("query_id"))
      .select(col("query_id"), col("nid"),
        vec_cosine(col("q_vec"), col("c_vec")).as("score"))
      .distinct()
    cands
      .groupBy(col("query_id"))
      .agg(topk_by(col("score"), col("nid"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("score"))
  }

  /** Nearest-centroid assignment against a CONSTANT centroid set, fused
    * into the scan: one codegen'd [[vec_cosine]] per centroid and a
    * `greatest(struct(score, -cid))` argmax — no join, no shuffle, no
    * higher-order function (HOF bodies fall back to interpreted eval).
    * Ties break toward the smaller centroid id. The centroid set rides
    * the plan as literals, the same driver-side footprint as a KMeans
    * model's centers ([[buildIvfIndex]]); it must stay index-sized
    * (10²-10⁴), which it is by construction for coarse quantizers.
    */
  def semanticAssign(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Float])]): DataFrame =
    semanticAssignScored(vecs, idCol, vecCol, centroids).drop("_score")

  /** [[semanticAssign]] plus the winning cosine (`_score`) — the probe
    * needs only the cell, but index MAINTENANCE wants the score: a batch
    * of new vectors far from every centroid is the refit signal.
    */
  def semanticAssignScored(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    require(centroids.nonEmpty, "centroid set is empty")
    val best = centroids.map { case (cid, cv) =>
      struct(vec_cosine(col(vecCol), typedLit(cv)).as("s"),
        lit(-cid).as("negCid"))
    }.reduce(greatest(_, _))
    vecs.select(col(idCol), col(vecCol),
      (-best.getField("negCid")).cast("long").as("cluster_id"),
      best.getField("s").as("_score"))
  }

  /** Persist an IVF index into the store: the centroid table replicates
    * (index-sized), the assignment table buckets BY CELL so probe joins
    * are storage-partitioned and a probe touches only its cells' buckets.
    * The CREATE INDEX side of the reference's index story, made durable —
    * [[loadIvfIndex]] + [[ivfProbe]] then run query-path-only work.
    */
  def saveIvfIndex(spark: SparkSession, index: IvfIndex, name: String,
      buckets: Int = 8): Unit = {
    val g = graft.GraftSession(spark)
    g.createTable(s"${name}_centroids", index.centroids)
    g.createTable(s"${name}_assigned", index.assigned,
      partitionBy = Seq("cell"), buckets = buckets)
  }

  /** The store-backed index, ready for [[ivfProbe]]/[[ivfAppend]]. */
  def loadIvfIndex(spark: SparkSession, name: String): IvfIndex = {
    val g = graft.GraftSession(spark)
    IvfIndex(g.table(s"${name}_centroids"), g.table(s"${name}_assigned"))
  }

  /** Incremental IVF maintenance — the standard vector-store ingestion
    * path: assign NEW vectors to the EXISTING centroids (no refit) and
    * append them to the stored assignment table. Returns (appended
    * count, drift fraction) where drift counts new vectors whose best
    * centroid cosine is below `driftThreshold` — the published refit
    * signal: when drift grows, the coarse quantizer no longer covers the
    * data distribution and the index wants a re-train.
    *
    * Scale shape: centroids collect to the driver (index-sized, the same
    * footprint every probe already broadcasts), assignment is a pure map
    * over the new batch, the append is one bucketed write. Per-batch
    * cost only — the existing assignment never rewrites.
    */
  def ivfAppend(spark: SparkSession, name: String, vecs: DataFrame,
      idCol: String, vecCol: String, driftThreshold: Double = 0.0): (Long, Double) = {
    val g = graft.GraftSession(spark)
    val centroids = g.table(s"${name}_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    val scored = semanticAssignScored(vecs, idCol, vecCol, centroids)
      .localCheckpoint(false) // one materialization feeds stats + append
    val stats = scored.agg(count(lit(1)),
      sum(when(col("_score") < driftThreshold, 1L).otherwise(0L))).head()
    val n = stats.getLong(0)
    val low = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    if (n > 0) {
      g.insert(s"${name}_assigned", scored.select(
        col(idCol).as("nid"), col(vecCol).as("c_vec"),
        col("cluster_id").cast("int").as("cell")))
    }
    (n, if (n == 0) 0.0 else low.toDouble / n)
  }

  /** SemDeDup-style semantic near-duplicate pairs: cluster the corpus
    * with [[semanticAssign]], then score pairs WITHIN each cluster only —
    * clustering is what turns the corpus-quadratic problem into a
    * per-cluster one. Output: (cluster_id, a, b, cosine), a < b.
    *
    * Scale shape: assignment is a pure map; the pair generation is an
    * equi-join on cluster_id, so work is Σ|cluster|²/2 across tasks and
    * nothing is all-pairs. The centroid count must scale with the corpus
    * (SemDeDup uses ~√n clusters) to keep clusters bounded; for a fat
    * cluster beyond task memory, compose with the block-partitioned pair
    * join of [[Dedup.embeddingNearDups]] inside the cluster key.
    */
  def semanticNearDups(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Float])], threshold: Double): DataFrame = {
    val assigned = semanticAssign(vecs, idCol, vecCol, centroids)
    val l = assigned.select(col("cluster_id"),
      col(idCol).as("a"), col(vecCol).as("va"))
    val r = assigned.select(col("cluster_id"),
      col(idCol).as("b"), col(vecCol).as("vb"))
    l.join(r, Seq("cluster_id")).filter(col("a") < col("b"))
      .withColumn("cosine", vec_cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("cluster_id", "a", "b", "cosine")
  }

  /** Semantic decontamination: flag corpus vectors whose MAX cosine
    * against the (small) eval set reaches `threshold` — the
    * embedding-space complement of the n-gram `Dedup.decontaminate`
    * (published contamination audits pair exactly these two signals:
    * surface n-gram overlap + embedding similarity).
    *
    * Scale shape: the eval set aggregates to ONE row (an array of
    * vectors — the same driver-side footprint as a centroid table, so it
    * must stay eval-sized: 10²–10⁵ vectors), broadcast to every task;
    * each corpus row computes an array fold over it inside the scan.
    * No pair rows materialize, nothing shuffles at any corpus size.
    * Output: (id, max_eval_cosine, contaminated); an EMPTY eval set
    * flags nothing (max is NULL, contaminated false).
    */
  def semanticDecontaminate(corpus: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // rename both sides first: corpus and eval routinely derive from the
    // SAME frame (an eval slice of the corpus), and shared attribute ids
    // would otherwise resolve the lambda's vector reference to the eval
    // side — which the aggregate has already projected away
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"))
    val evs = eval.select(col(vecCol).as("__ev"))
      .agg(collect_list(col("__ev")).as("__evs"))
    c.crossJoin(broadcast(evs))
      .select(col("__cid").as(idCol),
        array_max(transform(col("__evs"), e => vec_cosine(col("__cv"), e)))
          .as("max_eval_cosine"))
      .withColumn("contaminated",
        coalesce(col("max_eval_cosine") >= threshold, lit(false)))
  }

  /** Per-vector int8 scalar quantization — the standard vector-store
    * ingestion pass (4× smaller than float32, dequantization error
    * ≤ range/510 per component). Each vector maps to
    * `q_i = round((x_i - min) · 255 / (max - min))` with its own
    * (vmin, vmax) carried for dequantization; a constant vector
    * quantizes to zeros. Pure per-row array expressions over doubles
    * (float→double cast first so the arithmetic is engine-portable) —
    * fuses into the scan, no shuffle at any corpus size.
    * Output: (id, vmin, vmax, q: array<int>).
    */
  def quantize8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val d = transform(col(vecCol), _.cast("double"))
    df.select(col(idCol), d.as("__d"))
      .select(col(idCol), col("__d"),
        array_min(col("__d")).as("vmin"), array_max(col("__d")).as("vmax"))
      .select(col(idCol), col("vmin"), col("vmax"),
        when(col("vmax") === col("vmin"),
          transform(col("__d"), _ => lit(0)))
          .otherwise(transform(col("__d"), x =>
            round((x - col("vmin")) * 255.0 / (col("vmax") - col("vmin")))
              .cast("int")))
          .as("q"))
  }

  // ---- product quantization (Jégou et al. 2011): the 100 TB memory
  // play — the corpus stores m small codes (m·1 B) instead of d floats
  // (d·4 B), and ADC search costs m table lookups per candidate instead
  // of d multiplies. Codebooks are m·k·(d/m) doubles — kilobytes — so
  // they travel as a plan literal with every task. ----

  /** Train per-subspace codebooks: deterministic seeds (the subvectors
    * of the k lowest-id vectors) refined by `refineSteps` Lloyd steps.
    * Each step assigns DISTRIBUTED (one `pq_encode` projection over the
    * training frame) and averages per (subspace, cell) via a bounded
    * aggregate — only m·k·sd doubles ever reach the driver, so training
    * scales to any corpus (pass a `.limit(n)` sample for speed).
    * Empty cells keep their previous centroid.
    */
  def pqCodebook(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, refineSteps: Int = 1): Array[Array[Array[Double]]] = {
    import graft.functions.VectorExpressions.pq_encode
    val dvec = transform(col(vecCol), _.cast("double"))
    val seeds = vecs.orderBy(col(idCol)).limit(k)
      .select(dvec.as("v")).collect().map(_.getSeq[Double](0).toArray)
    val dim = seeds.head.length
    require(dim % m == 0, s"pqCodebook: dim $dim not divisible by m=$m")
    val sd = dim / m
    var cb: Array[Array[Array[Double]]] =
      Array.tabulate(m, k)((j, c) => seeds(c).slice(j * sd, (j + 1) * sd))
    var step = 0
    while (step < refineSteps) {
      val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
      // (j, code, i, x) → mean per (subspace, cell, component):
      // shuffled rows are O(m·k·sd), independent of corpus size
      val means = vecs.select(dvec.as("v"), pq_encode(dvec, cbLit).as("codes"))
        .select(col("v"), posexplode(col("codes")).as(Seq("j", "code")))
        .select(col("j"), col("code"),
          posexplode(slice(col("v"), col("j") * sd + 1, lit(sd))).as(Seq("i", "x")))
        .groupBy(col("j"), col("code"), col("i"))
        .agg(avg(col("x")).as("c"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      cb = next
      step += 1
    }
    cb
  }

  /** Encode the corpus: (id, codes array<int>) — one scan-fused
    * projection, no shuffle at any corpus size.
    */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Array[Double]]]): DataFrame = {
    import graft.functions.VectorExpressions.pq_encode
    val cbLit = typedLit(codebook.map(_.map(_.toSeq).toSeq).toSeq)
    vecs.select(col(idCol),
      pq_encode(transform(col(vecCol), _.cast("double")), cbLit).as("codes"))
  }

  /** ADC top-k: each query precomputes its [m][k] distance table ONCE
    * (projected on the broadcast side before the join), then every
    * candidate costs m lookups. Output: (query_id, rank, neighbor_id,
    * adist) by ascending approximate squared L2, rank ties on id over
    * the 4dp-rounded distance (engine-portable ordering).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebook: Array[Array[Array[Double]]],
      k: Int): DataFrame =
    pqTopKEncoded(
      pqEncode(corpus, idCol, vecCol, codebook).withColumnRenamed(idCol, "neighbor_id"),
      queries, idCol, vecCol, codebook, k)

  /** ADC search over a PRE-ENCODED corpus (`(neighbor_id, codes)`) — the
    * index-persisted form: encode once at CREATE INDEX time, search many
    * times over m-byte codes.
    */
  def pqTopKEncoded(enc: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebook: Array[Array[Array[Double]]],
      k: Int): DataFrame = {
    import graft.functions.VectorExpressions.{pq_adc, pq_dist_table}
    val cbLit = typedLit(codebook.map(_.map(_.toSeq).toSeq).toSeq)
    val qt = queries.select(col(idCol).as("query_id"),
      pq_dist_table(transform(col(vecCol), _.cast("double")), cbLit).as("qtab"))
    // topk_by, NOT a rank window: the window would shuffle+sort EVERY
    // candidate pair row (measured 1.4× slower than brute force at 64k —
    // the pair-row trap, fourth sighting); the aggregate reduces each map
    // partition to k pairs before the exchange. Ranking key is the
    // 4dp-ROUNDED distance with id tie-breaks (TopKBuffer keeps the
    // smaller id on equal scores), identical to the oracle's
    // ORDER BY adist, nid.
    enc.join(broadcast(qt), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.dround(pq_adc(col("codes"), col("qtab")), 4).as("adist"))
      .groupBy(col("query_id"))
      .agg(topk_by(-col("adist"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), (-col("col.score")).as("adist"))
  }

  /** IVF-PQ index (the FAISS IndexIVFPQ composition, Jégou et al.):
    * IVF cells bound WHICH vectors a query touches (~nprobe/nlist of
    * the corpus), PQ residual codes bound what each touched vector
    * COSTS (m table lookups, m bytes resident instead of d floats).
    * Vectors are L2-normalized first so squared-L2 ranking ≡ cosine
    * ranking (‖a−b‖² = 2−2·cos for unit vectors); PQ encodes the
    * RESIDUAL v−centroid(cell), which is what makes the shared
    * codebooks tight enough to rank inside a cell.
    */
  final case class IvfPqIndex(
      centroids: DataFrame, // (cell, center: array<float>) — nlist rows
      encoded: DataFrame, // (nid, cell, codes: array<int>)
      codebook: Array[Array[Array[Double]]])

  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, m: Int = 4, k: Int = 8, refineSteps: Int = 1,
      seed: Long = 42L): IvfPqIndex = {
    import graft.functions.VectorExpressions.pq_encode
    val ivf = buildIvfIndex(corpus, idCol, vecCol, nlist, seed)
    val residuals = ivf.assigned
      .join(broadcast(ivf.centroids), "cell")
      .select(col("nid"), col("cell"),
        residualExpr(col("c_vec"), col("center")).as("r"))
    val cb = pqCodebook(residuals, "nid", "r", m, k, refineSteps)
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    val encoded = residuals
      .select(col("nid"), col("cell"), pq_encode(col("r"), cbLit).as("codes"))
    IvfPqIndex(ivf.centroids, encoded, cb)
  }

  /** Residual-PQ encode for ALREADY-ASSIGNED vectors — the incremental
    * ivfpq ingestion step ([[AnnIndexes.append]]): a pure map over the
    * new batch against the frozen centroids + codebook, producing rows
    * shaped like [[IvfPqIndex.encoded]] (nid, cell, codes).
    */
  def encodeResiduals(assigned: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    import graft.functions.VectorExpressions.pq_encode
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    assigned.join(broadcast(centroids), "cell")
      .select(col(idCol).as("nid"), col("cell"),
        pq_encode(residualExpr(col(vecCol), col("center")), cbLit).as("codes"))
  }

  /** query/corpus residual vs a cell center, over L2-normalized input —
    * array<double> (the PQ kernels' input type).
    */
  private def residualExpr(vec: org.apache.spark.sql.Column,
      center: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = vec_norm(vec)
    val unit = transform(vec, x => when(n > 0, x / n).otherwise(x))
    zip_with(unit, center, (x, c) => x.cast("double") - c.cast("double"))
  }

  /** ADC probe + exact rerank: each query ranks the (broadcast, nlist-row)
    * centroid table for its `nprobe` cells, computes ONE [m][k] ADC table
    * per (query, cell) — O(nprobe·k·d) per query, never per candidate —
    * shortlists `shortlist` ids per query by approximate residual
    * distance (m lookups per candidate), and reranks the shortlist with
    * exact cosine. Work touched: Σ probed-cell sizes ≈ corpus·nprobe/nlist
    * candidates at m lookups each, plus `shortlist` exact distances —
    * the 100 TB shape where neither the full corpus nor full vectors
    * enter the query path.
    */
  def ivfPqTopK(index: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 4,
      shortlist: Int = 64): DataFrame = {
    import graft.functions.VectorExpressions.{pq_adc, pq_dist_table}
    val cbLit = typedLit(index.codebook.map(_.map(_.toSeq).toSeq).toSeq)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    // nprobe nearest cells per query, then the per-(query, cell) ADC
    // table — projected on the (queries × nprobe)-row side, never per pair
    val probes = q
      .crossJoin(broadcast(index.centroids))
      .groupBy(col("query_id"))
      .agg(topk_by(vec_cosine(col("q_vec"), col("center")),
        col("cell").cast("long"), nprobe).as("cells"))
      .select(col("query_id"), explode(col("cells.id")).as("cell"))
      .withColumn("cell", col("cell").cast("int"))
      .join(q, "query_id")
      .join(broadcast(index.centroids), "cell")
      .select(col("query_id"), col("cell"),
        pq_dist_table(residualExpr(col("q_vec"), col("center")), cbLit).as("qtab"))
    val short = index.encoded.join(broadcast(probes), "cell")
      .filter(col("nid") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(topk_by(-pq_adc(col("codes"), col("qtab")), col("nid"), shortlist)
        .as("cands"))
      .select(col("query_id"), explode(col("cands.id")).as("neighbor_id"))
    // exact rerank over the shortlist only
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    short.join(c, "neighbor_id").join(q, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        vec_cosine(col("q_vec"), col("c_vec")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  /** Per-label centroid statistics: member count and the L2 norm of the
    * component-wise mean vector — the class-centroid computation behind
    * SemDeDup-style pruning and IVF cell seeding, as a pure DataFrame
    * aggregation.
    *
    * Scale shape: `posexplode` fans each vector into (label, pos, v)
    * rows INSIDE the scan task and the mean reduces map-side per
    * (label, pos) — shuffled rows are O(labels × dim), independent of
    * corpus size; the final per-label fold over dim components is a
    * second O(labels × dim) aggregate. No vector ever reaches the
    * driver.
    */
  def labelCentroids(emb: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val comp = emb
      .select(col(labelCol).as("label"),
        posexplode(transform(col(vecCol), _.cast("double"))))
    val counts = emb.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
    comp
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("c"))
      .groupBy(col("label"))
      .agg(sqrt(sum(col("c") * col("c"))).as("__norm"))
      .join(counts, "label")
      .select(col("label"), col("n"),
        graft.dround(col("__norm"), 4).as("centroid_norm"))
  }

  /** Exact k-nearest-neighbor GRAPH over the corpus — every vector's
    * top-k cosine neighbors, the substrate of kNN-graph clustering,
    * SemDeDup refinement, and graph-based ANN index construction
    * (HNSW/NSG build from exactly this edge list). Output:
    * (src, rank, dst, cosine), rank 1-based, ties toward the smaller id
    * (the [[graft.functions.TopKByScore]] contract).
    *
    * Scale shape: here the corpus IS the query set, so the
    * [[bruteForceTopK]] broadcast is the wrong tool. The corpus packs
    * into `blocks` rows (one `array<struct<id, vec>>` per block); every
    * query row replicates once per block (an equi-join against the
    * literal combo frame — no BroadcastNestedLoopJoin, no cartesian)
    * and probes the matching pack through the fused
    * [[graft.functions.VectorExpressions.topk_cosine_local]] kernel, so
    * the n² pair stream NEVER materializes as rows — each probe emits k
    * structs, and per-block winners merge through k-row
    * [[graft.functions.TopKByScore]] partials in the one src-keyed
    * shuffle (the join-row formulation measured 4× slower at sf0.1:
    * 3.5 s vs 0.8 s — pair-row materialization, not cosine flops,
    * dominated it). Pick `blocks` so a pack stays O(MB): replication is
    * queries×blocks rows, pack bytes are corpus/blocks each. Quadratic
    * WORK is inherent to the EXACT graph; beyond ~10⁶ vectors build the
    * approximate graph instead: assign cells with [[buildIvfIndex]] and
    * probe within cells ([[semanticNearDups]] shape), or LSH-bucket
    * with [[withSignatures]].
    */
  def knnGraph(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      blocks: Int = 8): DataFrame =
    packedTopKGraph(vecs, idCol, vecCol, k, blocks, crossKey = None)

  /** Shared packed-kernel graph pipeline behind [[knnGraph]] and
    * [[hardNegatives]]: block-pack the corpus (additionally keyed by
    * `crossKey` when set), replicate each probe row once per target
    * block, probe through the fused kernel, merge per-src winners.
    * With `crossKey`, packs of the probe row's own key value are
    * filtered out BEFORE the kernel runs (the hard-negative label
    * inequality).
    *
    * The probe stage is CPU-bound, not size-bound: without an explicit
    * spread, broadcast joins inherit the (tiny) source partitioning and
    * the whole n²/blocks² cosine work lands in one task — and AQE would
    * coalesce a size-based shuffle right back. The explicit-count
    * round-robin pins probe parallelism to the cluster, a few hundred
    * lightweight rows per task; at fleet scale the pack join degrades
    * to a g2-keyed shuffle join whose parallelism is `blocks` (sized
    * with the corpus), and packs never replicate per probe row.
    */
  private def packedTopKGraph(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, blocks: Int, crossKey: Option[String]): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(blocks >= 1, s"blocks must be positive: $blocks")
    val spark = vecs.sparkSession
    import spark.implicits._
    import graft.functions.VectorExpressions.topk_cosine_local
    val combos = (for { g <- 0 until blocks; g2 <- 0 until blocks }
      yield (g, g2)).toDF("g", "g2")
    val base = (crossKey match {
      case Some(c) => vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"),
        col(c).as("__xk"))
      case None => vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    }).withColumn("g", pmod(xxhash64(col("vid")), lit(blocks)).cast("int"))
    val packKeys = col("g").as("g2") +:
      crossKey.map(_ => col("__xk").as("__xk_b")).toSeq
    val packs = base.groupBy(packKeys: _*)
      .agg(collect_list(struct(col("vid").as("id"), col("vec"))).as("pack"))
    val parallelism = math.max(spark.sparkContext.defaultParallelism, blocks)
    val probes = base.join(broadcast(combos), "g")
      .repartition(parallelism)
      .join(packs, Seq("g2"))
    crossKey.fold(probes)(_ => probes.filter(col("__xk") =!= col("__xk_b")))
      .select(col("vid").as("src"),
        posexplode(topk_cosine_local(col("pack"), col("vec"), col("vid"), k)))
      .groupBy(col("src"))
      .agg(topk_by(col("col.score"), col("col.id"), k).as("topk"))
      .select(col("src"), posexplode(col("topk")))
      .select(col("src"), (col("pos") + 1).as("rank"),
        col("col.id").as("dst"), col("col.score").as("cosine"))
  }

  /** Hard-negative mining for contrastive training: every vector's top-k
    * most-similar neighbors carrying a DIFFERENT label — the
    * high-similarity cross-label pairs a dual-encoder trains against.
    * Same packed-kernel machinery as [[knnGraph]], with packs keyed by
    * (block, label) so the label inequality prunes BEFORE the kernel
    * runs: a probe row meets only the packs of other labels, and the
    * per-src top-k is computed after the filter (a prebuilt all-label
    * graph cannot answer this — its top-k may be all same-label).
    * Output: (src, rank, dst, cosine).
    *
    * Scale shape: [[knnGraph]]'s — the pack count grows to
    * blocks × |labels| (still bounded), probe replication to
    * blocks × (|labels| − 1) rows per vector, pair work unchanged and
    * fully kernel-fused; k-row `TopKByScore` partials feed the one
    * src-keyed shuffle.
    */
  def hardNegatives(vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, blocks: Int = 8): DataFrame =
    packedTopKGraph(vecs, idCol, vecCol, k, blocks, crossKey = Some(labelCol))

  /** Approximate hard negatives — the ≥10⁶-vector path [[hardNegatives]]'
    * contract points at: IVF-probed instead of exact-n². Each vector
    * scores the (broadcast, nlist-row) centroid table for its `nprobe`
    * nearest cells and meets only the cross-label corpus rows ASSIGNED to
    * those cells — work ∝ nprobe/nlist of the corpus per probe instead of
    * the full corpus. Exact cosine + per-src top-k over the candidates,
    * so every returned pair's score is exact; only RECALL is traded
    * (a true hard negative hiding in an unprobed cell is missed —
    * `q_hard_negatives_approx` pins the measured recall as its oracle
    * claim).
    *
    * Output: (src, rank, dst, cosine) — [[hardNegatives]]'s shape.
    *
    * At 100 TB: index build is the one KMeans + assign job (amortized
    * across probes via [[buildIvfIndex]] + [[hardNegativesProbe]] on a
    * persisted index); the probe pass shuffles corpus rows once on
    * `cell` (storage-partition-prunable when the assigned table is
    * bucketed by cell) and per-src partial top-k reduces each partition
    * to k rows before the final src shuffle. Size `nlist` with the
    * corpus (cells of ~10⁴-10⁵ vectors) so per-task candidate sets stay
    * bounded.
    */
  /** Exact hard negatives for a SUBSET of probe vectors — the
    * broadcast-queries twin of [[hardNegatives]] (which pays the full
    * packed n² graph): the query set broadcasts, the corpus streams once
    * through the cosine loop with the label inequality in the join
    * condition, per-src top-k via k-row partials. The right tool when
    * |queries| ≪ corpus (spot checks, recall oracles).
    */
  def hardNegativesFor(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("src"), col(vecCol).as("q_vec"),
      col(labelCol).as("__lq"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("c_vec"),
      col(labelCol).as("__lc"))
    c.join(broadcast(q), col("nid") =!= col("src") && col("__lc") =!= col("__lq"))
      .groupBy(col("src"))
      .agg(topk_by(vec_cosine(col("q_vec"), col("c_vec")), col("nid"), k).as("topk"))
      .select(col("src"), posexplode(col("topk")))
      .select(col("src"), (col("pos") + 1).as("rank"),
        col("col.id").as("dst"), col("col.score").as("cosine"))
  }

  def hardNegativesApprox(vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L): DataFrame =
    hardNegativesProbe(buildIvfIndex(vecs, idCol, vecCol, nlist, seed),
      vecs, idCol, vecCol, labelCol, k, nprobe)

  /** Probe-only approximate hard negatives over a prebuilt [[IvfIndex]]
    * (the persisted-index path). `vecs` defines BOTH the probe set and
    * the candidate corpus: assigned ids absent from `vecs` have no label
    * to filter on and are EXCLUDED from the packs (inner label join) —
    * pass the full labeled corpus unless you deliberately want negatives
    * mined within a subset.
    */
  def hardNegativesProbe(index: IvfIndex, vecs: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int, nprobe: Int = 4): DataFrame = {
    import graft.functions.VectorExpressions.topk_cosine_local
    val spark = vecs.sparkSession
    val labels = vecs.select(col(idCol).as("nid"), col(labelCol).as("__lbl_b"))
    val labeled = index.assigned.join(labels, "nid")
    // (cell, label) PACKS probed through the fused kernel — the same
    // no-pair-rows discipline as packedTopKGraph: the join-row
    // formulation of this probe measured 6x SLOWER than the exact
    // packed kernel at 16k vectors (row overhead, not cosine flops —
    // PERF_NOTES §14); packing restores the fused loop and the label
    // filter stays a pack-level predicate.
    val packs = labeled.groupBy(col("cell"), col("__lbl_b"))
      .agg(collect_list(struct(col("nid").as("id"), col("c_vec").as("vec")))
        .as("pack"))
    val q = vecs.select(col(idCol).as("src"), col(vecCol).as("q_vec"),
      col(labelCol).as("__lbl"))
    val probes = q
      .crossJoin(broadcast(index.centroids))
      .groupBy(col("src"))
      .agg(topk_by(vec_cosine(col("q_vec"), col("center")),
        col("cell").cast("long"), nprobe).as("cells"))
      .select(col("src"), explode(col("cells.id")).as("cell64"))
      .select(col("src"), col("cell64").cast("int").as("cell"))
      .join(q, "src")
      // kernel work is CPU-bound, not size-bound (packedTopKGraph's
      // note): spread the probe rows across the cluster explicitly
      .repartition(math.max(spark.sparkContext.defaultParallelism, nprobe))
    probes.join(packs, Seq("cell"))
      .filter(col("__lbl_b") =!= col("__lbl"))
      .select(col("src"),
        posexplode(topk_cosine_local(col("pack"), col("q_vec"), col("src"), k)))
      .groupBy(col("src"))
      .agg(topk_by(col("col.score"), col("col.id"), k).as("topk"))
      .select(col("src"), posexplode(col("topk")))
      .select(col("src"), (col("pos") + 1).as("rank"),
        col("col.id").as("dst"), col("col.score").as("cosine"))
  }
}
