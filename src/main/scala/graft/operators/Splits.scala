package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every row is
  * assigned to a named split (train/validation/test/...) by a uniform
  * value derived from the md5 of its key — the same engine-portable
  * construction as the AQP sampler ([[Aqp.stratifiedSample]]), so
  *  - re-running the pipeline reproduces the identical split (no RNG,
  *    no partition-order dependence);
  *  - adding rows never reassigns existing ones (membership depends only
  *    on the row's own key);
  *  - an external engine can recompute the exact assignment
  *    (`CAST('0x' || substr(md5(key), 1, 10) AS BIGINT) / 2^40`), which
  *    is what makes the split hash-checkable.
  * The assignment is a scan-fused column expression — at 100 TB it costs
  * one md5 per row inside whole-stage codegen, no shuffle.
  */
object Splits {

  /** Uniform [0, 1) from the '|'-joined key expressions — THE
    * engine-portable membership hash (first 40 md5 bits). Every
    * hash-threshold operator (AQP sampler, splits, mixture) MUST build
    * its uniform through here: the construction is load-bearing for
    * DuckDB oracle replay, and a drifted copy would silently break
    * hash-checked parity.
    */
  def uniformOf(keys: Seq[Column]): Column =
    org.apache.spark.sql.graft.TextHashExpressions
      .md5_prefix_long(concat_ws("|", keys: _*), 10)
      .cast("double") / (1L << 40).toDouble

  /** Uniform [0, 1) from named key columns. */
  def uniform(rankKey: Seq[String]): Column = uniformOf(rankKey.map(col))

  /** Append a `_split` column assigning each row to one of `splits`
    * (name → weight; weights need not sum to 1 — they are normalized).
    * Split boundaries are cumulative, so enlarging a later split never
    * moves rows between earlier ones.
    */
  def assign(df: DataFrame, rankKey: Seq[String],
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "assign: splits must be non-empty with positive weights")
    val total = splits.map(_._2).sum
    val u = uniform(rankKey)
    // cumulate THEN divide: bounds like 9/10 parse to the identical
    // double in any engine, where 0.8 + 0.1 would not equal literal 0.9
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val expr = splits.init.zip(bounds.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), hi), els) =>
        when(u < hi, name).otherwise(els)
      }
    df.withColumn("_split", expr)
  }

  /** Deterministic per-epoch shuffle + sharding — the data-loader
    * ordering pass of a distributed training run: every row gets a
    * `(shard, pos)` address for the given epoch, derived from
    * md5(key|epoch) so (a) each epoch is a fresh pseudorandom
    * permutation, (b) re-runs and resumed jobs reproduce it exactly, and
    * (c) an external engine can replay the full order (same portable
    * construction as [[uniformOf]]).
    *
    * Scale shape: the hash is scan-fused; the only exchange is the
    * partition-by-shard window, and each shard is corpus/numShards rows —
    * numShards tracks the reader count (hundreds-plus at 100 TB), so
    * per-shard sorts stay bounded and no global sort ever happens. Write
    * the result partitioned by shard and each reader streams its shard in
    * `pos` order.
    */
  def epochShuffle(df: DataFrame, rankKey: Seq[String], epoch: Int,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be positive: $numShards")
    val h = org.apache.spark.sql.graft.TextHashExpressions.md5_prefix_long(
      concat_ws("|", (rankKey.map(col) :+ lit(s"ep$epoch")): _*), 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_shard"))
      .orderBy(col("__h") +: rankKey.map(col): _*)
    df.withColumn("__h", h)
      .withColumn("_shard", pmod(col("__h"), lit(numShards)).cast("int"))
      .withColumn("_pos", row_number().over(w).cast("long") - 1)
      .drop("__h")
  }

  /** Per-group quantile normalization of a score column: each row's raw
    * score becomes its within-group percentile (`percent_rank`, ties
    * broken by `idCol` so the rank is total) — the calibration step that
    * makes quality scores COMPARABLE ACROSS SOURCES before a single
    * global keep-threshold is applied (raw score distributions differ
    * per source; a fixed raw cutoff keeps 90% of one source and 10% of
    * another for the same "quality").
    *
    * Portable exactness: `(rank - 1) / (n - 1)` is one IEEE division of
    * small exact integers, identical in any engine; the ordering is
    * total, so no tie can flip a rank.
    *
    * Scale shape: one group-keyed window pass; group sizes are
    * per-source corpus shares, so the sort is the per-partition cost a
    * 100 TB quality pass already pays. No driver state, no second pass.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, outCol: String = "pct"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol), col(idCol))
    df.withColumn(outCol, percent_rank().over(w))
  }

  /** Curriculum ordering (easy→hard with deterministic exploration
    * noise): every row gets a `(shard, pos)` reader address where the
    * within-shard order follows `wD·difficulty + wN·uniform(id|salt)` —
    * `wN = 0` is a strict curriculum, `wD = 0` degenerates to
    * [[epochShuffle]]'s pure pseudorandom pass. Weights are taken
    * verbatim (NOT derived as `1 - wD`): the caller and any external
    * replayer must share the exact literals, and `1 - 0.7` is not the
    * double `0.3`.
    *
    * `difficultyCol` should already be calibrated (e.g. the
    * [[quantileNormalize]] percentile) so the mixing weights mean the
    * same thing in every source.
    *
    * Scale shape: identical to [[epochShuffle]] — scan-fused hash +
    * one partition-by-shard window; shards track reader count so
    * per-shard sorts stay bounded.
    */
  def curriculumOrder(df: DataFrame, difficultyCol: String, idCol: String,
      wD: Double, wN: Double, numShards: Int,
      salt: String = "cur"): DataFrame = {
    require(numShards >= 1, s"numShards must be positive: $numShards")
    val u = uniformOf(Seq(col(idCol), lit(salt)))
    val key = lit(wD) * col(difficultyCol) + lit(wN) * u
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_shard")).orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("_shard",
        pmod(org.apache.spark.sql.graft.TextHashExpressions.md5_prefix_long(
          concat_ws("|", col(idCol), lit(s"shard|$salt")), 10),
          lit(numShards)).cast("int"))
      .withColumn("_pos", row_number().over(w).cast("long") - 1)
      .drop("__key")
  }
}

/** Domain-weighted mixture resampling — the data-mixing pass of a
  * pretraining pipeline (fixed target proportions per domain, DoReMi-
  * style): deterministically DOWN-sample each domain so the output
  * follows the target mixture at the largest feasible size
  * (`cap = min_d n_d / p_d`; keep rate `r_d = cap·p_d / n_d ≤ 1`).
  *
  * Scale shape: one map-combined count per domain (|domains| rows of
  * METADATA to the driver — never data), then membership is the same
  * scan-fused md5-threshold test as [[Splits]]/the AQP sampler:
  * deterministic, append-stable, and replayable by an external engine.
  * Rows of domains absent from `targets` are dropped.
  */
object Mixture {

  /** One domain-count aggregation (domain-bounded rows to the driver —
    * the only "collect" in the mixture family).
    */
  private def domainCounts(df: DataFrame, domainCol: String): Map[String, Long] =
    df.groupBy(col(domainCol)).count().collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap

  def resample(df: DataFrame, domainCol: String, idCol: String,
      targets: Seq[(String, Double)], salt: String = "mix"): DataFrame =
    resampleWith(df, domainCol, idCol, domainCounts(df, domainCol), targets, salt)

  /** Temperature-flattened domain mixture (the T5/PaLM mixing knob):
    * sampling weights `p_d ∝ count_d^alpha`. `alpha = 1` is the natural
    * mix — every rate works out to 1.0 and all rows keep; as alpha → 0
    * the target proportions flatten toward uniform, boosting
    * low-resource domains that a natural mix would drown. Same
    * md5-threshold determinism as [[resample]]: re-runs reproduce the
    * exact kept set, appends never reshuffle it.
    */
  def temperatureMix(df: DataFrame, domainCol: String, idCol: String,
      alpha: Double, salt: String = "mix"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperatureMix: alpha in (0,1]: $alpha")
    val counts = domainCounts(df, domainCol)
    require(counts.nonEmpty, "temperatureMix: empty input")
    // deterministic weight order (sorted domains) so the double sum in
    // resampleWith is run-stable
    val targets = counts.toSeq.sortBy(_._1)
      .map { case (d, c) => d -> math.pow(c.toDouble, alpha) }
    resampleWith(df, domainCol, idCol, counts, targets, salt)
  }

  private def resampleWith(df: DataFrame, domainCol: String, idCol: String,
      counts: Map[String, Long], targets: Seq[(String, Double)],
      salt: String): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "resample: targets must be non-empty with positive weights")
    val tot = targets.map(_._2).sum
    targets.foreach { case (d, _) =>
      require(counts.contains(d), s"resample: no rows for target domain '$d'")
    }
    val withP = targets.map { case (d, w) => (d, w / tot) }
    val cap = withP.map { case (d, p) => counts(d) / p }.min
    val rates = withP.map { case (d, p) =>
      d -> math.min(1.0, cap * p / counts(d))
    }
    applyRates(df, domainCol, idCol, rates, salt)
  }

  /** The deterministic md5-threshold keep at per-domain rates. */
  private def applyRates(df: DataFrame, domainCol: String, idCol: String,
      rates: Seq[(String, Double)], salt: String): DataFrame = {
    val u = Splits.uniformOf(Seq(col(idCol).cast("string"), lit(salt)))
    val rateCol = rates.foldRight(lit(0.0): Column) { case ((d, r), els) =>
      when(col(domainCol) === d, lit(r)).otherwise(els)
    }
    df.filter(u < rateCol)
  }

  /** UniMax-style budgeted uniform mixture (the published successor to
    * temperature sampling — Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling", single-epoch form): spread a total
    * document `budget` UNIFORMLY across domains, capping each domain at
    * its size. The water-filling level L solves Σ_d min(n_d, L) =
    * budget; each domain keeps at rate min(1, L/n_d) via the same
    * deterministic md5 threshold (re-runs reproduce the exact set). A
    * budget at or above the corpus keeps everything.
    *
    * Scale shape: one domain-count aggregation; the level is a
    * domain-bounded driver computation; the keep is a scan filter.
    */
  def uniformCapMix(df: DataFrame, domainCol: String, idCol: String,
      budget: Long, salt: String = "mix"): DataFrame = {
    require(budget > 0, s"uniformCapMix: budget must be positive: $budget")
    val counts = domainCounts(df, domainCol)
    require(counts.nonEmpty, "uniformCapMix: empty input")
    // capacities ascending; the first feasible level (one where the
    // not-yet-capped suffix can absorb the remaining budget without
    // exceeding this domain's capacity) is the water line
    val sorted = counts.toSeq.sortBy { case (d, n) => (n, d) }
    val k = sorted.size
    var cumBefore = 0L
    var level = Double.PositiveInfinity
    var i = 0
    while (i < k && level.isPosInfinity) {
      val n = sorted(i)._2
      val cand = (budget - cumBefore).toDouble / (k - i)
      if (cand <= n) level = cand else cumBefore += n
      i += 1
    }
    val rates = counts.toSeq.sortBy(_._1).map { case (d, n) =>
      d -> math.min(1.0, level / n)
    }
    applyRates(df, domainCol, idCol, rates, salt)
  }

  /** Token-budget packing — the "best docs until the budget is spent"
    * selection every pre-training mix ends with: per domain, rank
    * documents by quality (deterministic id tie-break) and keep the
    * prefix whose cumulative token count stays within `budgetPerDomain`.
    * Returns (id, domain, n_tokens, quality, cum_tokens) for the kept
    * prefix.
    *
    * Scale shape: the quality signals are per-row scan projections
    * ([[TextAnalysis.qualityScore]]), so the operator's only shuffle is
    * the window's partition-by-domain exchange — and that stream carries
    * (id, domain, two numbers), never text. Skew note: one window
    * partition per domain serializes per-domain ranking; with few huge
    * domains, pre-aggregate to (doc, n_tokens, quality) buckets or
    * range-partition by (domain, quality band) before the final exact
    * prefix — the budget cut only needs ORDER within the top of each
    * domain.
    */
  def tokenBudgetPack(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, budgetPerDomain: Long): DataFrame = {
    require(budgetPerDomain > 0, s"budgetPerDomain must be positive: $budgetPerDomain")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col("quality").desc, col(idCol))
    graft.operators.TextAnalysis.qualityScore(docs, idCol, textCol, carry = Seq(domainCol))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerDomain)
  }

  /** Class-balanced subsampling — cap every class at `perClass` rows,
    * chosen by a deterministic pseudorandom rank (the portable md5
    * uniform of [[Splits.uniformOf]], id tie-break): the standard
    * rebalancing pass before fine-tuning on skewed label distributions.
    * Unlike [[resample]] (fixed mixture PROPORTIONS at the largest
    * feasible size) this fixes an absolute per-class COUNT, so minority
    * classes pass through whole while majority classes are cut to size.
    *
    * Scale shape: one window exchange keyed by the class column carrying
    * (id, class, hash) — never payloads; rows per window partition =
    * class size. For few huge classes, pre-filter with a hash-threshold
    * pass (keep rate ≈ perClass·fudge/n_class via one metadata count) so
    * the exact rank only sees the expected survivors — same skew note as
    * [[tokenBudgetPack]].
    */
  def classBalance(df: DataFrame, classCol: String, idCol: String,
      perClass: Int, salt: String = "bal"): DataFrame = {
    require(perClass >= 1, s"perClass must be positive: $perClass")
    val u = Splits.uniformOf(Seq(col(idCol).cast("string"), lit(salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol))
      .orderBy(u, col(idCol))
    df.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= perClass)
      .drop("_rank")
  }
}
