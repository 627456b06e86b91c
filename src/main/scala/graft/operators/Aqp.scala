package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate Query Processing: stratified sampling + closed-form error
  * estimation, rebuilt from the reference's PUBLIC contracts only
  * (SURVEY.md §1.6: createSampleTable QCS/FRACTION/STRATARESERVOIRSIZE,
  * docs/sde/hac_contracts.md error functions `absolute_error`,
  * `relative_error`, `lower_bound`, `upper_bound`; the implementation jar
  * is closed-source, so the math here is standard stratified-sampling
  * theory as in the public CIDR'17 paper).
  *
  * Sampling is DETERMINISTIC and ENGINE-PORTABLE: membership is decided
  * by a uniform value derived from the md5 of the row's key — not an RNG
  * and not an engine-private hash — so re-running the pipeline reproduces
  * the identical sample AND an external SQL engine (the DuckDB oracle)
  * can reconstruct the exact same sample from the base table, which turns
  * every value-dependent sample aggregate into a hash-checkable result.
  * md5 costs more than xxhash64 per row, but it is paid once at sample
  * BUILD time over ~16 bytes of key per row — immaterial next to the
  * base-table scan it rides on.
  */
object Aqp {

  /** Stratified sample with per-stratum reservoir floor — hash-threshold
    * membership with EXACT stratum accounting.
    *
    * Scale shape (the reference's stratum reservoirs re-expressed for a
    * shared-nothing scan): the data rows are NEVER shuffled. Two
    * map-side-combined aggregations compute (a) exact stratum sizes n_h
    * and (b) the exact realized sample size kept_h; both are tiny
    * (|distinct QCS|) and broadcast back onto the scan. Membership is
    * decided per row from the first 40 bits of md5('|'-joined key): keep
    * iff u(key) < target_h / n_h with target_h = max(floor, ceil(n_h·f))
    * — deterministic, so re-running reproduces the identical sample. Each
    * kept row carries `_weight = n_h / kept_h` (inverse realized
    * inclusion probability), so Horvitz-Thompson count/sum estimates per
    * stratum-aligned group stay EXACTLY unbiased (Σ_weight = n_h).
    *
    * (The previous formulation ranked rows with `row_number() OVER
    * (PARTITION BY qcs)` — one reducer per stratum, a single-partition
    * sort at 100 TB. This one has no wide shuffle at all.)
    */
  def stratifiedSample(
      df: DataFrame,
      qcs: Seq[String],
      fraction: Double,
      reservoirFloor: Int,
      rankKey: Seq[String]): DataFrame = {
    // uniform [0,1) from the deterministic row key; md5 (not xxhash64) so
    // the DuckDB oracle can replay the identical sample:
    //   CAST('0x' || substr(md5(k1 || '|' || k2), 1, 10) AS BIGINT) / 2^40
    val u = Splits.uniform(rankKey)
    val sizes = df.groupBy(qcs.map(col): _*)
      .agg(count(lit(1)).as("_n_h"))
      .withColumn("_target_h",
        least(col("_n_h"),
          greatest(lit(reservoirFloor.toLong), ceil(col("_n_h") * fraction)))
          .cast("long"))
    val candidates = df
      .join(broadcast(sizes), qcs)
      .filter(u < col("_target_h").cast("double") / col("_n_h"))
    val kept = candidates.groupBy(qcs.map(col): _*)
      .agg(count(lit(1)).as("_kept_h"))
    candidates
      .join(broadcast(kept), qcs)
      .withColumn("_weight", col("_n_h").cast("double") / col("_kept_h"))
      .drop("_target_h")
  }

  /** z-score for the standard confidence levels (reference default 0.95,
    * Literals.scala:259-303).
    */
  def zScore(confidence: Double): Double = confidence match {
    case c if c >= 0.99 => 2.5758293035489004
    case c if c >= 0.95 => 1.959963984540054
    case c if c >= 0.90 => 1.6448536269514722
    case _ => 1.2815515655446004 // 0.80
  }

  /** Weighted AVG per group with closed-form (CLT) error columns —
    * the DataFrame form of the reference's
    * `SELECT avg(x), absolute_error(e), relative_error(e), lower_bound(e),
    *  upper_bound(e) ... WITH ERROR f CONFIDENCE c`.
    *
    * Estimator: stratified Horvitz-Thompson. Per (group, stratum):
    * N̂_gh = n·w, total̂_gh = N̂_gh·ȳ, Var(total̂_gh) = N̂²(1-n/N̂)s²/n
    * (with finite-population correction). Group avg = Σtotal̂/ΣN̂ with
    * Var(avg) ≈ ΣVar(total̂)/ (ΣN̂)².
    */
  def approxAvgWithError(
      sample: DataFrame,
      valueCol: String,
      qcs: Seq[String],
      groupBy: Seq[String],
      confidence: Double = 0.95): DataFrame = {
    val z = zScore(confidence)
    val perStratum = sample
      .groupBy((groupBy ++ qcs).map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("n"),
        first(col("_weight")).as("w"),
        avg(col(valueCol)).as("mean"),
        coalesce(var_samp(col(valueCol)), lit(0.0)).as("s2"))
      .withColumn("n_hat", col("n") * col("w"))
      .withColumn("total_hat", col("n_hat") * col("mean"))
      .withColumn("var_total",
        col("n_hat") * col("n_hat") *
          greatest(lit(0.0), lit(1.0) - col("n") / col("n_hat")) *
          col("s2") / col("n"))
    val grouped =
      if (groupBy.nonEmpty) perStratum.groupBy(groupBy.map(col): _*)
      else perStratum.groupBy()
    grouped
      .agg(
        sum(col("n_hat")).as("n_est"),
        sum(col("total_hat")).as("total_est"),
        sum(col("var_total")).as("var_total"))
      .withColumn("estimate", col("total_est") / col("n_est"))
      .withColumn("absolute_error", lit(z) * sqrt(col("var_total")) / col("n_est"))
      .withColumn("relative_error",
        when(col("estimate") =!= 0, col("absolute_error") / abs(col("estimate")))
          .otherwise(lit(null)))
      .withColumn("lower_bound", col("estimate") - col("absolute_error"))
      .withColumn("upper_bound", col("estimate") + col("absolute_error"))
      .drop("n_est", "total_est", "var_total")
  }

  /** Weighted COUNT and SUM per group with error columns (same estimator
    * machinery; count is the HT total of the weight column).
    */
  def approxSumCount(
      sample: DataFrame,
      valueCol: String,
      groupBy: Seq[String]): DataFrame = {
    val grouped =
      if (groupBy.nonEmpty) sample.groupBy(groupBy.map(col): _*)
      else sample.groupBy()
    grouped.agg(
      sum(col("_weight")).as("count_est"),
      sum(col("_weight") * col(valueCol)).as("sum_est"))
  }
}
