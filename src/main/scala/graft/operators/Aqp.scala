package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate Query Processing: stratified sampling + closed-form error
  * estimation, rebuilt from the reference's PUBLIC contracts only
  * (SURVEY.md §1.6: createSampleTable QCS/FRACTION/STRATARESERVOIRSIZE,
  * docs/sde/hac_contracts.md error functions `absolute_error`,
  * `relative_error`, `lower_bound`, `upper_bound`; the implementation jar
  * is closed-source, so the math here is standard stratified-sampling
  * theory as in the public CIDR'17 paper).
  *
  * Sampling is DETERMINISTIC: membership is decided by the xxhash64 rank
  * of the row's key within its stratum, not an RNG — re-running the
  * pipeline reproduces the identical sample, and at scale it costs one
  * shuffle on the QCS (stratification) columns.
  */
object Aqp {

  /** Stratified sample with per-stratum reservoir floor.
    *
    * Every stratum (distinct QCS combination) keeps
    * `max(reservoirFloor, ceil(n_h * fraction))` rows chosen by hash rank;
    * each kept row carries `_weight = n_h / kept_h` (its inverse inclusion
    * probability) for unbiased Horvitz-Thompson estimates downstream.
    */
  def stratifiedSample(
      df: DataFrame,
      qcs: Seq[String],
      fraction: Double,
      reservoirFloor: Int,
      rankKey: Seq[String]): DataFrame = {
    val strat = Window.partitionBy(qcs.map(col): _*)
    df
      .withColumn("_rank", row_number().over(
        strat.orderBy(xxhash64(rankKey.map(col): _*), col(rankKey.head))))
      .withColumn("_n_h", count(lit(1)).over(strat))
      .withColumn("_kept_h",
        least(col("_n_h"),
          greatest(lit(reservoirFloor.toLong), ceil(col("_n_h") * fraction)))
          .cast("long"))
      .filter(col("_rank") <= col("_kept_h"))
      .withColumn("_weight", col("_n_h").cast("double") / col("_kept_h"))
      .drop("_rank")
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
