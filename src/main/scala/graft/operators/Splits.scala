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

  /** Uniform [0, 1) from the '|'-joined key columns. */
  def uniform(rankKey: Seq[String]): Column =
    org.apache.spark.sql.graft.TextHashExpressions
      .md5_prefix_long(concat_ws("|", rankKey.map(col): _*), 10)
      .cast("double") / (1L << 40).toDouble

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
}
