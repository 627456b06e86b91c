package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to every left row the most recent right
  * row with the same key and `rightTs <= leftTs`.
  *
  * Beyond-reference operator (the reference has none — SURVEY.md §2.3
  * "range/as-of: not implemented"), included because event-time
  * enrichment is a staple of training-data pipelines.
  *
  * Implementation is the scalable union-window form, NOT a range join:
  * both sides union into one stream tagged by side, one shuffle+sort per
  * key partition, and `last(payload) ignore nulls` over the time-ordered
  * window carries the latest right payload forward to each left row.
  * Cost: one Exchange + one in-partition sort — the same plan shape as a
  * windowed aggregation, regardless of how many right rows precede each
  * left row (a broadcast-range-join would degrade quadratically in
  * dense keys).
  */
object AsofJoin {

  /** @param rightOrder extra right-side columns that deterministically
    *                    break ties among right rows with equal timestamps
    *                    (latest in this order wins).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTs: String,
      rightTs: String,
      rightOrder: Seq[String] = Nil,
      rightPrefix: String = "asof_"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => by.contains(c)).toSeq
    val tieCols = rightOrder.map(c => col(c).as(s"_tie_$c"))

    val taggedRight = right.select(
      (by.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_tag") :+
        struct(payloadCols.map(col): _*).as("_payload")) ++ tieCols: _*)
    val taggedLeft = left.select(
      (Seq(struct(left.columns.map(col): _*).as("_left")) ++ by.map(col) :+
        col(leftTs).as("_ts") :+ lit(1).as("_tag") :+
        lit(null).cast(taggedRight.schema("_payload").dataType).as("_payload")) ++
        rightOrder.map(c => lit(null).cast(right.schema(c).dataType).as(s"_tie_$c")): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy((col("_ts").asc +: col("_tag").asc +:
        rightOrder.map(c => col(s"_tie_$c").asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight.withColumn("_left",
        lit(null).cast(taggedLeft.schema("_left").dataType)), allowMissingColumns = false)
      .withColumn("_m", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(
        left.columns.map(c => col(s"_left.$c").as(c)).toSeq ++
          payloadCols.map(c => col(s"_m.$c").as(s"$rightPrefix$c")): _*)
  }
}
