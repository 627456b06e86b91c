package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many users completed step 1, then step 2
  * strictly after it, then step 3 after that, ... — the standard product
  * funnel over an event stream.
  *
  * Shape: one user-keyed aggregation per step (min timestamp of the
  * step's events that occur AFTER the user's previous-step time), chained
  * by joins on the user key. Every stage shuffles (user, timestamp)
  * pairs — never event payloads — and the per-step frames shrink
  * monotonically, so at 100 TB the heavy shuffle happens exactly once
  * (step 1) and each later stage works on the surviving cohort. No
  * windows over the full stream, no per-user event collection.
  */
object Funnel {

  /** (step, step_name, users) — users reaching each funnel step in
    * order, each step within `maxGap` (a SQL interval string, e.g.
    * "24 hours") of the previous one; no gap bound when empty.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], maxGap: String = ""): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    // each cohort materializes ONCE (localCheckpoint): it feeds both its
    // own count and every later step's chain — without the checkpoint the
    // step-1 full-stream scan would re-execute once per union branch
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t1"))
      .localCheckpoint(true)
    val cohorts = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (step, i)) =>
        val afterPrev = col(tsCol) > col(s"_t$i")
        val inWindow =
          if (maxGap.isEmpty) afterPrev
          else afterPrev && col(tsCol) <= col(s"_t$i") + expr(s"INTERVAL $maxGap")
        events.filter(col(typeCol) === step)
          .join(prev, userCol)
          .filter(inWindow)
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"_t${i + 1}"))
          .localCheckpoint(true)
    }
    cohorts.zip(steps).zipWithIndex.map { case ((cohort, step), i) =>
      cohort.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(step).as("step_name"), col("users"))
    }.reduce(_.unionByName(_))
  }

  /** Cohort retention matrix: users grouped by the period of their first
    * event (the cohort), counted in every later period they were active —
    * (cohort, period_offset, n_users). Two user-keyed aggregations (first
    * period, distinct active periods) and one join; event payloads never
    * shuffle. `period` is a `date_trunc` unit; offsets are exact because
    * both sides truncate to the same period boundaries.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      period: String = "week"): DataFrame = {
    val periodDays = period.toLowerCase match {
      case "week" => 7
      case "day" => 1
      case other => throw new IllegalArgumentException(
        s"retention: unsupported period '$other' (week | day)")
    }
    val p = date_trunc(period, col(tsCol))
    val first = events.groupBy(col(userCol)).agg(min(p).as("_cohort"))
    val active = events.select(col(userCol), p.as("_p")).distinct()
    active.join(first, userCol)
      .groupBy(
        date_format(col("_cohort"), "yyyy-MM-dd").as("cohort"),
        (datediff(col("_p"), col("_cohort")) / periodDays).cast("int")
          .as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
