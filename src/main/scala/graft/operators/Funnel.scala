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
}
