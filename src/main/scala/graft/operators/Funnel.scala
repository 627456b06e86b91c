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

  /** Last-touch attribution: credit every conversion event to the user's
    * most recent touch event (any type in `touchTypes`) that happened
    * strictly before it and within `maxGap` — the standard marketing-
    * attribution join, expressed as ONE per-user window pass instead of a
    * self-join: `last(touch, ignoreNulls)` over rows up to (but not
    * including) the conversion row picks the latest preceding touch in
    * (ts, event id) order. Conversions with no in-window touch keep NULL
    * attribution (they count as organic). Output: (conversion event id,
    * user, conversion ts, touch event id, touch type, gap seconds).
    *
    * Scale shape: the type filter pushes into the scan so only touch and
    * conversion rows survive; the single window exchange is user-keyed
    * and carries (user, ts, id, type) — never event payloads. No
    * self-join, no per-user collect; per-partition state is one struct.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, touchTypes: Seq[String],
      convType: String, maxGapUs: Long = 0L): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouchAttribution: need touch types")
    require(!touchTypes.contains(convType),
      s"lastTouchAttribution: conversion type '$convType' cannot also be a touch")
    val tsUs = unix_micros(col(tsCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(tsUs, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val touch = last(
      when(isTouch, struct(tsUs.as("ts_us"), col(idCol).as("id"),
        col(typeCol).as("typ"))),
      ignoreNulls = true).over(w)
    val attributed = events
      .filter(isTouch || col(typeCol) === convType)
      .withColumn("__ts_us", tsUs)
      .withColumn("__touch", touch)
      .filter(col(typeCol) === convType)
    val inWindow =
      if (maxGapUs <= 0L) col("__touch").isNotNull
      else col("__touch.ts_us") >= col("__ts_us") - maxGapUs
    attributed.select(
      col(idCol).as("conversion_id"),
      col(userCol).as("user_id"),
      col("__ts_us").as("conv_ts_us"),
      when(inWindow, col("__touch.id")).as("touch_id"),
      when(inWindow, col("__touch.typ")).as("touch_type"),
      when(inWindow, col("__ts_us") - col("__touch.ts_us")).as("gap_us"))
  }

  /** Top event paths: the most frequent length-`steps` sequences of
    * consecutive event types per user (clickstream path mining — the
    * k-step generalization of the first-order transition matrix).
    * Output: the `k` most common paths as (step_1..step_n, n_paths),
    * ties broken by path ascending.
    *
    * Scale shape: ONE user-keyed window pass (same shuffle the
    * transition matrix pays — lead(i) for all i share one sort), then a
    * count agg bounded by |types|^steps and a k-row top-k. No self-joins,
    * nothing quadratic in events.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, steps: Int, k: Int): DataFrame = {
    require(steps >= 2, s"topPaths: need at least 2 steps, got $steps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val stepCols = (1 to steps).map { i =>
      (if (i == 1) col(typeCol) else lead(col(typeCol), i - 1).over(w))
        .as(s"step_$i")
    }
    val paths = events.select(stepCols: _*)
      .filter(stepCols.indices.map(i => col(s"step_${i + 1}").isNotNull)
        .reduce(_ && _))
      .groupBy((1 to steps).map(i => col(s"step_$i")): _*)
      .agg(count(lit(1)).as("n_paths"))
    paths.orderBy(col("n_paths").desc +: (1 to steps).map(i => col(s"step_$i")): _*)
      .limit(k)
  }
}
