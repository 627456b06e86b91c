package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming last-touch attribution — the stream twin of
  * [[graft.operators.Funnel.lastTouchAttribution]]: each user's latest
  * touch event lives in the state store, and every conversion emits its
  * attribution the moment it arrives, instead of waiting for a batch
  * window pass over the full history. Same output columns and the same
  * ordering contract as the batch operator (touches strictly earlier in
  * (timestamp, event id) order are eligible; a gap bound turns stale
  * touches into NULL/organic attribution) — for in-order delivery the
  * stream and batch results are row-identical, which is what the spec
  * asserts. Out-of-order arrivals ACROSS micro-batches attribute against
  * the state as of arrival (the streaming trade-off; bound it with the
  * source's watermark).
  *
  * Scale shape: state is ONE (ts, id, type) triple per user —
  * hash-partitioned by the state store, independent of stream length;
  * each micro-batch shuffles only that batch's touch/conversion rows,
  * pre-filtered by event type inside the scan. An idle-user TTL caps
  * state for unbounded user populations.
  */
object StreamingAttribution {

  /** State record: the user's latest touch (public — the state encoder's
    * generated code constructs and reads it reflectively).
    */
  case class Touch(tsUs: Long, id: Long, typ: String)

  val outputSchema: StructType = StructType(Seq(
    StructField("conversion_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("conv_ts_us", LongType, nullable = false),
    StructField("touch_id", LongType, nullable = true),
    StructField("touch_type", StringType, nullable = true),
    StructField("gap_us", LongType, nullable = true)))

  /** Continuous attribution over a streaming events frame. `tsCol` must
    * be a timestamp column; `idCol`/`userCol` long keys.
    */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, touchTypes: Seq[String],
      convType: String, maxGapUs: Long = 0L,
      idleUserTtl: Option[String] = None): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouch: need touch types")
    require(!touchTypes.contains(convType),
      s"lastTouch: conversion type '$convType' cannot also be a touch")
    val touchSet = touchTypes.toSet
    val slim = events
      .filter(col(typeCol).isin((touchTypes :+ convType).map(x => x: Any): _*))
      .select(col(userCol).cast("long").as("u"), col(idCol).cast("long").as("id"),
        col(typeCol).as("typ"), unix_micros(col(tsCol)).as("ts_us"))
    val rowEnc = Encoders.row(outputSchema)
    val timeout =
      if (idleUserTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val attribute = (user: Long, rows: Iterator[Row], state: GroupState[Touch]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty[Row]
      } else {
        // the group's batch rows replay in the batch operator's (ts, id)
        // order so same-batch touches are visible to later conversions
        val sorted = rows.toArray.sortBy(r => (r.getLong(3), r.getLong(1)))
        var touch = state.getOption
        val out = ArrayBuffer.empty[Row]
        sorted.foreach { r =>
          val id = r.getLong(1); val typ = r.getString(2); val ts = r.getLong(3)
          if (touchSet.contains(typ)) {
            touch = Some(Touch(ts, id, typ))
          } else {
            val eligible = touch.filter(t => maxGapUs <= 0L || t.tsUs >= ts - maxGapUs)
            out += (eligible match {
              case Some(t) => Row(id, user, ts, t.id, t.typ, ts - t.tsUs)
              case None => Row(id, user, ts, null, null, null)
            })
          }
        }
        touch.foreach(state.update)
        idleUserTtl.foreach(state.setTimeoutDuration)
        out.iterator
      }
    }
    slim
      .groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(attribute)(
        Encoders.product[Touch], rowEnc)
  }
}
