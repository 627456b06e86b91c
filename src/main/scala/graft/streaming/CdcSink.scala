package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.store.{GraftColumnStore, GraftStoreOps}
import org.apache.spark.sql.types._

/** Exactly-once CDC-aware streaming upsert sink — the Structured-Streaming
  * rebuild of the reference's SnappyStoreSink
  * (reference: streaming/SnappySinkCallback.scala:63-391):
  *
  *  - events carry an `_eventType` column: 0=INSERT, 1=UPDATE, 2=DELETE
  *    (`:119-138`);
  *  - duplicate micro-batch detection via a PERSISTENT (queryName, table)
  *    → batchId state table consulted before applying
  *    (`isPossibleDuplicate:196-219`) — the state lives in the graftstore
  *    itself (reference keeps it in SNAPPYSYS_INTERNAL.SINK_STATE_TABLE),
  *    so a RESTARTED job replaying its last micro-batch from the
  *    checkpoint is still a no-op; nothing is process-local;
  *  - key conflation: only the LAST event per key in a batch is applied
  *    (`:143-236`), ordered by `orderCol`;
  *  - apply order: deletes first, then upserts (PUT INTO semantics on the
  *    managed table). The batchId is recorded in the same apply, AFTER
  *    the mutations: a crash between them replays a CONFLATED batch,
  *    which is idempotent per key (delete of a dead key and a keyed put
  *    are both no-op-or-overwrite).
  *
  * Usage: `df.writeStream.foreachBatch(CdcSink(g, "table", Seq("k"), "ord").apply _)`.
  */
case class CdcSink(
    session: GraftSession,
    table: String,
    keyColumns: Seq[String],
    orderCol: String,
    queryName: String = "cdc",
    eventTypeCol: String = "_eventType") {

  def apply(batch: DataFrame, batchId: Long): Unit = {
    if (CdcSink.lastCommitted(session, queryName, table).exists(_ >= batchId))
      return // duplicate replay (in-session or post-restart) → no-op
    applyBatch(batch)
    CdcSink.record(session, queryName, table, batchId)
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

  /** The persistent sink-state table (reference SINK_STATE_TABLE). */
  val StateTable = "graft_sink_state"

  private val stateSchema = StructType(Seq(
    StructField("query_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("batch_id", LongType, nullable = false)))

  private def ensureStateTable(): Unit =
    GraftColumnStore.getOrCreate(StateTable, stateSchema,
      keyColumns = Seq("query_name", "table_name"))

  /** Highest batchId recorded for (queryName, table), surviving session
    * restarts (any process with the same store sees it).
    */
  def lastCommitted(session: GraftSession, queryName: String, table: String): Option[Long] = {
    if (GraftColumnStore.get(StateTable).isEmpty) return None
    GraftStoreOps.read(session.spark, StateTable)
      .filter(col("query_name") === queryName && col("table_name") === table)
      .collect().headOption.map(_.getAs[Long]("batch_id"))
  }

  /** Record (queryName, table) → batchId via a keyed upsert on the state
    * table — same write path, same store, as the data itself.
    */
  def record(session: GraftSession, queryName: String, table: String, batchId: Long): Unit = {
    ensureStateTable()
    val spark = session.spark
    import spark.implicits._
    GraftStoreOps.putInto(spark, StateTable,
      Seq((queryName, table, batchId)).toDF("query_name", "table_name", "batch_id"))
  }
}
