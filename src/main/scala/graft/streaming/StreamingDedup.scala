package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the stream twin of
  * `Dedup.incrementalDedup`'s batch registry loop: the FIRST row carrying
  * each content fingerprint (across all micro-batches of the stream's
  * lifetime) flows through; every later occurrence drops. Where the batch
  * form anti-joins each ingest increment against a store-backed
  * fingerprint registry, the stream form keeps the registry in the state
  * store via `flatMapGroupsWithState`, so the filter is continuous and
  * exactly-once under checkpoint recovery.
  *
  * Scale shape: state is ONE empty record per distinct fingerprint,
  * hash-partitioned by the state store across executors — memory is
  * bounded by distinct content, not stream length, and an optional
  * processing-time TTL expires idle fingerprints for unbounded streams
  * (the dedup window then becomes "within `ttl`", the standard
  * trade-off). Within a single micro-batch the surviving representative
  * of a fingerprint is arbitrary (same contract as Spark's own
  * `dropDuplicates`); across batches the winner is strictly the earlier
  * batch's row.
  */
object StreamingDedup {

  /** First-seen filter on a fingerprint expression (e.g.
    * `md5Hash60(col("text"))`). Returns the deduplicated stream with the
    * fingerprint exposed as `_fingerprint`.
    */
  def firstSeen(df: DataFrame, fingerprint: Column,
      ttl: Option[String] = None): DataFrame = {
    // null fingerprints (e.g. a null text column) group under a sentinel
    // instead of NPE-ing the groupByKey extractor — the first null-content
    // row passes, later ones dedup against it, matching the batch twin's
    // null-as-one-dedup-class contract
    val withFp = df.withColumn("_fingerprint",
      coalesce(fingerprint.cast("long"), lit(Long.MinValue)))
    val schema = withFp.schema
    val fpIdx = schema.fieldIndex("_fingerprint")
    val rowEnc = Encoders.row(schema)
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val dedup = (fp: Long, rows: Iterator[Row], state: GroupState[Boolean]) => {
      if (state.hasTimedOut) {
        // idle fingerprint expired: drop the registry entry; the next
        // occurrence (if any) is treated as first-seen again
        state.remove()
        Iterator.empty[Row]
      } else {
        val out = if (state.exists) Iterator.empty[Row] else rows.take(1)
        state.update(true)
        ttl.foreach(state.setTimeoutDuration)
        out
      }
    }
    withFp
      .groupByKey((r: Row) => r.getLong(fpIdx))(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(dedup)(
        Encoders.scalaBoolean, rowEnc)
  }
}
