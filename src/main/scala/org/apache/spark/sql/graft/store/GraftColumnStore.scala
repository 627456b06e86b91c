package org.apache.spark.sql.graft.store

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** In-memory column store backing the `graftstore` DSv2 source — the
  * from-scratch analog of the reference's column-batch storage
  * (reference: encoders/.../columnar/ColumnBatch.scala:39 — sealed
  * columnar batches with a per-column stats row,
  * ColumnEncoding.scala:1011-1027 ColumnStatsSchema lower/upper/nullCount;
  * scan-side batch skipping ColumnTableScan.scala:900-980).
  *
  * v1 scope: append-only sealed batches (mutation goes through
  * GraftSession's snapshot tables), per-column min/max/nullCount stats
  * used by the scan to skip batches against pushed filters. Values are
  * stored column-major per batch, so reads serve Spark's vectorized
  * `ColumnarBatch` path without row pivoting.
  */
object GraftColumnStore {

  /** One sealed batch: column-major values + per-column stats.
    * Serializable: writer tasks ship sealed batches to the driver inside
    * their commit messages.
    */
  final case class ColumnStats(min: Any, max: Any, nullCount: Int)
  final class StoreBatch(
      val numRows: Int,
      val columns: Array[Array[Any]], // column-major, boxed (v1)
      val stats: Array[ColumnStats]) extends Serializable

  final class StoreTable(val name: String, val schema: StructType) {
    val batches: ArrayBuffer[StoreBatch] = ArrayBuffer.empty
    def addBatch(b: StoreBatch): Unit = synchronized { batches += b }
    def rowCount: Long = synchronized(batches.map(_.numRows.toLong).sum)
  }

  private val tables = TrieMap.empty[String, StoreTable]

  /** Scan-side telemetry: batches skipped by stats since JVM start
    * (asserted by specs to prove pruning actually happens).
    */
  val batchesSkipped = new AtomicLong(0)
  val batchesScanned = new AtomicLong(0)

  def createOrReplace(name: String, schema: StructType): StoreTable = {
    val t = new StoreTable(name, schema)
    tables.put(name, t)
    t
  }

  def getOrCreate(name: String, schema: StructType): StoreTable =
    tables.getOrElseUpdate(name, new StoreTable(name, schema))

  def get(name: String): Option[StoreTable] = tables.get(name)

  def drop(name: String): Unit = tables.remove(name)

  /** Builder used by writers: buffers rows, seals a batch every
    * `batchSize` rows (reference default 24 MB per batch; here row-count
    * sealed for simplicity).
    */
  final class BatchBuilder(schema: StructType, batchSize: Int) {
    private var buf = ArrayBuffer.empty[InternalRow]
    private val sealedBatches = ArrayBuffer.empty[StoreBatch]

    def add(row: InternalRow): Unit = {
      buf += row.copy()
      if (buf.length >= batchSize) seal()
    }

    def seal(): Unit = if (buf.nonEmpty) {
      val n = buf.length
      val fields = schema.fields
      val cols = Array.ofDim[Array[Any]](fields.length)
      val stats = Array.ofDim[ColumnStats](fields.length)
      var c = 0
      while (c < fields.length) {
        val dt = fields(c).dataType
        val vals = new Array[Any](n)
        var nulls = 0
        var min: Any = null
        var max: Any = null
        var i = 0
        while (i < n) {
          val v = if (buf(i).isNullAt(c)) null else buf(i).get(c, dt)
          vals(i) = v
          if (v == null) nulls += 1
          else {
            if (min == null || compare(dt, v, min) < 0) min = v
            if (max == null || compare(dt, v, max) > 0) max = v
          }
          i += 1
        }
        cols(c) = vals
        stats(c) = ColumnStats(min, max, nulls)
        c += 1
      }
      sealedBatches += new StoreBatch(n, cols, stats)
      buf = ArrayBuffer.empty[InternalRow]
    }

    def result(): Seq[StoreBatch] = { seal(); sealedBatches.toSeq }
  }

  def compare(dt: DataType, a: Any, b: Any): Int = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case StringType => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case BooleanType => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case _ => 0
  }
}
