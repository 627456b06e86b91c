package org.apache.spark.sql.graft.store

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource v2 front-end for [[GraftColumnStore]] — the Spark-idiomatic
  * rebuild of the reference's column-table scan/write path
  * (reference: ColumnTableScan batch-stats skipping
  * core/.../columnar/ColumnTableScan.scala:900-980, filter pushdown
  * StoreDataSourceStrategy.scala:55, writes ColumnInsertExec.scala:45).
  *
  * Capabilities: batch read (COLUMNAR — scans hand Spark `ColumnarBatch`es
  * directly, no row pivot), filter pushdown with per-batch min/max/null
  * stats skipping, column pruning (only requested vectors materialize),
  * batch write with append/truncate.
  *
  * Single-JVM scope (local mode): batches live in a JVM-wide registry —
  * on a real cluster this layer would sit over a distributed store with
  * one InputPartition per (node, batch) exactly as the reference's bucket
  * regions do; the planner-facing contract (pushdown, stats, columnar
  * reads) is identical.
  *
  * Usage:
  *   df.write.format("org.apache.spark.sql.graft.store.GraftColumnSource")
  *     .option("table", "t").mode("append").save()
  *   spark.read.format(...).option("table", "t").load()
  */
class GraftColumnSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val name = options.get("table")
    GraftColumnStore.get(name).map(_.schema)
      .getOrElse(throw new IllegalArgumentException(s"graftstore table not found: $name"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftTable(properties.get("table"), schema,
      Option(properties.get("batch_size")).map(_.toInt).getOrElse(4096))

  override def supportsExternalMetadata(): Boolean = true
}

class GraftTable(tableName: String, tableSchema: StructType, batchSize: Int)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftstore.$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableName, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(tableName, info.schema(), batchSize)
}

// ------------------------------- read path -------------------------------

class GraftScanBuilder(tableName: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // stats can only PRUNE batches, never fully evaluate a predicate →
    // accept everything for skipping but report all as residual so Spark
    // still applies the exact filter on the surviving rows
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftScan(tableName, fullSchema, required, pushed)
}

class GraftScan(tableName: String, fullSchema: StructType,
    required: StructType, filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftstore.$tableName pushed=[${filters.mkString(", ")}] cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val table = GraftColumnStore.get(tableName)
      .getOrElse(throw new IllegalStateException(s"graftstore table dropped: $tableName"))
    val all = table.batches.zipWithIndex
    val kept = all.filter { case (b, _) => BatchPruning.mightMatch(b, fullSchema, filters) }
    GraftColumnStore.batchesSkipped.addAndGet(all.size - kept.size)
    GraftColumnStore.batchesScanned.addAndGet(kept.size)
    kept.map { case (_, idx) =>
      GraftInputPartition(tableName, idx): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(tableName, fullSchema, required)
}

case class GraftInputPartition(tableName: String, batchIdx: Int) extends InputPartition

class GraftReaderFactory(tableName: String, fullSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException("columnar-only source")

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    val batch = GraftColumnStore.get(p.tableName).get.batches(p.batchIdx)
    new PartitionReader[ColumnarBatch] {
      private var consumed = false
      override def next(): Boolean = !consumed && { consumed = true; true }
      override def get(): ColumnarBatch = {
        val vectors: Array[ColumnVector] = required.fields.map { f =>
          val srcIdx = fullSchema.fieldIndex(f.name)
          val vec = new OnHeapColumnVector(batch.numRows, f.dataType)
          fill(vec, f.dataType, batch.columns(srcIdx), batch.numRows)
          vec: ColumnVector
        }
        new ColumnarBatch(vectors, batch.numRows)
      }
      override def close(): Unit = ()
    }
  }

  private def fill(vec: OnHeapColumnVector, dt: DataType, vals: Array[Any], n: Int): Unit = {
    var i = 0
    while (i < n) {
      val v = vals(i)
      if (v == null) vec.putNull(i)
      else dt match {
        case LongType | TimestampType | TimestampNTZType => vec.putLong(i, v.asInstanceOf[Long])
        case IntegerType | DateType => vec.putInt(i, v.asInstanceOf[Int])
        case DoubleType => vec.putDouble(i, v.asInstanceOf[Double])
        case FloatType => vec.putFloat(i, v.asInstanceOf[Float])
        case BooleanType => vec.putBoolean(i, v.asInstanceOf[Boolean])
        case StringType =>
          val b = v.asInstanceOf[UTF8String].getBytes
          vec.putByteArray(i, b, 0, b.length)
        case other => throw new UnsupportedOperationException(s"graftstore type: $other")
      }
      i += 1
    }
  }
}

/** Batch skipping: a batch survives unless its stats PROVE no row can
  * satisfy some pushed conjunct (reference ColumnTableScan stats filter).
  */
object BatchPruning {
  import GraftColumnStore.{compare, ColumnStats, StoreBatch}

  def mightMatch(b: StoreBatch, schema: StructType, filters: Array[Filter]): Boolean =
    filters.forall(f => mightMatchOne(b, schema, f))

  private def statsFor(b: StoreBatch, schema: StructType, col: String): Option[(ColumnStats, DataType)] = {
    val idx = schema.fieldNames.indexOf(col)
    if (idx < 0) None else Some((b.stats(idx), schema.fields(idx).dataType))
  }

  /** External (Filter) value → internal stats value. */
  private def internal(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (StringType, s: String) => Some(UTF8String.fromString(s))
    case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
      Some(DateTimeUtils.fromJavaTimestamp(t))
    case (TimestampType | TimestampNTZType, t: java.time.Instant) =>
      Some(DateTimeUtils.instantToMicros(t))
    case (TimestampNTZType, t: java.time.LocalDateTime) =>
      Some(DateTimeUtils.localDateTimeToMicros(t))
    case (LongType, n: Number) => Some(n.longValue())
    case (IntegerType, n: Number) => Some(n.intValue())
    case (DoubleType, n: Number) => Some(n.doubleValue())
    case (FloatType, n: Number) => Some(n.floatValue())
    case (BooleanType, bb: java.lang.Boolean) => Some(bb.booleanValue())
    case _ => None
  }

  private def mightMatchOne(b: StoreBatch, schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(c, v) => check(b, schema, c, v) { (dt, st, iv) =>
      st.min == null || (compare(dt, iv, st.min) >= 0 && compare(dt, iv, st.max) <= 0)
    }
    case GreaterThan(c, v) => check(b, schema, c, v) { (dt, st, iv) =>
      st.max == null || compare(dt, st.max, iv) > 0
    }
    case GreaterThanOrEqual(c, v) => check(b, schema, c, v) { (dt, st, iv) =>
      st.max == null || compare(dt, st.max, iv) >= 0
    }
    case LessThan(c, v) => check(b, schema, c, v) { (dt, st, iv) =>
      st.min == null || compare(dt, st.min, iv) < 0
    }
    case LessThanOrEqual(c, v) => check(b, schema, c, v) { (dt, st, iv) =>
      st.min == null || compare(dt, st.min, iv) <= 0
    }
    case IsNull(c) =>
      statsFor(b, schema, c).forall(_._1.nullCount > 0)
    case IsNotNull(c) =>
      statsFor(b, schema, c).forall(_._1.nullCount < b.numRows)
    case And(l, r) => mightMatchOne(b, schema, l) && mightMatchOne(b, schema, r)
    case Or(l, r) => mightMatchOne(b, schema, l) || mightMatchOne(b, schema, r)
    case In(c, vs) => vs.exists(v => mightMatchOne(b, schema, EqualTo(c, v)))
    case _ => true // unknown predicate: cannot prune
  }

  private def check(b: StoreBatch, schema: StructType, c: String, v: Any)(
      p: (DataType, ColumnStats, Any) => Boolean): Boolean =
    statsFor(b, schema, c) match {
      case Some((st, dt)) => internal(dt, v) match {
        case Some(iv) => st.nullCount == b.numRows || p(dt, st, iv)
        case None => true
      }
      case None => true
    }
}

// ------------------------------- write path ------------------------------

class GraftWriteBuilder(tableName: String, writeSchema: StructType, batchSize: Int)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftBatchWrite(tableName, writeSchema, batchSize, doTruncate)
  }
}

class GraftBatchWrite(tableName: String, schema: StructType, batchSize: Int, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(schema, batchSize)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val table =
      if (truncate) GraftColumnStore.createOrReplace(tableName, schema)
      else GraftColumnStore.getOrCreate(tableName, schema)
    messages.foreach {
      case GraftCommit(batches) => batches.foreach(table.addBatch)
      case _ =>
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class GraftCommit(batches: Seq[GraftColumnStore.StoreBatch])
    extends WriterCommitMessage

class GraftWriterFactory(schema: StructType, batchSize: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val builder = new GraftColumnStore.BatchBuilder(schema, batchSize)
      override def write(record: InternalRow): Unit = builder.add(record)
      override def commit(): WriterCommitMessage = GraftCommit(builder.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
