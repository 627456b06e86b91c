package org.apache.spark.sql.graft.store

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Dictionary-code hash join: the store-side rebuild of the reference's
  * `DictionaryOptimizedMapAccessor` (core/.../execution/
  * DictionaryOptimizedMapAccessor.scala:26-50 — "string dictionary
  * optimization for joins": when the stream-side key column is
  * dictionary encoded, the join's hash-map lookup is computed once per
  * DICTIONARY CODE and reused for every row carrying that code, instead
  * of hashing the string per row).
  *
  * Spark-first shape: the graft column scan already surfaces dict/RLE
  * string columns as dictionary-id vectors (`GraftColumnSource.decode`),
  * so the probe side here walks the scan's OWN `ColumnarBatch`es and
  * memoizes build-map lookups per (batch, code). Per probe row the work
  * is an int read + array deref — no UTF8String materialization, no
  * murmur hash. Plain-encoded batches (high-cardinality columns the
  * ingest left unencoded) fall back to the per-row lookup inline, so the
  * operator is correct for any column.
  *
  * Contract (the broadcast-hash-join shape): INNER equi-join, build side
  * small enough to collect and broadcast — the same smallness the
  * reference assumes for its replicated-dimension joins. Output columns:
  * every probe column, then every build column except `buildKey` (the
  * USING-join projection). At 100 TB the probe side never moves: the
  * join runs inside the scan's partitions (bucket locality preserved),
  * and only the dimension broadcast ships.
  *
  * This is the explicit-operator form of the mechanism; a planner
  * `Strategy` could pattern-match Join(managed scan, small dim) to apply
  * it transparently, but an explicit call keeps the 154-query surface's
  * plans byte-stable while the mechanism is proven (StoreBench measures
  * it; DictJoinSpec pins A/B equality with the Spark join).
  */
object DictJoin {

  def dictJoin(spark: SparkSession, table: String, key: String,
      build: DataFrame, buildKey: String): DataFrame = {
    val probe = GraftStoreOps.read(spark, table)
    val probeSchema = probe.schema
    require(probeSchema.fieldNames.contains(key),
      s"dictJoin: probe column '$key' not in ${probeSchema.fieldNames.mkString(",")}")
    require(probeSchema(key).dataType == StringType,
      s"dictJoin: the dictionary fast path is for STRING keys, got ${probeSchema(key).dataType}")
    val buildSchema = build.schema
    val buildKeyIdx = buildSchema.fieldIndex(buildKey)
    require(buildSchema(buildKeyIdx).dataType == StringType,
      s"dictJoin: build key '$buildKey' must be STRING")

    // the scan's columnar batches, straight from the DSv2 exec (no
    // ColumnarToRow in between — the whole point is reading the
    // dictionary-id vectors before row materialization)
    val scanExec = probe.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(sys.error(s"dictJoin: no columnar scan for $table"))
    val keyIdx = scanExec.output.indexWhere(_.name == key)
    val nProbe = scanExec.output.size

    // build-side hash map: UTF8String key -> matching build rows (keys
    // with no match are simply absent — inner join)
    val buildRows = build.queryExecution.executedPlan.executeCollect()
    val map = new java.util.HashMap[UTF8String, Array[InternalRow]](buildRows.length * 2)
    buildRows.foreach { r =>
      if (!r.isNullAt(buildKeyIdx)) {
        val k = r.getUTF8String(buildKeyIdx).clone()
        val prev = map.get(k)
        val row = r.copy()
        map.put(k, if (prev == null) Array[InternalRow](row) else prev :+ row)
      }
    }
    val bcast: Broadcast[java.util.HashMap[UTF8String, Array[InternalRow]]] =
      spark.sparkContext.broadcast(map)

    val outSchema = StructType(probeSchema.fields ++
      buildSchema.fields.zipWithIndex.collect { case (f, i) if i != buildKeyIdx => f })
    val probeTypes = probeSchema.fields.map(_.dataType)
    val buildTypes = buildSchema.fields.map(_.dataType)
    val outExprs = probeTypes.indices.map(i =>
        BoundReference(i, probeTypes(i), nullable = true)) ++
      buildTypes.indices.filter(_ != buildKeyIdx).map(j =>
        BoundReference(nProbe + j, buildTypes(j), nullable = true))

    val rdd = scanExec.executeColumnar().mapPartitions { batches =>
      val lookup = bcast.value
      val proj = UnsafeProjection.create(outExprs.toArray)
      val joined = new JoinedRow
      val empty = Array.empty[InternalRow]
      batches.flatMap { cb =>
        val keyVec = cb.column(keyIdx)
        val dictIds = keyVec match {
          case w: WritableColumnVector if w.hasDictionary => w.getDictionaryIds
          case _ => null
        }
        // per-batch code -> matches memo; codes are small ints (dict
        // positions), so an int-keyed open map would also do — the
        // boxed map is off the per-row path after the first hit
        val memo = if (dictIds == null) null
          else new java.util.HashMap[Integer, Array[InternalRow]]()
        val rows = cb.rowIterator()
        new Iterator[UnsafeRow] {
          private var rowId = -1
          private var matches: Array[InternalRow] = empty
          private var mi = 0
          private var probeRow: InternalRow = _
          private def advance(): Unit = {
            while (mi >= matches.length && rows.hasNext) {
              val r = rows.next()
              rowId += 1
              if (!r.isNullAt(keyIdx)) {
                val m =
                  if (memo != null) {
                    val c = Integer.valueOf(dictIds.getInt(rowId))
                    var arr = memo.get(c)
                    if (arr == null) {
                      arr = lookup.getOrDefault(r.getUTF8String(keyIdx), empty)
                      memo.put(c, arr)
                    }
                    arr
                  } else lookup.getOrDefault(r.getUTF8String(keyIdx), empty)
                if (m.nonEmpty) { matches = m; mi = 0; probeRow = r }
              }
            }
          }
          override def hasNext: Boolean = { advance(); mi < matches.length }
          override def next(): UnsafeRow = {
            advance()
            val out = proj(joined(probeRow, matches(mi)))
            mi += 1
            // rows feed a LogicalRDD scan, whose contract wants stable
            // rows (the projection buffer is reused per partition)
            out.copy()
          }
        }
      }
    }
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd.asInstanceOf[org.apache.spark.rdd.RDD[InternalRow]], outSchema)
  }
}
