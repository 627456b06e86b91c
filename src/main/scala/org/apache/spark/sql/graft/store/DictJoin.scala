package org.apache.spark.sql.graft.store

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch
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
  * Contract (the broadcast-hash-join shape): INNER, LEFT OUTER, LEFT
  * SEMI or LEFT ANTI equi-join (`joinType = "inner" | "left_outer" |
  * "left_semi" | "left_anti"` — all the build-legal shapes, the span the
  * reference's `HashJoinExec.scala:54` covers), build side small enough
  * to collect and broadcast — the same smallness the reference assumes
  * for its replicated-dimension joins. Output columns: every probe
  * column, then every build column except `buildKey` (the USING-join
  * projection); semi/anti output the probe columns alone. At 100 TB the probe side never moves: the
  * join runs inside the scan's partitions (bucket locality preserved),
  * and only the dimension broadcast ships.
  *
  * [[DictJoinStrategy]] applies the same mechanism transparently (via
  * [[DictJoinExec]]) to ordinary `df.join(dim, key)` calls when opted in;
  * the explicit operator keeps working regardless of the conf.
  */
object DictJoin {

  /** UTF8String key -> matching rows, from collected build rows (keys
    * with no match are simply absent — inner join).
    */
  private[store] def buildKeyMap(rows: Array[InternalRow], keyIdx: Int)
      : java.util.HashMap[UTF8String, Array[InternalRow]] = {
    val map = new java.util.HashMap[UTF8String, Array[InternalRow]](rows.length * 2)
    rows.foreach { r =>
      if (!r.isNullAt(keyIdx)) {
        val k = r.getUTF8String(keyIdx).clone()
        val prev = map.get(k)
        val row = r.copy()
        map.put(k, if (prev == null) Array[InternalRow](row) else prev :+ row)
      }
    }
    map
  }

  /** Memoized probe over ONE columnar batch: the build-map lookup runs
    * once per (batch, dictionary code) when the key vector is
    * dictionary-backed, per row otherwise. `emit` shapes each output
    * (projection / copy policy differs per caller). With `nullBuild ==
    * null` the join is INNER (null keys and misses drop); passing an
    * all-null build-side row makes it LEFT OUTER (every probe row
    * emits, misses extend with `nullBuild`).
    */
  private[store] def probeBatch(
      cb: ColumnarBatch, keyIdx: Int,
      lookup: java.util.HashMap[UTF8String, Array[InternalRow]],
      emit: (InternalRow, InternalRow) => InternalRow,
      nullBuild: InternalRow = null): Iterator[InternalRow] = {
    val keyVec = cb.column(keyIdx)
    val dictIds = keyVec match {
      case w: WritableColumnVector if w.hasDictionary => w.getDictionaryIds
      case _ => null
    }
    // per-batch code -> matches memo; codes are small ints (dict
    // positions), so an int-keyed open map would also do — the boxed
    // map is off the per-row path after the first hit
    val memo = if (dictIds == null) null
      else new java.util.HashMap[Integer, Array[InternalRow]]()
    val rows = cb.rowIterator()
    val empty = Array.empty[InternalRow]
    val nullMatch = if (nullBuild == null) null else Array(nullBuild)
    new Iterator[InternalRow] {
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
            else if (nullMatch != null) { matches = nullMatch; mi = 0; probeRow = r }
          } else if (nullMatch != null) { matches = nullMatch; mi = 0; probeRow = r }
        }
      }
      override def hasNext: Boolean = { advance(); mi < matches.length }
      override def next(): InternalRow = {
        advance()
        val out = emit(probeRow, matches(mi))
        mi += 1
        out
      }
    }
  }

  /** Memoized EXISTENCE probe over one columnar batch — the semi/anti
    * arm of [[probeBatch]]: the build-map membership test runs once per
    * (batch, dictionary code) when the key vector is dictionary-backed,
    * per row otherwise, and each probe row emits at most once. With
    * `keepMatched = true` (LEFT SEMI) rows whose non-null key has a
    * build match survive; with `keepMatched = false` (LEFT ANTI) rows
    * with a null key or no match survive — exactly Spark's
    * LeftSemi/LeftAnti semantics for an equi-condition (a null key never
    * matches, so anti keeps it).
    */
  private[store] def probeBatchExists(
      cb: ColumnarBatch, keyIdx: Int,
      lookup: java.util.HashMap[UTF8String, Array[InternalRow]],
      keepMatched: Boolean,
      emit: InternalRow => InternalRow): Iterator[InternalRow] = {
    val keyVec = cb.column(keyIdx)
    val dictIds = keyVec match {
      case w: WritableColumnVector if w.hasDictionary => w.getDictionaryIds
      case _ => null
    }
    val memo = if (dictIds == null) null
      else new java.util.HashMap[Integer, java.lang.Boolean]()
    val rows = cb.rowIterator()
    new Iterator[InternalRow] {
      private var rowId = -1
      private var pending: InternalRow = _
      private def matched(r: InternalRow): Boolean =
        if (r.isNullAt(keyIdx)) false
        else if (memo != null) {
          val c = Integer.valueOf(dictIds.getInt(rowId))
          var m = memo.get(c)
          if (m == null) {
            m = java.lang.Boolean.valueOf(
              lookup.containsKey(r.getUTF8String(keyIdx)))
            memo.put(c, m)
          }
          m.booleanValue()
        } else lookup.containsKey(r.getUTF8String(keyIdx))
      private def advance(): Unit =
        while (pending == null && rows.hasNext) {
          val r = rows.next()
          rowId += 1
          if (matched(r) == keepMatched) pending = r
        }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): InternalRow = {
        advance()
        val out = emit(pending)
        pending = null
        out
      }
    }
  }

  def dictJoin(spark: SparkSession, table: String, key: String,
      build: DataFrame, buildKey: String, joinType: String = "inner"): DataFrame = {
    // existence: semi = Some(true), anti = Some(false); None = row-join
    val (existence: Option[Boolean], outer: Boolean) =
      joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "") match {
        case "inner" => (None, false)
        case "left" | "leftouter" => (None, true)
        case "leftsemi" | "semi" => (Some(true), false)
        case "leftanti" | "anti" => (Some(false), false)
        case other => sys.error(
          s"dictJoin: joinType must be inner, left_outer, left_semi or left_anti, got '$other'")
      }
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

    val map = buildKeyMap(build.queryExecution.executedPlan.executeCollect(), buildKeyIdx)
    val bcast: Broadcast[java.util.HashMap[UTF8String, Array[InternalRow]]] =
      spark.sparkContext.broadcast(map)

    val probeTypes = probeSchema.fields.map(_.dataType)
    // semi/anti output the probe columns only (the build side is a
    // filter, never a projection source)
    val outSchema =
      if (existence.isDefined) probeSchema
      else StructType(probeSchema.fields ++
        buildSchema.fields.zipWithIndex.collect { case (f, i) if i != buildKeyIdx =>
          if (outer) f.copy(nullable = true) else f })
    val buildTypes = buildSchema.fields.map(_.dataType)
    val probeExprs = probeTypes.indices.map(i =>
      BoundReference(i, probeTypes(i), nullable = true))
    val outExprs = probeExprs ++
      buildTypes.indices.filter(_ != buildKeyIdx).map(j =>
        BoundReference(nProbe + j, buildTypes(j), nullable = true))

    val nBuildFields = buildSchema.length
    // rows feed a LogicalRDD scan, whose contract wants stable rows
    // (the projection buffer is reused per partition) — hence copy()
    val rdd = existence match {
      case Some(keepMatched) =>
        scanExec.executeColumnar().mapPartitions { batches =>
          val lookup = bcast.value
          val proj = UnsafeProjection.create(probeExprs.toArray)
          batches.flatMap(cb =>
            probeBatchExists(cb, keyIdx, lookup, keepMatched, p => proj(p).copy()))
        }
      case None =>
        scanExec.executeColumnar().mapPartitions { batches =>
          val lookup = bcast.value
          val proj = UnsafeProjection.create(outExprs.toArray)
          val joined = new JoinedRow
          val nullBuild = if (outer) new GenericInternalRow(nBuildFields) else null
          batches.flatMap(cb =>
            probeBatch(cb, keyIdx, lookup, (p, b) => proj(joined(p, b)).copy(), nullBuild))
        }
    }
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, outSchema)
  }

  /** Join→group pipeline that keeps dictionary codes END-TO-END — the
    * composition the reference gets from one map accessor serving both
    * its join and its group-by (`DictionaryOptimizedMapAccessor.scala:26`,
    * reused by `HashJoinExec` and `SnappyHashAggregateExec`): a probe
    * row's key string is never materialized between the two operators.
    *
    * Spark-first, the same end state falls out of operator REORDERING
    * rather than operator fusion: for the canonical dimension shape
    * `fact ⋈ dim ON k GROUP BY k, dim.attrs` with aggregates over fact
    * columns and a UNIQUE dim key, aggregation commutes through the
    * join. So this runs the group-by directly ON the scan — where the
    * dictionary-grouping pushdown ([[GraftAggScan]], when enabled)
    * accumulates per batch into code-indexed slots, reading only
    * dictionary ids — and joins the METADATA-SCALE result (one row per
    * distinct key) with the dimension afterwards. Codes survive until
    * the per-group result rows, which is strictly later than the
    * reference achieves (its probe still materializes output rows per
    * FACT row; here the string key materializes once per GROUP).
    *
    * `aggs` must reference only fact columns (checked); `extraGroup`
    * may add more fact grouping columns. The dim key must be unique —
    * with duplicate dim keys the reorder is invalid (join-then-group
    * multiplies fact rows per duplicate) and the call fails fast.
    * Output: group columns, then `aggs`, then the dim's other columns.
    *
    * At 100 TB: the fact side never shuffles strings — one partial-agg
    * pass over the scan (code-indexed under pushdown), a distinct-keys
    * sized exchange, and a broadcast of the dimension.
    */
  def dictJoinAgg(spark: SparkSession, table: String, key: String,
      build: DataFrame, buildKey: String,
      aggs: Seq[org.apache.spark.sql.Column],
      extraGroup: Seq[String] = Nil,
      requireUniqueBuild: Boolean = true): DataFrame = {
    require(aggs.nonEmpty, "dictJoinAgg: need at least one aggregate")
    val probe = GraftStoreOps.read(spark, table)
    // fact-columns-only check: the aggregates must analyze against the
    // probe ALONE — a build-side reference means the reorder is invalid
    // (aggregate after the join instead)
    try probe.groupBy(key, extraGroup: _*).agg(aggs.head, aggs.tail: _*)
      .queryExecution.analyzed
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          "dictJoinAgg: aggregates/groups must use fact columns only — " +
            s"a reference does not resolve against '$table' (likely a " +
            s"build side column; aggregate after the join instead): ${e.getMessage}")
    }
    // the reorder is invalid under duplicate dim keys (join-then-group
    // multiplies fact rows per duplicate). The check is one tiny job
    // over the dimension; callers with a KNOWN primary key (validated
    // at dimension load, not per query) can skip it — at micro-bench
    // scale the extra job costs more than the reorder saves
    // (StoreBench's validate=on/off arms).
    if (requireUniqueBuild) {
      val dupKeys = build.groupBy(col(buildKey)).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dupKeys.isEmpty,
        s"dictJoinAgg: build key '$buildKey' is not unique " +
          s"(e.g. ${dupKeys.head.get(0)}) — aggregation does not commute " +
          "through a multiplying join")
    }
    val grouped = probe.groupBy(key, extraGroup: _*).agg(aggs.head, aggs.tail: _*)
    grouped.join(org.apache.spark.sql.functions.broadcast(build),
        grouped(key) === build(buildKey), "inner")
      .drop(build(buildKey))
  }
}

/** Physical dictionary-code join: same per-(batch, code) memoized probe
  * as [[DictJoin.dictJoin]] (shared [[DictJoin.probeBatch]] kernel), but
  * as a planner-integrated `SparkPlan` so the fast path applies to
  * ordinary `df.join(dim, key)` calls (INNER, LEFT OUTER, LEFT SEMI and
  * LEFT ANTI — all the build-legal dimension-join shapes, the same span
  * the reference's `HashJoinExec.scala:54` handles; semi/anti run an
  * existence-only probe memoized per code, no output-row fan-out). Standard join output (all columns of
  * both sides; right side nullable under LEFT OUTER); build side is
  * collected and broadcast (the strategy only fires under the
  * autoBroadcastJoinThreshold, the same gate Spark's own BHJ uses).
  * Output rows are UnsafeRows from a reused projection buffer — the
  * usual SparkPlan contract (buffering consumers copy), and safe for
  * consumers that cast to UnsafeRow (executeCollect, shuffle writers).
  */
case class DictJoinExec(streamKeyIdx: Int, buildKeyIdx: Int,
    left: org.apache.spark.sql.execution.SparkPlan,
    right: org.apache.spark.sql.execution.SparkPlan,
    joinType: org.apache.spark.sql.catalyst.plans.JoinType =
      org.apache.spark.sql.catalyst.plans.Inner)
    extends org.apache.spark.sql.execution.SparkPlan {
  import org.apache.spark.sql.catalyst.expressions.Attribute
  import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter, LeftSemi}

  private def outer: Boolean = joinType == LeftOuter
  // semi = Some(true), anti = Some(false): existence-only probe, output
  // is the stream side alone
  private def existence: Option[Boolean] = joinType match {
    case LeftSemi => Some(true)
    case LeftAnti => Some(false)
    case _ => None
  }

  override def children: Seq[org.apache.spark.sql.execution.SparkPlan] = Seq(left, right)
  override def output: Seq[Attribute] =
    if (existence.isDefined) left.output
    else left.output ++
      (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[org.apache.spark.sql.execution.SparkPlan]): DictJoinExec =
    copy(left = c(0), right = c(1))

  override protected def doExecute(): org.apache.spark.rdd.RDD[InternalRow] = {
    val map = DictJoin.buildKeyMap(right.executeCollect(), buildKeyIdx)
    val bcast = sparkContext.broadcast(map)
    val keyIdx = streamKeyIdx
    val outTypes = output.map(_.dataType).toArray
    val nBuildFields = right.output.size
    val isOuter = outer
    // Spark's transition rule wraps the columnar scan in ColumnarToRow
    // (custom execs can't declare columnar input); unwrap the pure
    // pass-through so the probe reads the dictionary-id vectors the
    // whole mechanism is about.
    val columnarChild: Option[org.apache.spark.sql.execution.SparkPlan] = left match {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.child match {
        case c: org.apache.spark.sql.execution.ColumnarToRowExec
            if c.child.supportsColumnar => Some(c.child)
        case _ => None
      }
      case c: org.apache.spark.sql.execution.ColumnarToRowExec
          if c.child.supportsColumnar => Some(c.child)
      case s if s.supportsColumnar => Some(s)
      case _ => None
    }
    val exist = existence
    if (columnarChild.isEmpty) {
      // row-producing child (planner interposed something): plain
      // per-row lookups, still broadcast-shaped
      return left.execute().mapPartitionsInternal { rows =>
        val lookup = bcast.value
        val proj = UnsafeProjection.create(outTypes)
        exist match {
          case Some(keepMatched) =>
            rows.filter(r => (!r.isNullAt(keyIdx) &&
              lookup.containsKey(r.getUTF8String(keyIdx))) == keepMatched)
              .map(proj)
          case None =>
            val joined = new JoinedRow
            val nullBuild: InternalRow =
              if (isOuter) new GenericInternalRow(nBuildFields) else null
            rows.flatMap { r =>
              if (r.isNullAt(keyIdx)) {
                if (isOuter) Iterator.single(proj(joined(r, nullBuild)))
                else Iterator.empty
              } else {
                val m = lookup.get(r.getUTF8String(keyIdx))
                if (m == null) {
                  if (isOuter) Iterator.single(proj(joined(r, nullBuild)))
                  else Iterator.empty
                }
                else if (m.length == 1) Iterator.single(proj(joined(r, m(0))))
                else m.iterator.map(b => proj(joined(r, b)))
              }
            }
        }
      }
    }
    columnarChild.get.executeColumnar().mapPartitionsInternal { batches =>
      val lookup = bcast.value
      val proj = UnsafeProjection.create(outTypes)
      exist match {
        case Some(keepMatched) =>
          batches.flatMap(cb =>
            DictJoin.probeBatchExists(cb, keyIdx, lookup, keepMatched, proj))
        case None =>
          val joined = new JoinedRow
          val nullBuild: InternalRow =
            if (isOuter) new GenericInternalRow(nBuildFields) else null
          batches.flatMap(cb =>
            DictJoin.probeBatch(cb, keyIdx, lookup, (p, b) => proj(joined(p, b)),
              nullBuild))
      }
    }
  }
}

/** Planner strategy (`spark.sql.graft.dictJoin = false | auto | true`):
  * rewrites `Join(Inner | LeftOuter | LeftSemi | LeftAnti,
  * probeKey = buildKey)` to [[DictJoinExec]] when the probe side is
  * EXACTLY a graft column-store scan (bare DSv2 relation — any
  * interposed Project/Filter keeps Spark's planning), the key is a
  * string column, and the build side fits the broadcast threshold.
  *
  * Modes (default `auto`):
  *  - `false` — off; every query plans byte-identically to stock Spark.
  *  - `auto` — cost-gated: additionally requires the probe key column to
  *    actually BE dictionary-encoded in the store
  *    ([[GraftColumnStore.likelyDictEncoded]], sampled from resident
  *    batches only). A plain-encoded high-cardinality key gains nothing
  *    from per-code memoization and would leave whole-stage codegen for
  *    no win, so auto declines and Spark's BHJ plans as usual.
  *  - `true` — fire on every legal shape (the per-row fallback inside
  *    [[DictJoinExec]] keeps plain-encoded batches correct); StoreBench
  *    and DictJoinSpec exercise this path explicitly.
  */
object DictJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
  import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi}
  import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

  val CONF_KEY = "spark.sql.graft.dictJoin"
  // default flipped to auto after the r8 experiment: PlanDiff proved all
  // 203 suite queries plan identically (normalized) under auto vs false,
  // and DictJoinSpec pins that auto fires exactly on dict-encoded keys
  // (PERF_NOTES §19)
  val DEFAULT_MODE = "auto"

  override def apply(plan: LogicalPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    // tolerate the historical booleans; any unrecognized value = off
    val mode = conf.getConfString(CONF_KEY, DEFAULT_MODE).toLowerCase
    if (mode != "true" && mode != "auto") return Nil
    plan match {
      case Join(l, r, jt,
          Some(EqualTo(a: AttributeReference, b: AttributeReference)), _)
          if jt == Inner || jt == LeftOuter || jt == LeftSemi || jt == LeftAnti =>
        // The optimizer interposes Filter(isnotnull(key)) above the scan
        // for inner joins (the predicate is also already pushed INTO the
        // scan, so the retained node is a residual re-check). DictJoinExec
        // skips null probe keys inherently, so exactly that filter is
        // absorbed; any other interposed node keeps Spark's planning.
        val (scanRel, graftScan, residual) = l match {
          case s @ DataSourceV2ScanRelation(_, g: GraftScan, _, _, _) =>
            (s, g, None)
          case org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
              s @ DataSourceV2ScanRelation(_, g: GraftScan, _, _, _)) =>
            (s, g, Some(cond))
          case _ => return Nil
        }
        val (pk, bk) =
          if (scanRel.outputSet.contains(a) && r.outputSet.contains(b)) (a, b)
          else if (scanRel.outputSet.contains(b) && r.outputSet.contains(a)) (b, a)
          else return Nil
        // LEFT OUTER and LEFT ANTI keep null-key probe rows (outer
        // null-extends them, anti emits them — a null key never equals
        // anything), so an interposed IsNotNull filter must NOT be
        // absorbed for those — and the optimizer doesn't interpose one
        // for them anyway. Inner and semi drop null keys inherently, so
        // exactly that filter is absorbed.
        val filterAbsorbable =
          if (jt == LeftOuter || jt == LeftAnti) residual.isEmpty
          else residual.forall { cond =>
            splitConjunctivePredicates(cond).forall {
              case org.apache.spark.sql.catalyst.expressions.IsNotNull(
                  x: AttributeReference) => x.exprId == pk.exprId
              case _ => false
            }
          }
        if (!filterAbsorbable) return Nil
        if (pk.dataType != StringType) return Nil
        if (r.stats.sizeInBytes > conf.autoBroadcastJoinThreshold) return Nil
        // auto mode's cost gate: only fire when the per-code memoization
        // has codes to work with — the probe key must actually be
        // dict-encoded in the store (resident-batch majority)
        if (mode == "auto" &&
            !GraftColumnStore.likelyDictEncoded(graftScan.table, pk.name)) return Nil
        val keyIdx = scanRel.output.indexWhere(_.exprId == pk.exprId)
        val buildIdx = r.output.indexWhere(_.exprId == bk.exprId)
        if (keyIdx < 0 || buildIdx < 0) return Nil
        DictJoinExec(keyIdx, buildIdx, planLater(scanRel), planLater(r), jt) :: Nil
      case _ => Nil
    }
  }
}
