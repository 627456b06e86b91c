package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Count-Min-Sketch + candidate-heap buffer for approximate heavy hitters.
  *
  * Rebuild of the reference's TopK structure semantics
  * (reference: core/.../execution/TopK.scala:20 stub + TimeEpoch.scala:22,
  * API SnappySession.createApproxTSTopK:958 — implementation closed-source;
  * this is the textbook CMS+heap design from the public Cormode-
  * Muthukrishnan paper the docs cite). Time bucketing comes from grouping
  * by `window(ts, interval)` outside the aggregate, which reproduces the
  * Hokusai-style per-epoch sketches.
  *
  * Candidate pool is `poolFactor × k` so merges between partitions don't
  * prematurely drop border keys.
  */
final class CmsTopKBuffer(val width: Int, val depth: Int, val k: Int,
    val empty: Boolean = false) {
  // `empty` marks a merge-side buffer that has adopted no sketch yet —
  // an EXPLICIT flag, not a dimension sentinel: a genuine width-1 or
  // depth-1 sketch (degenerate but constructible) must never be
  // conflated with "nothing merged yet" and silently dropped.
  val counts: Array[Long] = new Array[Long](width * depth)
  val candidates: mutable.HashMap[String, Long] = mutable.HashMap.empty
  // Generous pool: tie-groups at the rank-k boundary survive partial
  // merges only if all tied keys are still in the pool when the final
  // (count desc, key asc) cut happens.
  private val pool = math.max(256, 8 * k)

  private def rowHash(key: String, row: Int): Int = {
    // splitmix64 over (key hash, row) — deterministic across JVMs.
    var z = key.hashCode.toLong + 0x9e3779b97f4a7c15L * (row + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (((z ^ (z >>> 31)) & Long.MaxValue) % width).toInt
  }

  def estimate(key: String): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      est = math.min(est, counts(r * width + rowHash(key, r)))
      r += 1
    }
    est
  }

  def add(key: String, n: Long = 1L): Unit = {
    var r = 0
    while (r < depth) {
      counts(r * width + rowHash(key, r)) += n
      r += 1
    }
    refreshCandidate(key)
  }

  // Lazily-tracked pool minimum: the hot path at high distinct-key rates
  // is "pool full, unseen tail key, est <= pool min" — with a valid
  // cached min that is a single comparison with zero allocations, where
  // a per-row minBy was an O(pool) scan allocating a tuple per entry
  // (the q_approx_topk_ts GC amplifier, VERDICT r5 #3). The cache
  // invalidates only when the min entry itself moves (eviction, or the
  // min key's own count growing), so rescans are amortized over many
  // adds. Eviction order is unchanged: smallest est, ties by key asc.
  private var minValid = false
  private var minKey: String = _
  private var minEst = 0L

  private def rescanMin(): Unit = {
    var mk: String = null
    var me = Long.MaxValue
    candidates.foreachEntry { (ck, ce) =>
      if (ce < me || (ce == me && (mk == null || ck < mk))) { mk = ck; me = ce }
    }
    minKey = mk; minEst = me; minValid = true
  }

  private def refreshCandidate(key: String): Unit = {
    val est = estimate(key)
    if (candidates.size < pool) {
      val prev = candidates.put(key, est)
      if (minValid) {
        if (prev.isDefined && key == minKey) minValid = false
        else if (est < minEst || (est == minEst && key < minKey)) {
          minKey = key; minEst = est
        }
      }
    } else if (candidates.contains(key)) {
      candidates.update(key, est)
      if (minValid && key == minKey) minValid = false
    } else {
      if (!minValid) rescanMin()
      if (est > minEst) {
        candidates.remove(minKey)
        candidates.update(key, est)
        minValid = false
      }
    }
  }

  def merge(o: CmsTopKBuffer): Unit = {
    // counters add cell-by-cell, so the layouts must be identical —
    // mixing sketch widths (e.g. state tables built under different
    // width settings) would otherwise index out of bounds or, worse,
    // silently add counts for DIFFERENT hash cells
    require(o.width == width && o.depth == depth,
      s"CMS merge: incompatible sketch dimensions (${width}x$depth vs " +
        s"${o.width}x${o.depth}) — sketches in one merge must be built " +
        "with identical width/depth")
    minValid = false
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
    // Re-estimate every candidate against the merged sketch, keep pool.
    val all = (candidates.keySet ++ o.candidates.keySet).toSeq
    candidates.clear()
    all.foreach { key => candidates.update(key, estimate(key)) }
    if (candidates.size > pool) {
      val keep = candidates.toSeq.sortBy { case (key, est) => (-est, key) }.take(pool)
      candidates.clear()
      keep.foreach { case (key, est) => candidates.update(key, est) }
    }
  }

  /** Top-k (key, count), count desc then key asc. */
  def topK: Seq[(String, Long)] =
    candidates.toSeq.sortBy { case (key, est) => (-est, key) }.take(k)

  /** Hokusai "item aggregation" width decay: fold this sketch to
    * `targetWidth` (any divisor of `width`) by summing the cells of each
    * residue class mod target. Because the row hash indexes by
    * `H(key,row) % width`, and (H % width) % target == H % target when
    * target divides width, the folded array is CELL-FOR-CELL IDENTICAL
    * to a sketch built directly at the target width over the same rows
    * (CmsTopKSpec pins that equality) — so the CMS overestimate
    * guarantee survives, with the error bound widened by width/target.
    * Memory shrinks by the same factor: aged epochs keep answering
    * range queries at geometrically decaying cost, the Hokusai trade.
    */
  def foldTo(targetWidth: Int): CmsTopKBuffer = {
    require(targetWidth > 0 && width % targetWidth == 0,
      s"CMS decay: target width $targetWidth must divide sketch width $width")
    if (targetWidth == width) return this
    val nb = new CmsTopKBuffer(targetWidth, depth, k)
    var r = 0
    while (r < depth) {
      var j = 0
      while (j < width) {
        nb.counts(r * targetWidth + j % targetWidth) += counts(r * width + j)
        j += 1
      }
      r += 1
    }
    // the candidate pool carries over, re-estimated against the folded
    // cells (estimates can only grow — more collisions, same guarantee)
    candidates.keysIterator.foreach(key => nb.candidates.update(key, nb.estimate(key)))
    nb
  }
}

case class CmsTopK(
    keyExpr: Expression,
    k: Int,
    width: Int = 4096,
    depth: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsTopKBuffer] {

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", StringType), StructField("count", LongType))))
  override def prettyName: String = "approx_topk"

  override def createAggregationBuffer(): CmsTopKBuffer =
    new CmsTopKBuffer(width, depth, k)

  override def update(buf: CmsTopKBuffer, input: InternalRow): CmsTopKBuffer = {
    val v = keyExpr.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: CmsTopKBuffer, other: CmsTopKBuffer): CmsTopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: CmsTopKBuffer): Any =
    new GenericArrayData(buf.topK.map { case (key, cnt) =>
      InternalRow(UTF8String.fromString(key), cnt)
    }.toArray[Any])

  override def serialize(buf: CmsTopKBuffer): Array[Byte] =
    CmsTopKAggregate.write(buf)

  override def deserialize(bytes: Array[Byte]): CmsTopKBuffer =
    CmsTopKAggregate.read(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(keyExpr = cs(0))
}

/** [[CmsTopK]] with the SERIALIZED buffer as the result — the per-epoch
  * sketch the Hokusai time-series store persists (reference
  * docs/sde/sketching.md: one CMS per epoch, range queries merge
  * epochs). Emitting the state instead of the extracted top-k is what
  * makes arbitrary [start, end) ranges answerable later: counters add
  * across epochs, so no key that is big IN AGGREGATE can be lost to a
  * per-epoch top-k cut.
  */
case class CmsTopKState(
    keyExpr: Expression,
    k: Int,
    width: Int = 4096,
    depth: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsTopKBuffer] {

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "approx_topk_state"

  override def createAggregationBuffer(): CmsTopKBuffer =
    new CmsTopKBuffer(width, depth, k)
  override def update(buf: CmsTopKBuffer, input: InternalRow): CmsTopKBuffer = {
    val v = keyExpr.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }
  override def merge(buf: CmsTopKBuffer, other: CmsTopKBuffer): CmsTopKBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: CmsTopKBuffer): Any = CmsTopKAggregate.write(buf)
  override def serialize(buf: CmsTopKBuffer): Array[Byte] =
    CmsTopKAggregate.write(buf)
  override def deserialize(bytes: Array[Byte]): CmsTopKBuffer =
    CmsTopKAggregate.read(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CmsTopKState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsTopKState =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(keyExpr = cs(0))
}

/** Merge serialized [[CmsTopKState]] sketches and extract the top-k —
  * the range-query side of the Hokusai store: counters are additive, so
  * the merged estimate for every candidate equals the estimate a single
  * sketch over the UNION of the epochs' rows would give (CmsTopKSpec
  * pins that equivalence). The buffer self-sizes by ADOPTING the first
  * incoming sketch's dimensions (they ride the serialized form), so the
  * query side needs no build-time parameters.
  */
case class CmsTopKMerge(
    stateExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsTopKBuffer] {

  override def children: Seq[Expression] = Seq(stateExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", StringType), StructField("count", LongType))))
  override def prettyName: String = "approx_topk_merge"

  // explicitly-flagged empty buffer until the first real sketch
  // arrives and is adopted (the flag rides serialization as width=0, so
  // a genuine 1x1 sketch is never mistaken for it)
  override def createAggregationBuffer(): CmsTopKBuffer =
    new CmsTopKBuffer(1, 1, k, empty = true)
  private def isSentinel(b: CmsTopKBuffer): Boolean = b.empty

  /** Mixed widths are LEGAL on the merge side: a Hokusai store holds
    * width-decayed aged epochs beside fresh full-width ones. Fold the
    * wider sketch down to the narrower (the folded array equals a
    * direct build at that width — [[CmsTopKBuffer.foldTo]]), then merge
    * cell-for-cell as usual. The range answer carries the WIDEST error
    * bound among the epochs touched, exactly Hokusai's contract.
    */
  private def aligned(a: CmsTopKBuffer, b: CmsTopKBuffer): (CmsTopKBuffer, CmsTopKBuffer) =
    if (a.width == b.width) (a, b)
    else {
      // non-divisible widths are a genuine layout mismatch (two stores
      // built under unrelated settings), not decay — refuse with a
      // merge-worded error rather than foldTo's decay-worded one
      require(math.max(a.width, b.width) % math.min(a.width, b.width) == 0,
        s"CMS merge: incompatible sketch widths (${a.width} vs ${b.width}) — " +
          "mergeable widths must be equal or related by width decay " +
          "(one must divide the other)")
      if (a.width > b.width) (a.foldTo(b.width), b)
      else (a, b.foldTo(a.width))
    }

  override def update(buf: CmsTopKBuffer, input: InternalRow): CmsTopKBuffer = {
    val v = stateExpr.eval(input)
    if (v == null) buf
    else {
      val o = CmsTopKAggregate.read(v.asInstanceOf[Array[Byte]])
      if (isSentinel(buf)) o
      else { val (a, b) = aligned(buf, o); a.merge(b); a }
    }
  }
  override def merge(buf: CmsTopKBuffer, other: CmsTopKBuffer): CmsTopKBuffer =
    if (isSentinel(other)) buf
    else if (isSentinel(buf)) other
    else { val (a, b) = aligned(buf, other); a.merge(b); a }
  override def eval(buf: CmsTopKBuffer): Any =
    new GenericArrayData(buf.topK.take(k).map { case (key, cnt) =>
      InternalRow(UTF8String.fromString(key), cnt)
    }.toArray[Any])
  override def serialize(buf: CmsTopKBuffer): Array[Byte] =
    CmsTopKAggregate.write(buf)
  override def deserialize(bytes: Array[Byte]): CmsTopKBuffer =
    CmsTopKAggregate.read(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CmsTopKMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsTopKMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(stateExpr = cs(0))
}

/** Scalar width-decay of one serialized sketch — the maintenance face of
  * [[CmsTopKBuffer.foldTo]]: halve the width `generations` times (stop
  * early at odd widths). Hokusai time decay: run it over aged epochs of
  * a `_sketches` state table and their memory shrinks 2^g while range
  * queries keep working through [[CmsTopKMerge]]'s width alignment.
  * CodegenFallback is fine — this runs at maintenance cadence over
  * O(epochs) rows, never in a per-row hot path.
  */
case class CmsTopKDecay(child: Expression, generations: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(generations >= 0, "approx_topk_decay: generations must be >= 0")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "approx_topk_decay"
  override protected def nullSafeEval(input: Any): Any = {
    val buf = CmsTopKAggregate.read(input.asInstanceOf[Array[Byte]])
    if (buf.empty) input
    else {
      var target = buf.width
      var g = generations
      while (g > 0 && target % 2 == 0) { target /= 2; g -= 1 }
      if (target == buf.width) input
      else CmsTopKAggregate.write(buf.foldTo(target))
    }
  }
  override protected def withNewChildInternal(c: Expression): CmsTopKDecay =
    copy(child = c)
}

/** TARGET-STATED width decay of one serialized sketch: fold DOWN TO
  * `targetExpr` cells per row (repeated halving, stopping early at odd
  * widths), a NO-OP when the sketch is already at or below the target.
  * Idempotence is the point — the caller derives an ABSOLUTE target
  * from the store's creation width, so a retried retention job
  * re-running the same cutoff recomputes the same target and folds
  * nothing twice, where the relative form ([[CmsTopKDecay]]) halves
  * again on every call. CodegenFallback is fine — maintenance cadence
  * over O(epochs) rows, never a per-row hot path.
  */
case class CmsTopKDecayTo(child: Expression, targetExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = child
  override def right: Expression = targetExpr
  override def dataType: DataType = BinaryType
  override def prettyName: String = "approx_topk_decay_to"
  override protected def nullSafeEval(input: Any, t: Any): Any = {
    val target = t.asInstanceOf[Number].intValue()
    require(target >= 1, s"approx_topk_decay_to: target width $target must be >= 1")
    val buf = CmsTopKAggregate.read(input.asInstanceOf[Array[Byte]])
    if (buf.empty) input
    else {
      // stop BEFORE a halving would cross below the target: a target not
      // reachable by exact halving folds to the smallest reachable width
      // at or ABOVE it — the floor contract ("never below") wins over
      // folding depth
      var w = buf.width
      while (w / 2 >= target && w % 2 == 0) w /= 2
      if (w == buf.width) input
      else CmsTopKAggregate.write(buf.foldTo(w))
    }
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmsTopKDecayTo = copy(child = l, targetExpr = r)
}

object CmsTopKAggregate {
  /** Column API: approximate top-k keys by frequency within the group. */
  def approx_topk(key: Column, k: Int, width: Int = 4096, depth: Int = 5): Column =
    ExpressionUtils.column(
      CmsTopK(ExpressionUtils.expression(key), k, width, depth).toAggregateExpression())

  /** Column API: the group's CMS+pool sketch, serialized (per-epoch). */
  def approx_topk_state(key: Column, k: Int, width: Int = 4096, depth: Int = 5): Column =
    ExpressionUtils.column(
      CmsTopKState(ExpressionUtils.expression(key), k, width, depth).toAggregateExpression())

  /** Column API: merge serialized sketches, extract top-k. */
  def approx_topk_merge(state: Column, k: Int): Column =
    ExpressionUtils.column(
      CmsTopKMerge(ExpressionUtils.expression(state), k).toAggregateExpression())

  /** Column API: width-decay a serialized sketch by `generations`
    * halvings (Hokusai item aggregation over aged epochs). RELATIVE —
    * prefer [[approx_topk_decay_to]] for retention jobs, which is
    * idempotent under retries.
    */
  def approx_topk_decay(state: Column, generations: Int): Column =
    ExpressionUtils.column(
      CmsTopKDecay(ExpressionUtils.expression(state), generations))

  /** Column API: width-decay a serialized sketch DOWN TO an absolute
    * target width (no-op at or below it) — the idempotent face.
    */
  def approx_topk_decay_to(state: Column, target: Column): Column =
    ExpressionUtils.column(CmsTopKDecayTo(
      ExpressionUtils.expression(state), ExpressionUtils.expression(target)))

  private[graft] def write(buf: CmsTopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.empty) { // width=0 header marks the not-yet-adopted buffer
      out.writeInt(0); out.writeInt(0); out.writeInt(buf.k)
      out.flush(); return bos.toByteArray
    }
    out.writeInt(buf.width); out.writeInt(buf.depth); out.writeInt(buf.k)
    buf.counts.foreach(out.writeLong)
    out.writeInt(buf.candidates.size)
    buf.candidates.foreach { case (key, est) =>
      out.writeUTF(key); out.writeLong(est)
    }
    out.flush()
    bos.toByteArray
  }

  private[graft] def read(bytes: Array[Byte]): CmsTopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val w = in.readInt(); val d = in.readInt(); val kk = in.readInt()
    if (w == 0) return new CmsTopKBuffer(1, 1, kk, empty = true)
    val buf = new CmsTopKBuffer(w, d, kk)
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = in.readLong(); i += 1 }
    val nc = in.readInt()
    i = 0
    while (i < nc) {
      val key = in.readUTF(); val est = in.readLong()
      buf.candidates.update(key, est)
      i += 1
    }
    buf
  }
}
