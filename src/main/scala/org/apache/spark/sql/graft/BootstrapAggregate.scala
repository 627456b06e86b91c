package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Poissonized-bootstrap resampling for AQP error estimation — the
  * reference's `NumBootStrapTrials` contract (reference
  * Literals.scala:259-303 exposes `spark.sql.aqp.numBootStrapTrials` /
  * `closedFormEstimates`; the estimator itself is closed-source, so this
  * is the standard online-bootstrap construction from the public
  * literature: Pol & Jermaine, "Relational confidence bounds are easy
  * with the bootstrap", SIGMOD'05; Agarwal et al., BlinkDB/EUROSYS'13
  * diagnostics).
  *
  * Closed-form CIs (SampleRewrite.absErrOf) assume the HT estimator is
  * normal; on skewed strata at small realized sample sizes the normal
  * interval under-covers, and for non-linear estimators there is no
  * closed form at all. The bootstrap replaces the analytic variance with
  * the empirical distribution of the estimator over `trials` resamples of
  * the sample itself.
  *
  * One-pass construction: materializing B resamples is impossible at
  * scale, so each input row enters trial t with a Poisson(1) multiplicity
  * (the standard large-n approximation of multinomial resampling — row
  * counts in a bootstrap resample of n rows are asymptotically iid
  * Poisson(1)). Per row we draw `trials` multiplicities and accumulate
  *   num_t += m_t · w · x      den_t += m_t · w
  * so the buffer is 2·trials doubles regardless of group size, merges are
  * element-wise adds (map-side partial aggregation works), and the data
  * is never reshuffled or re-scanned.
  *
  * DETERMINISM: multiplicities come from a counter-based splitmix64
  * stream keyed on (seed, row identity, trial) — not an RNG with state —
  * so re-running the query reproduces identical trials regardless of
  * partitioning or merge order (the same property the md5 sampler gives
  * the sample itself). The row identity is `xxhash64` over all columns
  * (supplied by the WITH ERROR rewrite): rows that merely share (x, w)
  * still draw independently, which matters most for count(*) where every
  * row of a stratum is (1, w). Bare SQL calls without a key fall back to
  * content bits (exact duplicate VALUES then share draws — fine for
  * near-distinct value columns, wrong for constants).
  *
  * Composability: `bootstrap_trials` returns the raw ARRAY<DOUBLE> of
  * per-trial estimates, so any non-linear estimator a user can phrase
  * over arrays (ratios, logs, differences of aggregates) gets a CI via
  * `bootstrap_ci(array, confidence)` — exactly the UDAF/non-linear gap
  * closed-form leaves.
  *
  * Modes: 'sum' → trial estimates are Σ m·w·x (HT totals; count(*) is
  * x = 1, count(x) is x = IS NOT NULL); 'ratio' → Σ m·w·x / Σ m·w (HT
  * means). Empty resamples (den 0) repeat the point estimate (standard
  * practice — drop-or-center are both defensible; centering keeps the
  * trial count fixed).
  */
case class BootstrapTrials(
    value: Expression,
    weight: Expression,
    mode: Expression, // 'sum' | 'ratio' (foldable string)
    trialsExpr: Expression, // foldable int
    seedExpr: Expression, // foldable long
    keyExpr: Expression = Literal(null, LongType), // per-row identity (LONG)
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def prettyName: String = "bootstrap_trials"

  override def children: Seq[Expression] =
    Seq(value, weight, mode, trialsExpr, seedExpr, keyExpr)

  private lazy val ratio: Boolean =
    String.valueOf(mode.eval()).equalsIgnoreCase("ratio")
  private lazy val trials: Int = BootstrapTrials.numOf(trialsExpr.eval()).toInt
  private lazy val seed: Long = BootstrapTrials.numOf(seedExpr.eval()).toLong

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!Seq(value, weight).forall(_.dataType.isInstanceOf[NumericType]))
      return TypeCheckResult.TypeCheckFailure(
        "bootstrap_trials(x, w, mode, trials, seed): x and w must be numeric")
    if (!(mode.foldable && trialsExpr.foldable && seedExpr.foldable))
      return TypeCheckResult.TypeCheckFailure(
        "bootstrap_trials: mode, trials and seed must be literals")
    val m = String.valueOf(mode.eval()).toLowerCase
    if (m != "sum" && m != "ratio")
      return TypeCheckResult.TypeCheckFailure(
        s"bootstrap_trials mode must be 'sum' or 'ratio', got '$m'")
    val t = BootstrapTrials.numOf(trialsExpr.eval()).toInt
    if (t < 2 || t > 10000)
      return TypeCheckResult.TypeCheckFailure(
        s"bootstrap_trials: trials must be in [2, 10000], got $t")
    keyExpr.dataType match {
      case LongType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bootstrap_trials: key must be a LONG row identity (e.g. xxhash64(*)), got $other")
    }
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // buffer layout: [num_0..num_{B-1}, den_0..den_{B-1}, num_pt, den_pt]
  // (pt = unresampled point estimate, used to center empty resamples)
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](2 * trials + 2)

  private lazy val valueDouble = Cast(value, DoubleType)
  private lazy val weightDouble = Cast(weight, DoubleType)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val xAny = valueDouble.eval(input)
    val wAny = weightDouble.eval(input)
    if (xAny == null || wAny == null) return buf
    val x = xAny.asInstanceOf[Double]
    val w = wAny.asInstanceOf[Double]
    val wx = w * x
    // counter stream keyed on the row IDENTITY when one is supplied
    // (xxhash64 over all columns in the WITH ERROR rewrite) — duplicate
    // (x, w) pairs then still draw independent multiplicities. Without a
    // key (bare SQL calls) fall back to content bits, where exact
    // duplicate values share draws: fatal for count(*) (every row of a
    // stratum has (1, w)), mild for near-distinct value columns.
    val kAny = keyExpr.eval(input)
    val rowKey =
      if (kAny != null) BootstrapTrials.mix(seed, kAny.asInstanceOf[Long])
      else BootstrapTrials.mix(
        BootstrapTrials.mix(seed, java.lang.Double.doubleToLongBits(x)),
        java.lang.Double.doubleToLongBits(w))
    val b = trials
    var t = 0
    while (t < b) {
      val m = BootstrapTrials.poisson1(BootstrapTrials.mix(rowKey, t.toLong))
      if (m > 0) {
        buf(t) += m * wx
        buf(b + t) += m * w
      }
      t += 1
    }
    buf(2 * b) += wx
    buf(2 * b + 1) += w
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val b = trials
    val out = new Array[Any](b)
    val ptNum = buf(2 * b)
    val ptDen = buf(2 * b + 1)
    val pt = if (ratio) (if (ptDen == 0d) 0d else ptNum / ptDen) else ptNum
    var t = 0
    while (t < b) {
      out(t) =
        if (!ratio) buf(t)
        else if (buf(b + t) == 0d) pt // empty resample → center
        else buf(t) / buf(b + t)
      t += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BootstrapTrials =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootstrapTrials =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BootstrapTrials =
    copy(value = newChildren(0), weight = newChildren(1), mode = newChildren(2),
      trialsExpr = newChildren(3), seedExpr = newChildren(4),
      keyExpr = newChildren(5))
}

object BootstrapTrials {

  /** Foldable-literal numeric coercion (SQL `0.95` arrives as Decimal). */
  def numOf(a: Any): Double = a match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
    case other => java.lang.Double.parseDouble(String.valueOf(other))
  }

  /** splitmix64 finalizer over a combined key — a counter-based stream:
    * stateless, order-independent, collision-scrambled.
    */
  def mix(a: Long, b: Long): Long = {
    var z = a + 0x9e3779b97f4a7c15L * (b + 0x632be59bd9b4e019L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Poisson(1) cumulative thresholds scaled to [0, 1): P(X <= k) for
    * k = 0..9 (tail beyond 9 is < 1.1e-7 — clamp).
    */
  private val cdf: Array[Double] = {
    val out = new Array[Double](10)
    var p = math.exp(-1.0)
    var c = p
    out(0) = c
    var k = 1
    while (k < 10) { p /= k; c += p; out(k) = c; k += 1 }
    out
  }

  /** Deterministic Poisson(1) draw from a 64-bit hash. */
  def poisson1(h: Long): Int = {
    val u = (h >>> 11).toDouble * 1.1102230246251565e-16 // 2^-53
    var k = 0
    while (k < 10 && u >= cdf(k)) k += 1
    k
  }
}

/** `bootstrap_ci(trials_array, confidence)` → STRUCT<abs_err, lo, hi>:
  * the percentile confidence interval of the trial estimates. Percentile
  * (not normal-theory) intervals are the point of the bootstrap — they
  * keep the skew of the estimator's distribution, so `lo`/`hi` need not
  * be symmetric around the point estimate.
  */
case class BootstrapCI(child: Expression, confidenceExpr: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = confidenceExpr
  override def prettyName: String = "bootstrap_ci"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if confidenceExpr.foldable =>
      val c = BootstrapTrials.numOf(confidenceExpr.eval())
      if (c > 0d && c < 1d) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"confidence must be in (0,1), got $c")
    case _ => TypeCheckResult.TypeCheckFailure(
      "bootstrap_ci(trials, confidence): trials must be ARRAY<DOUBLE>, confidence a literal")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("abs_err", DoubleType, nullable = false),
    StructField("lo", DoubleType, nullable = false),
    StructField("hi", DoubleType, nullable = false)))
  override def nullable: Boolean = true // null child OR empty trials array

  private lazy val confidence: Double =
    BootstrapTrials.numOf(confidenceExpr.eval())

  override def nullSafeEval(arr: Any, conf: Any): Any = {
    val a = arr.asInstanceOf[ArrayData].toDoubleArray.sorted
    val n = a.length
    if (n == 0) return null // no trials, no interval
    // interpolated type-7 quantile (matches DuckDB/NumPy default)
    def q(p: Double): Double = {
      val h = p * (n - 1)
      val i = h.toInt
      if (i >= n - 1) a(n - 1) else a(i) + (h - i) * (a(i + 1) - a(i))
    }
    val alpha = (1.0 - confidence) / 2.0
    val lo = q(alpha)
    val hi = q(1.0 - alpha)
    InternalRow((hi - lo) / 2.0, lo, hi)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BootstrapCI =
    copy(child = newLeft, confidenceExpr = newRight)
}
