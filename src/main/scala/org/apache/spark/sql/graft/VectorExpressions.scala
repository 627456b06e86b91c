package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector math over
  * `array<float>` columns, computed in double precision.
  *
  * These are whole-stage-codegen friendly (`doGenCode` emits a tight
  * primitive loop over the ArrayData, no boxing, no UDF serialization),
  * which is what makes brute-force similarity scans viable at scale:
  * the per-row cost is a fused dot-product loop inside the generated
  * stage, reading directly from the columnar scan.
  *
  * The reference has no vector ops (SURVEY.md §2.3 note) — this is part of
  * the beyond-reference training-data-pipeline surface.
  */
object VectorExpressions {

  private def dotLoop(a: ArrayData, b: ArrayData): (Double, Double, Double) = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    (dot, na, nb)
  }

  /** dot(a, b) in double. Nulls propagate. */
  case class VectorDot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (dot, _, _) = dotLoop(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double ${ev.value}_acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value}_acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = ${ev.value}_acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** cosine(a, b) in double; 0.0 when either vector has zero norm. */
  case class VectorCosine(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (dot, na, nb) = dotLoop(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (na == 0d || nb == 0d) 0d else dot / math.sqrt(na * nb)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double x = (double) $a.getFloat($i);
           |  double y = (double) $b.getFloat($i);
           |  $dot += x * y; $na += x * x; $nb += y * y;
           |}
           |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** L2 norm of a float vector, in double. */
  case class VectorNorm(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      var acc = 0d
      var i = 0
      val n = arr.numElements()
      while (i < n) { val x = arr.getFloat(i).toDouble; acc += x * x; i += 1 }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |double $acc = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double x = (double) $a.getFloat($i);
           |  $acc += x * x;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Signed-random-projection LSH signatures for `tables` tables of
    * `bits` hyperplanes each, in ONE fused pass over the vector.
    *
    * Plane components are ±1 derived from bits of `XXH64(dim, seed+blk)`
    * — one hash per dimension per 64-plane block (vs. one per dimension
    * PER PLANE in a functions-composed formulation: 32× fewer hashes at
    * 8 bits × 4 tables), planes independent at any dimensionality.
    * Output: array<long>, one packed signature per table.
    */
  case class SrpSignatures(child: Expression, bits: Int, tables: Int, seed: Long)
      extends UnaryExpression with ExpectsInputTypes {
    require(bits > 0 && bits <= 64 && tables > 0, "srp_sigs: 1..64 bits per table")
    private val planes = bits * tables
    private val blocks = (planes + 63) / 64

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "srp_sigs"

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = new Array[Double](planes)
      var i = 0
      while (i < n) {
        val x = arr.getFloat(i).toDouble
        var b = 0
        while (b < blocks) {
          val mask = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, seed + b)
          var p = b * 64
          val end = math.min(planes, p + 64)
          while (p < end) {
            acc(p) += (if (((mask >>> (p & 63)) & 1L) == 0L) x else -x)
            p += 1
          }
          b += 1
        }
        i += 1
      }
      val sigs = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var s = 0L
        var p = 0
        while (p < bits) {
          if (acc(t * bits + p) >= 0) s |= (1L << p)
          p += 1
        }
        sigs(t) = s
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val p = ctx.freshName("p")
        val t = ctx.freshName("t")
        val acc = ctx.freshName("acc")
        val mask = ctx.freshName("mask")
        val end = ctx.freshName("end")
        val sigs = ctx.freshName("sigs")
        val s = ctx.freshName("s")
        val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
        s"""
           |double[] $acc = new double[$planes];
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double x = (double) $a.getFloat($i);
           |  for (int $b = 0; $b < $blocks; $b++) {
           |    long $mask = $xxh.hashLong((long) $i, ${seed}L + $b);
           |    int $end = java.lang.Math.min($planes, $b * 64 + 64);
           |    for (int $p = $b * 64; $p < $end; $p++) {
           |      $acc[$p] += ((($mask >>> ($p & 63)) & 1L) == 0L) ? x : -x;
           |    }
           |  }
           |}
           |long[] $sigs = new long[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  long $s = 0L;
           |  for (int $p = 0; $p < $bits; $p++) {
           |    if ($acc[$t * $bits + $p] >= 0) $s |= (1L << $p);
           |  }
           |  $sigs[$t] = $s;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Fused block-probe kernel for kNN-graph construction: one query
    * vector against a PACKED block of corpus vectors
    * (`array<struct<id: long, vec: array<float>>>`), returning the
    * block-local top-k as `array<struct<score: double, id: long>>`,
    * best-first, ties toward the smaller id (the [[TopKBuffer]]
    * contract). Members whose id equals `selfId` are skipped (the query
    * itself when its own block is probed).
    *
    * Per-member cosine math is IDENTICAL to [[VectorCosine]] (same
    * accumulation order, same zero-norm rule), so downstream merges with
    * `topk_by` and oracle comparisons see bit-equal scores. The point of
    * the kernel is ROW ECONOMY: probing a B-vector pack emits one array
    * of k structs instead of B join rows — the pair stream never
    * materializes, which is what makes the blocked exact graph feasible
    * (measured 4× on 2000×2000 pairs: join-row formulation 3.5 s, packed
    * kernel 0.8 s at sf0.1).
    */
  case class TopKCosineLocal(pack: Expression, query: Expression,
      selfId: Expression, k: Int)
      extends TernaryExpression with ExpectsInputTypes {
    require(k >= 1, s"topk_cosine_local: k must be positive: $k")
    override def first: Expression = pack
    override def second: Expression = query
    override def third: Expression = selfId
    override def inputTypes: Seq[AbstractDataType] = Seq(
      ArrayType(StructType(Seq(
        StructField("id", LongType), StructField("vec", ArrayType(FloatType))))),
      ArrayType(FloatType), LongType)
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))))
    override def prettyName: String = "topk_cosine_local"

    override def nullSafeEval(p: Any, q: Any, self: Any): Any =
      TopKCosineLocal.probe(p.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
        self.asInstanceOf[Long], k)

    // the kernel is one static JVM call — emitting it directly keeps the
    // surrounding stage in whole-stage codegen (a CodegenFallback here
    // would interpret the whole projection)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (p, q, self) =>
        s"${ev.value} = org.apache.spark.sql.graft.VectorExpressions$$TopKCosineLocal$$" +
          s".MODULE$$.probe($p, $q, $self, $k);")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(pack = f, query = s, selfId = t)
  }

  object TopKCosineLocal {
    /** Block-probe kernel body (shared by eval and codegen). */
    def probe(members: ArrayData, qv: ArrayData, selfL: Long, k: Int): ArrayData = {
      val dim = qv.numElements()
      val qd = new Array[Double](dim)
      var i = 0
      while (i < dim) { qd(i) = qv.getFloat(i).toDouble; i += 1 }
      val buf = new TopKBuffer(k)
      var m = 0
      val nm = members.numElements()
      while (m < nm) {
        val row = members.getStruct(m, 2)
        val id = row.getLong(0)
        if (id != selfL) {
          val v = row.getArray(1)
          val n = math.min(dim, v.numElements())
          var dot = 0d; var na = 0d; var nb = 0d
          var j = 0
          while (j < n) {
            val x = qd(j); val y = v.getFloat(j).toDouble
            dot += x * y; na += x * x; nb += y * y
            j += 1
          }
          // na re-accumulates the query norm over min(dim, |v|) elements
          // so truncated members see exactly VectorCosine's math
          val c = if (na == 0d || nb == 0d) 0d else dot / math.sqrt(na * nb)
          buf.add(c, id)
        }
        m += 1
      }
      val rows: Array[Any] = buf.sortedPairs.map { case (s, id) =>
        InternalRow(s, id)
      }
      new GenericArrayData(rows)
    }
  }

  // ---- product quantization (Jégou et al., PQ for ANN search: split
  // the vector into m subvectors, quantize each against a per-subspace
  // codebook of k centroids, search via asymmetric distance computation
  // — the query precomputes an [m][k] distance table once, then every
  // candidate costs m table lookups instead of d multiplications, and
  // the corpus stores m small ints instead of d floats). ----

  /** pq_encode(vec, codebook): nearest-centroid code per subspace.
    * vec: array<double> (length m·sd); codebook: array[m] of array[k] of
    * array[sd] double. Ties break to the LOWEST centroid id so the
    * encoding is deterministic and replayable by the SQL oracle.
    */
  case class PqEncode(vec: Expression, codebook: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def left: Expression = vec
    override def right: Expression = codebook
    override def inputTypes: Seq[AbstractDataType] = Seq(
      ArrayType(DoubleType), ArrayType(ArrayType(ArrayType(DoubleType))))
    override def dataType: DataType = ArrayType(IntegerType)
    override def prettyName: String = "pq_encode"
    override def nullSafeEval(v: Any, cb: Any): Any =
      PqKernels.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, cb) =>
        s"${ev.value} = org.apache.spark.sql.graft.VectorExpressions$$PqKernels$$" +
          s".MODULE$$.encode($v, $cb);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(vec = l, codebook = r)
  }

  /** pq_dist_table(qvec, codebook): the ADC table — [m][k] squared L2
    * distances from the query's subvectors to every centroid. Projected
    * ONCE per query row (on the broadcast side, before the join), so
    * each candidate pair pays O(m), not O(k·d).
    */
  case class PqDistTable(vec: Expression, codebook: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def left: Expression = vec
    override def right: Expression = codebook
    override def inputTypes: Seq[AbstractDataType] = Seq(
      ArrayType(DoubleType), ArrayType(ArrayType(ArrayType(DoubleType))))
    override def dataType: DataType = ArrayType(ArrayType(DoubleType))
    override def prettyName: String = "pq_dist_table"
    override def nullSafeEval(v: Any, cb: Any): Any =
      PqKernels.distTable(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, cb) =>
        s"${ev.value} = org.apache.spark.sql.graft.VectorExpressions$$PqKernels$$" +
          s".MODULE$$.distTable($v, $cb);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(vec = l, codebook = r)
  }

  /** pq_adc(codes, table): approximate squared L2 = Σⱼ table[j][codes[j]]
    * — the m-lookup hot-path score.
    */
  case class PqAdc(codes: Expression, table: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def left: Expression = codes
    override def right: Expression = table
    override def inputTypes: Seq[AbstractDataType] = Seq(
      ArrayType(IntegerType), ArrayType(ArrayType(DoubleType)))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc"
    override def nullSafeEval(c: Any, t: Any): Any =
      PqKernels.adc(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, t) =>
        s"${ev.value} = org.apache.spark.sql.graft.VectorExpressions$$PqKernels$$" +
          s".MODULE$$.adc($c, $t);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(codes = l, table = r)
  }

  object PqKernels {
    /** Squared L2 between vec[j·sd .. j·sd+sd) and a centroid array. */
    private def subDist(v: ArrayData, off: Int, c: ArrayData): Double = {
      val sd = c.numElements()
      var d = 0d; var i = 0
      while (i < sd) {
        val x = v.getDouble(off + i) - c.getDouble(i)
        d += x * x
        i += 1
      }
      d
    }

    def encode(v: ArrayData, cb: ArrayData): ArrayData = {
      val m = cb.numElements()
      val codes = new Array[Any](m)
      var off = 0
      var j = 0
      while (j < m) {
        val cents = cb.getArray(j)
        val k = cents.numElements()
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = subDist(v, off, cents.getArray(c))
          if (d < bestD) { bestD = d; best = c } // strict < : ties keep lowest c
          c += 1
        }
        codes(j) = best
        off += cents.getArray(0).numElements()
        j += 1
      }
      new GenericArrayData(codes)
    }

    def distTable(v: ArrayData, cb: ArrayData): ArrayData = {
      val m = cb.numElements()
      val rows = new Array[Any](m)
      var off = 0
      var j = 0
      while (j < m) {
        val cents = cb.getArray(j)
        val k = cents.numElements()
        val ds = new Array[Any](k)
        var c = 0
        while (c < k) { ds(c) = subDist(v, off, cents.getArray(c)); c += 1 }
        rows(j) = new GenericArrayData(ds)
        off += cents.getArray(0).numElements()
        j += 1
      }
      new GenericArrayData(rows)
    }

    def adc(codes: ArrayData, table: ArrayData): Double = {
      val m = math.min(codes.numElements(), table.numElements())
      var s = 0d; var j = 0
      while (j < m) {
        s += table.getArray(j).getDouble(codes.getInt(j))
        j += 1
      }
      s
    }
  }

  // ---- Column-API surface ----
  private def e(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst tree for graft.dround (DuckDB-exact half-away-from-zero on
    * the binary double; see graft.dround scaladoc) — the SQL-function
    * form `graft_round(x, s)`.
    */
  def graftRoundExpr(arg: Expression, scale: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, CaseWhen, Cast, Divide, Floor, GreaterThanOrEqual, Literal, Multiply, UnaryMinus}
    val x = Cast(arg, DoubleType)
    val p = Literal(math.pow(10, scale))
    val scaled = Multiply(x, p)
    val pos = Floor(Add(scaled, Literal(0.5)))
    val neg = UnaryMinus(Floor(Add(UnaryMinus(scaled), Literal(0.5))))
    Cast(Divide(
      Cast(CaseWhen(Seq((GreaterThanOrEqual(x, Literal(0.0)), pos)), neg), DoubleType),
      p), DoubleType)
  }
  def srp_sigs(a: Column, bits: Int, tables: Int, seed: Long): Column =
    ExpressionUtils.column(SrpSignatures(e(a), bits, tables, seed))
  def vec_dot(a: Column, b: Column): Column = ExpressionUtils.column(VectorDot(e(a), e(b)))
  def vec_cosine(a: Column, b: Column): Column = ExpressionUtils.column(VectorCosine(e(a), e(b)))
  def vec_norm(a: Column): Column = ExpressionUtils.column(VectorNorm(e(a)))
  def topk_cosine_local(pack: Column, query: Column, selfId: Column, k: Int): Column =
    ExpressionUtils.column(TopKCosineLocal(e(pack), e(query), e(selfId), k))
  def pq_encode(vec: Column, codebook: Column): Column =
    ExpressionUtils.column(PqEncode(e(vec), e(codebook)))
  def pq_dist_table(qvec: Column, codebook: Column): Column =
    ExpressionUtils.column(PqDistTable(e(qvec), e(codebook)))
  def pq_adc(codes: Column, table: Column): Column =
    ExpressionUtils.column(PqAdc(e(codes), e(table)))
}
