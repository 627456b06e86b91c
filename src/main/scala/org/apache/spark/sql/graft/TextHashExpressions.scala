package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Single-pass text-hashing expressions for dedup at scale.
  *
  * The relational formulation (explode shingles → distinct → 16×min agg)
  * shuffles the exploded shingle table several times; these expressions
  * compute the same results as a NARROW map over the document scan — no
  * explode, no shuffle, one pass per row. The LSH pipeline then shuffles
  * only (id, band) pairs and candidate ids.
  */
object TextHash {

  @inline private[graft] def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit hash of a shingle under permutation `seed`. */
  @inline def shingleHash(s: String, seed: Long): Long =
    splitmix(scala.util.hashing.MurmurHash3.stringHash(s).toLong ^ (seed * 0xc2b2ae3d27d4eb4fL))

  def tokens(text: String): Array[String] =
    text.trim.split("\\s+")

  /** Distinct word n-gram shingles. */
  def shingleSet(text: String, n: Int): mutable.HashSet[String] = {
    val t = tokens(text)
    val out = mutable.HashSet.empty[String]
    var i = 0
    while (i + n <= t.length) {
      out.add(t.slice(i, i + n).mkString(" "))
      i += 1
    }
    out
  }

  /** MinHash signature. Each shingle is string-hashed ONCE; the k
    * "permutations" are cheap long-mixes of that hash — O(|shingles| ×
    * (strlen + k)) instead of O(|shingles| × k × strlen).
    */
  def minhash(text: String, shingleLen: Int, numHashes: Int): Array[Long] =
    minhashOf(sortedShingleHashes(text, shingleLen), numHashes)

  /** MinHash signature from precomputed shingle hashes. */
  def minhashOf(hs: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < numHashes) {
        val m = splitmix(h ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Sorted distinct 64-bit hashes of the text's shingle set — the
    * per-document precomputation that makes pairwise verification a
    * merge-intersection over longs (no per-pair string work). Collision
    * probability within a pair's union (~128 hashes over 2^64) is ~4e-16.
    */
  def sortedShingleHashes(text: String, n: Int): Array[Long] = {
    val sh = shingleSet(text, n)
    val out = new Array[Long](sh.size)
    var i = 0
    sh.foreach { s => out(i) = shingleHash(s, 0L); i += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Jaccard of two sorted hash arrays by linear merge. */
  def sortedJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  def jaccard(a: String, b: String, n: Int): Double = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    if (sa.isEmpty && sb.isEmpty) 0.0
    else {
      var inter = 0
      sa.foreach(s => if (sb.contains(s)) inter += 1)
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }
}

/** minhash_sig(text) — array of `numHashes` per-permutation minima.
  * Codegen'd via a static helper: a CodegenFallback expression
  * de-codegens its WHOLE projection stage (PERF_NOTES §4 lesson), and
  * this sits in the hottest dedup scan.
  */
case class MinHashSignature(child: Expression, shingleLen: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any =
    MinHashSignature.eval(v.asInstanceOf[UTF8String], shingleLen, numHashes)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.MinHashSignature$$.MODULE$$.eval($s, $shingleLen, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  def eval(s: UTF8String, shingleLen: Int, numHashes: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new GenericArrayData(TextHash.minhash(s.toString, shingleLen, numHashes))
}

/** ngram_jaccard(a, b) — exact word n-gram Jaccard similarity. Codegen'd. */
case class NgramJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccard.eval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.NgramJaccard$$.MODULE$$.eval($a, $b, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NgramJaccard {
  def eval(a: UTF8String, b: UTF8String, n: Int): Double =
    TextHash.jaccard(a.toString, b.toString, n)
}

/** shingle_hashes(text) — sorted distinct shingle hashes (see
  * [[TextHash.sortedShingleHashes]]). Codegen'd.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(v: Any): Any =
    ShingleHashes.eval(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.ShingleHashes$$.MODULE$$.eval($s, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  def eval(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new GenericArrayData(TextHash.sortedShingleHashes(s.toString, n))
}

/** minhash_full(text) — struct(sig, sh): the MinHash signature AND the
  * sorted shingle-hash array from ONE shingling pass. The LSH pipeline
  * needs both (bands from `sig`, per-pair verification from `sh`);
  * computing them with separate expressions shingles every document
  * twice — this expression derives the signature from the hash set it
  * already built. Value-identical to
  * `struct(minhash_sig(text), shingle_hashes(text))`.
  */
case class MinHashFull(child: Expression, shingleLen: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sh", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "minhash_full"
  override def nullSafeEval(v: Any): Any =
    MinHashFull.eval(v.asInstanceOf[UTF8String], shingleLen, numHashes)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.MinHashFull$$.MODULE$$.eval($s, $shingleLen, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashFull {
  def eval(s: UTF8String, shingleLen: Int, numHashes: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val hs = TextHash.sortedShingleHashes(s.toString, shingleLen)
    org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(TextHash.minhashOf(hs, numHashes)),
      new GenericArrayData(hs))
  }
}

/** hash_jaccard(a, b) — Jaccard of two sorted hash arrays. Codegen'd. */
case class HashArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hash_jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    HashArrayJaccard.eval(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.HashArrayJaccard$$.MODULE$$.eval($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HashArrayJaccard {
  def eval(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double =
    TextHash.sortedJaccard(a.toLongArray(), b.toLongArray())
}

/** md5_prefix_long(s, hexChars) — the first `hexChars` hex digits of
  * md5(s) as an unsigned long, computed DIRECTLY from the digest bytes
  * (top 4·hexChars bits of the first 8 bytes). Value-identical to
  * `CAST('0x' || substr(md5(s), 1, hexChars) AS BIGINT)` — the
  * engine-portable hash the DuckDB oracle replays — without
  * materializing the 32-char hex string and re-parsing it (measured 2×
  * on the simhash token stream). Codegen'd; the digest instance is
  * thread-local.
  */
case class Md5PrefixLong(child: Expression, hexChars: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(hexChars >= 1 && hexChars <= 15, s"hexChars must be in [1,15]: $hexChars")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"
  override def nullSafeEval(v: Any): Any =
    Md5PrefixLong.hash(v.asInstanceOf[UTF8String], hexChars)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.Md5PrefixLong$$.MODULE$$.hash($s, $hexChars)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** top_gram_fracs(tokens) — per-row repetition signals: for each n in
  * 1..maxN, the fraction of the document's word n-grams accounted for by
  * the single most frequent n-gram (`max(count)/numGrams`). Value-identical
  * to the relational explode → groupBy(doc, gram) → max/sum pipeline, but
  * computed entirely inside the scan projection: token bytes are hashed
  * once (XXH64, 64-bit — within-document collision odds ~1e-14), gram
  * hashes are a splitmix chain over the n consecutive token hashes, and
  * the max count is the longest run of the sorted primitive array. No
  * explode, no shuffle — at 100 TB this runs at scan speed with perfect
  * partition locality, where the relational form shuffles a (doc, gram)
  * pair per gram occurrence. Codegen'd via a compiled helper (Spark's
  * higher-order functions are CodegenFallback, so a transform/aggregate
  * formulation pays interpreted per-element overhead — measured 3×
  * SLOWER than the explode pipeline it was meant to replace).
  *
  * Gram-count contract (matches `sequence(0, greatest(size-n, 0))` +
  * `slice`): a document with fewer than n tokens yields ONE partial gram,
  * so its fraction is 1.0.
  */
case class TopGramFracs(child: Expression, maxN: Int)
    extends UnaryExpression {
  require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8]: $maxN")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "top_gram_fracs"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    TopGramFracs.fracs(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], maxN)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TopGramFracs$$.MODULE$$.fracs($s, $maxN)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TopGramFracs {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.ArrayData

  def fracs(arr: ArrayData, maxN: Int): ArrayData = {
    val len = arr.numElements()
    // one 64-bit hash per token; gram hashes chain these, never re-touch
    // the token bytes
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      val t = arr.getUTF8String(i)
      th(i) =
        if (t == null) 0L
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }
    val out = new Array[Double](maxN)
    var n = 1
    while (n <= maxN) {
      if (len < n) out(n - 1) = 1.0
      else {
        val numGrams = len - n + 1
        val g = new Array[Long](numGrams)
        var s = 0
        while (s < numGrams) {
          var h = 0x9e3779b97f4a7c15L + n
          var j = 0
          while (j < n) { h = TextHash.splitmix(h ^ th(s + j)); j += 1 }
          g(s) = h
          s += 1
        }
        java.util.Arrays.sort(g)
        var best = 1
        var run = 1
        var k = 1
        while (k < numGrams) {
          if (g(k) == g(k - 1)) { run += 1; if (run > best) best = run }
          else run = 1
          k += 1
        }
        out(n - 1) = best.toDouble / numGrams
      }
      n += 1
    }
    new GenericArrayData(out)
  }
}

/** array_count_in(arr, values) — how many elements of `arr` (with
  * repetition) belong to the constant string set `values`. The per-row
  * form of `explode → sum(when(tok.isin(values), 1))`: dictionary-probe
  * operators (stopword density, language ID) become pure scan
  * projections instead of a token-level shuffle + per-doc aggregate +
  * join back. Codegen'd; the probe set is built once per expression
  * instance and shipped as a codegen reference object.
  */
case class ArrayCountIn(child: Expression, values: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_count_in"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.catalogString}")
    }
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }
  override def nullSafeEval(v: Any): Any =
    ArrayCountIn.count(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val setRef = ctx.addReferenceObj("probeSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.ArrayCountIn$$.MODULE$$.count($s, $setRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ArrayCountIn {
  def count(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      set: java.util.HashSet[UTF8String]): Int = {
    val len = arr.numElements()
    var n = 0
    var i = 0
    while (i < len) {
      val t = arr.getUTF8String(i)
      if (t != null && set.contains(t)) n += 1
      i += 1
    }
    n
  }
}

/** simhash_sig(tokens) — the document's SimHash signature as one per-row
  * expression: count token occurrences in a per-row hash map, hash each
  * DISTINCT token once (xxhash64, or the md5-derived 60-bit prefix when
  * `md5Portable` — the variant a SQL oracle can replay), accumulate
  * ±count per bit, take signs. Value-identical to the relational
  * explode → groupBy(doc, token) → 60-conditional-sum pipeline, which
  * shuffles every (doc, token) pair and then a 60-column aggregate row
  * per doc; this computes inside the scan projection — zero shuffles at
  * any corpus size. Tokens must already be split (pass the `split()`
  * column) so tokenization stays engine-identical with the oracle's
  * `string_split_regex`.
  */
case class SimHashSig(child: Expression, sigBits: Int, md5Portable: Boolean)
    extends UnaryExpression {
  require(sigBits >= 1 && sigBits <= 64, s"sigBits must be in [1,64]: $sigBits")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig_expr"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    SimHashSig.sig(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      sigBits, md5Portable)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.SimHashSig$$.MODULE$$.sig($s, $sigBits, $md5Portable)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashSig {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.ArrayData

  def sig(arr: ArrayData, sigBits: Int, md5Portable: Boolean): Long = {
    val len = arr.numElements()
    // count per DISTINCT token first so the expensive hash (md5 in the
    // portable variant) runs once per distinct token, not per occurrence
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < len) {
      val t = arr.getUTF8String(i)
      if (t != null) counts.merge(t, 1, (a: Integer, b: Integer) => a + b)
      i += 1
    }
    val acc = new Array[Int](sigBits)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val t = e.getKey
      val c: Int = e.getValue
      val h =
        if (md5Portable) Md5PrefixLong.hash(t, 15)
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < sigBits) {
        if (((h >>> b) & 1L) == 1L) acc(b) += c else acc(b) -= c
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < sigBits) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** rolling_window_hash(tokens) — polynomial fingerprint of EVERY
  * `windowLen`-token window of the document, one linear pass: each token
  * is md5-hashed ONCE (60-bit prefix, the [[Md5PrefixLong]] definition,
  * so a SQL oracle can replay token hashes portably) and window
  * fingerprints roll in O(1) per position over the Mersenne field
  * 2^61-1 — h(p) = Σ th(t[p+j])·B^(W-1-j) mod M. The direct
  * formulation (md5 of the re-concatenated window text per position,
  * what `transform(sequence(...), slice…)` expresses) is O(tokens × W)
  * character work; this is O(tokens) — the suffix-array-dedup scaling
  * fix the Dedup scaladoc previously only documented as possible.
  *
  * Output: array of numTokens-windowLen+1 fingerprints (empty when the
  * document is shorter than one window). Oracle replay: per position,
  * Σ (md5h(token) · pw[j]) % M with pw[j] = B^(W-1-j) mod M inlined as
  * literals — exact in DuckDB HUGEINT arithmetic.
  */
case class RollingWindowHash(child: Expression, windowLen: Int)
    extends UnaryExpression {
  require(windowLen >= 2 && windowLen <= 64,
    s"windowLen must be in [2,64]: $windowLen")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hash"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    RollingWindowHash.hashes(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], windowLen)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.RollingWindowHash$$.MODULE$$.hashes($s, $windowLen)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingWindowHash {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Mersenne prime 2^61-1: `2^61 ≡ 1 (mod M)` folds a 128-bit product
    * into the field with two shifts and two adds.
    */
  val M: Long = (1L << 61) - 1

  /** Polynomial base — any value in (1, M); fixed for oracle parity. */
  val B: Long = 1000003L

  /** (a·b) mod M for a, b ∈ [0, 2^61): the 128-bit product hi·2^64+lo
    * reduces via 2^64 ≡ 8 and 2^61 ≡ 1 to 8·hi + (lo>>>61) + (lo&M),
    * every term < 2^61 so the sum can't overflow a signed long.
    */
  @inline def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    (8L * hi + (lo >>> 61) + (lo & M)) % M
  }

  def hashes(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      // a null element (the array type admits containsNull) hashes to 0
      // instead of NPE-ing the task — deterministic and collision-safe
      // enough for window fingerprints (0 is also md5-reachable only
      // with ~2^-60 probability)
      th(i) =
        if (arr.isNullAt(i)) 0L else Md5PrefixLong.hash(arr.getUTF8String(i), 15)
      i += 1
    }
    var pw = 1L // B^(w-1) mod M — the outgoing token's weight
    i = 0
    while (i < w - 1) { pw = mulmod(pw, B); i += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = (mulmod(h, B) + th(i)) % M; i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - w) {
      val without = (h - mulmod(th(p - 1), pw) + M) % M
      h = (mulmod(without, B) + th(p + w - 1)) % M
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }
}

object Md5PrefixLong {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String, hexChars: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> (64 - 4 * hexChars)
  }
}

object TextHashExpressions {
  def md5_prefix_long(s: Column, hexChars: Int): Column =
    ExpressionUtils.column(Md5PrefixLong(ExpressionUtils.expression(s), hexChars))
  def minhash_sig(text: Column, shingleLen: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(text), shingleLen, numHashes))
  def ngram_jaccard(a: Column, b: Column, n: Int): Column =
    ExpressionUtils.column(
      NgramJaccard(ExpressionUtils.expression(a), ExpressionUtils.expression(b), n))
  def shingle_hashes(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(text), n))
  def hash_jaccard(a: Column, b: Column): Column =
    ExpressionUtils.column(
      HashArrayJaccard(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def top_gram_fracs(tokens: Column, maxN: Int): Column =
    ExpressionUtils.column(TopGramFracs(ExpressionUtils.expression(tokens), maxN))
  def simhash_sig_expr(tokens: Column, sigBits: Int, md5Portable: Boolean): Column =
    ExpressionUtils.column(
      SimHashSig(ExpressionUtils.expression(tokens), sigBits, md5Portable))
  def array_count_in(arr: Column, values: Seq[String]): Column =
    ExpressionUtils.column(ArrayCountIn(ExpressionUtils.expression(arr), values))
  def minhash_full(text: Column, shingleLen: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashFull(ExpressionUtils.expression(text), shingleLen, numHashes))
  def rolling_window_hash(tokens: Column, windowLen: Int): Column =
    ExpressionUtils.column(
      RollingWindowHash(ExpressionUtils.expression(tokens), windowLen))
}
