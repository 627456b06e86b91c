package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** IVF-PQ composite index ([[Similarity.buildIvfPqIndex]]/[[Similarity
  * .ivfPqTopK]]): cells bound which vectors a query touches, residual PQ
  * codes bound what each touched vector costs, exact cosine reranks the
  * shortlist. Exhaustive settings must reproduce exact search EXACTLY;
  * bounded settings must clear a recall floor while touching strictly
  * fewer candidates than brute force.
  */
class IvfPqSpec extends SparkTestBase {

  private def corpus = Tables.load(spark, sf, "embeddings")

  test("exhaustive probes + full shortlist reproduce exact search exactly") {
    val idx = Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding",
      nlist = 8, m = 4, k = 8, refineSteps = 1)
    assert(idx.encoded.count() == 500)
    val row = idx.encoded.first()
    assert(row.getSeq[Int](2).length == 4, "m codes per vector")
    val queries = corpus.filter(col("vec_id") < 5)
    // probe EVERY cell and shortlist the whole corpus: the approximate
    // stage then prunes nothing and the exact rerank IS exact search
    val got = Similarity.ivfPqTopK(idx, corpus, queries, "vec_id", "embedding",
        k = 5, nprobe = 8, shortlist = 500)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == exact, "exhaustive IVF-PQ must equal brute force")
  }

  test("bounded probes: recall floor, strictly fewer candidates than brute force") {
    val idx = Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding",
      nlist = 16, m = 4, k = 8, refineSteps = 1)
    val queries = corpus.filter(col("vec_id") < 10)
    val nprobe = 8
    val approx = Similarity.ivfPqTopK(idx, corpus, queries, "vec_id", "embedding",
        k = 10, nprobe = nprobe, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(approx.values.forall(_.size == 10))
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq
      .map(q => (exact(q) intersect approx(q)).size / 10.0).sum / exact.size
    // unstructured synthetic embeddings are the hardest quantization
    // case; the floor carries margin under the measured value
    assert(recall >= 0.5, s"IVF-PQ recall@10 too low: $recall")
    // work bound: candidates scored = Σ probed-cell sizes, strictly
    // under the brute-force 10 × 499 pair count
    val cellSizes = idx.encoded.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probedCells = queries.count() * nprobe
    val maxCand = cellSizes.values.toSeq.sorted.reverse.take(nprobe).sum * 10
    assert(maxCand < 10L * 499,
      s"probed work ($maxCand upper bound over $probedCells cells) must beat brute force")
  }
}
