package graft

import org.apache.spark.sql.graft.CmsTopKBuffer
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Differential check for the CmsTopK candidate-pool maintenance.
  *
  * Round 6 replaced the per-add O(pool) `minBy` (tuple allocation per
  * entry per row — the q_approx_topk_ts GC amplifier) with a
  * lazily-tracked pool minimum. The eviction POLICY must be unchanged:
  * evict the entry with the smallest estimate, ties broken by key
  * ascending, only when the incoming estimate is strictly larger. This
  * spec replays the exact pre-change policy against an independent model
  * sketch and requires bit-identical candidate pools and top-k output.
  */
class CmsTopKSpec extends AnyFunSuite {

  /** Independent model: same CMS arithmetic, original minBy policy. */
  private final class Model(width: Int, depth: Int, k: Int) {
    val counts = new Array[Long](width * depth)
    val candidates: mutable.HashMap[String, Long] = mutable.HashMap.empty
    private val pool = math.max(256, 8 * k)

    private def rowHash(key: String, row: Int): Int = {
      var z = key.hashCode.toLong + 0x9e3779b97f4a7c15L * (row + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (((z ^ (z >>> 31)) & Long.MaxValue) % width).toInt
    }

    def estimate(key: String): Long =
      (0 until depth).map(r => counts(r * width + rowHash(key, r))).min

    def add(key: String): Unit = {
      var r = 0
      while (r < depth) { counts(r * width + rowHash(key, r)) += 1; r += 1 }
      val est = estimate(key)
      if (candidates.contains(key) || candidates.size < pool) {
        candidates.update(key, est)
      } else {
        val (minKey, minEst) = candidates.minBy { case (ck, ce) => (ce, ck) }
        if (est > minEst) {
          candidates.remove(minKey)
          candidates.update(key, est)
        }
      }
    }

    def topK: Seq[(String, Long)] =
      candidates.toSeq.sortBy { case (key, est) => (-est, key) }.take(k)
  }

  test("lazy-min pool maintenance is bit-identical to the minBy policy") {
    // Small width forces hash collisions (over-estimates), a zipf-ish
    // stream with 3000 distinct keys (>> pool=256) forces constant
    // eviction pressure, and repeated heavy keys exercise the
    // min-entry-update invalidation path.
    val width = 64; val depth = 3; val k = 5
    val buf = new CmsTopKBuffer(width, depth, k)
    val model = new Model(width, depth, k)
    val rnd = new scala.util.Random(42)
    (1 to 60000).foreach { _ =>
      // zipf-ish: rank = floor(3000 * u^3) biases mass to low ranks
      val u = rnd.nextDouble()
      val key = s"k${(3000 * u * u * u).toInt}"
      buf.add(key)
      model.add(key)
    }
    assert(buf.candidates.size === model.candidates.size)
    assert(buf.candidates.toMap === model.candidates.toMap)
    assert(buf.topK === model.topK)
  }

  test("pool-overflow eviction keeps the largest estimates") {
    val buf = new CmsTopKBuffer(4096, 5, 3)
    // 300 distinct keys with strictly increasing frequency 1..300 —
    // pool is 256, so the 44 rarest keys must be evicted and the top-3
    // must be exact (wide sketch => no collisions at this cardinality).
    (1 to 300).foreach { i => (1 to i).foreach(_ => buf.add(s"key$i")) }
    assert(buf.candidates.size === 256)
    assert(buf.topK === Seq(("key300", 300L), ("key299", 299L), ("key298", 298L)))
  }
}
