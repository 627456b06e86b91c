package graft.functions

import org.apache.spark.sql.Column

/** Public Column-API facade over the Catalyst-internal implementations in
  * `org.apache.spark.sql.graft` (hosted there because they build on
  * `private[sql]` Spark internals — the standard extension-library layout).
  */
object VectorExpressions {
  def vec_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.vec_dot(a, b)
  def vec_cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.vec_cosine(a, b)
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.vec_norm(a)
  def srp_sigs(a: Column, bits: Int, tables: Int, seed: Long = 42L): Column =
    org.apache.spark.sql.graft.VectorExpressions.srp_sigs(a, bits, tables, seed)
  def topk_cosine_local(pack: Column, query: Column, selfId: Column, k: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.topk_cosine_local(pack, query, selfId, k)
  def pq_encode(vec: Column, codebook: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.pq_encode(vec, codebook)
  def pq_dist_table(qvec: Column, codebook: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.pq_dist_table(qvec, codebook)
  def pq_adc(codes: Column, table: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.pq_adc(codes, table)
}

object TopKAggregate {
  /** Distributed top-k (score, id) pairs per group, best-first. */
  def topk_by(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.TopKAggregate.topk_by(score, id, k)
}

object TextFunctions {
  /** MinHash signature of a text's word n-gram shingle set (one pass). */
  def minhash_sig(text: Column, shingleLen: Int, numHashes: Int): Column =
    org.apache.spark.sql.graft.TextHashExpressions.minhash_sig(text, shingleLen, numHashes)
  /** Exact word n-gram Jaccard between two texts. */
  def ngram_jaccard(a: Column, b: Column, n: Int): Column =
    org.apache.spark.sql.graft.TextHashExpressions.ngram_jaccard(a, b, n)
  /** Sorted distinct shingle hashes (one pass per document). */
  def shingle_hashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.TextHashExpressions.shingle_hashes(text, n)
  /** Jaccard of two sorted hash arrays (linear merge). */
  def hash_jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.TextHashExpressions.hash_jaccard(a, b)
  /** Rabin-Karp fingerprints of every windowLen-token window (one md5
    * per token + O(1) per window — linear in tokens).
    */
  def rolling_window_hash(tokens: Column, windowLen: Int): Column =
    org.apache.spark.sql.graft.TextHashExpressions.rolling_window_hash(tokens, windowLen)
}

object MoneyFunctions {
  /** Exact 128-bit sum of a pre-scaled LONG column → DECIMAL(38, scale). */
  def int128_sum(scaled: Column, scale: Int): Column =
    org.apache.spark.sql.graft.Int128Sum.int128_sum(scaled, scale)
}

object SketchFunctions {
  /** Approximate top-k keys by frequency (CMS + candidate heap). */
  def approx_topk(key: Column, k: Int, width: Int = 4096, depth: Int = 5): Column =
    org.apache.spark.sql.graft.CmsTopKAggregate.approx_topk(key, k, width, depth)
}
