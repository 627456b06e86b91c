package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance retrieval over a document corpus.
  *
  * The reference exposes its corpus through SQL scans and LIKE-style
  * predicates (`core/src/main/scala/.../SnappySessionState.scala` LIKE
  * optimization); a training-data pipeline additionally needs ranked
  * keyword retrieval — "find the documents most relevant to these terms"
  * — for curation triage, eval-set mining and contamination review.
  * BM25 (Robertson et al., TREC-3; the Lucene/Elasticsearch default
  * scoring function) is the standard lexical ranking function.
  */
object Retrieval {

  /** BM25 scores of every document against a small fixed query-term
    * set, top-k by score.
    *
    * Per-term idf uses the Lucene variant
    * `ln(1 + (N - df + 0.5) / (df + 0.5))` (always positive), and the
    * per-document term contribution is
    * `idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))`.
    *
    * Scale shape (100 TB): the query-term set is an API-bounded
    * constant, so per-term `tf` counts are computed INSIDE the scan as
    * `size(filter(tokens, _ == term))` — no explode of the corpus token
    * stream and no (doc, term) shuffle. Corpus statistics (N, avgdl,
    * one df per query term) reduce to a SINGLE row (map-side partials →
    * one global agg), which rejoins via a 1-row broadcast; the final
    * top-k is a sort-limit with k-row per-partition partials. Total
    * shuffled bytes are O(partitions × (|terms| + k)), independent of
    * corpus size.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "terms must be a small fixed set")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    // null-text guard: without it, ANSI-off size(null) = -1 poisons dl,
    // avgdl and every tf — corrupting all scores, not just the null row
    val base = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val withTf = terms.indices.foldLeft(base) { case (df, i) =>
      df.withColumn(s"tf_$i",
        size(filter(col("toks"), x => x === lit(terms(i)))).cast("double"))
    }.drop("toks")

    // one row: N, avgdl, df per term
    val statExprs: Seq[Column] =
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = withTf.agg(count(lit(1)).cast("double").as("n_docs"), statExprs: _*)

    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored
      .select(col(idCol), graft.dround(score, 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }
}
