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

  /** Hybrid lexical+semantic retrieval fused by Reciprocal Rank Fusion
    * (Cormack et al., SIGIR'09 — the standard ensemble for BM25 +
    * dense-vector search): each arm contributes `1 / (rrfK + rank)` for
    * its top-`armK` hits, fused scores rank the final top-`topK`. The
    * lexical arm is [[bm25]] over the query terms; the semantic arm is
    * cosine similarity against the query embedding (here: the corpus
    * vector with id `queryVecId`, so the whole operator is replayable).
    * Arm ranks tie-break by id over the ROUNDED arm scores — integral
    * ranks make the fused score bit-exact across engines. Output:
    * (id, rrf, r_lex, r_sem) — NULL arm rank when the doc only surfaced
    * in the other arm.
    *
    * Scale shape: each arm is a corpus scan reduced to `armK` rows
    * (BM25's 1-row stats broadcast + sort-limit partials; one fused
    * cosine per vector + sort-limit partials); fusion is a full outer
    * join of two armK-row frames — bounded work after the scans,
    * nothing quadratic, no payload shuffles.
    */
  def hybridRrf(docs: DataFrame, embs: DataFrame,
      idCol: String, textCol: String, vecIdCol: String, vecCol: String,
      terms: Seq[String], queryVecId: Long,
      rrfK: Int = 60, armK: Int = 100, topK: Int = 20): DataFrame = {
    import graft.functions.VectorExpressions.vec_cosine
    val lexW = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col(idCol))
    val lex = bm25(docs, idCol, textCol, terms, topK = armK)
      .withColumn("r_lex", row_number().over(lexW))
      .select(col(idCol).as("id"), col("r_lex"))
    // grouping-free aggregate → provably ONE row for the broadcast side
    // (a bare filter+select is not: the planner — and the scale audit —
    // can't bound its cardinality)
    val qv = embs.filter(col(vecIdCol) === queryVecId)
      .agg(first(col(vecCol)).as("__qv"))
    val semW = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos").desc, col(vecIdCol))
    val sem = embs.crossJoin(broadcast(qv))
      .select(col(vecIdCol),
        graft.dround(vec_cosine(col(vecCol), col("__qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col(vecIdCol))
      .limit(armK)
      .withColumn("r_sem", row_number().over(semW))
      .select(col(vecIdCol).as("id"), col("r_sem"))
    lex.join(sem, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_sem")), lit(0.0)))
      .orderBy(col("rrf").desc, col("id"))
      .limit(topK)
      .select(col("id"), graft.dround(col("rrf"), 6).as("rrf"),
        col("r_lex"), col("r_sem"))
  }

  /** Inverted-index build job: per term, the document frequency and the
    * full posting list (sorted doc ids) — the artifact a search engine's
    * index shards ship. Restricted here to the `topTerms` highest-df
    * terms (ties: term ascending) so the driver-facing result stays
    * bounded; the unbounded variant is the same plan minus the top-k.
    * Posting lists surface as an md5 digest of the comma-joined sorted
    * ids — engine-portable and constant-width however long the list.
    *
    * Scale shape: one (term, doc) distinct agg + one term-keyed
    * collect_set, both shuffling (term, doc_id) pairs once; posting
    * lists build WHERE THE TERM LIVES (no driver collect). A real
    * deployment would range-shard terms; the plan is shard-oblivious.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      topTerms: Int): DataFrame = {
    val postings = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        // numeric sort BEFORE the string cast (lexicographic "10"<"2"
        // would desync engines), md5 over the comma-joined ids
        md5(concat_ws(",",
          transform(sort_array(collect_set(col("__doc"))), x => x.cast("string"))))
          .as("postings_md5"))
    postings.orderBy(col("df").desc, col("term")).limit(topTerms)
  }
}
