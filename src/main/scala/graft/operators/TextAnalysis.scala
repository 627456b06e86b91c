package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextHashExpressions

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language identification and
  * content fingerprinting. All are single-pass, codegen-friendly
  * column expressions (no UDFs), so they fuse into the document scan —
  * at 100 TB these run at parquet-read speed with full column pruning.
  */
object TextAnalysis {

  /** Fan a small scan out to the session's parallelism before a
    * compute-heavy projection (guide §2.5, input skew): a single-file
    * corpus plans ONE scan task, serializing the whole explode/aggregate
    * pipeline on one core while the rest idle — StageProbe measured
    * q_skipgram_pairs as one 1.6 s task on local[32]. Fires only when the
    * scan has materially fewer partitions than the scheduler has slots;
    * at real scale the input arrives in many splits and this is the
    * identity (no added exchange, nothing tuned to the local core count —
    * the same `splits < slots` gate as the ingest repartition floor).
    * The round-robin repartition pays one pass of the projected bytes,
    * worth it exactly when downstream per-row work dominates — the
    * caller's claim to make. Callers must project FIRST so the exchange
    * carries only what the computation needs (guide §2.3).
    */
  private[operators] def fanOutSmallScan(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= slots) df else df.repartition(slots)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish regex token count: letter runs, digit runs, single other. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Unigram-LM cross-entropy per document — the statistical shape of
    * perplexity quality filtering (as published for CCNet/CC-style corpus
    * cleaning, with the n-gram LM reduced to its unigram core): score a
    * document by the mean negative log-probability of its tokens under a
    * unigram model fit on `model` (defaults to the scored corpus itself —
    * self-entropy flags repetitive/boilerplate docs as LOW and
    * rare-token-heavy docs as HIGH). Tokens unseen in the model take the
    * add-one floor 1/(N+1). Output: (id, n_tokens, xent).
    *
    * Scale shape: the vocabulary aggregation is token-keyed with map-side
    * partials (result bounded by vocab size, not corpus size); the
    * scoring join is token-keyed — AQE broadcasts the vocab while it
    * fits, and a web-scale vocab degrades to a bounded-key shuffle join,
    * never all-pairs; the per-doc mean is one doc-keyed aggregation of
    * (sum, count) partials. The model total rides as a broadcast
    * single-row frame, not a driver-side collect on the data path.
    */
  def unigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      model: Option[DataFrame] = None): DataFrame = {
    def tokens(df: DataFrame) = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__did"),
        explode(split(col(textCol), "\\s+")).as("__tok"))
    val vocab = tokens(model.getOrElse(docs))
      .groupBy("__tok").agg(count(lit(1)).as("__c"))
    val total = vocab.agg(sum(col("__c")).as("__n"))
    tokens(docs)
      .join(vocab, Seq("__tok"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col("__did").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(-log(when(col("__c").isNotNull,
            col("__c").cast("double") / col("__n"))
          .otherwise(lit(1.0) / (col("__n") + 1)))).as("xent"))
  }

  /** TF–IDF keyword extraction (linear-idf variant): the top-k terms per
    * document ranked by tf × (N/df). Doc-length normalization and the
    * corpus constant N don't change a per-document ranking, so the score
    * reduces to cnt/df — ONE IEEE division both engines round
    * identically, keeping the oracle hash exact (log-idf is not portable:
    * ln() implementations differ in the last ulp across engines).
    * Terms are lowercase alphabetic runs of length ≥ 4 (stopword-ish
    * short tokens drop out with the length floor).
    *
    * Scale shape: a (doc, term)-keyed aggregation (tf), a term-keyed
    * aggregation over tf (df — bounded by vocab, computed from tf so the
    * token stream is read once), a term-keyed join (AQE broadcasts the
    * vocab side while it fits, degrades to shuffle join beyond), and a
    * doc-partitioned window for the top-k. No all-pairs, no driver data.
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term").rlike("^[a-z]{4,}$"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("score", col("cnt").cast("double") / col("dfreq"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"),
        graft.dround(col("score"), 6).as("score"), col("rk"))
  }

  /** Per-document surface statistics. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    docs.select(
      col(idCol),
      length(t).as("n_chars"),
      nTok.as("n_tokens"),
      regexTokenCount(t).as("n_regex_tokens"),
      graft.dround(length(regexp_replace(t, "\\s+", "")).cast("double") / nTok, 4)
        .as("avg_token_len"),
      graft.dround(length(regexp_replace(t, "[a-zA-Z0-9\\s]", "")).cast("double") /
        length(t), 4).as("punct_ratio"))
  }

  /** Function-word sets per language for the stopword-overlap language
    * heuristic. Deliberately tiny: language ID at corpus scale is a
    * per-token dictionary probe, not a model inference.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "for", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "una", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "eine", "zu", "den", "von"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"))

  /** Stopword-overlap language ID. Returns (id, pred_lang, score) where
    * score is the winning language's stopword hit count. Deterministic
    * tie-break: language list order (en > es > de > fr).
    *
    * Per-language hit counts are per-row dictionary probes
    * (`array_count_in` over the token array), so the whole operator is a
    * scan projection — the former explode → token-level groupBy → join
    * shuffled every (doc, token) pair for a per-document answer.
    */
  def langId(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    // NULL-text docs are dropped (see qualityScore note) — otherwise the
    // when-chain's null conditions would default them to the last lang
    val scored = docs.filter(col(textCol).isNotNull)
      .select((col(idCol) +: carry.map(col)) ++
      langStopwords.map { case (lang, words) =>
        TextHashExpressions.array_count_in(toks, words).as(s"s_$lang")
      }: _*)
    val Seq(en, es, de, fr) = langStopwords.map(l => col(s"s_${l._1}"))
    scored.select((col(idCol) +: carry.map(col)) ++ Seq(
      when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr").as("pred_lang"),
      greatest(en, es, de, fr).cast("bigint").as("score")): _*)
  }

  /** Composite quality score in [0,1]: length saturation + stopword
    * density + punctuation cleanliness. Formula is the usual linear mix
    * of heuristic sub-scores used in corpus-quality filtering.
    *
    * Entirely per-row (`array_count_in` for the stopword probe), so it
    * fuses into the document scan — no token shuffle, no join.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val allStop = langStopwords.flatMap(_._2).distinct
    val toks = split(lower(t), "\\s+")
    // NULL-text docs are dropped, matching the relational formulation
    // (explode of null emits nothing → inner join omits the doc) and
    // the SQL oracles' unnest semantics
    docs.filter(t.isNotNull).select((col(idCol) +: carry.map(col)) ++ Seq(
        size(toks).cast("bigint").as("n_tokens"),
        TextHashExpressions.array_count_in(toks, allStop).as("n_stop"),
        length(t).as("n_chars"),
        (length(regexp_replace(t, "[a-zA-Z0-9\\s]", "")).cast("double") / length(t))
          .as("punct_ratio")): _*)
      .select((col(idCol) +: carry.map(col)) ++ Seq(
        col("n_tokens"),
        graft.dround(
          least(col("n_chars").cast("double") / 500.0, lit(1.0)) * 0.4 +
            least(col("n_stop").cast("double") / col("n_tokens") * 5.0, lit(1.0)) * 0.3 +
            (lit(1.0) - least(col("punct_ratio") * 10.0, lit(1.0))) * 0.3,
          4).as("quality")): _*)
  }

  /** Content fingerprint: md5 over the normalized text (lower-cased,
    * punctuation stripped, whitespace collapsed). Normalization-invariant
    * exact-dup key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " ")))

  /** PII patterns for corpus scrubbing, shared by the Column API and the
    * SQL oracles. Engine-portable subset (identical semantics under
    * Java regex and RE2): no backreferences, no lookaround.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    // URLs FIRST (addresses embedded in a URL vanish with it)
    "https?://[^\\s]+" -> "[URL]",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "[IP]")

  /** Redact URLs, e-mail addresses and IPv4 literals — the standard
    * pre-training scrub pass, as chained codegen `regexp_replace`s that
    * fuse into the document scan (no UDF, full column pruning).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Repetition statistics — the classic corpus-quality signals
    * (duplicate-content heuristics as in the public Gopher/RefinedWeb
    * filtering rules): per document, the fraction of tokens covered by
    * the single most frequent token / 2-gram / 3-gram. High values flag
    * boilerplate and generated spam. A per-document signal needs no
    * cross-row state, so it computes entirely inside the scan projection
    * via the codegen'd [[org.apache.spark.sql.graft.TopGramFracs]]
    * expression — no explode, no shuffle, no join: at 100 TB this runs at
    * scan speed with perfect partition locality. (Perf history, all at
    * sf0.1: three explode→count→join pipelines 2.3–5 s; a fused
    * single-explode struct variant 2.8× slower than that; a
    * transform/aggregate HOF formulation 3× slower again because Spark's
    * higher-order functions are CodegenFallback — interpreted per
    * element. The native expression runs the whole query in ~the scan
    * time.)
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // __fr is projected to its own attribute so the three element
    // extracts below reference one computed array; CollapseProject will
    // not inline a non-cheap expression into multiple consumers.
    // NULL-text docs are dropped (the explode formulation and the SQL
    // oracle both omit them).
    docs.filter(col(textCol).isNotNull).select(col(idCol),
        TextHashExpressions.top_gram_fracs(
          split(lower(trim(col(textCol))), "\\s+"), 3).as("__fr"))
      .select(col(idCol),
        col("__fr").getItem(0).as("top1gram_frac"),
        col("__fr").getItem(1).as("top2gram_frac"),
        col("__fr").getItem(2).as("top3gram_frac"))
  }

  /** Context-window chunking: split each document into `chunkTokens`-token
    * chunks overlapping by `overlap` tokens — the standard pre-training
    * windowing pass. Pure array expressions (`sequence` of chunk starts →
    * `transform`/`slice` → `posexplode`), so the fan-out happens inside
    * whole-stage codegen with no UDF and no shuffle: each scan task emits
    * its own chunk rows. Output: (id, chunk_idx, chunk_text).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"chunk($chunkTokens, $overlap): need chunkTokens > overlap >= 0")
    val stride = chunkTokens - overlap
    // Token array materialized once per row (see repetitionStats note) —
    // the transform lambda then slices the attribute instead of
    // re-splitting the full text once per chunk position.
    val tokenized = docs.select(col(idCol),
      split(trim(col(textCol)), "\\s+").as("__toks"))
    val toks = col("__toks")
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride))
    tokenized.select(col(idCol),
        posexplode(transform(starts,
          s => array_join(slice(toks, s + 1, lit(chunkTokens)), " "))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
  }

  /** Corpus vocabulary: per-token total occurrence count and document
    * frequency, top-k by count — the "build the tokenizer vocab" step of
    * a training pipeline (and the raw input to BPE-merge selection).
    *
    * Scale shape: the token stream explodes inside the scan tasks and
    * reduces through TWO map-side-combinable aggregates — (token, doc)
    * pre-aggregation for exact doc frequency, then token-keyed totals —
    * so shuffled bytes are O(distinct (token, doc) pairs), not O(corpus
    * tokens); top-k is a sort-limit over O(vocab) rows with k-row
    * per-partition partials.
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame =
    docs
      .select(col(idCol).as("__doc"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .groupBy(col("token"), col("__doc"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("token"))
      .agg(sum(col("__n")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)

  /** Hashing-trick linear text classifier — the fastText/quality-
    * classifier SHAPE (token → hashed feature id → weight; document
    * score = mean feature weight + bias) with the weight table replaced
    * by a deterministic md5-derived pseudo-weight in [-1, 1), so the
    * whole model is engine-portable and the oracle can replay every
    * score exactly. A real deployment drops in a trained weight table
    * (token-keyed join, AQE-broadcast while it fits) without changing
    * the plan shape; the pseudo-weight variant exercises — and
    * hash-checks — the full scoring machinery.
    *
    * Floating sums are order-sensitive, so the fold accumulates the RAW
    * 40-bit integer hashes (exact, order-independent, overflow-free
    * below 2²³ tokens/doc) and converts to the mean weight
    * `(Σh/n)/2³⁹ − 1` with two IEEE ops at the end — both engines
    * compute the identical double. Output: (id, n_tokens, score).
    *
    * Scale shape: a pure scan projection — one md5 per token inside
    * whole-stage codegen, zero shuffles, zero joins.
    */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
      bias: Double = 0.0, salt: String = "w"): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val hash = (t: Column) =>
      org.apache.spark.sql.graft.TextHashExpressions
        .md5_prefix_long(concat(t, lit("|" + salt)), 10)
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (aggregate(col("__toks"), lit(0L), (acc, t) => acc + hash(t))
          .cast("double") / size(col("__toks")) / (1L << 39).toDouble
          - 1.0 + bias).as("score"))
  }

  /** Gopher-style rule-based quality filter (Rae et al. 2021, §A1.1 —
    * the published heuristic battery behind MassiveText, minus the
    * n-gram repetition rules which live in [[repetitionStats]]): word
    * count bounds, mean-word-length bounds, alphabetic-word fraction,
    * and a stopword-presence check, each surfaced as its own flag plus
    * the conjunctive `keep`. All thresholds compare exact int/int ratio
    * divisions, so the flags are engine-portable bit-for-bit. Output:
    * (id, n_words, r_wordcount, r_meanwordlen, r_alpha, r_stopwords,
    * keep).
    *
    * Scale shape: a pure scan projection over the token array — zero
    * shuffles, zero joins; the rule battery fuses into whole-stage
    * codegen next to whatever filter consumes `keep`.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopwords: Int = 2,
      carry: Seq[String] = Nil): DataFrame = {
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = split(trim(col(textCol)), "\\s+")
    val carried = carry.map(col)
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol) +: toks.as("__t") +: carried: _*)
      .select(col(idCol) +:
        size(col("__t")).cast("long").as("n_words") +:
        col("__t") +: carried: _*)
      .select(col(idCol) +: col("n_words") +: carried ++: Seq(
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("r_wordcount"),
        (aggregate(col("__t"), lit(0L), (acc, x) => acc + length(x))
          .cast("double") / col("n_words"))
          .between(minMeanLen, maxMeanLen).as("r_meanwordlen"),
        (size(filter(col("__t"), x => x.rlike("[a-z]"))).cast("double")
          / col("n_words") > minAlphaFrac).as("r_alpha"),
        (size(array_intersect(col("__t"),
          array(stopwords.map(lit): _*))) >= minStopwords).as("r_stopwords")): _*)
      .withColumn("keep",
        col("r_wordcount") && col("r_meanwordlen") && col("r_alpha") &&
          col("r_stopwords"))
  }

  /** BPE merge selection (Sennrich et al., ACL'16) — the tokenizer-
    * training step [[vocabulary]] is the raw input to: starting from
    * character symbols, repeatedly merge the adjacent symbol pair with
    * the highest corpus weight (ties: weight desc, then (left, right)
    * ascending), applying each merge left-to-right non-overlapping in
    * every word. Output: (rank, left, right, weight) — the ordered merge
    * table a BPE tokenizer ships.
    *
    * Scale shape: the corpus token stream reduces ONCE to a
    * (word, count) table bounded by vocabulary, and every merge step is
    * one pair-keyed aggregation + one argmax over that bounded table —
    * the classic iterative build job (KMeans/IVF class): the driver
    * receives exactly ONE metadata row per step (the winning pair),
    * never data; per-step lineage is cut so N merges stay N independent
    * jobs. The merge application is a pure array fold expression — the
    * fold (carry the last output symbol, coalesce when it is `left` and
    * the next is `right`) is provably equivalent to the left-to-right
    * scan because a merged symbol `left||right` can never equal `left`.
    */
  def bpeMerges(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrain(docs, textCol, numMerges)._1
      .toDF("rank", "left", "right", "weight")
  }

  /** Apply a learned BPE segmentation back to the corpus: per document,
    * the whitespace word count and the total symbol count after
    * `numMerges` merge rounds — the "how many tokens will this corpus
    * cost" accounting step of tokenizer training. Output:
    * (id, n_words, n_syms).
    *
    * Scale shape: the final (word → symbols) table from [[bpeMerges]]'s
    * build loop is vocabulary-bounded, so encoding is one word-keyed
    * join (AQE broadcasts the vocab while it fits) + one doc-keyed
    * aggregation — the corpus token stream is read once.
    */
  def bpeEncodeStats(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int): DataFrame = {
    val lens = bpeTrain(docs, textCol, numMerges)._2
      .select(col("__w"), size(col("syms")).as("__len"))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
      .join(lens, "__w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__len")).cast("long").as("n_syms"))
  }

  /** Shared BPE build loop: returns (merge table rows, final word →
    * symbol-array frame with columns (__w, cnt, syms)).
    */
  private def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    var words = docs
      .filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("cnt"))
      .select(col("__w"), col("cnt"), split(col("__w"), "").as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("w"))
        .orderBy(col("w").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, w) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, a, b, w))
        val fold = aggregate(
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), 1, 1),
          (acc, x) => when(element_at(acc, -1) === a && x === b,
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        words = words.select(col("__w"), col("cnt"), fold.as("syms"))
          .localCheckpoint(true)
        step += 1
      }
    }
    (merges.toSeq, words)
  }

  /** One-row corpus profile — the "data card" summary a curation run
    * reports: document count, total whitespace tokens, length min/max/
    * mean, Shannon entropy of the language distribution (nats), and the
    * exact-duplicate rate (1 − distinct content hashes / docs).
    *
    * Scale shape: one full-scan aggregation with map-side partials for
    * the scalar stats, one lang-keyed aggregate (bounded by |languages|)
    * for the entropy, and one content-hash distinct-count (the same
    * hash-keyed shuffle class as exact dedup); the three single-row
    * frames cross-join at the end — driver traffic is one row.
    */
  def corpusProfile(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, lenCol: String): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
    val scalars = base.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(trim(col(textCol)), "\\s+")).cast("long")).as("total_tokens"),
      min(col(lenCol)).cast("long").as("min_len"),
      max(col(lenCol)).cast("long").as("max_len"),
      graft.dround(avg(col(lenCol)), 4).as("avg_len"))
    val langTotal = base.agg(count(lit(1)).as("__tot"))
    val entropy = base.groupBy(col(langCol)).agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(langTotal))
      .select((col("__n").cast("double") / col("__tot")).as("__p"))
      .agg(graft.dround(-sum(col("__p") * log(col("__p"))), 6).as("lang_entropy"))
    val dups = base.agg(count_distinct(md5(col(textCol))).as("__uniq"),
        count(lit(1)).as("__n"))
      .select(graft.dround(
        lit(1.0) - col("__uniq").cast("double") / col("__n"), 6).as("dup_rate"))
    scalars.crossJoin(entropy).crossJoin(dups)
  }

  /** Bigram-LM cross-entropy — one LM order up from
    * [[unigramCrossEntropy]], the statistical core of KenLM-style
    * perplexity filtering: score a document by the mean negative log of
    * the add-one-smoothed conditional bigram probability
    * `p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)` under counts fit on
    * the scored corpus itself (V = corpus unigram vocabulary size;
    * `c(w1 ·)` counts w1 as a bigram prefix, so the two count tables
    * come from ONE bigram stream). Documents under two tokens have no
    * bigrams and drop out. Output: (id, n_bigrams, xent2).
    *
    * Scale shape: the bigram stream explodes inside the scan and reduces
    * through bigram-keyed map-side-combinable aggregates (bounded by
    * bigram vocabulary, not corpus size); scoring joins are
    * bigram/prefix-keyed (AQE broadcasts while small, bounded-key
    * shuffles beyond); V and nothing else crosses the driver — it rides
    * as a broadcast single-row frame.
    */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), "\\s+")
    // bigrams ride as (w1, w2) COLUMN PAIRS, not concatenated strings
    // (the skipgramPairs lesson): the concat built a fresh string per
    // bigram INSTANCE — inside an interpreted HOF lambda, twice (the
    // count subtree and the scoring join side each explode) — and the
    // prefix aggregate re-parsed it with substring_index; the pair
    // columns group/join byte-equivalently and c1's prefix key is just
    // the w1 column. (A fanned-out shared-base variant was measured OUT:
    // the two consumers prune different columns, so the repartition
    // exchange does not reuse and the corpus shuffles twice — slower
    // than the single-task scans it replaced.)
    val bigrams = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__did"), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("__did"), explode(
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2")))).as("__p"))
      .select(col("__did"), col("__p.w1").as("__w1"), col("__p.w2").as("__w2"))
    val c2 = bigrams.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy("__w1").agg(sum(col("__c2")).as("__c1"))
    val vocab = docs.filter(col(textCol).isNotNull)
      .select(explode(toks).as("__tok")).agg(count_distinct(col("__tok")).as("__v"))
    // score once per DISTINCT bigram (bounded by bigram vocabulary), so
    // the corpus bigram stream pays ONE bounded-key join, not two
    val scores = c2
      .join(c1, "__w1")
      .crossJoin(broadcast(vocab))
      .select(col("__w1"), col("__w2"),
        (-log((col("__c2") + 1).cast("double") / (col("__c1") + col("__v"))))
          .as("__nlp"))
    bigrams
      .join(scores, Seq("__w1", "__w2"))
      .groupBy(col("__did").as(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(col("__nlp")).as("xent2"))
  }

  /** Collocation mining: rank adjacent word pairs by LIFT —
    * `c12 · N / (c1 · c2)` over bigram count c12, unigram counts c1/c2
    * and corpus token count N (the pointwise-mutual-information statistic
    * without the log, so the score is ONE integer-ratio IEEE division and
    * replays bit-exactly on any engine). The collocation table is what a
    * phrase-merging tokenizer step ("new york" → "new_york") consumes.
    * Output: (w1, w2, c12, lift) for bigrams with c12 ≥ `minCount`.
    *
    * Scale shape: the corpus token stream reduces ONCE to bigram-vocab-
    * and unigram-vocab-bounded count tables; scoring is two vocab-keyed
    * joins on the BOUNDED bigram table (AQE broadcasts them while they
    * fit), never a second pass over the corpus.
    */
  def collocations(docs: DataFrame, textCol: String,
      minCount: Long = 1L): DataFrame = {
    // project the token ARRAY first: an element_at(split(...), i) inside
    // the transform lambda would re-split the full text once per bigram
    // position (the O(T²) higher-order-function trap — Spark does not
    // hoist loop-invariant subexpressions out of lambda bodies)
    val base = docs.filter(col(textCol).isNotNull)
      .select(split(col(textCol), "\\s+").as("__t"))
    val c2 = base
      .filter(size(col("__t")) >= 2)
      .select(explode(
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => concat_ws(" ",
            element_at(col("__t"), i), element_at(col("__t"), i + 1))))
        .as("__bg"))
      .groupBy("__bg").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val c1 = base
      .select(explode(col("__t")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    val total = base
      .select(size(col("__t")).cast("long").as("__n"))
      .agg(sum(col("__n")).as("__total"))
    c2
      .withColumn("w1", substring_index(col("__bg"), " ", 1))
      .withColumn("w2", substring_index(col("__bg"), " ", -1))
      .join(c1.select(col("__w").as("w1"), col("__c").as("__c1")), "w1")
      .join(c1.select(col("__w").as("w2"), col("__c").as("__c2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"),
        ((col("c12") * col("__total")).cast("double") /
          (col("__c1") * col("__c2"))).as("lift"))
  }

  /** N-gram novelty: per document, the fraction of its DISTINCT word
    * n-grams that appear in no other document (corpus document-frequency
    * 1) — a uniqueness/memorization-risk signal: low-novelty documents
    * are recombinations of corpus-common phrasing, high-novelty ones
    * carry unique content. Output: (id, n_shingles, novel, novel_frac).
    *
    * Scale shape: reuses the dedup family's shingle stream — one
    * (doc, shingle) distinct, one shingle-keyed df agg (bounded by
    * shingle vocabulary), one join back, one doc-keyed agg. Linear in
    * corpus shingles; no self-join (contrast [[Dedup.containmentPairs]]).
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // scan-fused shingling: shingle_hashes emits each document's DISTINCT
    // shingle set as sorted 64-bit hashes in one pass, so the document
    // frequency agg and the join back shuffle 8-byte longs instead of
    // shingle STRINGS (the relational explode→distinct shape shuffled the
    // text twice). Within-corpus collision odds at 64 bits are ~1e-12 —
    // the same contract as the minhash verify path. Tokenization follows
    // TextHash.tokens (text is TRIMMED before the split — no phantom
    // empty-token shingle on padded docs), which differs from
    // Dedup.shingles' untrimmed convention; the oracle trims to match.
    val sh = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("sid"),
        explode(org.apache.spark.sql.graft.TextHashExpressions
          .shingle_hashes(col(textCol), n)).as("__h"))
    val df = sh.groupBy("__h").agg(count(lit(1)).as("__df"))
    sh.join(df, "__h")
      .groupBy(col("sid").as(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("novel"))
      .withColumn("novel_frac",
        col("novel").cast("double") / col("n_shingles"))
  }

  /** Concat-and-chop sequence packing accounting (the GPT-style
    * pretraining batch layout): documents concatenate in a deterministic
    * order (doc id) within each source domain and chop into fixed
    * `ctxLen`-token training sequences. Output per (source, seq_id):
    * how many documents the sequence spans (= cross-document attention
    * boundaries + 1) and its token fill — the "how many sequences, how
    * fragmented" accounting a data loader ships.
    *
    * Scale shape: ONE per-source window cumsum over (source, doc-order)
    * — a prefix sum, shuffling each source's (id, token-count) pairs
    * once — then a scan-fused span fan-out (each doc explodes to the
    * sequences it overlaps, ≤ tokens/ctxLen + 1 rows) and a
    * (source, seq)-keyed agg. At petabyte scale the cumsum runs
    * per-shard with shard-offset rebasing (two metadata-size passes);
    * the plan below is the single-shard form.
    */
  def seqPacking(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, ctxLen: Int): DataFrame = {
    require(ctxLen >= 1, s"ctxLen must be positive: $ctxLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(idCol))
    val toked = docs.filter(col(textCol).isNotNull)
      .select(col(sourceCol), col(idCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("__n"))
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("__start", col("__cum") - col("__n"))
    toked
      .select(col(sourceCol), col("__n"), col("__cum"), col("__start"),
        explode(sequence(
          floor(col("__start") / ctxLen),
          floor((col("__cum") - 1) / ctxLen))).as("seq_id"))
      .groupBy(col(sourceCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("__cum"), (col("seq_id") + 1) * ctxLen) -
          greatest(col("__start"), col("seq_id") * ctxLen)).as("n_tokens"))
  }

  /** Skip-gram co-occurrence pairs (word2vec/SGNS training-data prep):
    * ordered (center, context) token pairs within `window` positions,
    * counted corpus-wide. Distinct from bigram collocation: context
    * reaches past adjacency, and (a,b) at distance 1..window all count.
    * Output: (w1, w2, n_pairs) for pairs with n_pairs ≥ `minCount`.
    *
    * Scale shape: the pair stream fans out ≤ window rows per token
    * INSIDE the scan (array-index lambda over the projected token
    * array — no positions self-join), then one pair-keyed count agg
    * bounded by co-occurring vocabulary².
    */
  def skipgramPairs(docs: DataFrame, textCol: String, window: Int,
      minCount: Long = 1L): DataFrame = {
    require(window >= 1, s"window must be positive: $window")
    // fanned out past the single-split scan: the pair fan-out below is
    // the heaviest per-row projection in the text family (window×tokens
    // concats), measured as ONE 1.6 s task without this (StageProbe)
    val base = fanOutSmallScan(docs.filter(col(textCol).isNotNull)
      .select(split(trim(col(textCol)), "\\s+").as("__t")))
    // pairs ride as (w1, w2) STRUCTS, not concatenated strings: the
    // concat built a fresh string per pair and the tail substring_index
    // re-parsed it — pure per-pair CPU in the hottest projection of the
    // text family (the HOF lambda is interpreted per element, so every
    // saved expression counts); grouping on the two columns directly is
    // byte-equivalent on the shuffle
    base
      .filter(size(col("__t")) >= 2)
      .select(explode(flatten(
        transform(sequence(lit(1), size(col("__t")) - 1), i =>
          transform(
            sequence(lit(1), least(lit(window), size(col("__t")) - i)),
            d => struct(element_at(col("__t"), i).as("w1"),
              element_at(col("__t"), i + d).as("w2"))))))
        .as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minCount)
      .select(col("w1"), col("w2"), col("n_pairs"))
  }

  /** Weak-supervision label resolution (the Snorkel/labeling-function
    * shape): each labeling function votes keep(1) / drop(0) / abstain
    * (NULL); a document's label is the majority of NON-abstaining votes,
    * NULL on a tie or all-abstain. The three built-in LFs are published
    * heuristics over the corpus surface: length band, stopword presence,
    * repetition cap. Output: (id, lf_1..lf_3, n_votes, label).
    *
    * Scale shape: pure scan projection — every LF is a column expression
    * over the token array; no shuffle at all.
    */
  def weakLabels(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toksOf = split(trim(col(textCol)), "\\s+")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), toksOf.as("__t"))
    val n = size(col("__t"))
    // LF1: length band — too short/long is drop, mid-band keeps, near
    // the boundary abstains
    val lf1 = when(n.between(20, 2000), 1)
      .when(n < 10 || n > 5000, 0)
      .otherwise(lit(null).cast("int"))
    // LF2: stopword presence — natural language keeps; zero stopwords
    // drops; one abstains
    val sw = size(array_intersect(col("__t"), array(stopwords.map(lit): _*)))
    val lf2 = when(sw >= 2, 1).when(sw === 0, 0).otherwise(lit(null).cast("int"))
    // LF3: repetition cap — a dominant token above 20% of the doc drops;
    // under 10% keeps; between abstains. top_gram_fracs(n=1) IS
    // max-token-count / n, computed by the compiled sort-and-run-length
    // kernel — the HOF formulation (aggregate over transform over
    // filter) is O(distinct × n) interpreted comparisons per document
    val topFrac = element_at(
      TextHashExpressions.top_gram_fracs(col("__t"), 1), 1)
    val lf3 = when(topFrac < 0.10, 1).when(topFrac > 0.20, 0)
      .otherwise(lit(null).cast("int"))
    base
      .select(col(idCol), lf1.as("lf_1"), lf2.as("lf_2"), lf3.as("lf_3"))
      .withColumn("n_votes",
        (lit(3) - col("lf_1").isNull.cast("int") - col("lf_2").isNull.cast("int")
          - col("lf_3").isNull.cast("int")))
      .withColumn("__keeps",
        coalesce(col("lf_1"), lit(0)) + coalesce(col("lf_2"), lit(0)) +
          coalesce(col("lf_3"), lit(0)))
      .withColumn("label",
        when(col("__keeps") * 2 > col("n_votes"), 1)
          .when(col("__keeps") * 2 < col("n_votes"), 0)
          .otherwise(lit(null).cast("int")))
      .drop("__keeps")
  }

  /** Vocabulary coverage accounting: for the top-`k` corpus tokens by
    * frequency (ties: token ascending), the per-token and cumulative
    * fraction of all token occurrences they cover — the "how large must
    * the vocab be" curve of tokenizer design. Output:
    * (rank, token, cnt, frac, cum_frac).
    *
    * Scale shape: one token-keyed count agg (vocab-bounded), a k-row
    * top-k, and a window over those k rows only.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val toks = split(col(textCol), "\\s+")
    val counts = docs.filter(col(textCol).isNotNull)
      .select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    counts
      .orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rank", row_number().over(w))
      .withColumn("__cum", sum(col("cnt")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("cnt"),
        (col("cnt").cast("double") / col("__total")).as("frac"),
        (col("__cum").cast("double") / col("__total")).as("cum_frac"))
  }

  /** DSIR-shape importance scoring: rank raw documents by how much more
    * likely a TARGET-domain unigram LM finds them than the RAW-corpus
    * unigram LM — score = mean over tokens of
    * `log p_target(tok) - log p_raw(tok)` (the per-token log importance
    * weight of Data Selection via Importance Resampling, with the
    * hashed-bigram features reduced to their unigram core). Positive
    * scores mean "looks like the target domain"; selection is a
    * threshold or top-k over the score. Unseen tokens take each model's
    * add-one floor `1/(N+1)` — same convention as
    * [[unigramCrossEntropy]]. Output: (id, n_tokens, log_ratio).
    *
    * Scale shape: the doc token stream explodes ONCE and joins two
    * token-keyed vocab frames (each bounded by vocab size, AQE-broadcast
    * while small, bounded-key shuffle beyond); model totals ride as
    * broadcast single-row frames; the per-doc mean is one doc-keyed
    * aggregation of (sum, count) partials. No all-pairs, no driver data.
    */
  def importanceScore(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame): DataFrame = {
    def tokens(df: DataFrame) = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__did"),
        explode(split(col(textCol), "\\s+")).as("__tok"))
    def vocab(df: DataFrame, cnt: String) =
      tokens(df).groupBy("__tok").agg(count(lit(1)).as(cnt))
    val vt = vocab(target, "__ct")
    val vr = vocab(docs, "__cr")
    val totals = vt.agg(sum(col("__ct")).as("__nt"))
      .crossJoin(vr.agg(sum(col("__cr")).as("__nr")))
    def logp(c: Column, n: Column) =
      log(when(c.isNotNull, c.cast("double") / n)
        .otherwise(lit(1.0) / (n + 1)))
    tokens(docs)
      .join(vt, Seq("__tok"), "left")
      .join(vr, Seq("__tok"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col("__did").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(logp(col("__ct"), col("__nt")) - logp(col("__cr"), col("__nr")))
          .as("log_ratio"))
  }
}
