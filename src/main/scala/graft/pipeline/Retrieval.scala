package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Lexical retrieval scoring over the `documents` table: TF-IDF term
  * weighting and Okapi BM25 query scoring — the standard cheap relevance
  * primitives a training-data pipeline uses for targeted corpus slicing
  * (pull the docs most relevant to an eval topic) and quality-biased
  * sampling.
  *
  * Scale shape (100 TB): everything is tokenize → explode → hash
  * aggregate. For BM25 the per-query-term filter runs BEFORE the
  * aggregation, so only postings of the handful of query terms ever
  * shuffle — the rest of the corpus contributes one map-side length scan.
  * The per-term document frequencies (|query terms| rows) and the corpus
  * length stats (2 scalars) broadcast back; no quadratic or per-document
  * driver state anywhere.
  */
object Retrieval {

  /** lowercase whitespace terms, matching TextAnalysis.wsTokens' splitting
    * so token counts line up across operators
    */
  def terms(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** (doc_id, term, tf) postings + per-doc length — the exploded view both
    * scorers aggregate from.
    */
  def postings(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), terms(col(textCol)).as("_toks"))
      .withColumn("doc_len", size(col("_toks")))
      .select(col("doc_id"), col("doc_len"), explode(col("_toks")).as("term"))
      .groupBy("doc_id", "doc_len", "term")
      .agg(count(lit(1)).as("tf"))

  /** Per-document top-N TF-IDF terms. idf = ln((N + 1) / (df + 1)) + 1
    * (the smoothed scikit-style form: always positive, defined for
    * df = N). Weight = tf · idf; ties broken lexicographically so the
    * result is deterministic and oracle-able.
    *
    * Plan: one exploded aggregation for tf, one for df (term-keyed hash
    * agg), a shuffle join on term (df table is |vocabulary| rows — at
    * corpus scale this is the one join that genuinely shuffles both
    * sides, exactly like the reference-scale inverted-index builders),
    * then a bounded per-doc top-N window.
    */
  def tfidfTopTerms(
      docs: DataFrame,
      topN: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val post = postings(docs, idCol, textCol)
    val nDocs = docs.select(count(lit(1))).first().getLong(0)
    val df = post.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val idf = log((lit(nDocs.toDouble) + 1.0) / (col("df") + 1.0)) + 1.0
    post
      .join(df, "term")
      .withColumn("tfidf", col("tf") * idf)
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rank") <= topN)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /** Okapi BM25 scores for one query over the corpus: the Robertson
    * formulation with the Lucene-style non-negative idf
    * ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * score(d, q) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    *
    * Only documents matching ≥ 1 query term appear. The query-term filter
    * sits directly on the exploded postings, so the shuffled aggregation
    * carries |matching postings| rows, not the whole corpus; df and the
    * length stats reduce to a handful of broadcast scalars.
    */
  def bm25(
      docs: DataFrame,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val qTerms = queryTerms.map(_.toLowerCase).distinct
    val base = docs.select(col(idCol).as("doc_id"), terms(col(textCol)).as("_toks"))
    // corpus stats: N and avgdl (empty docs count toward both, like Lucene)
    val stats = base.select(count(lit(1)).as("n"), avg(size(col("_toks"))).as("avgdl")).first()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getDouble(1)
    val post = base
      .withColumn("doc_len", size(col("_toks")))
      .select(col("doc_id"), col("doc_len"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(qTerms: _*)) // prune before any shuffle
      .groupBy("doc_id", "doc_len", "term")
      .agg(count(lit(1)).as("tf"))
    val dfTab = post.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val idf = log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    post
      .join(broadcast(dfTab), "term")
      .withColumn(
        "_contrib",
        idf * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("doc_len") / avgdl)))
      .groupBy("doc_id")
      .agg(sum(col("_contrib")).as("score"), count(lit(1)).as("n_matched"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    * score every raw document by the unigram log-likelihood ratio between
    * a small TARGET corpus (the distribution you want more of) and the
    * raw corpus, w(d) = Σ_t tf_d(t) · ln(p_target(t) / p_raw(t)) with
    * add-one smoothing over the raw vocabulary. Sampling raw docs
    * proportional to exp(w) importance-resamples toward the target — the
    * standard cheap data-selection step before training.
    *
    * (The paper hashes n-grams into a fixed-width feature vector purely to
    * bound memory on a single machine; a distributed engine aggregates the
    * unigram tables directly — same estimator, no hash collisions.)
    *
    * Scale: two term-keyed hash aggregations (raw + target unigram
    * counts; target is metadata-scale and broadcasts), one join of doc
    * postings against the log-ratio table on term, one per-doc sum.
    * Nothing quadratic, no driver state beyond 4 scalars.
    */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rawPost = postings(raw, idCol, textCol)
    val rawCounts = rawPost.groupBy("term").agg(sum(col("tf")).as("raw_n"))
    val tgtCounts = postings(target, idCol, textCol)
      .groupBy("term").agg(sum(col("tf")).as("tgt_n"))
    val totals = rawCounts
      .join(tgtCounts, Seq("term"), "full_outer")
      .agg(
        sum(coalesce(col("raw_n"), lit(0L))).as("raw_total"),
        sum(coalesce(col("tgt_n"), lit(0L))).as("tgt_total"),
        count(lit(1)).as("vocab"))
      .first()
    val (rawTotal, tgtTotal, vocab) = (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    val ratio = rawCounts
      .join(tgtCounts, Seq("term"), "full_outer")
      .select(
        col("term"),
        (log((coalesce(col("tgt_n"), lit(0L)) + 1.0) / (tgtTotal.toDouble + vocab)) -
          log((coalesce(col("raw_n"), lit(0L)) + 1.0) / (rawTotal.toDouble + vocab))).as("log_ratio"))
    rawPost
      .join(ratio, "term")
      .groupBy("doc_id")
      .agg(
        sum(col("tf") * col("log_ratio")).as("dsir_weight"),
        sum(col("tf")).as("n_terms"))
  }

  /** Bigram stupid-backoff LM perplexity (Brants et al. 2007 "Large
    * Language Models in Machine Translation" §4) — the CCNet-style LM
    * quality filter (Wenzek et al. 2020 scores docs with a KenLM 5-gram;
    * at 100 TB the model order trades down to bigrams so training is two
    * hash aggregations over the reference slice, no external model).
    *
    * Train on `train`: unigram counts c1 (total T, vocab V) and bigram
    * counts c2. Score each doc in `docs` per token:
    *   p(w_0)          = (c1(w_0)+1) / (T+V)                (Laplace)
    *   p(w_i | w_i-1)  = c2(w_i-1,w_i) / c1(w_i-1)   if c2 > 0
    *                   = 0.4 · (c1(w_i)+1) / (T+V)          (backoff)
    * log-prob = Σ ln p;  perplexity = exp(−logprob / max(n,1)).
    *
    * Scale shape: bigrams are produced MAP-SIDE by an adjacent-pair HOF
    * (never a positional self-join); the count tables are vocab-scale
    * (≪ corpus) and meet the exploded doc bigrams in token-keyed joins
    * that AQE broadcasts when they fit. Per-doc reduction is one sum.
    */
  def lmPerplexity(
      train: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def toks(df: DataFrame) = df.select(col(idCol), terms(col(textCol)).as("t"))
    val bigramsOf = expr(
      "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))")

    val uni = toks(train)
      .select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val tv = uni.agg(sum("c1").as("tt"), count(lit(1)).as("v")).first()
    val (bigT, bigV) = (tv.getLong(0), tv.getLong(1))
    val laplaceDen = (bigT + bigV).toDouble
    val big = toks(train).filter(size(col("t")) >= 2)
      .select(explode(bigramsOf).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))

    val base = toks(docs)
    // first token: Laplace unigram
    val head = base.filter(size(col("t")) >= 1)
      .select(col(idCol), element_at(col("t"), 1).as("w"))
      .join(uni, Seq("w"), "left")
      .select(col(idCol),
        log((coalesce(col("c1"), lit(0L)) + 1.0) / laplaceDen).as("lp"))
    // tokens 1..n-1: bigram with stupid backoff
    val rest = base.filter(size(col("t")) >= 2)
      .select(col(idCol), explode(bigramsOf).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(big, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("c1").as("c1a")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), Seq("w2"), "left")
      .select(col(idCol),
        when(col("c2").isNotNull,
          log(col("c2").cast(DoubleType) / col("c1a")))
          .otherwise(log(lit(0.4) * (coalesce(col("c1b"), lit(0L)) + 1.0) / laplaceDen))
          .as("lp"))
    val lp = head.unionByName(rest)
      .groupBy(idCol).agg(sum(col("lp")).as("logprob"))
    base.select(col(idCol), size(col("t")).cast(LongType).as("n_tokens"))
      .join(lp, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("logprob"), lit(0.0)).as("logprob"),
        exp(-coalesce(col("logprob"), lit(0.0)) /
          greatest(col("n_tokens"), lit(1L)).cast(DoubleType)).as("perplexity"))
  }
}
