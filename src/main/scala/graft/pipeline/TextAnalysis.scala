package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for large-scale training-data pipelines over
  * the `documents` table (doc_id, text, lang, source, n_chars). All are
  * pure per-row column expressions — codegen'd, embarrassingly parallel,
  * no shuffle; they scale linearly with input splits.
  */
object TextAnalysis {

  /** whitespace tokenization (the baseline token counter) */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(wsTokens(text)))

  /** BPE-ish sub-word token estimate: word-ish runs, digits, and single
    * punctuation each count as one token — a deterministic regex
    * approximation of byte-pair tokenizers.
    */
  def bpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality scoring: length / punctuation ratio / stopword ratio /
    * mean word length — the standard cheap quality gates applied before
    * expensive dedup in data pipelines.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are")

  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = wsTokens(t)
    val nTok = size(toks).cast(DoubleType)
    val stopHits = size(filter(toks, w => lower(w).isin(stopwords: _*))).cast(DoubleType)
    val punct = (length(t) - length(regexp_replace(t, "[^\\p{L}\\p{N}\\s]", ""))).cast(DoubleType)
    df.withColumn("n_tokens", size(toks))
      .withColumn("mean_word_len",
        when(nTok > 0, (length(regexp_replace(t, "\\s+", "")).cast(DoubleType)) / nTok))
      .withColumn("punct_ratio",
        when(length(t) > 0, punct / length(t).cast(DoubleType)).otherwise(0.0))
      .withColumn("stopword_ratio", when(nTok > 0, stopHits / nTok).otherwise(0.0))
      .withColumn("quality_score",
        when(nTok > 0,
          least(nTok / 20.0, lit(1.0)) * 0.4 +
            (lit(1.0) - least(punct / greatest(nTok, lit(1.0)), lit(1.0))) * 0.3 +
            least(stopHits / greatest(nTok, lit(1.0)) * 5.0, lit(1.0)) * 0.3)
          .otherwise(0.0))
  }

  /** Language-ID by stopword-profile voting: a tiny per-language marker
    * lexicon; the language with the most marker hits wins (n-gram
    * heuristic in the character-profile spirit, implemented wordwise so it
    * stays a pure column expression).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "una", "en"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  def langScores(text: Column): Column = {
    val toks = transform(wsTokens(text), lower _)
    map(langMarkers.toSeq.sortBy(_._1).flatMap { case (lang, markers) =>
      Seq(lit(lang), size(filter(toks, w => w.isin(markers: _*))).cast(DoubleType))
    }: _*)
  }

  def detectLang(df: DataFrame, textCol: String = "text"): DataFrame = {
    val scores = langScores(col(textCol))
    // argmax over the map; ties → lexicographically first language
    val best = aggregate(
      array_sort(map_entries(scores)),
      struct(lit("und").as("lang"), lit(0.0).as("s")),
      (acc, e) =>
        when(e.getField("value") > acc.getField("s"),
          struct(e.getField("key").as("lang"), e.getField("value").as("s")))
          .otherwise(acc))
    df.withColumn("detected_lang", best.getField("lang"))
  }

  /** Document fingerprint: polynomial rolling hash of the token stream —
    * deterministic, order-sensitive (two docs with identical token
    * sequences collide, reordered ones don't).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      wsTokens(text),
      lit(0L),
      // rotate-left(5) ⊕ tokenhash: order-sensitive and wrap-safe (a
      // multiplicative hash overflows under ANSI arithmetic)
      (acc, w) =>
        call_function("shiftleft", acc, lit(5))
          .bitwiseOR(call_function("shiftrightunsigned", acc, lit(59)))
          .bitwiseXOR(xxhash64(w)))

  /** n-gram (shingle) set of the token stream — the input to Jaccard /
    * MinHash dedup.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = wsTokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }
}
