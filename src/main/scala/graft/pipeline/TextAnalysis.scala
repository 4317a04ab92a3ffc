package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Benchmark-contamination check: for every candidate document, the
    * count and share of its distinct n-grams that also appear in any
    * document of a benchmark set (the standard eval-leakage gate run
    * before training-set release).
    *
    * Scale path: the benchmark's distinct grams are tiny relative to the
    * corpus and are BROADCAST; candidate grams meet them in a map-side
    * semi-join, so full document text never shuffles — only the matched
    * gram hits (per-doc counts) do. Per-doc totals are computed inline
    * from the same row, no second aggregation over the corpus.
    */
  def contamination(docs: DataFrame, bench: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(shingles(col(textCol), n)).as("gram"))
    val benchGrams = bench
      .select(explode(shingles(col(textCol), n)).as("gram")).distinct()
    val hits = grams
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("contaminated_ngrams"))
    docs
      .select(col(idCol), size(shingles(col(textCol), n)).as("total_ngrams"))
      .join(hits, Seq(idCol), "left")
      .withColumn("contaminated_ngrams",
        coalesce(col("contaminated_ngrams"), lit(0L)))
      .withColumn("contamination_ratio",
        col("contaminated_ngrams").cast(DoubleType) /
          greatest(col("total_ngrams"), lit(1)).cast(DoubleType))
  }

  /** Deterministic stratified sampling: keep a per-stratum fraction of
    * documents chosen by a Knuth multiplicative hash of the id — fully
    * reproducible across runs/engines (no RNG), expressible in plain
    * SQL for the oracle, and a pure per-row filter (no shuffle, prunes
    * at the scan when the stratum column is a partition key). Strata
    * missing from `fractions` are dropped.
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 0L,
      idCol: String = "doc_id"): DataFrame = {
    val M = 1000003L // prime modulus; id*2654435761 stays < 2^63 for ids < 3.4e9
    val h = pmod(col(idCol) * lit(2654435761L) + lit(seed), lit(M))
    val cond = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && h < lit((f * M).toLong))
    }
    df.filter(cond)
  }

  /** Gopher-style document-quality rules (Rae et al. 2021 §A1.1, the
    * standard repetition/format filters run before training): line and
    * word shape statistics plus the composite keep/drop flag. Pure
    * per-row column expressions — codegen'd, zero shuffle.
    */
  def gopherQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n", -1)
    val nLines = size(lines).cast(DoubleType) // split never yields []
    val words = wsTokens(t)
    val nWords = size(words).cast(DoubleType)
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast(DoubleType)
    val symbols = (regexp_count(t, lit("#")) +
      regexp_count(t, lit("\\.\\.\\."))).cast(DoubleType)
    val bulletLines = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast(DoubleType)
    val ellipsisLines = size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast(DoubleType)
    val dupLines = (nLines - size(array_distinct(lines)).cast(DoubleType)) / nLines
    val meanWordLen = when(nWords > 0,
      length(regexp_replace(t, "\\s+", "")).cast(DoubleType) / nWords).otherwise(0.0)
    val symbolRatio = when(nWords > 0, symbols / nWords).otherwise(0.0)
    val alphaRatio = when(nWords > 0, alphaWords / nWords).otherwise(0.0)
    df.withColumn("n_words", size(words))
      .withColumn("mean_words_per_line", nWords / nLines)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("frac_bullet_lines", bulletLines / nLines)
      .withColumn("frac_ellipsis_lines", ellipsisLines / nLines)
      .withColumn("frac_alpha_words", alphaRatio)
      .withColumn("frac_duplicate_lines", dupLines)
      .withColumn("gopher_pass",
        nWords >= 50 && nWords <= 100000 &&
          meanWordLen >= 3 && meanWordLen <= 10 &&
          symbolRatio < 0.1 &&
          bulletLines / nLines < 0.9 &&
          ellipsisLines / nLines < 0.3 &&
          alphaRatio > 0.8 &&
          dupLines < 0.3)
  }

  /** Sequence packing: pack documents into fixed-capacity token bins with
    * a deterministic next-fit scan inside fixed doc-id blocks — the
    * standard pre-tokenization packing step for LLM training batches.
    * Packing is inherently sequential, so the distributed form makes the
    * sequence PER BLOCK: blocks pack independently in parallel (each
    * bounded by `blockSize` docs), bins are (block, bin) pairs, and the
    * result is reproducible regardless of partitioning. A document larger
    * than `capacity` gets its own bin.
    */
  def packSequences(docs: DataFrame, capacity: Int, blockSize: Int = 256,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokenCount(col(textCol)).cast("int").as("n_tokens"))
      .withColumn("block", floor(col("doc_id") / blockSize).cast("long"))
      .as[(Long, Int, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (block, it) =>
        val ds = it.toArray.sortBy(_._1)
        var bin = 0
        var fill = -1 // sentinel: first doc always opens bin 0
        ds.iterator.map { case (id, n, _) =>
          if (fill < 0) fill = n
          else if (fill + n > capacity) { bin += 1; fill = n }
          else fill += n
          (id, n, block, bin, fill)
        }
      }
      .toDF("doc_id", "n_tokens", "block", "bin", "fill")
  }

  /** C4-style page cleaning (Raffel et al. 2020 §2.2): line-level
    * retention (terminal punctuation, ≥ 3 words, no "javascript") plus
    * page-level drop rules (< 5 sentences after cleaning, "{", lorem
    * ipsum). Emits the cleaned text and the keep decision; pure per-row
    * column expressions — codegen'd, zero shuffle.
    */
  def c4Filters(df: DataFrame, textCol: String = "text"): DataFrame = {
    val lines = split(col(textCol), "\n", -1)
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(filter(split(trim(l), "\\s+"), w => length(w) > 0)) >= 3 &&
        !lower(l).contains("javascript"))
    val cleaned = array_join(kept, "\n")
    val nSentences = size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0)))
    df.withColumn("n_lines", size(lines))
      .withColumn("n_kept_lines", size(kept))
      .withColumn("cleaned", cleaned)
      .withColumn("n_sentences", nSentences)
      .withColumn("has_brace", col(textCol).contains("{"))
      .withColumn("has_lorem", lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("c4_keep",
        nSentences >= 5 && !col("has_brace") && !col("has_lorem"))
  }

  /** Gopher repetition statistics (Rae et al. 2021 §A1.1, the n-gram half
    * of the repetition filters): for n ∈ {2, 3, 4}, the fraction of the
    * document's characters contained in the most frequent word n-gram
    * (occurrences × n-gram chars over single-space-normalized text chars),
    * with a deterministic (count desc, gram asc) winner.
    *
    * Scale shape: per-row n-gram generation (pure column exprs) → ONE
    * exploded hash aggregation on (doc, n, gram) → per-doc max. The gram
    * table shuffles at corpus token scale — the same inverted-index shape
    * as TF-IDF/dedup, nothing quadratic.
    */
  def repetitionStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = Retrieval.terms(col(textCol))
    val base = docs.select(
      col(idCol).as("doc_id"), toks.as("_toks"),
      (aggregate(toks, lit(0L), (acc, t) => acc + length(t)) +
        greatest(size(toks) - 1, lit(0))).cast("double").as("_chars"))
    val grams = Seq(2, 3, 4).map { n =>
      base.select(
        col("doc_id"), col("_chars"), lit(n).as("n"),
        explode_outer(when(size(col("_toks")) >= n,
          transform(sequence(lit(1), size(col("_toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("_toks"), i, lit(n)))))).as("gram"))
    }.reduce(_ unionByName _)
    val counted = grams
      .filter(col("gram").isNotNull)
      .groupBy("doc_id", "_chars", "n", "gram")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"), col("n"))
          .orderBy(col("cnt").desc, col("gram").asc)))
      .filter(col("rk") === 1)
      .withColumn("frac",
        when(col("_chars") > 0,
          col("cnt") * length(col("gram")).cast("double") / col("_chars"))
          .otherwise(0.0))
    val wide = counted.groupBy("doc_id").pivot("n", Seq(2, 3, 4)).agg(
      first(col("frac")).as("frac"), first(col("gram")).as("gram"))
    docs.select(col(idCol).as("doc_id"))
      .join(wide, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("2_frac"), lit(0.0)).as("top2_frac"), col("2_gram").as("top2_gram"),
        coalesce(col("3_frac"), lit(0.0)).as("top3_frac"), col("3_gram").as("top3_gram"),
        coalesce(col("4_frac"), lit(0.0)).as("top4_frac"), col("4_gram").as("top4_gram"))
  }

  /** PII detection + redaction: emails, IPv4 addresses and phone-shaped
    * digit runs are counted and replaced with typed placeholder tokens.
    * Pure per-row regex work (codegen'd, zero shuffle); the patterns are
    * deliberately RE2-compatible so the DuckDB oracle runs them
    * verbatim.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("EMAIL", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("IP", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"),
    ("PHONE", "\\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\\b"))

  def piiRedact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (d, (kind, pat)) =>
      d.withColumn(s"n_${kind.toLowerCase}",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))))
    }
    val redacted = piiPatterns.foldLeft(col(textCol)) { case (c, (kind, pat)) =>
      regexp_replace(c, pat, s"[$kind]")
    }
    counted.withColumn("redacted", redacted)
  }
}
