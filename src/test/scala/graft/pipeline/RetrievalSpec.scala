package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "hash table"),
      (2L, "table scan scan"),
      (3L, "other words here"),
      (4L, "Hash hash HASH table scan")
    ).toDF("doc_id", "text")
  }

  test("bm25 matches a scalar re-derivation of the Okapi formula") {
    val out = Retrieval.bm25(corpus, Seq("hash", "table", "scan"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    // independent scalar computation (plain loops, no Spark)
    val docs = Map(
      1L -> Seq("hash", "table"),
      2L -> Seq("table", "scan", "scan"),
      3L -> Seq("other", "words", "here"),
      4L -> Seq("hash", "hash", "hash", "table", "scan"))
    val q = Seq("hash", "table", "scan")
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum / n
    val df = q.map(t => t -> docs.values.count(_.contains(t)).toDouble).toMap
    def score(toks: Seq[String]): (Double, Long) = {
      val hits = q.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          Some(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * toks.size / avgdl)))
        }
      }
      (hits.sum, hits.size.toLong)
    }
    assert(out.keySet === Set(1L, 2L, 4L), "doc 3 matches no query term")
    Seq(1L, 2L, 4L).foreach { id =>
      val (expScore, expMatched) = score(docs(id))
      assert(math.abs(out(id)._1 - expScore) < 1e-9, s"doc $id score")
      assert(out(id)._2 === expMatched, s"doc $id n_matched")
    }
    // tf saturation sanity: doc4 (tf=3 for 'hash') must outscore doc1 (tf=1)
    assert(out(4L)._1 > out(1L)._1)
  }

  test("tfidfTopTerms ranks by tf*idf with lexicographic tie-break") {
    val out = Retrieval.tfidfTopTerms(corpus, 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(5)).map(r => (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc4: hash tf=3 df=2 beats table/scan tf=1; then scan (df=2, rarer)
    // beats table (df=3) because idf is larger at equal tf
    assert(out(4L).map(_._1) === Seq("hash", "scan"))
    assert(out(4L).head._2 === 3L && out(4L).head._3 === 2L)
    // doc2: scan tf=2 first; second term is its only other term
    assert(out(2L).map(_._1) === Seq("scan", "table"))
    // doc3: all terms tf=1 df=1 → pure lexicographic
    assert(out(3L).map(_._1) === Seq("here", "other"))
  }

  test("dsirWeights matches a scalar re-derivation and ranks target-like docs higher") {
    import spark.implicits._
    val raw = Seq(
      (1L, "physics physics equations"), // target-like
      (2L, "spam spam offers spam"),     // raw-only noise
      (3L, "physics spam")               // mixed
    ).toDF("doc_id", "text")
    val target = Seq((10L, "physics equations physics theory")).toDF("doc_id", "text")
    val out = Retrieval.dsirWeights(raw, target)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    // scalar re-derivation with add-one smoothing over the union vocab
    val rawToks = Seq("physics", "physics", "equations", "spam", "spam",
      "offers", "spam", "physics", "spam")
    val tgtToks = Seq("physics", "equations", "physics", "theory")
    val vocab = (rawToks ++ tgtToks).distinct
    val rawN = rawToks.size.toDouble + vocab.size
    val tgtN = tgtToks.size.toDouble + vocab.size
    def lr(t: String): Double =
      math.log((tgtToks.count(_ == t) + 1.0) / tgtN) -
        math.log((rawToks.count(_ == t) + 1.0) / rawN)
    def w(toks: Seq[String]): Double = toks.map(lr).sum
    assert(math.abs(out(1L)._1 - w(Seq("physics", "physics", "equations"))) < 1e-9)
    assert(math.abs(out(2L)._1 - w(Seq("spam", "spam", "offers", "spam"))) < 1e-9)
    assert(out(1L)._2 === 3L && out(2L)._2 === 4L)
    // ordering: target-like > mixed > noise, and the noise doc is negative
    assert(out(1L)._1 > out(3L)._1 && out(3L)._1 > out(2L)._1)
    assert(out(2L)._1 < 0)
  }

  test("c4Filters: line retention and page drop rules") {
    import spark.implicits._
    val df = Seq(
      (1L, "A good first line.\nshort.\nno terminal punct\nthis uses javascript here.\nOne two. Three four! Five six? Seven eight. Nine ten."),
      (2L, "Lorem ipsum filler text here.\nOne two. Three four! Five six? Seven eight. Nine ten."),
      (3L, "Code sample { x }.\nOne two. Three four! Five six? Seven eight. Nine ten.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Filters(df)
      .select("doc_id", "n_lines", "n_kept_lines", "n_sentences", "has_brace", "has_lorem", "c4_keep")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    // doc1: 5 lines; kept = line1 + the 5-sentence line (short/no-punct/javascript dropped)
    assert(out(1L) === ((5, 2, 6, false, false, true)))
    // doc2: lorem ipsum page is dropped despite enough sentences
    assert(out(2L)._5 && !out(2L)._6)
    // doc3: '{' page is dropped
    assert(out(3L)._4 && !out(3L)._6)
  }

  test("repetitionStats: top n-gram character share with deterministic ties") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "x"), // too short for any n-gram
      (3L, "unique words only here now")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getString(2), r.getDouble(3), r.getString(4), r.getDouble(5))).toMap
    // chars = 6 tokens of len 1 + 5 spaces = 11
    // 2-grams: "a b"x3, "b a"x2 -> 3*3/11
    assert(math.abs(out(1L)._1 - 9.0 / 11) < 1e-9 && out(1L)._2 === "a b")
    // 3-grams: "a b a"x2 ties "b a b"x2 -> lexicographic winner "a b a"
    assert(math.abs(out(1L)._3 - 10.0 / 11) < 1e-9 && out(1L)._4 === "a b a")
    // overlapping 4-grams can exceed 1 ("a b a b"x2, 7 chars): 14/11
    assert(math.abs(out(1L)._5 - 14.0 / 11) < 1e-9)
    // no n-grams -> 0 fractions, null grams
    assert(out(2L)._1 === 0.0 && out(2L)._2 == null)
    // all-distinct text: every gram count 1, lexicographically first wins
    assert(out(3L)._2 === "here now")
  }

  test("bm25 empty-query-overlap corpus and case folding") {
    import spark.implicits._
    val df = Seq((1L, "ALPHA beta"), (2L, "")).toDF("doc_id", "text")
    val out = Retrieval.bm25(df, Seq("Alpha"))
      .collect().map(r => r.getLong(0)).toSet
    assert(out === Set(1L), "query and corpus fold to lowercase; empty doc never matches")
  }

  test("lmPerplexity matches a scalar re-derivation of bigram stupid backoff") {
    import spark.implicits._
    // train "a b a c": c1 = {a:2, b:1, c:1}, T=4, V=3, laplace den = 7;
    // bigrams (a,b), (b,a), (a,c) each once
    val train = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b a"), // seen bigrams: ln(3/7) + ln(1/2) + ln(1/1)
      (2L, "z a"),   // unseen head + backoff: ln(1/7) + ln(0.4*3/7)
      (3L, ""))      // empty → n=0, logprob 0, ppl 1
      .toDF("doc_id", "text")
    val out = Retrieval.lmPerplexity(train, score)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val lp1 = math.log(3.0 / 7) + math.log(0.5)
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - lp1) < 1e-12)
    assert(math.abs(out(1L)._3 - math.exp(-lp1 / 3)) < 1e-12)
    val lp2 = math.log(1.0 / 7) + math.log(0.4 * 3 / 7)
    assert(out(2L)._1 === 2L)
    assert(math.abs(out(2L)._2 - lp2) < 1e-12)
    assert(out(3L) === ((0L, 0.0, 1.0)))
  }
}
