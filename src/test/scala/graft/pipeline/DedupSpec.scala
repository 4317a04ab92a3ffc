package graft.pipeline

import graft.SparkSpec
import graft.core.Samples
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Samples.table(spark, sfDir, "documents").cache()

  test("exact dedup is idempotent and keeps one row per distinct text") {
    val d1 = Dedup.exact(docs)
    val distinctTexts = docs.select("text").distinct().count()
    assert(d1.count() === distinctTexts)
    assert(Dedup.exact(d1).count() === distinctTexts)
  }

  test("minhash LSH candidates recall >= 90% of true Jaccard>=0.8 pairs") {
    val truth = Dedup
      .ngramJaccardPairs(docs, 0.8)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val cands = Dedup
      .minhashCandidates(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(truth.nonEmpty, "test data must contain near-duplicate pairs")
    val recalled = truth.count(cands.contains)
    assert(
      recalled.toDouble / truth.size >= 0.9,
      s"LSH recalled $recalled of ${truth.size} true pairs")
  }

  test("minhashDedup keeps exactly the connected-component minima") {
    val verified = Dedup
      .jaccardVerify(docs, Dedup.minhashCandidates(docs))
      .filter(col("jaccard") >= 0.6)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find oracle over the same verified edge list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    verified.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val losers = parent.keys.count(x => find(x) != x)
    val kept = Dedup.minhashDedup(docs, 0.6).count()
    assert(kept === docs.count() - losers)
  }

  test("hot LSH bucket degrades to linear star edges, dedup result unchanged") {
    val s = spark
    import s.implicits._
    // one viral template duplicated 200x (>> the 64 all-pairs cap), plus
    // genuinely distinct docs — the web boilerplate shape
    val viral = (0L until 200L).map(i =>
      (i, "breaking news this exact same viral boilerplate body text repeats verbatim across mirrors " + "with identical wording every time"))
    val distinctDocs = (200L until 230L).map(i =>
      (i, s"unique document number $i talking about completely different topic ${i * 37} " +
        s"and other words ${i * 13} nothing shared here beyond english"))
    val docs = (viral ++ distinctDocs).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs)
    val n = cands.count()
    // all-pairs would be >= 199*100 pairs from the viral cluster alone;
    // star topology keeps it linear (199 star edges + small-bucket pairs)
    assert(n < 1000, s"hot bucket exploded: $n candidate pairs")
    assert(n >= 199, s"star edges missing: $n")
    // end-to-end dedup: exactly one viral survivor (the min id), all
    // distinct docs intact
    val kept = Dedup.minhashDedup(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.count(_ < 200L) == 1 && kept.contains(0L))
    assert((200L until 230L).forall(kept.contains))
  }

  test("connectedLosers collapses transitive chains (A~C, B~C -> keep A only)") {
    import spark.implicits._
    // single-link direct-neighbor would keep B (it is never an id_b);
    // connected components must drop both B and C
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val losers = Dedup.connectedLosers(pairs).collect().map(_.getLong(0)).toSet
    assert(losers === Set(2L, 3L, 11L))
  }

  test("simhash candidates: equal signatures have hamming 0, all pairs ordered") {
    val c = Dedup.simhashCandidates(docs).collect()
    assert(c.forall(r => r.getLong(0) < r.getLong(1)))
    // pigeonhole guarantee: every pair with hamming<=3 that shares a block
    // is found with hamming computed consistently
    assert(c.forall(r => r.getInt(r.fieldIndex("hamming")) >= 0))
  }

  test("dedupSamples keeps the latest (max-value-on-tie) sample per interval") {
    import spark.implicits._
    val df = Seq(
      ("a", 1000L, 1.0), ("a", 2000L, 2.0), ("a", 2000L, 5.0), // tie on ts → max value
      ("a", 11000L, 3.0),
      ("b", 500L, 9.0)
    ).toDF("name", "ts", "value")
    val out = Dedup
      .dedupSamples(df, Seq("name"), 10000L)
      .orderBy("name", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 2000L, 5.0), ("a", 11000L, 3.0), ("b", 500L, 9.0)))
  }

  test("dedupNamedSamples carries name/tags and keeps null-tag rows") {
    import spark.implicits._
    val df = Seq(
      ("m", Map("a" -> "1"), 1000L, 1.0), ("m", Map("a" -> "1"), 2000L, 2.0),
      ("m", Map("a" -> "2"), 2000L, 7.0),
      (null.asInstanceOf[String], Map("a" -> "1"), 1500L, 4.0)
    ).toDF("name", "tags", "ts", "value")
      // null tags row: must dedup as the empty map, not vanish (the r8
      // shape's null `_sk` join key silently dropped it)
      .union(Seq(("n", 3000L, 5.0)).toDF("name", "ts", "value")
        .select(col("name"), lit(null).cast("map<string,string>").as("tags"),
          col("ts"), col("value")))
    val out = Dedup.dedupNamedSamples(df, 10000L)
      .collect()
      .map(r => (r.getString(0), r.getMap[String, String](1).size,
        r.getLong(2), r.getDouble(3))).toSet
    assert(out === Set(
      ("m", 1, 2000L, 2.0), ("m", 1, 2000L, 7.0), (null, 1, 1500L, 4.0),
      ("n", 0, 3000L, 5.0)))
  }

  test("downsampling flag parse: selectors, validation errors") {
    val ps = Dedup.parseDownsamplingPeriods(
      """{__name__=~"node_.*,proc.*"}:1d:1m,30d:5m,180d:1h""")
    assert(ps.length == 3 &&
      ps.head.selector.contains("""{__name__=~"node_.*,proc.*"}""") &&
      ps.head.offsetMs == 86400000L && ps.head.intervalMs == 60000L &&
      ps(1).selector.isEmpty)
    def bad(f: String): String =
      intercept[IllegalArgumentException](Dedup.parseDownsamplingPeriods(f)).getMessage
    assert(bad("30d:7m").contains("multiple of interval")) // 30d % 7m != 0
    assert(bad("30d:5m,60d:8m").contains("multiples of each other"))
    assert(bad("30d:5m,30d:10m") // 30d dup offset (10m divides into... ) — offsets clash
      .contains("duplicate downsampling offsets"))
    assert(bad("30d").contains("offset:interval"))
  }

  test("downsample: first matching filter wins, tiers by age, 0s:0s exempts") {
    import spark.implicits._
    val now = 100000L
    val rows = Seq(
      // click matches its own filter: >10s old → 10s end-aligned buckets
      ("click", Map("user_id" -> "1"), 52000L, 1.0),  // bucket 60000 → dropped
      ("click", Map("user_id" -> "1"), 55000L, 2.0),  // bucket 60000 → kept
      ("click", Map("user_id" -> "1"), 95000L, 3.0),  // younger than 10s offset → raw
      // view matches only the default levels: >20s → 20s buckets, >80s → 40s
      ("view", Map("user_id" -> "1"), 70000L, 4.0),
      ("view", Map("user_id" -> "1"), 75000L, 5.0),   // same 20s bucket → dropped
      ("view", Map("user_id" -> "1"), 10000L, 6.0),   // age 90s > 80s → 40s bucket
      ("view", Map("user_id" -> "1"), 15000L, 7.0),   // same 40s bucket → kept (later)
      // exempted series: never downsampled despite matching default ages
      ("keepme", Map("user_id" -> "1"), 50000L, 8.0),
      ("keepme", Map("user_id" -> "1"), 51000L, 9.0))
      .toDF("name", "tags", "ts", "value")
    val periods = Dedup.parseDownsamplingPeriods(
      """{__name__="keepme"}:0s:0s,{__name__="click"}:10s:10s,20s:20s,80s:40s""")
    val out = Dedup.downsample(rows, periods, now)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      ("click", 55000L, 2.0), ("click", 95000L, 3.0),
      ("view", 75000L, 5.0), ("view", 15000L, 7.0),
      ("keepme", 50000L, 8.0), ("keepme", 51000L, 9.0)))
  }

  test("dupSpanRemoval keeps the first occurrence and merges overlapping spans") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f"),    // owns the first "a b c" and "b c d" → untouched
      (2L, "x a b c d y"),    // flagged starts 1,2 → cut positions 1..4
      (3L, "a b c q r s"),    // flagged start 0 → cut 0..2
      (4L, "a b"),            // shorter than n → no grams, untouched
      (5L, "m n o z m n o"))  // within-doc repeat: second "m n o" cut
      .toDF("doc_id", "text")
    val out = Dedup.dupSpanRemoval(corpus, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((6L, 0L, "a b c d e f")))
    assert(out(2L) === ((6L, 4L, "x y")))
    assert(out(3L) === ((6L, 3L, "q r s")))
    assert(out(4L) === ((2L, 0L, "a b")))
    assert(out(5L) === ((7L, 3L, "m n o z")))
  }
}
