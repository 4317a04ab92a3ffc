package graft.pipeline

import graft.SparkSpec
import graft.core.Samples
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  // two tight semantic groups + two isolated vectors (unit-ish, 4-dim)
  private def crafted = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.14f, 0.0f, 0.0f)),   // ~1
      (3L, Seq(0.98f, 0.0f, 0.2f, 0.0f)),    // ~1 (so 1,2,3 one group)
      (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (5L, Seq(0.0f, 0.99f, 0.0f, 0.14f)),   // ~4
      (6L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),     // isolated
      (7L, Seq(0.5f, 0.5f, 0.5f, 0.5f))      // isolated at 0.9 threshold
    ).toDF("vec_id", "embedding")
  }

  test("semanticDedup keeps one representative per semantic group") {
    val kept = Similarity.semanticDedup(crafted, threshold = 0.9, nClusters = 2, iters = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // groups {1,2,3} and {4,5} keep min ids; 6 and 7 are isolated.
    // nClusters=2 may split a group across clusters; connectivity within
    // clusters still keeps at least {1,4} and never drops 6 or 7.
    assert(kept.contains(1L) && kept.contains(4L))
    assert(kept.contains(6L) && kept.contains(7L))
    assert(!kept.contains(2L) || !kept.contains(3L) || kept.size < 7,
      "some near-duplicate must have been removed")
  }

  test("string doc ids work end-to-end (surrogate index, no Long cast)") {
    import spark.implicits._
    val stringIds = crafted
      .withColumn("vec_id", concat(lit("doc-"), format_string("%03d", col("vec_id"))))
    val pairs = Similarity.semanticDupPairs(stringIds, 0.9, nClusters = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // sid order == id order, so pair orientation matches the Long-id run
    assert(pairs === Set(("doc-001", "doc-002"), ("doc-001", "doc-003"),
      ("doc-002", "doc-003"), ("doc-004", "doc-005")))
    val kept = Similarity.semanticDedup(stringIds, 0.9, nClusters = 1)
      .select("vec_id").collect().map(_.getString(0)).toSet
    assert(kept === Set("doc-001", "doc-004", "doc-006", "doc-007"))
  }

  test("nClusters=1 degrades to exact all-pairs connectivity") {
    val semKept = Similarity.semanticDedup(crafted, threshold = 0.9, nClusters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val brutePairs = Similarity.bruteForceNearDupPairs(crafted, 0.9)
    val losers = Dedup.connectedLosers(brutePairs.select(col("id_a"), col("id_b")))
      .collect().map(_.getLong(0)).toSet
    val bruteKept = Set(1L, 2L, 3L, 4L, 5L, 6L, 7L) -- losers
    assert(semKept === bruteKept)
    assert(semKept === Set(1L, 4L, 6L, 7L))
  }

  test("clustered pairs are a subset of brute-force pairs on real embeddings") {
    // the synthetic embeddings are near-uniform (no cluster structure), so
    // only the safety invariant holds there; recall is gated on clusterable
    // data below, which is the operating regime SemDeDup assumes
    val embs = Samples.table(spark, sfDir, "embeddings")
    val brute = Similarity.bruteForceNearDupPairs(embs, 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clustered = Similarity.semanticDupPairs(embs, 0.45, nClusters = 4, iters = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clustered.subsetOf(brute), "clustering must never invent a pair")
  }

  test("full recall on well-separated semantic groups") {
    import spark.implicits._
    // 4 well-separated axis groups × 8 jittered members: k-means with k=4
    // recovers the groups, so every near-dup pair is intra-cluster
    val rows = for {
      g <- 0 until 4
      m <- 0 until 8
    } yield {
      val base = Array.fill(8)(0.02f * ((g * 31 + m * 7) % 5))
      base(g * 2) = 1.0f
      base(g * 2 + 1) = 0.05f * (m % 3)
      ((g * 8 + m).toLong, base.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceNearDupPairs(df, 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clustered = Similarity.semanticDupPairs(df, 0.9, nClusters = 4, iters = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(clustered === brute, s"recall ${clustered.size}/${brute.size} on separable groups")
  }

  test("banded embedding near-dup pairs: subset of brute, full planted recovery") {
    // 400 vectors, every 50th id's two successors are near-copies —
    // mirrors the SimScale probe's planted structure at spec scale
    import org.apache.spark.sql.functions._
    val n = 400L
    val isDup = expr("pmod(id, 50L) IN (1, 2)")
    val base = when(isDup, expr("id - pmod(id, 50L)")).otherwise(col("id"))
    val comp = (j: Int) =>
      (pmod(xxhash64(base, lit(j)), lit(20000L)).cast("double") / 10000.0 - 1.0 +
        when(isDup, pmod(xxhash64(col("id"), lit(j + 1000)), lit(100L)).cast("double") / 10000.0)
          .otherwise(lit(0.0))).cast("float")
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 32).map(comp): _*).as("embedding"))
    val banded = Similarity.embeddingNearDupPairs(corpus, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceNearDupPairs(corpus, 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(brute), "banding must never invent a pair")
    // every planted pair recovered: {head,head+1}, {head,head+2}, {head+1,head+2}
    val planted = (0L until n by 50L).flatMap(h =>
      Seq((h, h + 1), (h, h + 2), (h + 1, h + 2))).toSet
    assert(planted.subsetOf(banded),
      s"missed planted pairs: ${(planted -- banded).take(5)}")
  }
}
