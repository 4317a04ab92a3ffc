package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k — exact, used as the correctness
  * oracle and for small query sets (broadcast queries × corpus scan: one
  * pass over the corpus, no shuffle of the corpus itself).
  *
  * Scale path: random-hyperplane LSH buckets (sign of deterministic
  * pseudo-random projections) — candidates only meet inside a bucket;
  * corpus is bucketed once and reused, queries probe their own bucket.
  * At 100 TB the corpus-side design is exactly an IVF index with hash-
  * partitioned posting lists.
  */
object Similarity {

  /** zip_with/aggregate dot product — stays inside codegen, no UDF */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x.cast(DoubleType))

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + (x * x).cast(DoubleType)))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** unit-normalized copy (zeros stay zero) — computed ONCE per vector on
    * the scan side so the n² pair stage is a bare dot product instead of
    * re-deriving both norms per pair.
    */
  def normalized(vec: Column): Column = {
    val n = norm(vec)
    when(n > 0, transform(vec, x => x.cast(DoubleType) / n))
      .otherwise(transform(vec, x => x.cast(DoubleType) * 0.0))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding self-matches by id). Queries are broadcast; the
    * corpus is scanned once. Rank window partitioned per query.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), normalized(col(vecCol)).as("q_vec")))
    val c = corpus.select(col(idCol).as("c_id"), normalized(col(vecCol)).as("c_vec"))
    q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")))
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component: hash(plane, dim)
    * mapped to ±1. Gives reproducible LSH without shipping a plane matrix.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    when(pmod(xxhash64(lit(plane), dim), lit(2)) === 0, 1.0).otherwise(-1.0)

  /** nBits-bit signature: sign of <v, h_p> per pseudo-random hyperplane */
  def lshSignature(vec: Column, nBits: Int): Column = {
    val bits = transform(sequence(lit(0), lit(nBits - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast(DoubleType) * when(pmod(xxhash64(p, i), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: candidates = same bucket signature, ranked by
    * exact cosine within the bucket. Recall < 1 by construction; the
    * multiprobe variant ORs in neighboring buckets (bit flips) — here the
    * standard single-probe with nBits tuned low enough for recall.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nBits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(
      col(idCol).as("c_id"), normalized(col(vecCol)).as("c_vec"),
      lshSignature(col(vecCol), nBits).as("bkt"))
    val q = queries.select(
      col(idCol).as("q_id"), normalized(col(vecCol)).as("q_vec"),
      lshSignature(col(vecCol), nBits).as("bkt"))
    q.join(c, "bkt")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", dot(col("q_vec"), col("c_vec")))
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold inside LSH buckets
    * (the embedding flavor of Dedup.minhashCandidates).
    */
  def embeddingNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      nBits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(
      col(idCol).as("id"), normalized(col(vecCol)).as("vec"),
      lshSignature(col(vecCol), nBits).as("bkt"))
    c.as("a")
      .join(c.as("b"), col("a.bkt") === col("b.bkt") && col("a.id") < col("b.id"))
      .withColumn("cosine", dot(col("a.vec"), col("b.vec")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** Exact all-pairs cosine above a threshold — the verification oracle
    * for the LSH path (quadratic; only for sampled verification).
    */
  def bruteForceNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), normalized(col(vecCol)).as("vec"))
    c.as("a")
      .join(c.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine", dot(col("a.vec"), col("b.vec")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
