package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement probe for the approximate-gate recall floors (round 9):
  * how many brute-force top-k hits does each ANN path recover per query /
  * in total, and how many exact-Jaccard pairs does MinHash catch — across
  * several passes, to separate the deterministic ops (LSH, int8) from the
  * training-order-dependent ones (IVF, PQ) before encoding floors into
  * the driver-checkable gates. Not part of any gate; run by hand:
  *   sbt "runMain graft.tools.RecallProbe /root/testdata/sf0.01 3"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Dedup, Similarity}
    val embs = graft.core.Samples.table(spark, sfDir, "embeddings")
    val queries = embs.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(embs, queries, 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def hits(df: DataFrame): (Int, Map[Long, Int]) = {
      val got = df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val inter = got.intersect(truth)
      (inter.size, inter.groupBy(_._1).view.mapValues(_.size).toMap)
    }
    for (p <- 1 to passes) {
      val (lsh, lshQ) = hits(Similarity.lshTopK(embs, queries, 5, nBits = 4, probes = 1))
      val (i8, i8Q) = hits(Similarity.bruteForceTopKInt8(embs, queries, 5))
      val (ivf, ivfQ) = hits(Similarity.ivfTopK(embs, queries, 5))
      val books = Similarity.pqTrain(embs, m = 16, k = 16, iters = 3)
      val (pq, pqQ) = hits(Similarity.pqTopK(embs, queries, books, 5))
      def mn(m: Map[Long, Int]) = (0L until 10L).map(q => m.getOrElse(q, 0)).min
      println(s"[recall] pass=$p total/50: lsh=$lsh(min ${mn(lshQ)}) " +
        s"int8=$i8(min ${mn(i8Q)}) ivf=$ivf(min ${mn(ivfQ)}) pq=$pq(min ${mn(pqQ)})")
    }
    // minhash vs exact-Jaccard pairs at 0.6
    val docs = graft.core.Samples.table(spark, sfDir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (p <- 1 to passes) {
      val kept = Dedup.minhashDedup(docs, 0.6).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val caught = pairs.count { case (a, b) => !(kept(a) && kept(b)) }
      println(s"[recall] pass=$p minhash: truthPairs=${pairs.size} caught=$caught " +
        s"kept=${kept.size}")
    }
    // simhash: how many exact-Jaccard pairs appear among the block
    // candidates, and at what hamming distance?
    val cands = Dedup.simhashCandidates(docs)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val found = pairs.toSeq.flatMap(p => cands.get(p))
    println(s"[recall] simhash: truthPairs=${pairs.size} inCands=${found.size} " +
      s"hammingMax=${if (found.isEmpty) -1 else found.max} nCands=${cands.size}")
    spark.stop()
  }
}
