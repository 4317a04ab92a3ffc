package graft.tools

import org.apache.spark.sql.SparkSession

// scratch profiler for semanticDedup stage costs (not a driver surface)
object SemProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SEMPROF_DIR", "/root/testdata/sf0.1")
    val embs = graft.core.Samples.table(spark, dir, "embeddings")
    embs.count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (pass <- 1 to 2) {
      val cents = time(s"p$pass ivfTrain")(
        graft.pipeline.Similarity.ivfTrain(embs, 8, 3))
      println(s"[semprof] centroids: ${cents.length}")
      val pairs = time(s"p$pass pairs count")(
        graft.pipeline.Similarity.semanticDupPairs(embs, 0.45, 8, 3).count())
      println(s"[semprof] pairs: $pairs")
      val kept = time(s"p$pass full dedup")(
        graft.pipeline.Similarity.semanticDedup(embs, 0.45, 8, 3).count())
      println(s"[semprof] kept: $kept")
    }
    spark.stop()
  }
}
