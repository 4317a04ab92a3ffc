package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch debug for semanticDedup anti-join (not a driver surface)
object SemDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SEMPROF_DIR", "/root/testdata/sf0.1")
    val embs = graft.core.Samples.table(spark, dir, "embeddings")
    println(s"[semdbg] corpus=${embs.count()} distinct=${embs.select("vec_id").distinct().count()}")
    val pairs = graft.pipeline.Similarity.semanticDupPairs(embs, 0.45, 8, 3)
    println(s"[semdbg] pairs=${pairs.count()}")
    val losers = graft.pipeline.Dedup.connectedLosers(pairs.select(col("id_a"), col("id_b")))
    println(s"[semdbg] losers=${losers.count()}")
    losers.show(5)
    val kept = embs.join(losers.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left_anti")
    println(s"[semdbg] kept=${kept.count()}")
    spark.stop()
  }
}
