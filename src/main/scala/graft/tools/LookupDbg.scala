package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** throwaway probe: where does the sorted-layout lookup floor come from?
  * Reads the stores CardScale left under target/cardscale.
  */
object LookupDbg {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("lookupdbg")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val series = sys.env.getOrElse("CARDSCALE_SERIES", "10000000").toLong
    val nNames = sys.env.getOrElse("CARDSCALE_NAMES", "100").toInt
    val targetName = s"m${(series / 2) % nNames}"
    val targetPod = s"pod-${series / 2}"
    val b = spark.read.parquet("spark-warehouse/target/cardscale/bucketed")
    b.agg(count(lit(1))).collect()
    def timed(label: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[dbg] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s (result $n)")
      }
    }
    timed("sorted: name only, select(name)") {
      b.filter(col("name") === targetName).select("name").count()
    }
    timed("sorted: name only, full row") {
      b.filter(col("name") === targetName).count()
    }
    timed("sorted: name+pod") {
      b.filter(col("name") === targetName &&
        col("tags").getItem("pod") === targetPod).count()
    }
    timed("sorted: ts range only (no prune)") {
      b.filter(col("ts") < 0L).count()
    }
    // small-row-group rewrite: does row-group-level pruning beat pages?
    val small = "target/cardscale/bucketed_small_rg"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(small))
    b.repartition(8, col("_h1"))
      .sortWithinPartitions("name", "_h1", "_h2", "ts")
      .write.option("parquet.block.size", (4 * 1024 * 1024).toString)
      .mode("overwrite").parquet(small)
    val s = spark.read.parquet(small)
    s.agg(count(lit(1))).collect()
    timed("small-rg: name+pod") {
      s.filter(col("name") === targetName &&
        col("tags").getItem("pod") === targetPod).count()
    }
    timed("small-rg: name only, select(name)") {
      s.filter(col("name") === targetName).select("name").count()
    }
    spark.stop()
  }
}
