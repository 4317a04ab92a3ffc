// scratch: rebuild-per-pass variance probe
package graft.tools
import org.apache.spark.sql.SparkSession
object RebuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T0 = 1704067200000L; val D = 86400000L
    val grid = graft.core.GridSpec(T0, T0 + 7 * D, 60000L)
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      val n = graft.Engine.query(
        graft.core.Samples.fromEvents(spark, dir), "increase(click[12h])", grid, 7200000L).count()
      println(f"[rebuild] pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
