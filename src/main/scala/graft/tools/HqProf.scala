package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch profiler for the h_quantile chain (not a driver surface) */
object HqProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("hqprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hqprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").count()
    val H = 3600000L
    val ev = graft.core.Samples.eventsFlat(spark, sfDir)
    ev.count()
    val gridH = graft.core.GridSpec(1704067200000L, 1706659200000L, H)
    import graft.operators.{Rollup, HistogramQ}
    for (i <- 1 to 4) {
      time(s"bucketize+groupBy pass$i") {
        Rollup.histogramOverTime(ev, Seq("name"), gridH, H).count()
      }
      time(s"vmrangeToLE pass$i") {
        HistogramQ.vmrangeToLE(
          Rollup.histogramOverTime(ev, Seq("name"), gridH, H), Seq("name")).count()
      }
      time(s"full h_quantile pass$i") {
        graft.SparkEntry.queries("h_quantile")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
