package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch profiler for the graphite aggregation path (not a driver
  * surface; safe to delete)
  */
object GrProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("grprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val START = 1704067200000L
    val END = START + 30L * 86400000L
    val H = 3600000L
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[grprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val store = graft.SparkEntry.grStoreForProf(spark, sfDir)
    // warmups
    spark.range(1000).selectExpr("sum(id)").count()
    store.count()
    for (i <- 1 to 6) {
      val ctx = graft.graphite.GraphiteCtx(spark, store, START, END, H, nowMs = END)
      time(s"full exec pass$i") {
        graft.graphite.GraphiteEval.exec(ctx, "groupByNode({click,view}.*, 1, 'sum')")
          .df.filter(!isnan(col("value"))).count()
      }
      time(s"fetch only pass$i") {
        graft.graphite.GraphiteModel.fetch(ctx, "{click,view}.*").df.count()
      }
      val f = graft.graphite.GraphiteModel.fetch(ctx, "{click,view}.*").df
      time(s"fetch sum-value pass$i") {
        f.agg(sum(when(!isnan(col("value")), col("value")))).collect()
      }
      time(s"fetch nonnan count pass$i") {
        f.filter(!isnan(col("value"))).count()
      }
      time(s"store scan pass$i") { store.count() }
    }
    if (sys.env.contains("GRPROF_EXPLAIN")) {
      val ctx = graft.graphite.GraphiteCtx(spark, store, START, END, H, nowMs = END)
      graft.graphite.GraphiteEval.exec(ctx, "groupByNode({click,view}.*, 1, 'sum')")
        .df.filter(!isnan(col("value"))).explain("formatted")
    }
    spark.stop()
  }
}
