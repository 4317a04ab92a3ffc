package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** throwaway: decompose the O7 delta-refresh cost (InstantScale r11) */
object InstantDbg {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T0 = 1704067200000L
    val spanMs = 30L * 86400000L
    val tEnd = T0 + spanMs
    val df = graft.core.SampleStore.read(spark, "target/instantscale/store")
    df.agg(count(lit(1))).collect()
    def time(label: String)(f: => Long): Unit =
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"[idbg] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s ($n)")
      }
    def instant(t: Long) = graft.core.GridSpec(t, t, 60000L)
    time("tail window eval (60s)") {
      graft.Engine.query(df, "sum_over_time(m[60000ms])", instant(tEnd + 60000L), 60000L).count()
    }
    time("head window eval (60s)") {
      graft.Engine.query(df, "sum_over_time(m[60000ms])", instant(tEnd - 86400000L + 60000L), 60000L).count()
    }
    time("full 24h instant eval") {
      graft.Engine.query(df, "sum_over_time(m[24h])", instant(tEnd + 60000L), 60000L).count()
    }
    spark.stop()
  }
}
