package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch A/B probe: the `last` kernel's max(struct(ts,value)) forces
  * SortAggregate; compare against the ts-level two-phase HashAggregate
  * form on the default_rollup shape (not a driver surface; safe to
  * delete). Interleaved passes, min matters.
  */
object LastProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.core.Samples.fromEvents(spark, sfDir)
    val grid = graft.core.GridSpec(1704067200000L, 1706659200000L, 3600000L)
    // scale the input by unioning shifted copies (COPIES=20 makes the agg
    // cost dominate scheduling overhead; COPIES=1 is the raw sf shape —
    // the flat-store crossover probe)
    val copies = sys.env.getOrElse("SPARK_GRAFT_LASTPROF_COPIES", "20").toInt
    val big = (0 until copies).map(i =>
      ev.withColumn("ts", col("ts") + lit(i * 7L)))
      .reduce(_ unionByName _)
    val b = graft.core.Grid.bucketize(big, grid, 7200000L)
    val keys = Seq(col("name"), col("tags").getItem("user_id").as("user_id"))
    def sortForm = b.groupBy(keys :+ col("t"): _*)
      .agg(max(struct(col("ts"), col("value"))).getField("value").as("value"))
    def twoPhase = {
      val l1 = b.groupBy(keys :+ col("t") :+ col("ts"): _*)
        .agg(max(col("value")).as("_lv"))
      l1.groupBy(col("name"), col("user_id"), col("t"))
        .agg(max_by(col("_lv"), col("ts")).as("value"))
    }
    def time(label: String, df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[lastprof] $label%-10s $s%7.3f s")
      s
    }
    var (a, c) = (Double.MaxValue, Double.MaxValue)
    for (_ <- 1 to 4) {
      a = math.min(a, time("sortAgg", sortForm))
      c = math.min(c, time("twoPhase", twoPhase))
    }
    println(f"[lastprof] MIN sortAgg=$a%.3f twoPhase=$c%.3f")
    // sanity: identical results
    val d = sortForm.exceptAll(twoPhase).count() + twoPhase.exceptAll(sortForm).count()
    println(s"[lastprof] result diff rows: $d")
    spark.stop()
  }
}
