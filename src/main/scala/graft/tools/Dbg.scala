package graft.tools

import org.apache.spark.sql.SparkSession

// scratch debug main — not part of the library surface
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val M = 60000L
    val grid = graft.core.GridSpec(M, 10 * M, M)
    val samples = {
      import spark.implicits._
      (1 to 10).flatMap { i =>
        val ts = i * M - 30000
        val b = if (i <= 5) i * 10.0 else (i - 6) * 10.0 + 5.0
        Seq(("m", Map("inst" -> "a"), ts, i.toDouble), ("m", Map("inst" -> "b"), ts, b)) ++
          (if (i <= 5) Seq(("n", Map("inst" -> "a"), ts, 100.0)) else Nil)
      }.toDF("name", "tags", "ts", "value")
    }
    val qs = Seq(
      "running_sum(avg_over_time(m[1m]))",
      "keep_last_value(avg_over_time(n[1m]))",
      "range_max(avg_over_time(m[1m]))")
    for (q <- qs) {
      println("=== " + q)
      try {
        val out = graft.Engine.query(samples, q, grid)
        out.orderBy(org.apache.spark.sql.functions.to_json(
          org.apache.spark.sql.functions.col("tags")),
          org.apache.spark.sql.functions.col("t")).show(40, false)
      } catch { case e: Throwable => println("EXC " + e.getMessage) }
    }
    spark.stop()
  }
}
