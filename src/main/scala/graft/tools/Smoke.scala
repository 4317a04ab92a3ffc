package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-shaped smoke: run SparkEntry.entry exactly like the driver's
  * rows>0 check, print the result.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(10, truncate = false)
    spark.stop()
  }
}
