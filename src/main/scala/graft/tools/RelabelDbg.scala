package graft.tools
import org.apache.spark.sql.SparkSession
object RelabelDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- Seq("rl_relabel", "rl_relabel2")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val t0 = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      println(f"$q EXEC ${(t1-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
