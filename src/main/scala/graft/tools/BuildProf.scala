package graft.tools

import org.apache.spark.sql.SparkSession

/** scratch probe (not a driver surface; safe to delete): where does the
  * src_bucketed_* first-pass store build spend its time —
  * SampleStore.writeBucketed vs buildTagIndex (VERDICT r13 item 7: the
  * untimed-region build gates the timed number's stability).
  */
object BuildProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[buildprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").count() // session warmup
    for (pass <- 1 to 3) {
      val flat = graft.core.Samples.fromEvents(spark, sfDir)
      val tbl = s"buildprof_p$pass"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      time(s"pass$pass writeBucketed") {
        graft.core.SampleStore.writeBucketed(flat, tbl, s"target/buildprof_p$pass", buckets = 32)
      }
      time(s"pass$pass buildTagIndex") {
        graft.core.SampleStore.buildTagIndex(flat,
          graft.core.SampleStore.tagIndexPath(s"target/buildprof_p$pass"))
      }
      time(s"pass$pass firstQuery") {
        val b = graft.core.SampleStore.readBucketed(spark, tbl)
        val grid = graft.core.GridSpec(1704067200000L, 1704067200000L + 7 * 86400000L, 60000L)
        graft.Engine.query(b, "increase(click[12h])", grid, 7200000L).count()
      }
    }
    spark.stop()
  }
}
