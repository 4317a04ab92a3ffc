package graft.tools

import org.apache.spark.sql.SparkSession

/** scratch: isolate fill-path vs merge cost of the counter two-level plan
  * on the scalebench hot/uniform data (not a driver surface; safe to delete)
  */
object HotProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = new scala.collection.mutable.HashMap[Int, String]()
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val taskMax = new scala.collection.mutable.HashMap[Int, Long]()
      val spill = new scala.collection.mutable.HashMap[Int, Long]()
      val taskSum = new scala.collection.mutable.HashMap[Int, Long]()
      val taskN = new scala.collection.mutable.HashMap[Int, Int]()
      override def onStageSubmitted(ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        names.synchronized { names(ss.stageInfo.stageId) = ss.stageInfo.name.take(50) }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        taskMax(te.stageId) = math.max(taskMax.getOrElse(te.stageId, 0L), d)
        taskSum(te.stageId) = taskSum.getOrElse(te.stageId, 0L) + d
        taskN(te.stageId) = taskN.getOrElse(te.stageId, 0) + 1
        if (te.taskMetrics != null)
          spill(te.stageId) = spill.getOrElse(te.stageId, 0L) + te.taskMetrics.memoryBytesSpilled
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val id = sc.stageInfo.stageId
        stages.synchronized {
          stages += ((id, taskMax.getOrElse(id, 0L), taskSum.getOrElse(id, 0L), taskN.getOrElse(id, 0)))
          names.synchronized { names(id) = names.getOrElse(id, "?") + f" spillMB=${spill.getOrElse(id, 0L)/1e6}%.0f" }
        }
      }
    })
    val T0 = 1704067200000L; val D = 86400000L
    val grid = graft.core.GridSpec(T0, T0 + 7 * D, 60000L)


    def run(label: String, dir: String, fillable: Boolean): Unit = {
      val q = if (fillable) "increase(click[12h])" else "irate(click[12h])"
      def go(): Long = graft.Engine.query(
        graft.core.Samples.fromEvents(spark, dir), q, grid, 7200000L).count()
      go() // warm
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = go()
      println(f"[hotprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      Thread.sleep(300)
      stages.synchronized(stages.toVector).sortBy(-_._3).take(5).foreach { case (id, mx, sum, nt) =>
        println(f"[hotprof]   stage $id%5d: tasks=$nt%4d sum=${sum/1000.0}%8.1fs max=${mx/1000.0}%6.1fs name=${names.getOrElse(id, "?")}")
      }
    }
    if (sys.env.contains("HOTPROF_GR")) {
      val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val store = graft.SparkEntry.grStoreForProf(spark, dir)
      val END = T0 + 30L * 86400000L
      def go(): Long = {
        val ctx = graft.graphite.GraphiteCtx(spark, store, T0, END, 3600000L, nowMs = END)
        graft.graphite.GraphiteEval.exec(ctx, "groupByNode({click,view}.*, 1, 'sum')")
          .df.filter(!org.apache.spark.sql.functions.isnan(org.apache.spark.sql.functions.col("value"))).count()
      }
      go()
      for (i <- 1 to 2) {
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        val n = go()
        println(f"[hotprof] gr pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        Thread.sleep(300)
        stages.synchronized(stages.toVector).sortBy(-_._3).take(6).foreach { case (id, mx, sum, nt) =>
          println(f"[hotprof]   stage $id%5d: tasks=$nt%4d sum=${sum/1000.0}%8.1fs max=${mx/1000.0}%6.1fs name=${names.getOrElse(id, "?")}")
        }
      }
    } else for (dir <- Seq("target/scalebench/uniform", "target/scalebench/hot")) {
      run(s"increase(fill) $dir", dir, fillable = true)
      run(s"irate(nofill) $dir", dir, fillable = false)
    }
    spark.stop()
  }
}
