package graft.tools

import org.apache.spark.sql.SparkSession

/** scratch profiler for the skew probe: where does the hot-series extra
  * time go in increase(click[12h]) — prevPass or the merge? (not a
  * driver surface; safe to delete)
  */
object ScaleProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T0 = 1704067200000L
    val D = 86400000L
    val grid = graft.core.GridSpec(T0, T0 + 7 * D, 60000L)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").count()
    import org.apache.spark.sql.functions._
    // per-stage probe: max task time vs total — a skewed stage shows
    // maxTask ~ stage wall with low parallel efficiency
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int)]()
    val names = new scala.collection.mutable.HashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        names.synchronized { names(ss.stageInfo.stageId) =
          ss.stageInfo.name.take(60) + "|" + ss.stageInfo.details.linesIterator.filter(_.contains("graft")).take(2).mkString(";").take(120) }
      val taskMax = new scala.collection.mutable.HashMap[Int, Long]()
      val taskSum = new scala.collection.mutable.HashMap[Int, Long]()
      val taskN = new scala.collection.mutable.HashMap[Int, Int]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        taskMax(te.stageId) = math.max(taskMax.getOrElse(te.stageId, 0L), d)
        taskSum(te.stageId) = taskSum.getOrElse(te.stageId, 0L) + d
        taskN(te.stageId) = taskN.getOrElse(te.stageId, 0) + 1
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val id = sc.stageInfo.stageId
        stages.synchronized {
          stages += ((id, taskMax.getOrElse(id, 0L), taskSum.getOrElse(id, 0L), taskN.getOrElse(id, 0)))
        }
      }
    })
    def store(dir: String) = graft.core.Samples.fromEvents(spark, dir)
    def bare(dir: String): Long =
      graft.Engine.query(store(dir), "increase(click[12h])", grid, 7200000L).count()
    // SCALEPROF_DIRS: comma-separated data dirs (default: the ScaleBench
    // uniform/hot pair); each is warmed once then timed with stage stats
    val dirs = sys.env.get("SCALEPROF_DIRS").map(_.split(',').toSeq)
      .getOrElse(Seq("target/scalebench/uniform", "target/scalebench/hot"))
    for (variant <- dirs) {
      bare(variant) // warm
      stages.synchronized(stages.clear())
      time(s"bare $variant") { bare(variant) }
      Thread.sleep(500)
      val top = stages.synchronized(stages.toVector).sortBy(-_._3).take(6)
      top.foreach { case (id, mx, sum, n) =>
        println(f"[scaleprof]   stage $id%5d: tasks=$n%4d sumTask=${sum/1000.0}%8.1fs maxTask=${mx/1000.0}%7.1fs skew=${if (sum>0) mx.toDouble*n/sum else 0}%5.1f name=${names.getOrElse(id, "?")}")
      }
    }
    spark.stop()
  }
}
