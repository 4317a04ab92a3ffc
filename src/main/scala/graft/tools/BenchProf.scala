package graft.tools

import org.apache.spark.sql.SparkSession

/** scratch per-stage profiler for headline bench queries (not a driver
  * surface; safe to delete). Runs each named query PASSES times on the
  * exact Bench rig and prints wall per pass plus the top stages of the
  * LAST pass by summed task time — separating JIT-cold first passes
  * from steady-state, and stage-level hot spots from total wall.
  *
  * BENCHPROF_QUERIES=name,name…  BENCHPROF_PASSES=N (default 3)
  */
object BenchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("BENCHPROF_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int)]()
    val names = new scala.collection.mutable.HashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        names.synchronized {
          names(ss.stageInfo.stageId) = ss.stageInfo.name.take(50) + "|" +
            ss.stageInfo.details.linesIterator.filter(_.contains("graft"))
              .take(2).mkString(";").take(140)
        }
      val taskMax = new scala.collection.mutable.HashMap[Int, Long]()
      val taskSum = new scala.collection.mutable.HashMap[Int, Long]()
      val taskN = new scala.collection.mutable.HashMap[Int, Int]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskSum.synchronized {
          val d = te.taskInfo.duration
          taskMax(te.stageId) = math.max(taskMax.getOrElse(te.stageId, 0L), d)
          taskSum(te.stageId) = taskSum.getOrElse(te.stageId, 0L) + d
          taskN(te.stageId) = taskN.getOrElse(te.stageId, 0) + 1
        }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val id = sc.stageInfo.stageId
        taskSum.synchronized {
          stages.synchronized {
            stages += ((id, taskMax.getOrElse(id, 0L), taskSum.getOrElse(id, 0L),
              taskN.getOrElse(id, 0)))
          }
        }
      }
    })
    // same warmup as Bench
    spark.range(1000).selectExpr("sum(id)").count()
    Seq("lineitem", "orders", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    val all = graft.SparkEntry.queries
    val qnames = sys.env.get("BENCHPROF_QUERIES").map(_.split(',').toSeq)
      .getOrElse(graft.SparkEntry.benchNames.filter(all.contains))
    for (name <- qnames) {
      for (i <- 1 to passes) {
        if (i == passes) stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        val n = all(name)(spark, sfDir).count()
        println(f"[benchprof] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
      Thread.sleep(300)
      val top = stages.synchronized(stages.toVector).sortBy(-_._3).take(8)
      top.foreach { case (id, mx, sum, n) =>
        println(f"[benchprof]   stage $id%5d: tasks=$n%4d sumTask=${sum / 1000.0}%8.2fs " +
          f"maxTask=${mx / 1000.0}%7.2fs skew=${if (sum > 0) mx.toDouble * n / sum else 0}%5.1f " +
          f"name=${names.getOrElse(id, "?")}")
      }
      System.gc(); Thread.sleep(200)
    }
    spark.stop()
  }
}
