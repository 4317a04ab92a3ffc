package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** throwaway probe: why is the bucketed TSBS increase slower than flat? */
object BuckProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("BP_LOG", "ERROR"))
    val flat = graft.core.Samples.fromEvents(spark, sfDir)
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val tbl = s"buckprof$tag"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.core.SampleStore.writeBucketed(flat, tbl, s"target/buckprof$tag", buckets = 32)
    val b = graft.core.SampleStore.readBucketed(spark, tbl)
    val grid = graft.core.GridSpec(1704067200000L, 1704067200000L + 7 * 86400000L, 60000L)
    val q = "increase(click[12h])"
    def time(label: String, df: => org.apache.spark.sql.DataFrame): Unit =
      for (_ <- 1 to (if (sys.env.contains("BP_STAGES")) 1 else 3)) {
        val t0 = System.nanoTime()
        val frame = df // Engine.query: includes the eager level-1 checkpoint
        val t1 = System.nanoTime()
        val n = frame.count()
        println(f"[bp] $label%-10s build ${(t1 - t0) / 1e9}%7.3f s + exec " +
          f"${(System.nanoTime() - t1) / 1e9}%7.3f s ($n rows)")
      }
    // per-stage task breakdown via listener
    val taskTimes = new java.util.concurrent.ConcurrentHashMap[Int, List[(Long, Long)]]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          taskTimes.merge(te.stageId,
            List((te.taskMetrics.executorRunTime, te.taskMetrics.shuffleReadMetrics.recordsRead)),
            (a, b) => a ++ b)
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ts = Option(taskTimes.get(si.stageId)).getOrElse(Nil)
        val top = ts.sortBy(-_._1).take(4)
          .map { case (t, r) => f"${t / 1000.0}%.1fs/${r}r" }.mkString(" ")
        println(f"[bp-stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"time=${m.executorRunTime / 1000.0}%8.2f s-core " +
          f"sr=${m.shuffleReadMetrics.recordsRead}%9d " +
          f"spillMem=${m.memoryBytesSpilled / 1048576}%6dMB " +
          f"spillDisk=${m.diskBytesSpilled / 1048576}%6dMB " +
          f"peak=${m.peakExecutionMemory / 1048576}%6dMB top[$top]")
      }
    }
    // OLD r10 layout: sortBy(_h1,_h2,ts), no pre-write repartition
    val tblOld = s"buckprof_old$tag"
    spark.sql(s"DROP TABLE IF EXISTS $tblOld")
    locally {
      val entries = array_sort(map_entries(col("tags")))
      flat
        .withColumn("_h1", xxhash64(entries))
        .withColumn("_h2", xxhash64(entries, lit(1)))
        .withColumn("date", to_date(timestamp_millis(col("ts"))))
        .write.mode("overwrite")
        .option("path", s"target/buckprof_old$tag")
        .partitionBy("date").bucketBy(32, "_h1").sortBy("_h1", "_h2", "ts")
        .format("parquet").saveAsTable(tblOld)
    }
    val bOld = graft.core.SampleStore.readBucketed(spark, tblOld)
    if (sys.env.contains("BP_STAGES")) spark.sparkContext.addSparkListener(listener)
    time("flat", graft.Engine.query(flat, q, grid, 7200000L))
    time("bucketed", graft.Engine.query(b, q, grid, 7200000L))
    time("buckStripped", graft.Engine.query(b.drop("_h1", "_h2"), q, grid, 7200000L))
    time("bucketedOld", graft.Engine.query(bOld, q, grid, 7200000L))
    // isolate the tags-restore dim branch on each store
    def timeDim(label: String, src: org.apache.spark.sql.DataFrame,
        hasPair: Boolean): Unit = {
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val keyed =
          if (hasPair) src
          else {
            val entries = array_sort(map_entries(col("tags")))
            src.withColumn("_h1", xxhash64(entries))
              .withColumn("_h2", xxhash64(entries, lit(1)))
          }
        val n = keyed
          .filter(coalesce(col("name"), lit("")) === "click" &&
            col("ts") > lit(1704016800000L) && col("ts") <= lit(1704672000000L))
          .select(col("_h1"), col("_h2"), col("tags"))
          .dropDuplicates("_h1", "_h2").count()
        println(f"[bp] $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.3f s ($n series)")
      }
    }
    timeDim("dim-flat", flat, hasPair = false)
    timeDim("dim-bucketed", b, hasPair = true)
    // same but reading only scalars (no map column) on the bucketed store
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = b.filter(coalesce(col("name"), lit("")) === "click" &&
          col("ts") > lit(1704016800000L) && col("ts") <= lit(1704672000000L))
        .select(col("_h1"), col("_h2"))
        .dropDuplicates("_h1", "_h2").count()
      println(f"[bp] dim-buck-nomap ${(System.nanoTime() - t0) / 1e9}%7.3f s ($n series)")
    }
    // r12 residual isolation (VERDICT r11 "what's wrong" #2): is the
    // ~1.2× bucketed-vs-flat residual on the counter shape the inline
    // map-typed tags column's columnar decode? Same pruned scan, with and
    // without forcing the tags column to decode.
    def timeScan(label: String, forceTags: Boolean): Unit =
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val base = b.filter(col("name") === "click" &&
          col("ts") > lit(1704016800000L) && col("ts") <= lit(1704672000000L))
        val agg =
          if (forceTags) base.agg(count(lit(1)), sum(size(col("tags"))))
          else base.agg(count(lit(1)), sum(col("value")))
        agg.collect()
        println(f"[bp] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    timeScan("scan-no-tags", forceTags = false)
    timeScan("scan-with-tags", forceTags = true)
    // FINAL AQE plan dumps (post-execution: codegen markers visible)
    locally {
      val fp = graft.Engine.query(flat, q, grid, 7200000L).queryExecution.executedPlan
      fp.execute().count() // run THIS plan so AQE finalizes it
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/bp_flat_plan.txt"), fp.toString)
      val bp = graft.Engine.query(b, q, grid, 7200000L).queryExecution.executedPlan
      bp.execute().count()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/bp_buck_plan.txt"), bp.toString)
    }
    spark.sparkContext.addSparkListener(listener)
    println("[bp] --- flat stages ---")
    graft.Engine.query(flat, q, grid, 7200000L).count()
    Thread.sleep(1000)
    println("[bp] --- bucketed stages ---")
    graft.Engine.query(b, q, grid, 7200000L).count()
    Thread.sleep(1000)
    spark.stop()
  }
}
